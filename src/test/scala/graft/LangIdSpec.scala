package graft

import graft.operators.TextAnalysis
import org.scalatest.funsuite.AnyFunSuite

/** The Cavnar–Trenkle trigram classifier proven on REAL multilingual
  * text (held-out sentences, disjoint from the embedded training
  * samples). The driver testdata cannot exercise this — its `lang`
  * labels are statistically independent of the text (one shared 31-word
  * English vocabulary across all five labels), so accuracy there
  * measures the data, not the classifier.
  */
class LangIdSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val fixture: Seq[(String, String)] = Seq(
    // english — held-out sentences
    "en" -> "she walked through the old market looking for fresh bread and cheese",
    "en" -> "the weather this morning was cold but the sun came out after noon",
    "en" -> "my brother works at the hospital near the river in the city center",
    "en" -> "reading books in the evening helps me sleep much better at night",
    "en" -> "the children played football in the park until it started to rain",
    "en" -> "we would like to order two coffees and a piece of apple cake please",
    // spanish
    "es" -> "ella caminó por el mercado antiguo buscando pan fresco y queso",
    "es" -> "el tiempo esta mañana era frío pero el sol salió después del mediodía",
    "es" -> "mi hermano trabaja en el hospital cerca del río en el centro de la ciudad",
    "es" -> "leer libros por la noche me ayuda a dormir mucho mejor",
    "es" -> "los niños jugaron al fútbol en el parque hasta que empezó a llover",
    "es" -> "nos gustaría pedir dos cafés y un trozo de tarta de manzana por favor",
    // french
    "fr" -> "elle a marché dans le vieux marché en cherchant du pain frais et du fromage",
    "fr" -> "le temps ce matin était froid mais le soleil est sorti après midi",
    "fr" -> "mon frère travaille à l'hôpital près de la rivière au centre de la ville",
    "fr" -> "lire des livres le soir m'aide à beaucoup mieux dormir la nuit",
    "fr" -> "les enfants ont joué au football dans le parc jusqu'à ce qu'il pleuve",
    "fr" -> "nous voudrions commander deux cafés et un morceau de tarte aux pommes",
    // german
    "de" -> "sie ging durch den alten markt und suchte frisches brot und käse",
    "de" -> "das wetter heute morgen war kalt aber die sonne kam am nachmittag heraus",
    "de" -> "mein bruder arbeitet im krankenhaus in der nähe des flusses im stadtzentrum",
    "de" -> "abends bücher zu lesen hilft mir nachts viel besser zu schlafen",
    "de" -> "die kinder spielten fußball im park bis es zu regnen begann",
    "de" -> "wir möchten bitte zwei kaffee und ein stück apfelkuchen bestellen",
    // chinese
    "zh" -> "她走过古老的市场寻找新鲜的面包和奶酪",
    "zh" -> "今天早上的天气很冷但是中午之后太阳出来了",
    "zh" -> "我的哥哥在市中心河边的医院工作",
    "zh" -> "晚上读书帮助我睡得更好",
    "zh" -> "孩子们在公园里踢足球直到开始下雨",
    "zh" -> "我们想点两杯咖啡和一块苹果蛋糕")

  test("trigram rank-profile classifier exceeds 80% on held-out real text") {
    import spark.implicits._
    val df = fixture.zipWithIndex
      .map { case ((lang, text), i) => (i.toLong, lang, text) }
      .toDF("doc_id", "lang", "text")
    val out = TextAnalysis.classifyLang(df).collect()
    assert(out.length === fixture.length)
    val correct = out.count(_.getAs[Boolean]("agrees"))
    val acc = correct.toDouble / out.length
    assert(acc > 0.8, s"accuracy $acc (${out.length - correct} misclassified: " +
      out.filterNot(_.getAs[Boolean]("agrees"))
        .map(r => s"${r.getAs[Long]("doc_id")}:${r.getAs[String]("lang")}->${r.getAs[String]("predicted_lang")}")
        .mkString(", ") + ")")
  }

  test("classifier is deterministic across partitionings") {
    import spark.implicits._
    val df = fixture.zipWithIndex
      .map { case ((lang, text), i) => (i.toLong, lang, text) }
      .toDF("doc_id", "lang", "text")
    val a = TextAnalysis.classifyLang(df).collect().map(_.toSeq)
    val b = TextAnalysis.classifyLang(df.repartition(7)).collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }
}
