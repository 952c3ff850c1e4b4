package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Cavnar–Trenkle language-ID profiles (N-Gram-Based Text
  * Categorization, 1994 — public knowledge): each language has a
  * rank-ordered profile of its most frequent character 1/2/3-grams,
  * built at class-init from the embedded sample texts; a document is
  * classified by the minimal "out-of-place" distance between its own
  * top-gram ranks and each profile, missing grams costing the maximum
  * penalty. Shared by the per-row kernel ([[LangIdPredict]]) and the
  * DuckDB oracle generator (TextAnalysis.langIdSql), which embeds the
  * same profiles as literal VALUES.
  */
object LangProfiles {
  val ProfileSize = 200
  val DocTopK     = 100

  /** Embedded per-language sample text for profile building (authored
    * common-vocabulary sentences; order = deterministic tie-break
    * preference).
    */
  val LangSamples: Seq[(String, String)] = Seq(
    "en" -> ("the quick brown fox jumps over the lazy dog and the cat is in the " +
      "house that was built with wood it is a good day to think about what we " +
      "should do when they come home from work and school because there will be " +
      "time for everything the people who live here are friends of the family " +
      "and this is the most important thing of all to be with those you love " +
      "and the world will be a better place for everyone who tries to make it so"),
    "es" -> ("el perro y el gato están en la casa que fue construida con madera es " +
      "un buen día para pensar en lo que debemos hacer cuando vengan a casa del " +
      "trabajo y de la escuela porque habrá tiempo para todo las personas que " +
      "viven aquí son amigos de la familia y esto es lo más importante de todo " +
      "estar con los que amas y el mundo será un lugar mejor para todos los que " +
      "intentan hacerlo así"),
    "fr" -> ("le chien et le chat sont dans la maison qui a été construite en bois " +
      "c'est une bonne journée pour penser à ce que nous devons faire quand ils " +
      "rentrent du travail et de l'école parce qu'il y aura du temps pour tout " +
      "les gens qui vivent ici sont des amis de la famille et c'est la chose la " +
      "plus importante de toutes être avec ceux que vous aimez et le monde sera " +
      "un meilleur endroit pour tous ceux qui essaient de le faire"),
    "de" -> ("der hund und die katze sind in dem haus das aus holz gebaut wurde es " +
      "ist ein guter tag um darüber nachzudenken was wir tun sollten wenn sie " +
      "von der arbeit und der schule nach hause kommen weil es zeit für alles " +
      "geben wird die menschen die hier leben sind freunde der familie und das " +
      "ist das wichtigste von allem bei denen zu sein die man liebt und die " +
      "welt wird ein besserer ort für alle die es versuchen"),
    "zh" -> ("狗和猫在用木头建造的房子里今天是思考我们应该做什么的好日子当他们下班放学" +
      "回家因为一切都会有时间住在这里的人是家人的朋友这是最重要的事情和你爱的人在一" +
      "起世界会变得更美好对于每个努力的人来说都是如此"))

  /** Rank-ordered n-gram profile of a training text: top `ProfileSize`
    * character 1/2/3-grams of ' '+lower(text)+' ' by (count desc, gram
    * asc). Multiple gram lengths are essential (per the paper): single
    * characters carry the signal for ideographic scripts whose longer
    * grams rarely recur across texts.
    */
  /** SIMPLE (1:1 codepoint) lowercase — Character.toLowerCase, not
    * String.toLowerCase: the String form applies SpecialCasing
    * (U+0130 'İ' → "i" + U+0307, two code points) while DuckDB's
    * lower() uses the one-to-one simple mapping; a multi-codepoint
    * expansion would shift every downstream gram and break the oracle
    * on such characters.
    */
  private[functions] def simpleLower(text: String): String = {
    val cps = text.codePoints().map(Character.toLowerCase(_)).toArray
    new String(cps, 0, cps.length)
  }

  def profileOf(text: String): Seq[(String, Int)] = {
    val s = " " + simpleLower(text) + " "
    val grams = (1 to 3).flatMap(n => (0 to s.length - n).map(i => s.substring(i, i + n)))
    grams
      .groupBy(identity)
      .map { case (g, occ) => (g, occ.size) }
      .toSeq
      .sortBy { case (g, c) => (-c, g) }
      .take(ProfileSize)
      .zipWithIndex
      .map { case ((g, _), i) => (g, i + 1) }
  }

  private[functions] val langs: Array[String] = LangSamples.map(_._1).toArray

  private[functions] val rankMaps: Array[java.util.HashMap[String, Integer]] =
    LangSamples.map { case (_, text) =>
      val m = new java.util.HashMap[String, Integer]()
      profileOf(text).foreach { case (g, r) => m.put(g, Integer.valueOf(r)) }
      m
    }.toArray
}

/** Per-row Cavnar–Trenkle classifier: `graft_lang_id(text)` → predicted
  * language code (or 'und' for texts too short to gram). The whole
  * classification — gram counting, per-doc top-k ranking, out-of-place
  * scoring against all five broadcast-free static profiles, argmin — is
  * one codegen'd scalar call, so language ID over a 100 TB corpus is a
  * single narrow map with ZERO shuffle (the dataflow formulation needs
  * an explode of 3×|text| rows, a count shuffle, and a per-doc window).
  * Result-identical to the dataflow/oracle formulation: doc grams are
  * code-point 1..3-grams of ' '+lower(text)+' ' (DuckDB substr/length
  * are code-point based, and code-point order == UTF-8 byte order, so
  * tie-breaks match binary string collation), ranks 1..100 by
  * (count desc, gram asc), missing grams cost ProfileSize, first
  * language in sample order wins score ties.
  */
case class LangIdPredict(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(text: Any): Any =
    LangIdPredict.classify(text.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LangIdPredict.classify($c)")
  override protected def withNewChildInternal(newChild: Expression): LangIdPredict =
    copy(child = newChild)
  override def prettyName: String = "graft_lang_id"
}

object LangIdPredict {
  private val Und = UTF8String.fromString("und")
  private val langU8: Array[UTF8String] =
    LangProfiles.langs.map(UTF8String.fromString)

  /** Code-point lexicographic compare — equals UTF-8 byte order (and
    * therefore DuckDB/Spark binary string collation), unlike Java's
    * String.compareTo which sorts by UTF-16 unit and misorders
    * supplementary characters.
    */
  private def cpCompare(a: String, b: String): Int = {
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca)
      j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  def classify(text: UTF8String): UTF8String = {
    val s   = " " + LangProfiles.simpleLower(text.toString) + " "
    val cps = s.codePoints().toArray
    if (cps.length < 3) return Und

    val counts = new java.util.HashMap[String, Integer]()
    var n = 1
    while (n <= 3) {
      var i = 0
      val last = cps.length - n
      while (i <= last) {
        counts.merge(new String(cps, i, n), Integer.valueOf(1), (a, b) => a + b)
        i += 1
      }
      n += 1
    }

    val grams = counts.keySet().toArray(new Array[String](counts.size()))
    java.util.Arrays.sort(
      grams,
      { (a: String, b: String) =>
        val c = Integer.compare(counts.get(b), counts.get(a))
        if (c != 0) c else cpCompare(a, b)
      })

    val k        = math.min(LangProfiles.DocTopK, grams.length)
    val nLangs   = LangProfiles.rankMaps.length
    var best     = 0
    var bestScore = Long.MaxValue
    var li = 0
    while (li < nLangs) {
      val prof  = LangProfiles.rankMaps(li)
      var score = 0L
      var r = 0
      while (r < k) {
        val pr = prof.get(grams(r))
        score += (if (pr == null) LangProfiles.ProfileSize
                  else math.abs(r + 1 - pr.intValue()))
        r += 1
      }
      if (score < bestScore) { bestScore = score; best = li }
      li += 1
    }
    langU8(best)
  }
}
