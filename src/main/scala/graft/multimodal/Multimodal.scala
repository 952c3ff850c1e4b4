package graft.multimodal

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, decoded/feature-extracted per partition.
  *
  * The container has no image/audio codecs, so `fakeDecode` below is a
  * clearly-marked DETERMINISTIC STAND-IN for a real decoder (it computes
  * a normalized 16-bin byte histogram). Everything around it — the
  * schema (binary + metadata struct), the per-partition batch shape
  * (iterator → iterator, the same contract a real Arrow/codec-based
  * decode would use), frame sampling, and the feature aggregation — is
  * real Spark plumbing, tested in MultimodalSpec.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, content: Array[Byte], kind: String)
  final case class FeatureRow(
      doc_id: Long, n_bytes: Long, features: Array[Double])

  /** Media table synthesized from `documents`: UTF-8 payload as the
    * opaque binary column plus a typed metadata struct — the layout a
    * real image/audio table would have (binary + width/height/etc.).
    */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("content"),
      struct(
        lit("blob").as("kind"),
        col("n_chars").cast("long").as("n_bytes"),
        col("source").as("origin")).as("meta"))

  /** STUB DECODER — stands in for image decode / audio feature
    * extraction. Deterministic: 16-bin byte histogram, L1-normalized.
    * A real implementation would decode pixels/samples here; only this
    * function changes, the pipeline shape stays.
    */
  def fakeDecode(content: Array[Byte]): Array[Double] = {
    val hist = new Array[Double](16)
    var i = 0
    while (i < content.length) {
      hist((content(i) & 0xff) >> 4) += 1.0
      i += 1
    }
    val total = content.length.toDouble.max(1.0)
    var j = 0
    while (j < 16) { hist(j) /= total; j += 1 }
    hist
  }

  /** Per-partition batched decode: iterator→iterator keeps constant
    * memory per task (a real decoder would additionally batch rows into
    * codec-sized chunks — same contract).
    */
  def decodeFeatures(media: DataFrame): Dataset[FeatureRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, content) =>
          FeatureRow(id, content.length.toLong, fakeDecode(content))
        }
      }
  }

  /** Frame sampling: slice the payload into fixed-size frames and keep
    * every Nth — the video-frame-sampling access pattern, expressed with
    * codegen'd binary substring + posexplode (no UDF).
    */
  def frameSample(media: DataFrame, frameBytes: Int, everyN: Int): DataFrame =
    media
      .select(col("doc_id"), col("content"), length(col("content")).as("len"))
      .select(
        col("doc_id"),
        posexplode(expr(
          s"""transform(
             |  filter(sequence(0, CAST(ceil(len / ${frameBytes}.0) AS INT) - 1),
             |         f -> f % $everyN = 0),
             |  f -> substring(content, f * $frameBytes + 1, $frameBytes))""".stripMargin)))
      .withColumnRenamed("pos", "frame_idx")
      .withColumnRenamed("col", "frame")

  /** Registered query: decode features for every document and aggregate
    * per bucket of payload size — exercises the full binary pipeline on
    * real testdata. Rows-only check (the stub decoder has no SQL oracle).
    */
  def multimodalFeatures(spark: SparkSession, dir: String): DataFrame = {
    val feats = decodeFeatures(mediaTable(Tables.documents(spark, dir)))
    feats
      .toDF()
      .select(
        col("doc_id"),
        col("n_bytes"),
        expr("aggregate(features, 0D, (a, x) -> a + x * x)").as("feature_norm_sq"),
        expr("features[0]").as("f0"))
      .orderBy(col("doc_id"))
  }

  val defs: Map[String, QueryDef] = Map(
    "multimodal_features" -> QueryDef(multimodalFeatures, None))
}
