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

  /** Media manifest: per-origin blob accounting over the binary column —
    * counts, total/avg payload bytes, distinct payloads (two-stage on
    * md5 of the binary — never shuffles payloads), and the frame count a
    * 64-byte frame slicer would produce. Unlike the stub decoder these
    * are all REAL byte-level operations, and because the fixture payload
    * is the UTF-8 text, every measure has an exact SQL twin over the
    * text column — so the binary pipeline is oracle-checked end to end.
    */
  def mediaManifest(spark: SparkSession, dir: String): DataFrame = {
    val media = mediaTable(Tables.documents(spark, dir))
    val perPayload = media
      .select(
        col("meta.origin").as("origin"),
        length(col("content")).cast("long").as("n_bytes"),
        md5(col("content")).as("payload_md5"),
        ceil(length(col("content")) / lit(64.0)).cast("long").as("n_frames"))
    perPayload
      .groupBy(col("origin"), col("payload_md5"))
      .agg(
        count(lit(1)).as("n_copies"),
        sum(col("n_bytes")).as("bytes_sum"),
        sum(col("n_frames")).as("frames_sum"))
      .groupBy(col("origin"))
      .agg(
        sum(col("n_copies")).as("n_blobs"),
        count(lit(1)).as("n_distinct_payloads"),
        sum(col("bytes_sum")).as("total_bytes"),
        sum(col("frames_sum")).as("total_frames_64b"))
      .select(
        col("origin"), col("n_blobs"), col("n_distinct_payloads"),
        col("total_bytes"),
        graft.Det.detRound(col("total_bytes").cast("double") / col("n_blobs"), 4)
          .as("avg_bytes"),
        col("total_frames_64b"))
      .orderBy(col("origin"))
  }

  private val mediaManifestSql =
    s"""WITH per AS (
       |  SELECT source AS origin, md5(text) AS payload_md5,
       |         CAST(strlen(text) AS BIGINT) AS n_bytes,
       |         CAST(ceil(strlen(text) / 64.0) AS BIGINT) AS n_frames
       |  FROM documents
       |), grouped AS (
       |  SELECT origin, payload_md5, count(*) AS n_copies,
       |         SUM(n_bytes) AS bytes_sum, SUM(n_frames) AS frames_sum
       |  FROM per GROUP BY origin, payload_md5
       |)
       |SELECT origin,
       |       CAST(SUM(n_copies) AS BIGINT) AS n_blobs,
       |       count(*) AS n_distinct_payloads,
       |       CAST(SUM(bytes_sum) AS BIGINT) AS total_bytes,
       |       ${graft.Det.roundSql("CAST(SUM(bytes_sum) AS DOUBLE) / SUM(n_copies)", 4)} AS avg_bytes,
       |       CAST(SUM(frames_sum) AS BIGINT) AS total_frames_64b
       |FROM grouped
       |GROUP BY origin
       |ORDER BY origin""".stripMargin

  val defs: Map[String, QueryDef] = Map(
    "multimodal_features" -> QueryDef(multimodalFeatures, None),
    "media_manifest"      -> QueryDef(mediaManifest, Some(mediaManifestSql)))
}
