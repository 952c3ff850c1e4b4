package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incrementally maintained table signature — the streaming twin of
  * `operators.Quality.tableChecksum`. Because the signature is a sum of
  * per-row hashes mod 2^61 plus a row count, and an ingest stream is
  * append-only, each micro-batch's contribution is ADDITIVE: the running
  * signature after batch N is bit-identical to the batch checksum
  * recomputed over every row seen so far, without ever rereading them.
  * That turns continuous replica verification from a nightly full-table
  * scan into O(batch) work per micro-batch — at 100 TB the difference
  * between "audit once a week" and "audit always".
  *
  * Durability: the sidecar carries (lastBatchId, n_rows, checksum) and is
  * committed by write-temp + atomic rename; replayed micro-batches (the
  * at-least-once path of foreachBatch) are skipped by the batchId guard,
  * so the signature never double-counts — same protocol as the
  * incremental views in [[EventStreams]].
  */
object ChecksumStream {

  private val Mod = BigInt("2305843009213693952") // 2^61

  final case class Sig(lastBatch: Long, nRows: Long, checksum: BigInt)

  private def sigPath(path: String): java.nio.file.Path =
    java.nio.file.Paths.get(path)

  def readSig(path: String): Sig = {
    val p = sigPath(path)
    if (!java.nio.file.Files.exists(p)) Sig(-1L, 0L, BigInt(0))
    else {
      val Array(b, n, c) =
        new String(java.nio.file.Files.readAllBytes(p)).trim.split('\t')
      Sig(b.toLong, n.toLong, BigInt(c))
    }
  }

  private def writeSig(path: String, s: Sig): Unit = {
    val p   = sigPath(path)
    val tmp = java.nio.file.Paths.get(p.toString + ".tmp")
    java.nio.file.Files.write(
      tmp, s"${s.lastBatch}\t${s.nRows}\t${s.checksum}".getBytes)
    java.nio.file.Files.move(
      tmp, p,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  /** The portable row hash (md5-h60 of a canonical serialization) as a
    * decimal column — identical to Quality.tableChecksum's per-row term.
    */
  def rowHash(ser: Column): Column = graft.Det.md5h60Col(ser)

  /** Merge one micro-batch into the running signature. Factored out of
    * foreachBatch so specs can drive it directly (and inject replays).
    */
  private[graft] def mergeBatch(
      batch: DataFrame, ser: Column, path: String, batchId: Long): Unit = {
    val prev = readSig(path)
    if (batchId <= prev.lastBatch) () // replayed micro-batch: already added
    else {
      val row = batch
        .select(rowHash(ser).as("h"))
        .agg(count(lit(1)).as("n"), sum(col("h")).as("hs"))
        .first()
      val dn = row.getLong(0)
      val ds =
        if (row.isNullAt(1)) BigInt(0)
        else BigInt(row.getDecimal(1).toBigInteger)
      writeSig(
        path,
        Sig(batchId, prev.nRows + dn, (prev.checksum + ds).mod(Mod)))
    }
  }

  /** Streaming entry: maintain the signature of everything ingested. */
  def maintained(
      events: DataFrame, ser: Column, path: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream
      .outputMode("append")
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         batchId: Long) => mergeBatch(batch.toDF(), ser, path, batchId)
      }

  /** Batch recompute of the same signature over a static frame — the
    * verification side of the equality the spec asserts.
    */
  def batchSig(df: DataFrame, ser: Column): (Long, BigInt) = {
    val row = df
      .select(rowHash(ser).as("h"))
      .agg(count(lit(1)).as("n"), sum(col("h")).as("hs"))
      .first()
    val n = row.getLong(0)
    val s =
      if (row.isNullAt(1)) BigInt(0) else BigInt(row.getDecimal(1).toBigInteger)
    (n, s.mod(Mod))
  }
}
