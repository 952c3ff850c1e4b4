package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet-native Bloom filters — the row-group data-skipping tier for
  * POINT lookups on high-cardinality columns, where min/max statistics
  * are useless (every row group of a random-valued column spans nearly
  * the full domain, so range pruning keeps everything) and dictionary
  * filtering falls over (high-cardinality pages abandon dictionary
  * encoding). A per-row-group Bloom filter in the file footer lets the
  * reader prove "this key is not here" and skip the group without
  * touching its data pages.
  *
  * This sits UNDER [[StatsManifest]] in the skipping stack:
  * manifest prunes files (driver-side, one sidecar read) → parquet
  * min/max + Bloom prune row groups → page indexes prune pages. All
  * three engage from a plain declarative `filter(col === x)` — the
  * query never changes, only the layout does.
  *
  * Why it matters at 100 TB: an id-lookup ("fetch this document by
  * content hash") over a hash-keyed corpus otherwise degenerates to a
  * full scan of every row group the manifest keeps. The write-side cost
  * is one footer-resident bitset per row group (sized from expected NDV);
  * the read-side win is measured in ParquetBloomSpec: the same equality
  * query reads ~0 rows from Bloom-indexed files vs every row of the
  * matching row groups without.
  *
  * Everything here is standard public Parquet (parquet-mr split-block
  * Bloom filters, PARQUET-41) driven through Spark's per-column write
  * options — no private APIs.
  */
object ParquetBloom {

  /** Write `df` with a split-block Bloom filter on `column`, with small
    * row groups so a single output file exercises multi-group skipping.
    * `ndv` sizes the filter (expected distinct values per row group is
    * approximated by total NDV — conservative: larger ndv → lower FPP).
    */
  def writeWithBloom(
      df: DataFrame,
      dir: String,
      column: String,
      ndv: Long,
      blockSize: Int = 256 * 1024): Unit =
    df.write
      .mode("overwrite")
      .option(s"parquet.bloom.filter.enabled#$column", "true")
      .option(s"parquet.bloom.filter.expected.ndv#$column", ndv.toString)
      .option("parquet.block.size", blockSize.toString)
      .parquet(dir)

  /** Same layout WITHOUT the Bloom filter — the control arm. */
  def writeControl(df: DataFrame, dir: String, blockSize: Int = 256 * 1024): Unit =
    df.write
      .mode("overwrite")
      .option("parquet.block.size", blockSize.toString)
      .parquet(dir)

  /** Rows the scan actually READ (task input metrics) while running
    * `body` — the row-group-skipping measurement: a Bloom-pruned point
    * miss reads ~0 rows; an unpruned one reads every row of every kept
    * row group (Spark's Filter then drops them, but the I/O happened).
    * Polls the listener bus to a quiescent count — metrics arrive async.
    */
  def recordsRead(spark: SparkSession)(body: => Unit): Long = {
    val n = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null) n.addAndGet(e.taskMetrics.inputMetrics.recordsRead)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      body
      var last = -1L
      var stable = 0
      while (stable < 3) { // three unchanged polls = bus drained
        Thread.sleep(200)
        val cur = n.get()
        if (cur == last) stable += 1 else { stable = 0; last = cur }
      }
      n.get()
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
