package graft.sources

import graft.QueryDef
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Hive-style bucketed tables — the co-located-join layout for facts
  * that are repeatedly joined on the same key at 100 TB. Both sides are
  * written with `bucketBy(n, key)` + `sortBy(key)`; a subsequent
  * equi-join on that key is planned as a SortMergeJoin with ZERO
  * exchanges and zero sorts (bucket count and key line up, so
  * EnsureRequirements inserts nothing) — the shuffle is paid once at
  * write time, then every downstream join/aggregation on the key is
  * exchange-free. BucketingSpec asserts the no-Exchange plan and the
  * result parity against the plain shuffled join.
  *
  * This is the table-layout analog of Ingest.writePartitioned (which
  * targets partition-PRUNED scans; bucketing targets partition-ALIGNED
  * joins). Both compose: partitionBy(date) + bucketBy(key) is the
  * standard 100 TB fact layout.
  */
object Bucketing {

  /** Write `df` as a managed bucketed table (bucket count must match on
    * every table that wants exchange-free joins against it).
    */
  def writeBucketed(
      df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Bucket count for the stored probe indexes (substring postings,
    * minhash base index, CDC chunk store). 32 matches the session's
    * shuffle partitioning at test scale; a 100 TB deployment raises it
    * to O(corpus/target-partition-size) once at index build — probes
    * adapt automatically (the delta side is exchanged to the index's
    * bucket count, never the reverse).
    */
  val IndexBuckets = 32

  // PER-TABLE monitors, not one global lock: a corpus-sized bucketed
  // write must not block an unrelated layout's already-built fast-path
  // registration (the same rule DerivedCache documents for its key
  // locks). Spark's catalog is itself thread-safe; the lock only makes
  // each table's exists-check/CREATE (and DROP/write) pair atomic.
  private val tableLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def lockFor(table: String): Object =
    tableLocks.computeIfAbsent(table, _ => new Object)

  /** Deterministic catalog name for an external bucketed table at
    * `path`. The path already carries the DerivedCache content key, so
    * the name is unique per corpus stamp + layout version and never
    * stale: a rebuilt layout lands at a NEW path → a new table name.
    */
  private[graft] def tableNameFor(path: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    "graft_idx_" + md.digest(path.getBytes("UTF-8"))
      .take(12).map("%02x".format(_)).mkString
  }

  /** Write `df` as an external BUCKETED table at `path` — the layout
    * that makes every later equi-join on `keys` exchange-free on this
    * side. bucketBy requires saveAsTable (catalog metadata carries the
    * bucket spec), so the table registers in the session catalog AND
    * the files land at `path`; the repartition puts one file per
    * bucket. The in-memory catalog dies with the session — later
    * sessions re-attach via [[readBucketed]].
    *
    * `aligned = true` skips the repartition: for a frame that is ALREADY
    * hash-clustered on `keys` at `buckets` partitions (e.g. the output
    * of an exchange-free join of two same-bucketed scans, or an
    * aggregation keyed on `keys` when shuffle partitions == buckets),
    * the user repartition is a redundant table-sized shuffle Spark will
    * not elide — compaction of a bucketed index must not pay it.
    * Alignment is a FILE-COUNT optimization, never a correctness
    * gamble: the bucketed writer derives each row's bucket id from its
    * key hash per row (sorting within tasks by bucket id), so a
    * misaligned caller only produces more files per bucket, and
    * bucketed reads group files by bucket id regardless.
    */
  def writeBucketedExternal(
      df: DataFrame, path: String, keys: Seq[String],
      buckets: Int = IndexBuckets, aligned: Boolean = false): Unit = {
    import org.apache.spark.sql.functions.col
    val spark = df.sparkSession
    val tbl = tableNameFor(path)
    lockFor(tbl).synchronized {
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      (if (aligned) df else df.repartition(buckets, keys.map(col): _*))
        .write.mode(SaveMode.Overwrite)
        .option("path", path)
        .bucketBy(buckets, keys.head, keys.tail: _*)
        .sortBy(keys.head, keys.tail: _*)
        .format("parquet")
        .saveAsTable(tbl)
    }
  }

  /** Read an external bucketed table written by [[writeBucketedExternal]],
    * (re-)registering it in THIS session's catalog when absent (the
    * in-memory catalog does not survive the JVM; the bucketed files
    * do — Spark recovers each row's bucket from the writer's file
    * naming). `schema` is explicit DDL: the layout is ours, and a
    * schema-less read would fire a footer-inference job per plan
    * construction.
    */
  def readBucketed(
      spark: SparkSession, path: String, keys: Seq[String], schema: String,
      buckets: Int = IndexBuckets): DataFrame = {
    val tbl = tableNameFor(path)
    lockFor(tbl).synchronized {
      if (!spark.catalog.tableExists(tbl)) {
        val ks = keys.mkString(", ")
        // single quotes in the path double-escape per the SQL string
        // literal rule — an unescaped quote (user-named tmpdirs on
        // macOS etc.) would break the statement while tableNameFor
        // already committed to this exact path string
        val loc = path.replace("'", "''")
        spark.sql(
          s"CREATE TABLE $tbl ($schema) USING parquet " +
            s"CLUSTERED BY ($ks) SORTED BY ($ks) INTO $buckets BUCKETS " +
            s"LOCATION '$loc'")
      }
    }
    spark.table(tbl)
  }

  /** Equi-join two same-bucket-count tables on their bucket keys.
    * With both sides bucketed this plans with no Exchange on either
    * side; the caller can `.explain` or assert on the executed plan.
    */
  def bucketedJoin(
      spark: SparkSession,
      leftTable: String, rightTable: String,
      leftKey: String, rightKey: String): DataFrame =
    spark.table(leftTable)
      .join(spark.table(rightTable),
        spark.table(leftTable)(leftKey) === spark.table(rightTable)(rightKey))

  /** Z-ordered (Morton) layout: sort the table along a space-filling
    * curve over two key expressions and write `files` range-partitioned
    * parquet files. Each file then covers a compact 2-D TILE of the key
    * space, so file/row-group min-max statistics prune on EITHER
    * dimension — a lexicographic (x, y) sort prunes only on x, and a
    * query filtering on y alone must read every file. At 100 TB this is
    * the difference between a time-range query over a user-sorted
    * events table scanning everything vs ~√files of it.
    * ZOrderSpec measures the per-file ranges of both layouts.
    */
  def writeZOrdered(
      df: DataFrame, path: String,
      xExpr: String, yExpr: String, files: Int): Unit = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.withColumn("__z",
        org.apache.spark.sql.functions.expr(s"graft_morton(CAST(($xExpr) AS BIGINT), CAST(($yExpr) AS BIGINT))"))
      .repartitionByRange(files, org.apache.spark.sql.functions.col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Z-order TILE statistics over (user, day) — the registered-query
    * surface of the Morton kernel: every distinct (user_id, day) pair's
    * 62-bit Z-code, bucketed into curve tiles (code div 2^12 — sized so the
    * testdata's ~60-day × user key box spans many tiles), with
    * per-tile counts and key ranges. The oracle recomputes the bit
    * interleave arithmetically (Σ ((x>>i)&1)<<2i | ((y>>i)&1)<<(2i+1) —
    * exact BIGINT shifts, not float powers), so the codegen'd spread
    * tables are hash-checked bit for bit. The tile histogram is what a
    * layout optimizer consults to pick file split points.
    */
  def zorderTileStats(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(spark)
    graft.Tables.events(spark, dir)
      // a Z-code needs both coordinates: NULL-user rows have no place
      // on the curve (a real writer reserves them a side partition) and
      // would diverge in NULL sort order (null_sweep hazard)
      .filter(col("user_id").isNotNull)
      .select(
        col("user_id"),
        expr("ts div 86400000000").as("day"))
      .distinct()
      .select(
        col("user_id"), col("day"),
        expr("graft_morton(user_id, day)").as("z"))
      .groupBy(expr("z div 4096").as("tile")) // INTEGER division: a double `/` loses bits past 2^53 on 62-bit codes
      .agg(
        count(lit(1)).as("n_pairs"),
        min(col("user_id")).as("min_user"),
        max(col("user_id")).as("max_user"),
        min(col("day")).as("min_day"),
        max(col("day")).as("max_day"))
      .orderBy(col("tile"))
  }

  private[sources] val zorderTileStatsSql =
    """WITH pairs AS (
      |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events
      |  WHERE user_id IS NOT NULL
      |), z AS (
      |  SELECT user_id, day,
      |         (SELECT SUM(((user_id >> i.i) & 1) << (2 * i.i))
      |                 + SUM(((day >> i.i) & 1) << (2 * i.i + 1))
      |          FROM (SELECT unnest(generate_series(0, 30)) AS i) i) AS z
      |  FROM pairs
      |)
      |SELECT CAST(z // 4096 AS BIGINT) AS tile,
      |       count(*) AS n_pairs,
      |       min(user_id) AS min_user, max(user_id) AS max_user,
      |       min(day) AS min_day, max(day) AS max_day
      |FROM z
      |GROUP BY 1
      |ORDER BY tile""".stripMargin

  private def rmTree(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(rmTree); f.delete(); ()
  }

  /** Heal any state a crashed [[compact]] left behind — the recovery
    * half of the commit protocol (see compact's docstring). Plain
    * filesystems have no two-directory atomic swap, so the protocol
    * makes every intermediate state DETERMINISTICALLY recoverable
    * instead: the rewrite's `_SUCCESS` marker is the commit record
    * (the same role the manifest file plays in
    * EventStreams.mergeManifestBatch), and this function rolls each
    * possible crash state forward (marker present → finish the swap)
    * or back (marker absent → restore the original). Idempotent;
    * called automatically at the start of every compact(), and safe
    * for an operator/reader to call any time.
    */
  def recoverCompact(path: String): Unit = {
    val base = path.stripSuffix("/")
    val dir  = new java.io.File(base)
    val next = new java.io.File(base + "._next")
    val old  = new java.io.File(base + "._old")
    val committed = new java.io.File(next, "_SUCCESS").exists()
    if (dir.exists()) {
      // crash before the swap started (next half-written or complete
      // but unswapped — a retry rewrites it), or after the swap-in but
      // before the old dir was pruned; the table itself is intact
      if (next.exists()) rmTree(next)
      if (old.exists()) rmTree(old)
    } else if (old.exists()) {
      // crash mid-swap: the table was moved aside. The marker decides:
      // a COMPLETE rewrite rolls forward (finish the swap), anything
      // else rolls back to the original
      if (committed && next.renameTo(dir)) rmTree(old)
      else {
        require(old.renameTo(dir), s"recoverCompact: could not restore $path")
        if (next.exists()) rmTree(next)
      }
    }
  }

  /** Small-file compaction: rewrite a parquet directory into
    * ⌈bytes/target⌉ files. Streaming sinks and incremental upserts
    * accrete files far smaller than a scan-efficient size; compaction
    * restores (file count ∝ data size) so scans stop paying per-file
    * open/footer costs — at 100 TB an uncompacted events table can hit
    * millions of files and spend longer listing than reading.
    *
    * Commit protocol (crash-safe at every step, CompactCrashSpec
    * injects a crash at the widest window):
    *   1. rewrite to `<path>._next` (the `_SUCCESS` marker = the
    *      commit record);
    *   2. rename `<path>` → `<path>._old`;
    *   3. rename `<path>._next` → `<path>`;
    *   4. prune `<path>._old`.
    * A crash anywhere leaves a state [[recoverCompact]] (run on the
    * next compact(), or by any operator/reader) resolves without data
    * loss: before step 2 the table is untouched; between 2 and 3 the
    * marker rolls the swap forward; after 3 the old dir is garbage.
    * Callers needing concurrent readers DURING compaction should route
    * reads through a pointer (the streaming view's versioned commit
    * pattern); for exclusive maintenance windows this protocol is the
    * whole story.
    *
    * @return (filesBefore, filesAfter)
    */
  def compact(
      spark: SparkSession, path: String, targetBytes: Long,
      crashHook: () => Unit = () => ()): (Int, Int) = {
    def parquetFiles(p: java.io.File): Seq[java.io.File] =
      Option(p.listFiles()).getOrElse(Array.empty).toSeq.flatMap { f =>
        if (f.isDirectory) parquetFiles(f)
        else if (f.getName.endsWith(".parquet")) Seq(f)
        else Nil
      }
    recoverCompact(path)
    val base   = path.stripSuffix("/")
    val dir    = new java.io.File(base)
    val before = parquetFiles(dir)
    val total  = before.map(_.length()).sum
    val nOut   = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
    val next   = new java.io.File(base + "._next")
    spark.read.parquet(path)
      .repartition(nOut)
      .write.mode(SaveMode.Overwrite).parquet(next.getPath)
    val old = new java.io.File(base + "._old")
    require(dir.renameTo(old), s"could not move $path aside")
    crashHook() // spec-injected crash: the widest torn window (no table dir)
    if (!next.renameTo(dir)) {
      // roll back: the original table comes back before we report failure
      old.renameTo(dir)
      rmTree(next)
      throw new IllegalStateException(s"could not swap $next into $path; original restored")
    }
    rmTree(old)
    (before.length, parquetFiles(dir).length)
  }

  val defs: Map[String, QueryDef] = Map(
    "zorder_tile_stats" -> QueryDef(zorderTileStats, Some(zorderTileStatsSql)))
}
