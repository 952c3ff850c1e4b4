package graft.sources

import graft.{Det, QueryDef}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** File-skipping statistics manifest — the data-skipping tier ABOVE
  * Spark's parquet row-group pruning. At write time we harvest each
  * file's per-column min/max from its parquet FOOTER (no data pages are
  * read) into a sidecar manifest; at read time a range predicate is
  * evaluated against the manifest and only intersecting files are handed
  * to Spark at all. Row-group pruning then still applies inside the kept
  * files — the two tiers compose.
  *
  * Why it matters at 100 TB: Spark's min/max pruning runs per row-group
  * AFTER listing and footer-reading every file in the table; a manifest
  * turns "open a million footers per query" into one small sidecar read
  * on the driver, which is precisely what Delta/Iceberg file statistics
  * do. Combined with the Z-order layout ([[Bucketing.writeZOrdered]] —
  * each file covers a compact 2-D tile) a single-dimension range query
  * skips all but ~√F of F files; on a lexicographic layout the same
  * predicate on the secondary key keeps every file.
  * StatsManifestSpec measures exactly that skip-count difference.
  *
  * Scope: numeric columns (parquet INT32/INT64/FLOAT/DOUBLE). Values are
  * carried as BigDecimal strings so INT64 keys beyond 2^53 (e.g. Z-codes,
  * composite rowkeys — SURVEY §2's S5) compare exactly; string columns
  * would add only an encoding, not a new mechanism.
  *
  * The footer harvest runs as a Spark job over the file list (one task
  * per ~64 files), not a driver loop — a million-file table's manifest
  * build is itself distributed.
  */
/** Build-once cache for DERIVED layouts under the system tmpdir — the
  * shared idiom behind [[StatsManifest.manifestRangeScan]]'s day layout
  * and graft.operators.Dedup's stored base index. The cache key carries
  * a caller-supplied content FINGERPRINT (row counts, parameter
  * constants) in addition to the source path, so regenerated testdata
  * or changed sketch parameters rebuild instead of silently reusing a
  * stale artifact; completion is marked by an explicit done-file
  * written only after `build` returns.
  */
/** Record of DerivedCache builds that actually RAN (cache misses) in
  * this JVM — the instrumentation behind graft.Bench's builds line. A
  * one-time stored-layout build landing inside a timed query reads as
  * that query being slow (round 12: dedup_containment_minhash at 19.96 s
  * driver vs 1.06 s warm was the first-touch corpus-sketch build);
  * itemizing builds by layout name makes the driver artifact separate
  * build bill from serve cost. Thread-safe; drain() empties the log.
  */
object BuildLog {
  final case class Item(name: String, sec: Double)
  private val q = new java.util.concurrent.ConcurrentLinkedQueue[Item]()
  private[graft] def record(name: String, sec: Double): Unit = {
    q.add(Item(name, sec)); ()
  }
  def drain(): Seq[Item] = {
    val out = Seq.newBuilder[Item]
    var it = q.poll()
    while (it != null) { out += it; it = q.poll() }
    out.result()
  }
}

object DerivedCache {
  /** File-metadata stamp of a source path (recursive size+mtime sum —
    * no data scan): appended to every cache key so REGENERATED source
    * data invalidates stored artifacts even when caller-level
    * fingerprints (e.g. row counts) happen to collide. A row-count
    * fingerprint alone cannot see a same-cardinality regeneration,
    * and a stale stored index would silently diverge from an oracle
    * that reads the fresh data.
    */
  private[graft] def sourceStamp(path: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isFile) f.length * 31 + f.lastModified
      else Option(f.listFiles()).getOrElse(Array.empty).map(walk).sum
    walk(new java.io.File(path))
  }

  /** 128-bit key: a 32-bit String.hashCode over long fingerprint strings
    * WILL collide across a long-lived tmpdir (birthday bound ~77k keys);
    * a collision here silently serves another layout's data.
    */
  private def digest(s: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(s.getBytes("UTF-8")).take(16).map("%02x".format(_)).mkString
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(); ()
  }

  def dir(srcDir: String, name: String, fingerprint: String)(
      build: String => Unit): String = {
    val fp   = s"$fingerprint;src=${sourceStamp(srcDir)}"
    val key  = digest(srcDir + "|" + fp)
    val base = sys.props("java.io.tmpdir").stripSuffix("/")
    val out  = s"$base/graft-$name-$key"
    val done = new java.io.File(out, "_GRAFT_DONE")
    // reuse is valid only if the done-file's recorded fingerprint matches
    // EXACTLY — guards torn builds (done written, content stale) and the
    // residual digest-collision case the key alone can't rule out. Any
    // IO error (file vanished between exists and read — cross-process
    // rebuild window, eviction race) degrades to "invalid, rebuild
    // under lock" instead of throwing out of dir().
    def valid(): Boolean =
      try {
        done.exists() && new String(
          java.nio.file.Files.readAllBytes(done.toPath), "UTF-8") == fp
      } catch { case _: java.io.IOException => false }
    // PER-KEY monitor, not a JVM-global one: while one thread blocks on
    // another PROCESS's file lock for a slow build, requests for other
    // (already-built) layouts must keep their fast path
    val mon = keyLocks.computeIfAbsent(out, _ => new Object)
    mon.synchronized {
      if (!valid()) {
        // cross-PROCESS exclusion: sbt test and a bench JVM can race the
        // same derived layout; serialize builders on a tmpdir lock file
        // (the per-key monitor above only covers in-process races)
        val lockPath = java.nio.file.Paths.get(s"$out.lock")
        val ch = java.nio.channels.FileChannel.open(
          lockPath,
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.WRITE)
        try {
          val lock = ch.lock()
          try {
            if (!valid()) { // losing racer: winner built it while we waited
              deleteRecursively(new java.io.File(out))
              val t0 = System.nanoTime()
              build(out)
              BuildLog.record(name, (System.nanoTime() - t0) / 1e9)
              java.nio.file.Files.createDirectories(done.toPath.getParent)
              java.nio.file.Files.write(done.toPath, fp.getBytes("UTF-8"))
              ()
            }
          } finally lock.release()
        } finally ch.close()
      }
      // LRU stamp: the done-file's mtime records last USE, not last
      // build — prune() below orders eviction candidates by it
      done.setLastModified(System.currentTimeMillis())
      ()
    }
    prune(base, out)
    out
  }

  /** Size-capped LRU eviction over the whole derived-cache tmpdir: a
    * long-lived machine otherwise accumulates one stored layout per
    * (rows, params) permutation across every testdata regeneration.
    * Policy: scan `graft-*-<key>` dirs carrying a done-file, and while
    * the total exceeds the cap delete the least-recently-USED first —
    * skipping `keep` (the layout the caller is about to read), anything
    * used within the min-age window (a concurrent reader has, by
    * definition, just stamped it), and anything whose build lock is
    * currently held. Best-effort by design: eviction failure must never
    * fail the query that triggered it.
    */
  private[graft] def prune(base: String, keep: String): Unit =
    try {
      val capBytes =
        sys.props.get("graft.derivedCache.capBytes").map(_.toLong)
          .getOrElse(4L * 1024 * 1024 * 1024)
      val minAgeMs =
        sys.props.get("graft.derivedCache.minAgeMs").map(_.toLong)
          .getOrElse(10L * 60 * 1000)
      val keyDir = "^graft-.+-[0-9a-f]{32}$".r
      def sizeOf(f: java.io.File): Long =
        if (f.isFile) f.length
        else Option(f.listFiles()).getOrElse(Array.empty).map(sizeOf).sum
      val entries = Option(new java.io.File(base).listFiles())
        .getOrElse(Array.empty)
        .filter(f => f.isDirectory && keyDir.matches(f.getName))
        .flatMap { d =>
          val done = new java.io.File(d, "_GRAFT_DONE")
          if (done.exists()) Some((d, done.lastModified(), sizeOf(d))) else None
        }
      var excess = entries.map(_._3).sum - capBytes
      if (excess > 0) {
        val now = System.currentTimeMillis()
        entries
          .sortBy(_._2) // least-recently-used first
          .iterator
          .takeWhile(_ => excess > 0)
          .foreach { case (d, used, size) =>
            val lockHeld = {
              val lockPath = java.nio.file.Paths.get(s"${d.getPath}.lock")
              try {
                val ch = java.nio.channels.FileChannel.open(
                  lockPath,
                  java.nio.file.StandardOpenOption.CREATE,
                  java.nio.file.StandardOpenOption.WRITE)
                try {
                  val l = ch.tryLock()
                  if (l == null) true else { l.release(); false }
                } finally ch.close()
              } catch { case _: java.io.IOException => true }
            }
            if (d.getPath != keep && now - used >= minAgeMs && !lockHeld) {
              deleteRecursively(d)
              new java.io.File(s"${d.getPath}.lock").delete()
              excess -= size
            }
          }
      }
    } catch { case _: Exception => () }

  private val keyLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
}

object StatsManifest {

  final case class FileStats(
      path: String, rows: Long, stats: Map[String, (BigDecimal, BigDecimal)])

  /** Inclusive range predicate on one column; None = unbounded side. */
  final case class Range(col: String, lo: Option[BigDecimal], hi: Option[BigDecimal])

  final case class PruneReport(totalFiles: Int, keptFiles: Int) {
    def skipped: Int = totalFiles - keptFiles
  }

  private def manifestPath(dir: String): java.nio.file.Path =
    java.nio.file.Paths.get(dir.stripSuffix("/") + "._stats_manifest")

  private def parquetFiles(dir: String): Seq[String] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isFile) { if (f.getName.endsWith(".parquet")) Seq(f) else Nil }
      else Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
    walk(new java.io.File(dir)).map(_.getAbsolutePath).sorted
  }

  /** Harvest per-file min/max for `cols` from parquet footers and write
    * the sidecar manifest. Returns the number of files covered.
    */
  def write(spark: SparkSession, dir: String, cols: Seq[String]): Int = {
    val files = parquetFiles(dir)
    val tasks = math.max(1, math.min(files.size, 64))
    val harvested: Seq[FileStats] = spark.sparkContext
      .parallelize(files, tasks)
      .map { p =>
        val conf = new org.apache.hadoop.conf.Configuration()
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(new org.apache.hadoop.fs.Path(p), conf)
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          val blocks = reader.getFooter.getBlocks.asScala.toSeq
          val rows = blocks.map(_.getRowCount).sum
          val perCol = cols.flatMap { c =>
            val ranges = blocks.flatMap { b =>
              b.getColumns.asScala
                .find(_.getPath.toDotString == c)
                .flatMap { cc =>
                  val s = cc.getStatistics
                  if (s == null || !s.hasNonNullValue) None
                  else (s.genericGetMin, s.genericGetMax) match {
                    case (mn: Number, mx: Number) =>
                      Some((BigDecimal(mn.toString), BigDecimal(mx.toString)))
                    case _ => None // non-numeric: out of scope, stays prunable-by-Spark only
                  }
                }
            }
            // every row-group must carry stats, else the file's bound is
            // not sound for pruning — skip the column (conservative keep)
            if (ranges.size == blocks.size && ranges.nonEmpty)
              Some(c -> (ranges.map(_._1).min, ranges.map(_._2).max))
            else None
          }.toMap
          FileStats(p, rows, perCol)
        } finally reader.close()
      }
      .collect() // bounded: one small record per FILE, not per row
      .toSeq
    val body = harvested.sortBy(_.path).flatMap { fs =>
      if (fs.stats.isEmpty)
        // stats-less file: MUST still appear in the manifest (a file a
        // reader cannot see is silently dropped from every pruned scan —
        // pruning has to be conservative-keep, never lossy)
        Seq(s"${fs.path}\t${fs.rows}\t-\t-\t-")
      else
        fs.stats.toSeq.sortBy(_._1).map { case (c, (mn, mx)) =>
          s"${fs.path}\t${fs.rows}\t$c\t$mn\t$mx"
        }
    }.mkString("\n")
    val tmp = java.nio.file.Paths.get(manifestPath(dir).toString + ".tmp")
    java.nio.file.Files.write(tmp, body.getBytes)
    java.nio.file.Files.move(
      tmp, manifestPath(dir),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    harvested.size
  }

  def read(dir: String): Seq[FileStats] = {
    val p = manifestPath(dir)
    require(java.nio.file.Files.exists(p), s"no stats manifest under $dir")
    new String(java.nio.file.Files.readAllBytes(p))
      .linesIterator.filter(_.nonEmpty).toSeq
      .map { l =>
        val Array(path, rows, c, mn, mx) = l.split('\t')
        if (c == "-") (path, rows.toLong, None)
        else (path, rows.toLong, Some((c, BigDecimal(mn), BigDecimal(mx))))
      }
      .groupBy(t => (t._1, t._2))
      .map { case ((path, rows), ls) =>
        FileStats(
          path, rows,
          ls.flatMap(_._3).map { case (c, mn, mx) => c -> (mn, mx) }.toMap)
      }
      .toSeq.sortBy(_.path)
  }

  /** Files whose stats intersect every range. A file with no stats for a
    * predicate column is KEPT (pruning must be sound, never lossy).
    */
  def pruneFiles(dir: String, ranges: Seq[Range]): (Seq[String], PruneReport) = {
    val all = read(dir)
    val kept = all.filter { fs =>
      ranges.forall { r =>
        fs.stats.get(r.col) match {
          case None => true
          case Some((mn, mx)) =>
            r.lo.forall(_ <= mx) && r.hi.forall(_ >= mn)
        }
      }
    }
    (kept.map(_.path), PruneReport(all.size, kept.size))
  }

  /** Manifest-pruned scan: only intersecting files reach Spark's reader.
    * The caller still applies the exact filter — the manifest only
    * SKIPS files, it never stands in for the predicate.
    */
  def prunedRead(
      spark: SparkSession, dir: String, ranges: Seq[Range]): (DataFrame, PruneReport) = {
    val (files, report) = pruneFiles(dir, ranges)
    val df =
      if (files.isEmpty)
        // all files pruned: empty frame with the table's schema
        spark.read.parquet(dir).limit(0)
      else spark.read.option("basePath", dir).parquet(files: _*)
    (df, report)
  }

  // ----------------------------------------------- registered query path

  private val LayoutFiles = 12
  /** Report from the last manifestRangeScan build, for spec assertions. */
  @volatile private[graft] var lastReport: Option[PruneReport] = None

  /** Day-ranged copy of events for the pruned-scan carrier, built once
    * per source dir (range-partitioned by day so each file covers a
    * compact day interval — the layout a streaming date-partitioned
    * sink produces naturally at 100 TB).
    */
  private def eventsDayLayout(spark: SparkSession, dir: String): String = {
    // fingerprint = row count + layout width: regenerated testdata or a
    // re-tuned file count rebuilds instead of reusing a stale layout
    val rows = graft.Tables.cachedCount(spark, dir, "events")
    DerivedCache.dir(dir, "manifest-events-day", s"rows=$rows;files=$LayoutFiles") { out =>
      graft.Tables
        .events(spark, dir)
        .select(
          expr("ts div 86400000000").as("day"),
          col("user_id"),
          col("value"))
        .repartitionByRange(LayoutFiles, col("day"))
        .sortWithinPartitions("day")
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(out)
      write(spark, out, Seq("day"))
      ()
    }
  }

  /** Manifest-pruned range scan as a CORRECTNESS-gated query: a 10-day
    * window over the day-partitioned events copy is resolved against the
    * sidecar manifest FIRST, so non-intersecting files never reach
    * Spark's reader (the Delta/Iceberg file-stats tier); the exact
    * predicate is still applied to the kept files, so the result is
    * byte-identical to a full scan — which is exactly what the DuckDB
    * oracle computes, over the original un-laid-out table. The query
    * REFUSES to pass silently without pruning: if the manifest kept
    * every file the layout contract is broken and it throws.
    */
  def manifestRangeScan(spark: SparkSession, dir: String): DataFrame = {
    val layout   = eventsDayLayout(spark, dir)
    val manifest = read(layout)
    val dayStats = manifest.flatMap(_.stats.get("day"))
    // a NON-empty layout whose footers carry no usable day stats is a
    // manifest-integrity failure, not a query result: the window would
    // anchor at day 0 and silently diverge from the oracle's MIN(day)
    require(
      dayStats.nonEmpty || manifest.map(_.rows).sum == 0,
      s"no usable day statistics in the manifest under $layout")
    // footer-only anchoring is sound only when EVERY rows-bearing file
    // carries day stats; otherwise a stats-less file can hide the true
    // minimum and the window would diverge from the oracle's MIN(day) —
    // fall back to an exact scan for the anchor in that case
    val statless = manifest.exists(fs => fs.rows > 0 && !fs.stats.contains("day"))
    val minDay =
      if (statless)
        BigDecimal(
          spark.read.parquet(layout).agg(min(col("day"))).collect().head.getLong(0))
      else dayStats.map(_._1).reduceOption(_ min _).getOrElse(BigDecimal(0))
    val lo = minDay + 5
    val hi = minDay + 14
    val (pruned, report) = prunedRead(
      spark, layout, Seq(Range("day", Some(lo), Some(hi))))
    lastReport = Some(report)
    // contract: with a real multi-file day range the manifest MUST skip
    // something; a degenerate corpus (empty / single day / single file
    // with stats) has nothing to skip and is exempt
    val prunable = dayStats.count { case (mn, mx) => mx < lo || mn > hi }
    require(
      prunable == 0 || report.skipped > 0,
      s"manifest kept all ${report.totalFiles} files for days [$lo,$hi] — " +
        "range layout or manifest stats are broken")
    pruned
      .filter(col("day").between(lo.toLong, hi.toLong))
      .groupBy(col("day"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        Det.detRound(Det.moneySum(col("value")), 2).as("total_value"))
      .orderBy(col("day"))
  }

  private val manifestRangeScanSql =
    s"""WITH d AS (
       |  SELECT epoch_us(ts) // 86400000000 AS day, user_id, value FROM events
       |), b AS (
       |  SELECT MIN(day) + 5 AS lo, MIN(day) + 14 AS hi FROM d
       |)
       |SELECT day,
       |       count(*) AS n_events,
       |       count(DISTINCT user_id) AS n_users,
       |       ${Det.roundSql("CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)", 2)} AS total_value
       |FROM d, b
       |WHERE day BETWEEN lo AND hi
       |GROUP BY day
       |ORDER BY day""".stripMargin

  // ----------------------------------------------- compaction planning

  /** Target rows per compacted file. Files at or above the target are
    * left alone; smaller ones are packed.
    */
  private val CompactTargetRows = 25000L

  /** Small-file compaction plan over the day-grain layout (one file per
    * event day — the layout a streaming date-partitioned sink produces;
    * the same carrier manifestRangeScan prunes). The maintenance job
    * every file-statistics tier feeds at 100 TB: a streaming sink lands
    * one small file per day per table, and an uncompacted table bleeds
    * planning time (file listing, footer reads, task startup) on every
    * query. The plan is Iceberg/Delta binpack-by-sort-order:
    *   - files already >= [[CompactTargetRows]] rows: `keep` (rewriting
    *     them buys nothing, bin −1);
    *   - smaller files: `compact`, packed into consecutive-day groups by
    *     next-fit over the running row sum — bin = prefix-sum div
    *     target, the same bounded-parallel kernel as doc_pack_bins
    *     (Rank.withPrefixSum: range-bucketed, no single-partition
    *     window), so the plan computation itself scales past any
    *     calendar length.
    * Consecutive-day grouping is deliberate: compaction must preserve
    * the day-range clustering the manifest prunes on, so only adjacent
    * days may merge. Output: one row per file with its action and
    * target bin.
    */
  def compactionPlan(spark: SparkSession, dir: String): DataFrame = {
    val files = graft.Tables
      .events(spark, dir)
      .select(expr("ts div 86400000000").as("day"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_rows"))
    val keeps = files
      .filter(col("n_rows") >= CompactTargetRows)
      .select(
        col("day"), col("n_rows"),
        lit("keep").as("action"), lit(-1L).as("bin"))
    val packed = graft.operators.Rank
      .withPrefixSum(
        files.filter(col("n_rows") < CompactTargetRows), "day", "n_rows")
      .select(
        col("day"), col("n_rows"),
        lit("compact").as("action"),
        floor((col("cum") - col("n_rows")) / CompactTargetRows)
          .cast("long").as("bin"))
    keeps.unionAll(packed).orderBy(col("day"))
  }

  private val compactionPlanSql =
    s"""WITH f AS (
       |  SELECT epoch_us(ts) // 86400000000 AS day, count(*) AS n_rows
       |  FROM events GROUP BY 1
       |), s AS (
       |  SELECT day, n_rows,
       |         SUM(n_rows) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM f WHERE n_rows < $CompactTargetRows
       |)
       |SELECT day, n_rows, 'keep' AS action, CAST(-1 AS BIGINT) AS bin
       |FROM f WHERE n_rows >= $CompactTargetRows
       |UNION ALL
       |SELECT day, n_rows, 'compact', CAST((cum - n_rows) // $CompactTargetRows AS BIGINT)
       |FROM s
       |ORDER BY day""".stripMargin

  val defs: Map[String, QueryDef] = Map(
    "compaction_plan"     -> QueryDef(compactionPlan, Some(compactionPlanSql)),
    "manifest_range_scan" -> QueryDef(manifestRangeScan, Some(manifestRangeScanSql)))
}
