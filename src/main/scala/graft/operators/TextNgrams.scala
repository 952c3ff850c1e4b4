package graft.operators

import graft.{Det, QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** N-gram and corpus-statistics operators over `documents` (round 2 of
  * the training-data-pipeline tier): bigram frequency, TF-IDF term
  * extraction, composite quality filtering, and per-language length
  * percentiles.
  *
  * Scale notes:
  *  - bigrams are generated IN-ROW (transform over the token array —
  *    codegen'd, no explode of unigrams first): one shuffle of
  *    (w1, w2) partial counts, nothing else.
  *  - TF-IDF joins the doc-term frame to the vocabulary frame on term;
  *    the vocabulary side is output of a groupBy on the same key, so the
  *    join reuses its partitioning. At 100 TB with a bounded vocabulary,
  *    broadcast the DF side instead (one-line change, noted inline).
  *  - top-terms-per-doc goes through the custom TopKPerKey operator
  *    (bounded heaps) — no per-doc window sort.
  */
object TextNgrams {

  /** Corpus-wide top-40 word bigrams. Tokens are lowercase alnum runs;
    * pairs are built by a single in-row transform over the token array.
    */
  def bigramTopK(spark: SparkSession, dir: String): DataFrame = {
    // scan-fan (guide §2.5): tokenization + bigram expansion above the scan
    Tables
      .documentsFanned(spark, dir)
      .select(
        expr("filter(split(lower(text), '[^a-z0-9]+'), x -> x <> '')").as("t"))
      .filter(size(col("t")) >= 2)
      .select(explode(
        expr("transform(sequence(0, size(t) - 2), i -> struct(t[i] AS w1, t[i+1] AS w2))"))
        .as("bg"))
      .groupBy(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("w1"), asc("w2"))
      .limit(40)
  }

  private val bigramTopKSql =
    """WITH toks AS (
      |  SELECT list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t
      |  FROM documents
      |), pairs AS (
      |  SELECT t[i] AS w1, t[i+1] AS w2
      |  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i)
      |  WHERE len(t) >= 2
      |)
      |SELECT w1, w2, count(*) AS cnt
      |FROM pairs
      |GROUP BY w1, w2
      |ORDER BY cnt DESC, w1, w2
      |LIMIT 40""".stripMargin

  /** Top-50 adjacent character pairs inside words — the counting
    * primitive of one BPE tokenizer-training merge step (count all
    * symbol pairs, merge the most frequent; Sennrich et al. 2016,
    * public algorithm). Pair expansion is IN-ROW (transform over each
    * word's index range) and collapses to per-partition (pair, count)
    * partials before any shuffle, so shuffle volume is bounded by
    * |charset|² per partition regardless of corpus size — the same
    * map-side-combine shape as bigram_topk, one level down the
    * tokenization stack.
    */
  def bpePairCounts(spark: SparkSession, dir: String): DataFrame = {
    Tables
      .documents(spark, dir)
      .select(
        expr("filter(split(lower(text), '[^a-z0-9]+'), x -> length(x) >= 2)").as("ws"))
      .select(explode(expr(
        // NB: sequence() guard — Spark's sequence(1, 0) is DESCENDING,
        // not empty, so 1-char words must be filtered before expansion
        "flatten(transform(ws, w -> transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))))"))
        .as("pair"))
      .groupBy(col("pair"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("pair"))
      .limit(50)
  }

  private val bpePairCountsSql =
    """WITH ws AS (
      |  SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
      |                            x -> length(x) >= 2)) AS w
      |  FROM documents
      |), pairs AS (
      |  SELECT substr(w, i, 2) AS pair
      |  FROM ws, LATERAL (SELECT unnest(generate_series(1, length(w) - 1)) AS i)
      |)
      |SELECT pair, count(*) AS cnt
      |FROM pairs
      |GROUP BY pair
      |ORDER BY cnt DESC, pair
      |LIMIT 50""".stripMargin

  private val BpeMerges = 8

  /** BPE merge training (Sennrich et al. 2016, the public algorithm):
    * [[BpeMerges]] greedy rounds of count-all-adjacent-symbol-pairs →
    * merge the most frequent, run on the DISTINCT word-frequency table
    * — the classic optimization that makes BPE training corpus-size-
    * independent: the corpus is scanned once (word counts, map-side
    * combinable), every merge round then works on the vocabulary-sized
    * frame. Words are space-separated symbol strings; a merge is a
    * boundary-guarded non-overlapping left-to-right string replace
    * (' a b ' → ' ab '), identical semantics in JVM replace and DuckDB
    * replace, so the oracle reproduces the whole merge TRACE (step,
    * pair, merged symbol, count) hash-exactly via 8 unrolled CTEs —
    * the same unrolling pattern as the Lloyd-iteration oracles. Ties
    * break max-count → lexicographic pair. Per round one tiny job over
    * the persisted vocab frame; only the best pair (1 row) reaches the
    * driver, mirroring trainCentroids' k×dim collects.
    *
    * Merge-application variant, documented precisely: the literal
    * replace consumes BOTH delimiter spaces, so of two back-to-back
    * occurrences ('abab' → ' a b a b ') only the first merges in that
    * round — reference BPE with zero-width boundary guards would merge
    * both. The skipped occurrence still exists next round, so the same
    * pair can legitimately reappear in the trace (self-correcting);
    * `cnt` is the standard adjacency statistic (what greedy selection
    * ranks on), not the number of rewrites applied. Both engines apply
    * the identical variant, which is what the hash compare certifies.
    */
  def bpeTrain(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    trainedMerges(spark, dir)
      .toDF("step", "left_sym", "right_sym", "merged", "cnt")
      .orderBy(col("step"))
  }

  /** Memoized merge trainer (same per-session memo pattern as the
    * k-means trainer): the trace is a vocab-derived constant per source
    * dir, and bpeApply re-uses it without re-running the 8 merge jobs.
    * The key carries the documents file-metadata stamp so an IN-PLACE
    * testdata regeneration (it happened: see FIXTURES.md) retrains
    * instead of serving the old corpus's merges for the rest of the JVM.
    */
  private val mergeMemo = new java.util.concurrent.ConcurrentHashMap[
    (String, Long), Seq[(Long, String, String, String, Long)]]()

  private def trainedMerges(
      spark: SparkSession, dir: String): Seq[(Long, String, String, String, Long)] =
    mergeMemo.computeIfAbsent(
      (dir, graft.sources.DerivedCache.sourceStamp(s"$dir/documents.parquet")),
      _ => {
        // itemized like the DerivedCache layouts: the 8 merge-training
        // jobs are a one-time model build, and the bench's builds line
        // must attribute them instead of letting them land inside
        // whichever bpe_* query constructs first
        val t0 = System.nanoTime()
        val r  = trainMergesUncached(spark, dir)
        graft.sources.BuildLog.record("bpe-merges", (System.nanoTime() - t0) / 1e9)
        r
      })

  private def trainMergesUncached(
      spark: SparkSession, dir: String): Seq[(Long, String, String, String, Long)] = {
    val words = Tables
      .documents(spark, dir)
      .select(explode(
        expr("filter(split(lower(text), '[^a-z0-9]+'), x -> x <> '')")).as("w"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("cnt"))
      .select(
        concat(lit(" "), regexp_replace(col("w"), "(.)", "$1 ")).as("s"),
        col("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def bestPair(seqs: DataFrame): Option[(String, String, Long)] = {
      val t = seqs
        .select(split(expr("trim(s)"), " ").as("t"), col("cnt"))
        .filter(size(col("t")) >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(t) - 2), i -> struct(t[i] AS a, t[i+1] AS b))"))
          .as("p"), col("cnt"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("total"))
        .orderBy(desc("total"), asc("a"), asc("b"))
        .limit(1)
        .collect()
      t.headOption.map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    }
    var seqs = words
    val trace = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, String, Long)]
    var step = 1
    var done = false
    while (step <= BpeMerges && !done) {
      bestPair(seqs) match {
        case None => done = true
        case Some((a, b, total)) =>
          trace += ((step.toLong, a, b, a + b, total))
          // Column-API replace, NOT sql-string interpolation: a and b are
          // corpus-derived symbols collected to the driver — interpolating
          // them into expr() would let crafted corpus text inject SQL
          seqs = seqs.select(
            replace(col("s"), lit(s" $a $b "), lit(s" ${a + b} ")).as("s"),
            col("cnt"))
          step += 1
      }
    }
    words.unpersist()
    trace.toSeq
  }

  /** Corpus-wide application of the trained merges — the tokenize-the-
    * corpus step that follows tokenizer training in a real pipeline.
    * Per doc: words are char-spaced exactly like the training prep, the
    * [[BpeMerges]] merges replay IN ORDER as chained codegen'd string
    * replaces (same boundary-guarded non-overlapping variant as
    * training, see bpeTrain's scaladoc), and the output is the per-doc
    * token accounting (words, chars, BPE tokens). Cost is linear in the
    * corpus — one scan, 8 fused replaces, one hash agg; the merge list
    * is a driver-side vocab-sized constant (memoized), so at 100 TB
    * this is a single map-side-combinable pass.
    */
  def bpeApply(spark: SparkSession, dir: String): DataFrame = {
    val merges = trainedMerges(spark, dir)
    val perWord = Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        explode(
          expr("filter(split(lower(text), '[^a-z0-9]+'), x -> x <> '')")).as("w"))
      .select(
        col("doc_id"),
        length(col("w")).as("wc"),
        concat(lit(" "), regexp_replace(col("w"), "(.)", "$1 ")).as("s"))
    val applied = merges.foldLeft(perWord) { case (df, (_, a, b, m, _)) =>
      // Column-API replace — corpus-derived symbols never enter SQL text
      df.withColumn("s", replace(col("s"), lit(s" $a $b "), lit(s" $m ")))
    }
    applied
      .select(
        col("doc_id"), col("wc"),
        size(split(trim(col("s")), " ")).as("tok"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_words"),
        sum(col("wc")).cast("long").as("n_chars"),
        sum(col("tok")).cast("long").as("n_tokens"))
      .orderBy(col("doc_id"))
  }

  /** The training CTE chain (words → w0 → p_i/b_i/w_i per merge),
    * shared by the train and apply oracles so both replay the identical
    * greedy merge sequence.
    */
  private def bpeChainSql: String = {
    def pairsCte(i: Int) =
      s"""p$i AS (
         |  SELECT t[i] AS a, t[i+1] AS b, SUM(cnt) AS total
         |  FROM (SELECT string_split(trim(s), ' ') AS t, cnt FROM w${i - 1}),
         |       LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i)
         |  WHERE len(t) >= 2
         |  GROUP BY t[i], t[i+1]
         |), b$i AS (
         |  SELECT a, b, total FROM p$i ORDER BY total DESC, a, b LIMIT 1
         |), w$i AS (
         |  SELECT replace(s, ' ' || b$i.a || ' ' || b$i.b || ' ',
         |                 ' ' || b$i.a || b$i.b || ' ') AS s, cnt
         |  FROM w${i - 1}, b$i
         |)""".stripMargin
    val steps = (1 to BpeMerges).map(pairsCte).mkString(",\n")
    s"""words AS (
       |  SELECT w, count(*) AS cnt FROM (
       |    SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
       |                              x -> x <> '')) AS w
       |    FROM documents) GROUP BY w
       |), w0 AS (
       |  SELECT ' ' || regexp_replace(w, '(.)', '\\1 ', 'g') AS s, cnt FROM words
       |),
       |$steps""".stripMargin
  }

  private val bpeTrainSql = {
    val rows = (1 to BpeMerges)
      .map(i =>
        s"SELECT CAST($i AS BIGINT) AS step, a AS left_sym, b AS right_sym, a || b AS merged, CAST(total AS BIGINT) AS cnt FROM b$i")
      .mkString("\nUNION ALL\n")
    s"""WITH $bpeChainSql
       |$rows
       |ORDER BY step""".stripMargin
  }

  private val bpeApplySql = {
    // replay the merges over the PER-DOC word stream: d0 is the same
    // char-spaced prep as w0 but keyed by doc_id, and each d_i applies
    // merge b_i (trained on the word-frequency table) in order
    // LEFT JOIN + CASE, not a cross join: a corpus that exhausts its
    // merges before step i leaves b$i EMPTY, and `FROM d, b` would
    // annihilate every doc row where the Spark side (whose trainer just
    // stops early) still returns them
    def applyCte(i: Int) =
      s"""d$i AS (
         |  SELECT doc_id, wc,
         |         CASE WHEN b$i.a IS NULL THEN s
         |              ELSE replace(s, ' ' || b$i.a || ' ' || b$i.b || ' ',
         |                           ' ' || b$i.a || b$i.b || ' ') END AS s
         |  FROM d${i - 1} LEFT JOIN b$i ON true
         |)""".stripMargin
    val steps = (1 to BpeMerges).map(applyCte).mkString(",\n")
    s"""WITH $bpeChainSql,
       |dw AS (
       |  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
       |                                    x -> x <> '')) AS w
       |  FROM documents
       |), d0 AS (
       |  SELECT doc_id, length(w) AS wc,
       |         ' ' || regexp_replace(w, '(.)', '\\1 ', 'g') AS s
       |  FROM dw
       |),
       |$steps
       |SELECT doc_id,
       |       CAST(count(*) AS BIGINT) AS n_words,
       |       CAST(SUM(wc) AS BIGINT) AS n_chars,
       |       CAST(SUM(len(string_split(trim(s), ' '))) AS BIGINT) AS n_tokens
       |FROM d$BpeMerges
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin
  }

  /** Top-3 TF-IDF terms per document (idf = ln(N/df), raw counts — the
    * classic keyword extraction). Ranking runs on the unrounded score so
    * Spark and the oracle order identically; the emitted score is
    * deterministically rounded.
    */
  def tfidfTopK(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val nDocs = docs.count()
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // vocabulary frame: same key as the join → partitioning reused; at
    // 100 TB with a capped vocab, wrap in broadcast(...) instead.
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df_docs"))
    val scored = tf
      .join(df, "term")
      .withColumn("tfidf", col("tf") * log(lit(nDocs.toDouble) / col("df_docs")))
    org.apache.spark.sql.graft.TopK
      .perKey(
        scored,
        Seq("doc_id"),
        Seq("tfidf" -> false, "term" -> true),
        k = 3,
        rankName = "rn")
      .select(
        col("doc_id"), col("rn"), col("term"), col("tf"), col("df_docs"),
        Det.detRound(col("tfidf"), 6).as("tfidf"))
      .orderBy(col("doc_id"), col("rn"))
  }

  private val tfidfTopKSql =
    s"""WITH tf AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
       |  FROM documents
       |), tfc AS (
       |  SELECT doc_id, term, count(*) AS tf FROM tf GROUP BY doc_id, term
       |), dfc AS (
       |  SELECT term, count(*) AS df_docs FROM tfc GROUP BY term
       |), scored AS (
       |  SELECT t.doc_id, t.term, t.tf, d.df_docs,
       |         t.tf * ln((SELECT count(*) FROM documents) / CAST(d.df_docs AS DOUBLE)) AS tfidf
       |  FROM tfc t JOIN dfc d ON t.term = d.term
       |)
       |SELECT doc_id, rn, term, tf, df_docs,
       |       ${Det.roundSql("tfidf", 6)} AS tfidf
       |FROM (
       |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn
       |  FROM scored
       |) WHERE rn <= 3
       |ORDER BY doc_id, rn""".stripMargin

  /** Composite quality gate: per-language pass counts for the standard
    * pre-training filters (document length, token count, mean token
    * length band). Pure per-row arithmetic inside codegen; one tiny
    * aggregate.
    */
  /** The quality gate predicate over (n_chars, n_tokens, token_chars) —
    * THE thresholds. quality_filter reports them and quality_vs_dup
    * (Dedup.scala) cross-tabs them against duplication, so the
    * predicate lives in exactly one place (plus the SQL twins below);
    * a threshold change cannot desynchronize the two reports.
    */
  private[operators] def qualityPassFlag: Column =
    col("n_chars") >= 150 && col("n_tokens") >= 30 &&
      col("token_chars").cast("double") / col("n_tokens") >= 3.8 &&
      col("token_chars").cast("double") / col("n_tokens") <= 5.5

  private[operators] val qualityPassSql =
    """(n_chars >= 150 AND n_tokens >= 30
      |          AND CAST(token_chars AS DOUBLE) / n_tokens >= 3.8
      |          AND CAST(token_chars AS DOUBLE) / n_tokens <= 5.5)""".stripMargin

  /** DuckDB twin of the (n_tokens, token_chars) derivation feeding the
    * gate — shared for the same no-drift reason.
    */
  private[operators] val tokenCharsSql =
    "list_reduce(list_prepend(0, list_transform(string_split(text, ' '), w -> length(w))), (a, b) -> a + b)"

  def qualityFilter(spark: SparkSession, dir: String): DataFrame = {
    Tables
      .documents(spark, dir)
      .select(
        col("lang"),
        col("n_chars"),
        split(col("text"), " ").as("t"))
      .select(
        col("lang"),
        col("n_chars"),
        size(col("t")).cast("long").as("n_tokens"),
        expr("CAST(aggregate(t, 0, (a, w) -> a + length(w)) AS BIGINT)").as("token_chars"))
      .withColumn("passes", qualityPassFlag)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("passes"), 1L).otherwise(0L)).as("n_pass"))
      .select(
        col("lang"), col("n_docs"), col("n_pass"),
        Det.detRound(col("n_pass").cast("double") / col("n_docs"), 6).as("pass_rate"))
      .orderBy(asc_nulls_last("lang"))
  }

  private val qualityFilterSql =
    s"""WITH m AS (
       |  SELECT lang, n_chars,
       |         len(string_split(text, ' ')) AS n_tokens,
       |         $tokenCharsSql AS token_chars
       |  FROM documents
       |), flags AS (
       |  SELECT lang,
       |         $qualityPassSql AS passes
       |  FROM m
       |)
       |SELECT lang,
       |       count(*) AS n_docs,
       |       CAST(SUM(CASE WHEN passes THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
       |       ${Det.roundSql("CAST(SUM(CASE WHEN passes THEN 1 ELSE 0 END) AS DOUBLE) / count(*)", 6)} AS pass_rate
       |FROM flags
       |GROUP BY lang
       |ORDER BY lang""".stripMargin

  /** Exact linear-interpolation length percentiles per language —
    * grouped percentile coverage (the global form lives in
    * event_value_percentiles).
    */
  def docLenPercentiles(spark: SparkSession, dir: String): DataFrame = {
    Tables
      .documents(spark, dir)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        expr("percentile(n_chars, 0.25)").as("p25"),
        expr("percentile(n_chars, 0.5)").as("p50"),
        expr("percentile(n_chars, 0.75)").as("p75"),
        expr("percentile(n_chars, 0.95)").as("p95"))
      .orderBy(asc_nulls_last("lang"))
  }

  private val docLenPercentilesSql =
    """SELECT lang,
      |       count(*) AS n_docs,
      |       quantile_cont(n_chars, 0.25) AS p25,
      |       quantile_cont(n_chars, 0.5)  AS p50,
      |       quantile_cont(n_chars, 0.75) AS p75,
      |       quantile_cont(n_chars, 0.95) AS p95
      |FROM documents
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  /** Sequence packing for training: documents assigned to fixed-capacity
    * token bins (capacity 2048) by prefix-sum division in doc_id order —
    * bin = floor(tokens-before / capacity), the standard "chunked
    * packing" pass that turns a shuffled corpus into near-full context
    * windows. The running sum uses Rank.withPrefixSum (range-bucketed
    * distributed prefix sum — no single-partition window), and the
    * integer arithmetic makes the distributed result bit-identical to
    * the oracle's global window cumsum. Output is per-bin packing stats.
    */
  def docPackBins(spark: SparkSession, dir: String): DataFrame = {
    val cap = 2048
    val toks = Tables
      .documents(spark, dir)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tokens"))
    Rank
      .withPrefixSum(toks, "doc_id", "n_tokens")
      .withColumn("bin", floor((col("cum") - col("n_tokens")) / cap).cast("long"))
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .withColumn(
        "utilization",
        Det.detRound(col("total_tokens").cast("double") / cap, 6))
      .orderBy(col("bin"))
  }

  private val docPackBinsSql =
    s"""WITH t AS (
       |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       |  FROM documents
       |), c AS (
       |  SELECT doc_id, n_tokens,
       |         SUM(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM t
       |)
       |SELECT CAST((cum - n_tokens) // 2048 AS BIGINT) AS bin,
       |       count(*) AS n_docs,
       |       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       |       min(doc_id) AS first_doc,
       |       max(doc_id) AS last_doc,
       |       ${Det.roundSql("CAST(SUM(n_tokens) AS DOUBLE) / 2048", 6)} AS utilization
       |FROM c
       |GROUP BY 1
       |ORDER BY bin""".stripMargin

  /** Packing fragmentation: how many documents a concat-and-slice
    * packing run (the GPT-style layout — the token stream is cut into
    * fixed 2048-token windows, so a document can straddle window
    * boundaries) would split, under the DETERMINISTIC md5-shuffled
    * corpus order a real pretraining pass uses (corpus_shuffle's hash;
    * doc_pack_bins is the doc_id-ordered per-bin view — this is the
    * doc-grain boundary-crossing view you tune the context length
    * against). Each doc gets one EOS token; its window span follows
    * from an exact distributed prefix sum over (hash, doc_id) order
    * (Rank.withPrefixSum — range-bucketed, no single-partition window;
    * the doc_id tie-break makes each row's cum well-defined even on a
    * hash collision). Only (doc_id, n_tokens, h) ever shuffles — text
    * stays at the scan. Output: docs/tokens by windows-spanned, with
    * the doc fraction per span.
    */
  def packFragmentation(spark: SparkSession, dir: String): DataFrame = {
    val cap = 2048
    val toks = Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        (size(split(col("text"), " ")) + 1).cast("long").as("n_tokens"),
        expr("CAST(conv(substr(md5(concat('pack:', CAST(doc_id AS STRING))), 1, 15), 16, 10) AS BIGINT)")
          .as("h"))
    val spanned = Rank
      .withPrefixSum(toks, "h", "n_tokens", tieBreak = Seq("doc_id"))
      .select(
        col("n_tokens"),
        (expr(s"(cum - 1) div $cap") - expr(s"(cum - n_tokens) div $cap") + 1)
          .as("bins_spanned"))
      .groupBy(col("bins_spanned"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"))
    spanned
      .withColumn(
        "pct_docs",
        Det.detRound(
          col("n_docs").cast("double") /
            sum(col("n_docs")).over(org.apache.spark.sql.expressions.Window.partitionBy()),
          6))
      .orderBy(col("bins_spanned"))
  }

  private val packFragmentationSql =
    s"""WITH t AS (
       |  SELECT doc_id,
       |         CAST(len(string_split(text, ' ')) + 1 AS BIGINT) AS n_tokens,
       |         ('0x' || substr(md5('pack:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
       |  FROM documents
       |), c AS (
       |  SELECT doc_id, n_tokens,
       |         SUM(n_tokens) OVER (ORDER BY h, doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM t
       |), g AS (
       |  SELECT CAST((cum - 1) // 2048 - (cum - n_tokens) // 2048 + 1 AS BIGINT) AS bins_spanned,
       |         n_tokens
       |  FROM c
       |), a AS (
       |  SELECT bins_spanned, count(*) AS n_docs,
       |         CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
       |  FROM g GROUP BY bins_spanned
       |)
       |SELECT bins_spanned, n_docs, total_tokens,
       |       ${Det.roundSql(
            "CAST(n_docs AS DOUBLE) / CAST(SUM(n_docs) OVER () AS DOUBLE)", 6)} AS pct_docs
       |FROM a
       |ORDER BY bins_spanned""".stripMargin

  /** Benchmark-contamination check: which corpus documents share word
    * 5-grams with a held-out benchmark set (here: doc_id < 20), and how
    * much. The benchmark's distinct shingle set is broadcast — the
    * corpus is scanned once and never shuffled by shingle; per-doc
    * matched/total counts give the contamination score. Shingles join
    * as strings for oracle-exactness; at 100 TB the join key would be
    * xxhash64(shingle) with the same plan shape (collision risk
    * acceptable there, not in an exactness gate).
    */
  def contaminationCheck(spark: SparkSession, dir: String): DataFrame = {
    val sh = Tables
      .documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(
        col("doc_id"),
        explode(
          when(
            size(col("t")) >= 5,
            array_distinct(expr(
              "transform(sequence(0, size(t) - 5), i -> concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3], t[i+4]))")))
            .otherwise(array().cast("array<string>")))
          .as("s"))
    val bench  = sh.filter(col("doc_id") < 20).select(col("s")).distinct()
    val corpus = sh.filter(col("doc_id") >= 20)
    val sizes = corpus.groupBy(col("doc_id")).agg(count(lit(1)).as("total_shingles"))
    val matched = corpus
      .join(broadcast(bench), "s")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("matched_shingles"))
    matched
      .join(sizes, "doc_id")
      .select(
        col("doc_id"),
        col("matched_shingles"),
        col("total_shingles"),
        Det.detRound(
          col("matched_shingles").cast("double") / col("total_shingles"), 6)
          .as("contamination"))
      .orderBy(desc("contamination"), asc("doc_id"))
  }

  private val contaminationCheckSql =
    s"""WITH t AS (
       |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
       |), sh AS (
       |  SELECT DISTINCT doc_id, unnest(
       |    CASE WHEN len(t) >= 5
       |         THEN list_transform(generate_series(1, len(t) - 4),
       |                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4])
       |         ELSE [] END) AS s
       |  FROM t
       |), bench AS (
       |  SELECT DISTINCT s FROM sh WHERE doc_id < 20
       |), corpus AS (
       |  SELECT * FROM sh WHERE doc_id >= 20
       |), sizes AS (
       |  SELECT doc_id, count(*) AS total_shingles FROM corpus GROUP BY doc_id
       |), matched AS (
       |  SELECT doc_id, count(*) AS matched_shingles
       |  FROM corpus WHERE s IN (SELECT s FROM bench)
       |  GROUP BY doc_id
       |)
       |SELECT m.doc_id, m.matched_shingles, z.total_shingles,
       |       ${Det.roundSql("CAST(m.matched_shingles AS DOUBLE) / z.total_shingles", 6)} AS contamination
       |FROM matched m JOIN sizes z ON m.doc_id = z.doc_id
       |ORDER BY contamination DESC, m.doc_id""".stripMargin

  /** One-row corpus report card — the S14 text-report analog for the
    * training-data tier: document and token totals, exact-duplicate
    * count (docs minus distinct md5 payloads), benchmark-contaminated
    * doc count, and the overall quality-gate pass rate. Four independent
    * 1-row aggregates cross-joined (each side is a single row, so the
    * "joins" are free); oracle = the same measures as scalar subqueries.
    */
  def corpusReport(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val counts = docs
      .select(
        col("doc_id"),
        md5(col("text")).as("h"),
        size(split(col("text"), " ")).cast("long").as("toks"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("toks")).as("total_ws_tokens"),
        (count(lit(1)) - countDistinct(col("h"))).as("n_exact_dup_docs"))
    val contaminated = contaminationCheck(spark, dir)
      .agg(count(lit(1)).as("n_contaminated_docs"))
    val quality = qualityFilter(spark, dir)
      .agg(
        Det.detRound(
          sum(col("n_pass")).cast("double") / sum(col("n_docs")), 6)
          .as("quality_pass_rate"))
    counts
      .crossJoin(contaminated)
      .crossJoin(quality)
      .select(
        col("n_docs"), col("total_ws_tokens"), col("n_exact_dup_docs"),
        col("n_contaminated_docs"), col("quality_pass_rate"))
  }

  // lazy: interpolates contaminationCheckSql/qualityFilterSql, which are
  // initialized later in the object body
  private lazy val corpusReportSql =
    s"""SELECT
       |  (SELECT count(*) FROM documents) AS n_docs,
       |  (SELECT CAST(SUM(len(string_split(text, ' '))) AS BIGINT) FROM documents) AS total_ws_tokens,
       |  (SELECT count(*) - count(DISTINCT md5(text)) FROM documents) AS n_exact_dup_docs,
       |  (SELECT count(*) FROM ($contaminationCheckSql)) AS n_contaminated_docs,
       |  (SELECT ${Det.roundSql("CAST(SUM(n_pass) AS DOUBLE) / SUM(n_docs)", 6)}
       |   FROM ($qualityFilterSql)) AS quality_pass_rate""".stripMargin

  /** PMI-ranked collocations (Church & Hanks 1990, public): top-50 word
    * bigrams by pointwise mutual information ln(p(xy)/(p(x)p(y))) with a
    * min-count floor — the classic phrase-mining pass over a corpus.
    * Scale shape: unigram and bigram counts are map-side-combinable aggs;
    * the two count joins key on vocab-sized frames; the global top-50 is
    * TakeOrderedAndProject (per-partition heaps, no global sort).
    * Selection ranks on the unrounded score (tfidf_topk precedent); the
    * emitted score is deterministically rounded.
    */
  def pmiBigrams(spark: SparkSession, dir: String): DataFrame =
    pmiBigramsOf(Tables.documents(spark, dir))

  /** The PMI core over any frame with a `text` column — exposed for
    * CorpusOpsSpec's crafted-collocation fixture.
    */
  private[graft] def pmiBigramsOf(docs: DataFrame): DataFrame = {
    val MinCount = 5
    val base = docs
      .select(
        expr("filter(split(lower(text), '[^a-z0-9]+'), x -> x <> '')").as("t"))
    val uni = base
      .select(explode(col("t")).as("w"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("c"))
    val bg = base
      .filter(size(col("t")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(t) - 2), i -> struct(t[i] AS a, t[i+1] AS b))"))
        .as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
    val bi = bg.groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_xy"))
    // corpus totals: driver-side scalars (tfidf_topk's nDocs precedent),
    // but ONE shuffle-free mini-agg over `base` — no explode, no groupBy:
    // nu = Σ|t|, nb = Σ max(|t|−1, 0). Empty corpus: sums are NULL —
    // floor both at 1 so the (row-less) scoring pipeline never divides
    // by zero instead of crashing the collect
    val totRow = base
      .agg(
        coalesce(sum(size(col("t")).cast("long")), lit(0L)).as("nu"),
        coalesce(sum(greatest(size(col("t")) - 1, lit(0)).cast("long")), lit(0L))
          .as("nb"))
      .collect()(0)
    val nu = math.max(totRow.getLong(0), 1L)
    val nb = math.max(totRow.getLong(1), 1L)
    val scored = bi
      .filter(col("c_xy") >= MinCount)
      .join(uni.select(col("w").as("a"), col("c").as("c_a")), "a")
      .join(uni.select(col("w").as("b"), col("c").as("c_b")), "b")
      .withColumn(
        "pmi",
        log(
          (col("c_xy").cast("double") / nb.toDouble) /
            ((col("c_a").cast("double") / nu.toDouble) *
              (col("c_b").cast("double") / nu.toDouble))))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(desc("pmi"), asc("a"), asc("b"))
    scored
      .orderBy(desc("pmi"), asc("a"), asc("b"))
      .limit(50)
      .withColumn("rn", row_number().over(w))
      .select(
        col("rn"), col("a"), col("b"), col("c_xy"), col("c_a"), col("c_b"),
        Det.detRound(col("pmi"), 6).as("pmi"))
      .orderBy(col("rn"))
  }

  private val pmiBigramsSql =
    s"""WITH base AS (
       |  SELECT list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
       |                     x -> x <> '') AS t
       |  FROM documents
       |), toks AS (
       |  SELECT unnest(t) AS w FROM base
       |), uni AS (
       |  SELECT w, count(*) AS c FROM toks GROUP BY w
       |), bg AS (
       |  SELECT t[i] AS a, t[i+1] AS b
       |  FROM (SELECT t FROM base WHERE len(t) >= 2),
       |       LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i)
       |), bi AS (
       |  SELECT a, b, count(*) AS c_xy FROM bg GROUP BY a, b
       |), tot AS (
       |  SELECT (SELECT SUM(c) FROM uni) AS nu, (SELECT count(*) FROM bg) AS nb
       |), scored AS (
       |  SELECT bi.a, bi.b, bi.c_xy, ua.c AS c_a, ub.c AS c_b,
       |         ln((CAST(bi.c_xy AS DOUBLE) / CAST(nb AS DOUBLE)) /
       |            ((CAST(ua.c AS DOUBLE) / CAST(nu AS DOUBLE)) *
       |             (CAST(ub.c AS DOUBLE) / CAST(nu AS DOUBLE)))) AS pmi
       |  FROM bi, tot
       |  JOIN uni ua ON bi.a = ua.w
       |  JOIN uni ub ON bi.b = ub.w
       |  WHERE bi.c_xy >= 5
       |)
       |SELECT rn, a, b, CAST(c_xy AS BIGINT) AS c_xy,
       |       CAST(c_a AS BIGINT) AS c_a, CAST(c_b AS BIGINT) AS c_b,
       |       ${Det.roundSql("pmi", 6)} AS pmi
       |FROM (
       |  SELECT *, row_number() OVER (ORDER BY pmi DESC, a, b) AS rn
       |  FROM scored
       |) WHERE rn <= 50
       |ORDER BY rn""".stripMargin

  /** Tokenizer fertility report: per language, BPE tokens per word and
    * chars per BPE token under the trained merges — THE standard metric
    * for judging how well a tokenizer fits each language before
    * committing to a vocab (a high-fertility language pays more sequence
    * positions per sentence). Same single-scan chained-replace shape as
    * bpe_apply, aggregated by lang instead of doc.
    */
  def tokenizerFertility(spark: SparkSession, dir: String): DataFrame = {
    val merges = trainedMerges(spark, dir)
    // scan-fan (guide §2.5): per-word regex char-spacing + 8 chained
    // replaces are the heaviest per-row expressions in the text tier
    val perWord = Tables
      .documentsFanned(spark, dir)
      .select(
        col("lang"),
        explode(
          expr("filter(split(lower(text), '[^a-z0-9]+'), x -> x <> '')")).as("w"))
      .select(
        col("lang"),
        length(col("w")).as("wc"),
        concat(lit(" "), regexp_replace(col("w"), "(.)", "$1 ")).as("s"))
    val applied = merges.foldLeft(perWord) { case (df, (_, a, b, m, _)) =>
      df.withColumn("s", replace(col("s"), lit(s" $a $b "), lit(s" $m ")))
    }
    applied
      .select(
        col("lang"), col("wc"),
        size(split(trim(col("s")), " ")).as("tok"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_words"),
        sum(col("wc")).cast("long").as("n_chars"),
        sum(col("tok")).cast("long").as("n_tokens"))
      .select(
        col("lang"), col("n_words"), col("n_chars"), col("n_tokens"),
        Det.detRound(col("n_tokens").cast("double") / col("n_words"), 6)
          .as("tokens_per_word"),
        Det.detRound(col("n_chars").cast("double") / col("n_tokens"), 6)
          .as("chars_per_token"))
      .orderBy(asc_nulls_last("lang"))
  }

  private val tokenizerFertilitySql = {
    // same LEFT JOIN guard as bpeApplySql: an exhausted-merge corpus
    // leaves b$i empty and must not annihilate the row stream
    def applyCte(i: Int) =
      s"""f$i AS (
         |  SELECT lang, wc,
         |         CASE WHEN b$i.a IS NULL THEN s
         |              ELSE replace(s, ' ' || b$i.a || ' ' || b$i.b || ' ',
         |                           ' ' || b$i.a || b$i.b || ' ') END AS s
         |  FROM f${i - 1} LEFT JOIN b$i ON true
         |)""".stripMargin
    val steps = (1 to BpeMerges).map(applyCte).mkString(",\n")
    s"""WITH $bpeChainSql,
       |fw AS (
       |  SELECT lang, unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
       |                                  x -> x <> '')) AS w
       |  FROM documents
       |), f0 AS (
       |  SELECT lang, length(w) AS wc,
       |         ' ' || regexp_replace(w, '(.)', '\\1 ', 'g') AS s
       |  FROM fw
       |),
       |$steps,
       |agg AS (
       |  SELECT lang,
       |         CAST(count(*) AS BIGINT) AS n_words,
       |         CAST(SUM(wc) AS BIGINT) AS n_chars,
       |         CAST(SUM(len(string_split(trim(s), ' '))) AS BIGINT) AS n_tokens
       |  FROM f$BpeMerges
       |  GROUP BY lang
       |)
       |SELECT lang, n_words, n_chars, n_tokens,
       |       ${Det.roundSql("CAST(n_tokens AS DOUBLE) / n_words", 6)} AS tokens_per_word,
       |       ${Det.roundSql("CAST(n_chars AS DOUBLE) / n_tokens", 6)} AS chars_per_token
       |FROM agg
       |ORDER BY lang""".stripMargin
  }

  /** Zipf-law fit of the token frequency spectrum — the corpus-health
    * audit that flags synthetic, truncated, or template-generated text:
    * natural language runs a log-log slope near −1 with a tight linear
    * fit, while boilerplate-heavy or machine-generated corpora bend the
    * curve (|slope| drifts, r² drops). Least-squares on (ln rank,
    * ln freq) over the top-100 tokens; one summary row with the fitted
    * slope, intercept, and r².
    *
    * Scale: the unigram count is the corpus's only full-width pass — a
    * map-side-partial hash agg collapsing to vocabulary size before the
    * shuffle (the bigram_topk pattern). The rank window and regression
    * fold run on the 100-row top slice. Exactness: each ln() term is
    * quantized to DECIMAL(30,10) before summation (the lm_score
    * convention — engine last-ulp log differences vanish in the cast,
    * and DECIMAL addition is order-independent), the final statistics
    * detRound-pinned.
    */
  def zipfFit(spark: SparkSession, dir: String): DataFrame = {
    val TopN = 100
    val freq = Tables
      .documents(spark, dir)
      .select(explode(expr(
        "filter(split(lower(text), '[^a-z0-9]+'), x -> x <> '')")).as("w"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("c"))
    // Top-100 via orderBy().limit() (TakeOrderedAndProject — a bounded
    // per-partition heap + k-row driver merge, never a full sort), then
    // re-rank the <=100-row slice: the pmiBigrams pattern, with no
    // dependence on InferWindowGroupLimit rescuing a global row_number.
    val w = Window.orderBy(desc("c"), asc("w"))
    val top = freq
      .orderBy(desc("c"), asc("w"))
      .limit(TopN)
      .withColumn("r", row_number().over(w).cast("long"))
      .select(
        col("r"), col("c"),
        log(col("r").cast("double")).as("x"),
        log(col("c").cast("double")).as("y"))
    top
      .agg(
        count(lit(1)).as("n_terms"),
        max(col("c")).as("top1_freq"),
        Det.fineSum(col("x")).as("sx"),
        Det.fineSum(col("y")).as("sy"),
        Det.fineSum(col("x") * col("y")).as("sxy"),
        Det.fineSum(col("x") * col("x")).as("sxx"),
        Det.fineSum(col("y") * col("y")).as("syy"))
      .select(
        col("n_terms"),
        col("top1_freq"),
        when(
          col("n_terms") * col("sxx") - col("sx") * col("sx") === 0.0,
          lit(null).cast("double"))
          .otherwise(Det.detRound(
            (col("n_terms") * col("sxy") - col("sx") * col("sy")) /
              (col("n_terms") * col("sxx") - col("sx") * col("sx")), 6))
          .as("zipf_slope"),
        when(
          col("n_terms") * col("sxx") - col("sx") * col("sx") === 0.0,
          lit(null).cast("double"))
          .otherwise(Det.detRound(
            (col("sy") - (col("n_terms") * col("sxy") - col("sx") * col("sy")) /
              (col("n_terms") * col("sxx") - col("sx") * col("sx")) * col("sx")) /
              col("n_terms"), 6))
          .as("intercept"),
        when(
          (col("n_terms") * col("sxx") - col("sx") * col("sx")) *
            (col("n_terms") * col("syy") - col("sy") * col("sy")) === 0.0,
          lit(null).cast("double"))
          .otherwise(Det.detRound(
            (col("n_terms") * col("sxy") - col("sx") * col("sy")) *
              (col("n_terms") * col("sxy") - col("sx") * col("sy")) /
              ((col("n_terms") * col("sxx") - col("sx") * col("sx")) *
                (col("n_terms") * col("syy") - col("sy") * col("sy"))), 6))
          .as("r2"))
  }

  private val zipfFitSql = {
    def r6(e: String) = Det.roundSql(e, 6)
    val slope = "(n_terms * sxy - sx * sy) / (n_terms * sxx - sx * sx)"
    s"""WITH toks AS (
       |  SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
       |                x -> x <> '')) AS w
       |  FROM documents
       |), freq AS (
       |  SELECT w, count(*) AS c FROM toks GROUP BY w
       |), top AS (
       |  SELECT c,
       |         CAST(ROW_NUMBER() OVER (ORDER BY c DESC, w) AS BIGINT) AS r
       |  FROM freq QUALIFY r <= 100
       |), xy AS (
       |  SELECT r, c, ln(CAST(r AS DOUBLE)) AS x, ln(CAST(c AS DOUBLE)) AS y FROM top
       |), agg AS (
       |  SELECT count(*) AS n_terms, max(c) AS top1_freq,
       |         CAST(SUM(CAST(x AS DECIMAL(30,10))) AS DOUBLE) AS sx,
       |         CAST(SUM(CAST(y AS DECIMAL(30,10))) AS DOUBLE) AS sy,
       |         CAST(SUM(CAST(x * y AS DECIMAL(30,10))) AS DOUBLE) AS sxy,
       |         CAST(SUM(CAST(x * x AS DECIMAL(30,10))) AS DOUBLE) AS sxx,
       |         CAST(SUM(CAST(y * y AS DECIMAL(30,10))) AS DOUBLE) AS syy
       |  FROM xy
       |)
       |SELECT n_terms, top1_freq,
       |       CASE WHEN n_terms * sxx - sx * sx = 0 THEN NULL ELSE
       |         ${r6(slope)}
       |       END AS zipf_slope,
       |       CASE WHEN n_terms * sxx - sx * sx = 0 THEN NULL ELSE
       |         ${r6(s"(sy - ($slope) * sx) / n_terms")}
       |       END AS intercept,
       |       CASE WHEN (n_terms * sxx - sx * sx) * (n_terms * syy - sy * sy) = 0
       |            THEN NULL ELSE
       |         ${r6("""(n_terms * sxy - sx * sy) * (n_terms * sxy - sx * sy)
       |                 / ((n_terms * sxx - sx * sx) * (n_terms * syy - sy * sy))""")}
       |       END AS r2
       |FROM agg""".stripMargin
  }

  /** Vocabulary-head audit — the top-50 tokens by corpus frequency with
    * global rank and share of total token mass. The head of the
    * frequency spectrum is where boilerplate and template residue shows
    * up first (a navigation token outranking "the" = extraction bug);
    * read next to zipf_fit, it names the tokens behind the curve.
    *
    * Deliberately written in the declarative global-window form
    * (`row_number() OVER (ORDER BY ...)` then `rn <= 50`): the repo's
    * WindowTopKRewrite claims the empty-partition idiom and plans it as
    * per-partition bounded heaps under a k·p-row single-partition final
    * (plan-asserted in PlanAssertionsSpec), so the full-vocabulary
    * single-partition sort the built-in window path risks can never
    * happen. The unigram count itself is the bigram_topk map-side-
    * partial hash agg; the share denominator is a 1-row broadcast.
    */
  def vocabTopk(spark: SparkSession, dir: String): DataFrame = {
    val TopN = 50
    val freq = Tables
      .documents(spark, dir)
      .select(explode(expr(
        "filter(split(lower(text), '[^a-z0-9]+'), x -> x <> '')")).as("w"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("c"))
    val tot = freq.agg(sum(col("c")).as("t"))
    val w = Window.orderBy(desc("c"), asc("w"))
    freq
      .withColumn("vr", row_number().over(w))
      .filter(col("vr") <= TopN)
      .crossJoin(broadcast(tot))
      .select(
        col("vr").cast("long").as("vrank"),
        col("w"),
        col("c"),
        Det.detRound(col("c").cast("double") / col("t"), 6).as("share"))
      .orderBy(col("vrank"))
  }

  private val vocabTopkSql =
    s"""WITH toks AS (
       |  SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
       |                x -> x <> '')) AS w
       |  FROM documents
       |), freq AS (
       |  SELECT w, count(*) AS c FROM toks GROUP BY w
       |), tot AS (
       |  SELECT CAST(SUM(c) AS BIGINT) AS t FROM freq
       |), top AS (
       |  SELECT w, c,
       |         CAST(ROW_NUMBER() OVER (ORDER BY c DESC, w) AS BIGINT) AS vrank
       |  FROM freq QUALIFY vrank <= 50
       |)
       |SELECT vrank, w, c,
       |       ${Det.roundSql("CAST(c AS DOUBLE) / t", 6)} AS share
       |FROM top, tot
       |ORDER BY vrank""".stripMargin

  /** Corpus saturation curve — "is the crawl still finding new
    * content": docs are split into 10 ingest-order buckets (by doc_id,
    * the ingest sequence stand-in), and each bucket reports its distinct
    * 3-shingle count, how many of those shingles appear for the FIRST
    * time in that bucket, the novelty rate, and the cumulative share of
    * the corpus vocabulary discovered so far. A healthy growing crawl
    * holds novelty high; a saturated or self-duplicating one decays
    * toward zero — the signal that tells a 100 TB ingest to stop paying
    * for a source.
    *
    * Scale: two hash aggs over the shingle stream — per-(bucket,
    * shingle) dedup, and min-bucket per shingle — both map-side-partial,
    * both linear; every frame after them is ≤10 rows (the rate window
    * runs on the bucket frame). Shingles group by their string; a
    * production run would substitute xxhash64 before the shuffle, which
    * changes bytes moved, not results. Bucket ids are pinned to
    * [0, 9] with NULL doc_ids grouped NULLS LAST on both engines.
    */
  def ngramNovelty(spark: SparkSession, dir: String): DataFrame = {
    val B = 10
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
    val mx = Tables.documents(spark, dir).agg(max(col("doc_id")).as("mx"))
    def bucketed(df: DataFrame): DataFrame = df
      .crossJoin(broadcast(mx))
      .withColumn(
        "bucket",
        least(
          greatest(
            floor(col("doc_id") * lit(10.0) / (col("mx") + 1)).cast("long"), lit(0L)),
          lit((B - 1).toLong)))
    val sh = bucketed(docs)
      .select(
        col("bucket"),
        when(
          size(col("t")) >= 3,
          array_distinct(expr(
            "transform(sequence(0, size(t) - 3), i -> concat_ws(' ', t[i], t[i+1], t[i+2]))")))
          .otherwise(array().cast("array<string>")).as("shs"))
      .select(col("bucket"), explode(expr("if(size(shs) >= 0, shs, array())")).as("s"))
    val perBucket = sh
      .dropDuplicates("bucket", "s")
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_distinct"))
    val novel = sh
      .groupBy(col("s"))
      .agg(min(col("bucket")).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_novel"))
    val nDocs = bucketed(docs.select(col("doc_id")))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_docs"))
    val w = Window
      .orderBy(asc_nulls_last("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    nDocs
      .join(perBucket, Seq("bucket"), "left")
      .join(novel, Seq("bucket"), "left")
      .select(
        col("bucket"),
        col("n_docs"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"))
      .withColumn("cum_novel", sum(col("n_novel")).over(w))
      // vocab = Σ n_novel: every distinct shingle has exactly one min
      // bucket, so the corpus vocabulary is the novel-count total — a
      // window over the ≤10-row bucket frame, NOT a third full pass
      // over the shingle stream (which a distinct().count() here was)
      .withColumn(
        "vocab",
        sum(col("n_novel")).over(
          Window.orderBy(asc_nulls_last("bucket"))
            .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(
        col("bucket"),
        col("n_docs"),
        col("n_distinct"),
        col("n_novel"),
        when(col("n_distinct") === 0L, lit(null).cast("double"))
          .otherwise(Det.detRound(
            col("n_novel").cast("double") / col("n_distinct"), 6)).as("novelty_rate"),
        when(col("vocab") === 0L, lit(null).cast("double"))
          .otherwise(Det.detRound(
            col("cum_novel").cast("double") / col("vocab"), 6)).as("cum_vocab_share"))
      .orderBy(asc_nulls_last("bucket"))
  }

  private val ngramNoveltySql = {
    def r6(e: String) = Det.roundSql(e, 6)
    s"""WITH docs AS (
       |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
       |), mx AS (
       |  SELECT max(doc_id) AS mx FROM documents
       |), bdocs AS (
       |  SELECT least(greatest(CAST(floor(doc_id * 10.0 / (mx + 1)) AS BIGINT), 0), 9)
       |           AS bucket, t
       |  FROM docs, mx
       |), sh AS (
       |  SELECT bucket, unnest(list_distinct(
       |    CASE WHEN len(t) >= 3
       |         THEN list_transform(generate_series(1, len(t) - 2),
       |                             i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
       |         ELSE [] END)) AS s
       |  FROM bdocs
       |), per_bucket AS (
       |  SELECT bucket, count(*) AS n_distinct
       |  FROM (SELECT DISTINCT bucket, s FROM sh) GROUP BY bucket
       |), novel AS (
       |  SELECT bucket, count(*) AS n_novel
       |  FROM (SELECT s, min(bucket) AS bucket FROM sh GROUP BY s) GROUP BY bucket
       |), nd AS (
       |  SELECT bucket, count(*) AS n_docs FROM bdocs GROUP BY bucket
       |), vocab AS (
       |  SELECT count(DISTINCT s) AS vocab FROM sh
       |), merged AS (
       |  SELECT nd.bucket, nd.n_docs,
       |         COALESCE(per_bucket.n_distinct, 0) AS n_distinct,
       |         COALESCE(novel.n_novel, 0) AS n_novel
       |  FROM nd
       |  LEFT JOIN per_bucket ON nd.bucket = per_bucket.bucket
       |  LEFT JOIN novel ON nd.bucket = novel.bucket
       |), cum AS (
       |  SELECT bucket, n_docs, n_distinct, n_novel,
       |         SUM(n_novel) OVER (ORDER BY bucket NULLS LAST
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_novel
       |  FROM merged
       |)
       |SELECT bucket, n_docs,
       |       CAST(n_distinct AS BIGINT) AS n_distinct,
       |       CAST(n_novel AS BIGINT) AS n_novel,
       |       CASE WHEN n_distinct = 0 THEN NULL
       |            ELSE ${r6("CAST(n_novel AS DOUBLE) / n_distinct")} END AS novelty_rate,
       |       CASE WHEN vocab = 0 THEN NULL
       |            ELSE ${r6("CAST(cum_novel AS DOUBLE) / vocab")} END AS cum_vocab_share
       |FROM cum, vocab
       |ORDER BY bucket NULLS LAST""".stripMargin
  }

  val defs: Map[String, QueryDef] = Map(
    "zipf_fit"            -> QueryDef(zipfFit, Some(zipfFitSql)),
    "vocab_topk"          -> QueryDef(vocabTopk, Some(vocabTopkSql)),
    "ngram_novelty"       -> QueryDef(ngramNovelty, Some(ngramNoveltySql)),
    "pmi_bigrams"         -> QueryDef(pmiBigrams, Some(pmiBigramsSql)),
    "tokenizer_fertility" -> QueryDef(tokenizerFertility, Some(tokenizerFertilitySql)),
    "bpe_pair_counts"     -> QueryDef(bpePairCounts, Some(bpePairCountsSql)),
    "bpe_train"           -> QueryDef(bpeTrain, Some(bpeTrainSql)),
    "bpe_apply"           -> QueryDef(bpeApply, Some(bpeApplySql)),
    "corpus_report"       -> QueryDef(corpusReport, Some(corpusReportSql)),
    "contamination_check" -> QueryDef(contaminationCheck, Some(contaminationCheckSql)),
    "doc_pack_bins"       -> QueryDef(docPackBins, Some(docPackBinsSql)),
    "pack_fragmentation"  -> QueryDef(packFragmentation, Some(packFragmentationSql)),
    "bigram_topk"         -> QueryDef(bigramTopK, Some(bigramTopKSql)),
    "tfidf_topk"          -> QueryDef(tfidfTopK, Some(tfidfTopKSql)),
    "quality_filter"      -> QueryDef(qualityFilter, Some(qualityFilterSql)),
    "doc_len_percentiles" -> QueryDef(docLenPercentiles, Some(docLenPercentilesSql)))
}
