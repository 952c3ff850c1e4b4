package graft

import graft.multimodal.Multimodal
import graft.operators.{Dedup, Graph}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraphMediaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pagerank_parts: ranks positive, bounded below by teleport, deterministic") {
    val out = Graph.pagerankParts(spark, TestSpark.Sf).collect()
    assert(out.nonEmpty && out.length <= 50)
    out.foreach(r => assert(r.getDouble(1) >= 0.15 - 1e-9))
    val ranks = out.map(_.getDouble(1)).toSeq
    assert(ranks === ranks.sorted.reverse)
    val again = Graph.pagerankParts(spark, TestSpark.Sf).collect()
    assert(out.toSeq === again.toSeq, "fixed-iteration PageRank must be deterministic")
  }

  test("embedding_clusters: every LSH pair lands in one cluster, canonical id is min") {
    val clusters = Graph.embeddingClusters(spark, TestSpark.Sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = graft.operators.Similarity
      .embeddingNeardupLsh(spark, TestSpark.Sf)
      .filter(col("cos") >= 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty && clusters.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(clusters(a) === clusters(b), s"pair ($a,$b) split across clusters")
    }
    clusters.groupBy(_._2).foreach { case (label, members) =>
      assert(label === members.keys.min, "cluster id must be the minimum member")
    }
  }

  test("dedup_editdist: similar pairs really are close in edit space") {
    val rows = Dedup.dedupEditdist(spark, TestSpark.Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0.6)               // candidates came from jaccard >= 0.6
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
      assert(r.getLong(3) >= 0)
    }
    // near-dup pairs at jaccard >= 0.6 should be far more similar than
    // a random pair of documents
    assert(rows.map(_.getDouble(4)).min > 0.3)
  }

  test("minhash-based clusters agree with exact-jaccard clusters on the fixture") {
    val exact = Dedup.dedupClusters(spark, TestSpark.Sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sketch = Dedup.dedupClustersMinhash(spark, TestSpark.Sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every exact-jaccard near-dup pair should co-cluster in the sketch
    // graph for at least 80% of pairs (minhash recall)
    val pairs = Dedup.dedupJaccard(spark, TestSpark.Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val agree = pairs.count { case (a, b) =>
      sketch.get(a).zip(sketch.get(b)).exists { case (x, y) => x == y }
    }
    assert(agree.toDouble / pairs.length >= 0.8,
      s"minhash clusters recall ${agree.toDouble / pairs.length}")
    assert(exact.nonEmpty && sketch.nonEmpty)
  }

  test("graph_degree_stats: histogram partitions the node set, shares sum to 1") {
    val rows = graft.operators.Graph.graphDegreeStats(spark, TestSpark.Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) >= 1L, s"degree 0 node in an edge-derived graph: $r")
      assert(r.getLong(3) >= r.getLong(0) * r.getLong(1),
        s"strength below degree floor (every edge weighs >= 1... pruned >= 2): $r")
    }
    val shares = rows.map(_.getDouble(2)).sum
    assert(math.abs(shares - 1.0) < 1e-3, s"shares sum to $shares")
    // histogram node total == distinct nodes in the pruned edge list
    val pairs = graft.operators.Commerce
      .pairCounts(Tables.lineitem(spark, TestSpark.Sf)
        .select($"l_orderkey", $"l_partkey"))
      .filter($"pair_count" >= 2)
    val nNodes = pairs.select($"part_x".as("n"))
      .unionAll(pairs.select($"part_y".as("n"))).distinct().count()
    assert(rows.map(_.getLong(1)).sum === nNodes)
  }

  test("media_manifest: blob accounting consistent with the documents table") {
    val rows = Multimodal.mediaManifest(spark, TestSpark.Sf).collect()
    val docs = Tables.documents(spark, TestSpark.Sf)
    assert(rows.map(_.getLong(1)).sum === docs.count())
    val utf8Bytes = docs
      .select(length(encode($"text", "UTF-8")).cast("long").as("b"))
      .agg(sum($"b")).collect().head.getLong(0)
    assert(rows.map(_.getLong(3)).sum === utf8Bytes)
    rows.foreach(r => assert(r.getLong(2) <= r.getLong(1)))
  }
}
