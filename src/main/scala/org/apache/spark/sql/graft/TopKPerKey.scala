package org.apache.spark.sql.graft

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.LongType

/** Custom whole-operator: per-key top-k with rank output.
  *
  * The DataFrame-API formulation — row_number() over
  * (partition by key order by o) followed by `rn <= k` — fully sorts
  * every partition by (key, o) and materializes the window before the
  * filter drops all but k rows per key. This operator keeps a bounded
  * heap of k rows per key instead: O(n log k) per partition, no sort, no
  * window buffer — the difference between "sort 100 TB" and "scan
  * 100 TB" for per-entity top-k queries (SURVEY.md §2.7's prefix-scan
  * generalization).
  *
  * Implemented as the full custom-operator stack (the (c) rung of the
  * extension ladder): logical node → planner strategy (injected via
  * GraftExtensions) → physical exec node whose
  * `requiredChildDistribution` lets EnsureRequirements insert the
  * single hash shuffle by key.
  *
  * Lives under org.apache.spark.sql to reach `Dataset.ofRows`
  * (private[sql]) — the standard extension-library placement.
  */
case class TopKPerKey(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: LogicalPlan)
  extends UnaryNode {
  require(k > 0, "k must be positive")
  // keys may be EMPTY: global top-k-with-rank. The strategy then plans a
  // per-partition partial heap (LocalTopKExec) below the single-partition
  // final, so the exchange moves ≤ k·numPartitions rows, never the input.
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr :: Nil)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: SparkPlan)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr :: Nil)

  /** One hash shuffle by key — EnsureRequirements inserts the exchange.
    * Empty keys = global top-k: a single-partition final whose child the
    * strategy has already reduced to ≤k rows per partition.
    */
  override def requiredChildDistribution: Seq[Distribution] =
    (if (keys.isEmpty) AllTuples else ClusteredDistribution(keys)) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs    = keys
    val sortOrder   = order
    val limit       = k
    val outAttrs    = output
    child.execute().mapPartitionsInternal { iter =>
      val keyGen  = UnsafeProjection.create(keyExprs, childOutput)
      val ord     = new LazilyGeneratedOrdering(sortOrder, childOutput)
      // max-heap w.r.t. the sort order: root = worst row currently kept
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val key  = keyGen(row)
        val heap = heaps.getOrElseUpdate(
          key.copy(), mutable.PriorityQueue.empty[InternalRow](ord))
        if (heap.size < limit) {
          heap.enqueue(row.copy())
        } else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.copy())
        }
      }
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val rankRow = new GenericInternalRow(1)
      val joined  = new JoinedRow
      // rank type follows the declared attribute: LongType from the
      // TopK.perKey API, IntegerType when standing in for row_number()
      // via the WindowTopKRewrite optimizer rule
      val rankIsInt = rankAttr.dataType == org.apache.spark.sql.types.IntegerType
      heaps.iterator.flatMap { case (_, heap) =>
        val ascending: IndexedSeq[InternalRow] =
          heap.dequeueAll[InternalRow].toIndexedSeq.reverse
        ascending.iterator.zipWithIndex.map { case (row, i) =>
          if (rankIsInt) rankRow.update(0, i + 1)
          else rankRow.update(0, (i + 1).toLong)
          outProj(joined(row, rankRow)).copy(): InternalRow
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Per-partition partial top-k: a bounded k-row heap per input partition,
  * no shuffle, no rank output (ranks are assigned by the single-partition
  * final TopKPerKeyExec above). This is the map-side combine of global
  * top-k — the exchange above it carries ≤ k·numPartitions rows instead
  * of the whole input.
  */
case class LocalTopKExec(order: Seq[SortOrder], k: Int, child: SparkPlan)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val sortOrder   = order
    val limit       = k
    child.execute().mapPartitionsInternal { iter =>
      val ord  = new LazilyGeneratedOrdering(sortOrder, childOutput)
      val heap = mutable.PriorityQueue.empty[InternalRow](ord)
      iter.foreach { row =>
        if (heap.size < limit) {
          heap.enqueue(row.copy())
        } else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.copy())
        }
      }
      heap.iterator
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): LocalTopKExec =
    copy(child = newChild)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, rankAttr, child) if keys.isEmpty =>
      // global top-k: partial heap per partition, then the k·p-row final
      TopKPerKeyExec(
        keys, order, k, rankAttr, LocalTopKExec(order, k, planLater(child))) :: Nil
    case TopKPerKey(keys, order, k, rankAttr, child) =>
      TopKPerKeyExec(keys, order, k, rankAttr, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Public API: `TopK.perKey(df, Seq("user_id"), Seq("ts" -> true), 5)`.
  * Keys/order are column names (order entries are (name, ascending)) —
  * resolved here against the analyzed child plan, since Spark 4's lazy
  * Column→Expression wrappers are not resolved by the analyzer inside
  * custom logical nodes.
  */
object TopK {
  def perKey(
      df: DataFrame,
      keyNames: Seq[String],
      orderOn: Seq[(String, Boolean)],
      k: Int,
      rankName: String = "rn"): DataFrame = {
    val classicDf =
      df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val analyzed = classicDf.queryExecution.analyzed
    val resolver = classicDf.sparkSession.sessionState.analyzer.resolver
    def attr(name: String): Attribute =
      analyzed
        .resolve(Seq(name), resolver)
        .getOrElse(throw new IllegalArgumentException(
          s"TopK.perKey: column '$name' not found in ${analyzed.output.map(_.name)}"))
        .toAttribute
    val keys  = keyNames.map(attr)
    val order = orderOn.map { case (name, asc) =>
      SortOrder(attr(name), if (asc) Ascending else Descending)
    }
    val rankAttr = AttributeReference(rankName, LongType, nullable = false)()
    // Defensive: callers may run in a session built without
    // GraftExtensions (e.g. the driver's own session) — the strategy is
    // also injectable at runtime via experimental.extraStrategies.
    val session = classicDf.sparkSession
    if (!session.experimental.extraStrategies.contains(TopKStrategy)) {
      session.experimental.extraStrategies =
        session.experimental.extraStrategies :+ TopKStrategy
    }
    org.apache.spark.sql.classic.Dataset.ofRows(
      session,
      TopKPerKey(keys, order, k, rankAttr, analyzed))
  }
}
