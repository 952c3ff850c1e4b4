package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming dimension maintenance: the ingest-side twin of the batch
  * SCD type-2 build (`operators.Pipeline.scd2History`). A warehouse
  * dimension doesn't get rebuilt from scratch per day at 100 TB — change
  * events stream in and the versioned history is MAINTAINED: per-key
  * state holds the open version, a change event closes it (emitting the
  * finished [valid_from, valid_to) row downstream) and opens the next.
  */
object DimStreams {

  /** A finished (closed) dimension version — emitted exactly when the
    * change that supersedes it arrives. Open versions live in state, not
    * in the output stream (they aren't final until closed); readers get
    * them from the dimension snapshot, not the change log.
    */
  final case class ClosedVersion(
      custkey: Long, attr: String, valid_from: String, valid_to: String)

  /** SCD-2 maintenance over a change stream of
    * `(custkey, dt, orderkey, attr)` rows via flatMapGroupsWithState.
    * State per key = the open version's (attr, valid_from) — two small
    * strings, bounded regardless of history length, because closed
    * versions are EMITTED, not retained. Within a micro-batch the
    * group's rows are processed in (dt, orderkey) order — the same total
    * order the batch build's windows use, so replaying the same change
    * log through any micro-batch slicing that respects time order yields
    * the batch history, closed row for closed row (DimStreamsSpec).
    * Same-attribute events collapse (no new version), exactly like the
    * batch lag-filter.
    */
  def scd2Stream(changes: DataFrame): Dataset[ClosedVersion] = {
    val spark = changes.sparkSession
    import spark.implicits._
    changes
      .selectExpr("custkey", "dt", "orderkey", "attr")
      .as[(Long, String, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: Long,
         rows: Iterator[(Long, String, Long, String)],
         state: GroupState[(String, String)]) => {
          val sorted = rows.toSeq.sortBy { case (_, dt, ok, _) => (dt, ok) }
          var cur = state.getOption
          val out = scala.collection.mutable.Buffer[ClosedVersion]()
          sorted.foreach { case (_, dt, _, attr) =>
            cur match {
              case Some((cattr, cfrom)) if cattr != attr =>
                out += ClosedVersion(key, cattr, cfrom, dt)
                cur = Some((attr, dt))
              case None =>
                cur = Some((attr, dt))
              case _ => () // unchanged attribute: no new version
            }
          }
          cur.foreach(state.update)
          out.iterator
        })
  }
}
