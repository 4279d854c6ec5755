package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Streaming per-cell last-writer-wins merge — the continuous form of
  * [[graft.operators.Cdc.cellLwwMerge]]: a change stream of cell writes
  * (one row per pk/column/writetime) folds into per-key state holding
  * each column's current winner under the Cassandra rule (greater
  * writetime wins, ties to the greater value). Because the rule is
  * commutative and associative, ANY arrival order and ANY micro-batch
  * split converge to the same state — the property the replicator's
  * at-least-once delivery relies on (replays are harmless), and the
  * property the spec proves against the batch reduction.
  *
  * State per key is one small map (columns of one row), checkpointed by
  * the engine; `mapGroupsWithState` emits the key's full merged row each
  * time any of its cells change (update output mode).
  */
object StreamingLww {

  final case class CellUpdate(pk: Long, cell: String, value: String,
                              writetime: Long)
  final case class CellOut(pk: Long, cell: String, value: String,
                           writetime: Long)

  /** (v, w) beats (uv, uw) under LWW: strictly newer, or same writetime
    * and ≥ value (the deterministic Cassandra tie-break). The stream
    * contract is null-free: a never-written cell simply has no update.
    */
  private def holds(v: String, w: Long, uv: String, uw: Long): Boolean =
    w > uw || (w == uw && v >= uv)

  def mergedCellStream(updates: Dataset[CellUpdate]): Dataset[CellOut] = {
    val spark = updates.sparkSession
    import spark.implicits._
    updates.groupByKey(_.pk)
      .mapGroupsWithState[Map[String, (String, Long)], Seq[CellOut]](
        GroupStateTimeout.NoTimeout) { (pk, it, state) =>
        var cells = state.getOption.getOrElse(Map.empty[String, (String, Long)])
        it.foreach { u =>
          val keep = cells.get(u.cell) match {
            case Some((v, w)) => holds(v, w, u.value, u.writetime)
            case None         => false
          }
          if (!keep) cells += (u.cell -> ((u.value, u.writetime)))
        }
        state.update(cells)
        cells.toSeq.sortBy(_._1)
          .map { case (c, (v, w)) => CellOut(pk, c, v, w) }
      }
      .flatMap(identity)
  }
}
