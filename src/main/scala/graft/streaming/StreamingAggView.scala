package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Continuous aggregate-view maintenance — the streaming face of
  * [[graft.operators.Cdc.aggViewMaintain]]: the change feed's per-group
  * contributions (±value, ±1 row) fold into per-group running state.
  * Values travel as SCALED LONGS (micros), so the state update is pure
  * integer addition — commutative and associative, which makes ANY
  * micro-batch split and any at-least-once replay-free arrival order
  * converge to the batch aggregate (the same argument as
  * [[StreamingLww]], spec-proven). State per group is two longs; the
  * engine checkpoints it.
  */
object StreamingAggView {

  /** One change-feed contribution: a base-table write adds (+v, +1) to
    * its new group and (−v, −1) to its old one — exactly the rows
    * `Cdc.aggViewMaintain`'s contribution explode emits.
    */
  final case class GroupDelta(g: Long, dvMicros: Long, dn: Long)

  /** The maintained view row for a group, emitted whenever the group's
    * state changes (update output mode). A group whose count returns to
    * zero emits (g, 0, 0) — the tombstone the sink uses to drop the row.
    */
  final case class GroupView(g: Long, n: Long, sumMicros: Long)

  def viewStream(deltas: Dataset[GroupDelta]): Dataset[GroupView] = {
    val spark = deltas.sparkSession
    import spark.implicits._
    deltas.groupByKey(_.g)
      .mapGroupsWithState[(Long, Long), GroupView](
        GroupStateTimeout.NoTimeout) { (g, it, state) =>
        var (n, s) = state.getOption.getOrElse((0L, 0L))
        it.foreach { d => n += d.dn; s += d.dvMicros }
        // A drained group (count back to zero) emits its tombstone and
        // DROPS its state entry — long-lived streams would otherwise
        // accumulate (0, 0) state for every group that ever existed.
        // Re-insertion recreates the state from the zero default.
        // Well-formed feeds hold n == 0 ⇒ s == 0 (every contribution
        // pairs ±v with ±1); the s check makes that an invariant the
        // cleanup cannot violate — an inconsistent feed keeps its
        // residual sum in state instead of silently discarding it.
        if (n == 0L && s == 0L) state.remove() else state.update((n, s))
        GroupView(g, n, s)
      }
  }
}
