package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of q106's event-transition mining (the batch form is
  * a `lead` window in operators/Relational.scala): per-user last-event
  * state turns an unbounded event stream into (cur → next) transition
  * rows as they happen — the online feed of the Markov next-action
  * model the batch query snapshots.
  *
  * Semantics, pinned by EventTransitionsSpec against the batch window:
  *  - within a micro-batch, a user's events order by (ts, eventId) —
  *    the same total order the batch `lead` uses, so batch boundaries
  *    are invisible in the output (the cross-batch transition comes
  *    from state);
  *  - an event at or before the stored last (ts, eventId) is LATE
  *    beyond the operator's order contract and is dropped — the batch
  *    twin would have woven it into the middle of the sequence, which
  *    no online operator can do without reprocessing; dropping is the
  *    deterministic, documented choice (same stance as the reference's
  *    no-watermark segmentation, SURVEY.md §2 streaming notes).
  *
  * Scale: state is ONE (ts, eventId, eventType) triple per user —
  * O(1), the smallest possible sequence memory — and the per-batch
  * sort is over that user's slice of the batch only, never the
  * history. flatMapGroupsWithState rather than transformWithState so
  * the SAME code runs in batch mode for the parity spec.
  */
object EventTransitions {

  final case class Ev(userId: Long, ts: Long, eventId: Long,
      eventType: String)
  final case class LastEv(ts: Long, eventId: Long, eventType: String)
  final case class Transition(userId: Long, cur: String, nxt: String)

  private def keyOf(ts: Long, id: Long): (Long, Long) = (ts, id)

  private[streaming] def groupFn(userId: Long, it: Iterator[Ev],
      state: GroupState[LastEv]): Iterator[Transition] = {
    val ord = Ordering.Tuple2[Long, Long]
    val evs = it.toIndexedSeq.sortBy(e => keyOf(e.ts, e.eventId))(ord)
    val last = state.getOption
    val kept = evs.filter(e => last.forall(l =>
      ord.gt(keyOf(e.ts, e.eventId), keyOf(l.ts, l.eventId))))
    if (kept.isEmpty) return Iterator.empty
    val chain = last.map(_.eventType).toSeq ++ kept.map(_.eventType)
    state.update(LastEv(kept.last.ts, kept.last.eventId,
      kept.last.eventType))
    chain.sliding(2).collect {
      case Seq(a, b) => Transition(userId, a, b)
    }
  }

  /** Transition stream off an event stream (or, in batch mode, one
    * pass over a bounded Dataset — state spans the single "batch").
    */
  def transitions(events: Dataset[Ev]): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(groupFn)
  }
}
