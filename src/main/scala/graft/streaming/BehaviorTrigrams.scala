package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of q141's behavioral-trigram mining (the batch form
  * is a double `lead` window in operators/Relational.scala):
  * per-user last-TWO-events state turns an unbounded event stream into
  * (a, b, c) 3-step sequence rows as each third step lands — the
  * online feed of the order-3 pattern table the batch query snapshots
  * (EventTransitions is the same machine one order down).
  *
  * Semantics, pinned by BehaviorTrigramsSpec against the batch window:
  *  - within a micro-batch, a user's events order by (ts, eventId) —
  *    the same total order the batch leads use, so micro-batch
  *    boundaries are invisible (the cross-batch trigrams come from the
  *    two-event state);
  *  - an event at or before the stored last (ts, eventId) is LATE
  *    beyond the operator's order contract and drops deterministically
  *    (the EventTransitions stance — weaving it into the middle of an
  *    already-emitted sequence would require reprocessing);
  *  - NULL event types normalize to "" BEFORE entering the state, the
  *    q141 batch convention.
  *
  * Scale: state is TWO (ts, eventId, eventType) triples per user —
  * O(1); the per-batch sort covers only that user's slice of the
  * batch. flatMapGroupsWithState rather than transformWithState so the
  * SAME code runs in batch mode for the parity spec.
  */
object BehaviorTrigrams {

  final case class Ev(userId: Long, ts: Long, eventId: Long,
      eventType: String)

  /** Last two events; `ts2` is the newer one. A user seen fewer than
    * twice carries sentinel Long.MinValue rows (never matched by real
    * events, whose ts are epoch ms).
    */
  final case class Last2(ts1: Long, id1: Long, et1: String,
      ts2: Long, id2: Long, et2: String)

  final case class Trigram(userId: Long, a: String, b: String, c: String)

  private val none = (Long.MinValue, Long.MinValue, null: String)

  private[streaming] def groupFn(userId: Long, it: Iterator[Ev],
      state: GroupState[Last2]): Iterator[Trigram] = {
    val ord = Ordering.Tuple2[Long, Long]
    val evs = it.toIndexedSeq.sortBy(e => (e.ts, e.eventId))(ord)
    val st = state.getOption.getOrElse(
      Last2(none._1, none._2, none._3, none._1, none._2, none._3))
    val kept = evs.filter(e => ord.gt((e.ts, e.eventId), (st.ts2, st.id2)))
    if (kept.isEmpty) return Iterator.empty
    val norm = kept.map(e => (e.ts, e.eventId,
      Option(e.eventType).getOrElse("")))
    val chain = Seq((st.ts1, st.id1, st.et1), (st.ts2, st.id2, st.et2))
      .filter(_._3 != null) ++ norm
    val (t1, i1, e1) = if (chain.size >= 2) chain(chain.size - 2) else none
    val (t2, i2, e2) = chain.last
    state.update(Last2(t1, i1, e1, t2, i2, e2))
    chain.sliding(3).collect {
      case Seq((_, _, a), (_, _, b), (_, _, c)) => Trigram(userId, a, b, c)
    }
  }

  /** Trigram stream off an event stream (or, in batch mode, one pass
    * over a bounded Dataset — state spans the single "batch").
    */
  def trigrams(events: Dataset[Ev]): Dataset[Trigram] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(groupFn)
  }
}
