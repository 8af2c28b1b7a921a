package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of q70's funnel conversion (the batch form is the
  * sequential conditional-min join chain in operators/Relational.scala):
  * per-user O(1) state turns an unbounded event stream into funnel
  * PROGRESS rows — one emission whenever a user's (depth, tv, tc, tp)
  * tuple changes (plus a depth-0 baseline row when a user is first
  * seen, so the funnel population matches q70's `distinct user_id`
  * denominator). The latest row per user IS q70's row.
  *
  * Equivalence argument (pinned by StreamingFunnelSpec): q70 defines
  * tv = min view time, tc = min click time strictly after tv, tp = min
  * purchase time strictly after tc. Processing events in (ts, eventId)
  * order, the first view IS min-view; the first click with ms > tv is
  * the min such click (ties in ms store the same ms either way); same
  * for purchase — so an in-order fold reproduces the batch fixpoint
  * exactly, micro-batch boundaries invisible (state carries the
  * tuple). Strictness matters: a click at ms == tv is rejected by both
  * sides, whatever the within-tie processing order.
  *
  * Late data: an event at or before the stored last (ts, eventId) is
  * beyond the order contract and drops deterministically — a late
  * EARLIER view could retroactively validate an already-rejected
  * click, which no online operator can honor without reprocessing
  * (same stance as EventTransitions / the reference's no-watermark
  * segmentation, SURVEY.md §2 streaming notes).
  *
  * Scale: state is four longs + a seen flag per user; the per-batch
  * sort covers only that user's slice of the batch.
  * flatMapGroupsWithState rather than transformWithState so the SAME
  * code runs in batch mode for the parity spec.
  */
object StreamingFunnel {

  final case class Ev(userId: Long, ts: Long, eventId: Long,
      eventType: String)

  /** tv/tc/tp = 0 encodes "not reached" (event times are epoch ms,
    * never 0 in practice; an all-longs state keeps the encoder flat).
    */
  final case class FunnelState(tv: Long, tc: Long, tp: Long,
      lastTs: Long, lastId: Long)

  final case class Progress(userId: Long, depth: Long,
      tv: Long, tc: Long, tp: Long)

  private def depthOf(s: FunnelState): Long =
    if (s.tp != 0) 3L else if (s.tc != 0) 2L else if (s.tv != 0) 1L else 0L

  private[streaming] def groupFn(userId: Long, it: Iterator[Ev],
      state: GroupState[FunnelState]): Iterator[Progress] = {
    val ord = Ordering.Tuple2[Long, Long]
    val evs = it.toIndexedSeq.sortBy(e => (e.ts, e.eventId))(ord)
    val first = state.getOption.isEmpty
    var st = state.getOption.getOrElse(
      FunnelState(0L, 0L, 0L, Long.MinValue, Long.MinValue))
    val out = Seq.newBuilder[Progress]
    val kept = evs.filter(e =>
      ord.gt((e.ts, e.eventId), (st.lastTs, st.lastId)))
    if (kept.isEmpty) return Iterator.empty
    if (first)
      out += Progress(userId, 0L, 0L, 0L, 0L) // baseline: user entered
    kept.foreach { e =>
      val prev = st
      e.eventType match {
        case "view" if st.tv == 0 =>
          st = st.copy(tv = e.ts)
        case "click" if st.tc == 0 && st.tv != 0 && e.ts > st.tv =>
          st = st.copy(tc = e.ts)
        case "purchase" if st.tp == 0 && st.tc != 0 && e.ts > st.tc =>
          st = st.copy(tp = e.ts)
        case _ => ()
      }
      st = st.copy(lastTs = e.ts, lastId = e.eventId)
      if ((st.tv, st.tc, st.tp) != ((prev.tv, prev.tc, prev.tp)))
        out += Progress(userId, depthOf(st), st.tv, st.tc, st.tp)
    }
    state.update(st)
    out.result().iterator
  }

  /** Funnel-progress stream off an event stream (or, in batch mode,
    * one pass over a bounded Dataset — state spans the single
    * "batch").
    */
  def progress(events: Dataset[Ev]): Dataset[Progress] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(groupFn)
  }
}
