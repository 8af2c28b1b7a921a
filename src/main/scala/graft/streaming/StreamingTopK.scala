package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the custom TopKPerKey operator (graft.plans): a
  * per-key bounded top-k leaderboard maintained incrementally — after
  * ANY prefix of the stream, the state holds exactly what the batch
  * operator would compute over that prefix, so micro-batch boundaries
  * are invisible (pinned by StreamingTopKSpec against
  * `plans.TopK.perKey`). The reference's NMS confidence ranking
  * (`processor/YOLODetector.java:289-322`) is this shape online: keep
  * the k most confident detections per stream as frames arrive.
  *
  * Ordering matches q15 exactly: confidence DESC, then (frameId,
  * detId) ASC as the deterministic tiebreak — a total order, so the
  * leaderboard is replay-stable at any parallelism or batch split.
  *
  * Scale: state is a ≤ k-entry vector per key — O(k), the same bound
  * the batch operator's partial heaps put on each side of its
  * exchange; each batch merges the key's batch slice into it in
  * O((k + batch) log(k + batch)) local work, no shuffle beyond the
  * keyBy. Emission is the key's CURRENT leaderboard (update-mode
  * semantics: downstream replaces, never appends).
  * flatMapGroupsWithState rather than transformWithState so the SAME
  * group function runs in batch mode for the parity spec (the
  * EventTransitions precedent).
  */
object StreamingTopK {

  final case class Det(streamId: String, confidence: Double,
      frameId: Long, detId: Long)
  final case class Board(entries: List[Det])
  final case class Ranked(streamId: String, rn: Int, confidence: Double,
      frameId: Long, detId: Long)

  /** q15's total order: confidence DESC, (frameId, detId) ASC. */
  private val ord: Ordering[Det] =
    Ordering.by(d => (-d.confidence, d.frameId, d.detId))

  /** Merge a batch slice into the ≤ k-entry board — the incremental
    * step; associative over stream splits, which is WHY batch
    * boundaries cannot show in the output.
    */
  private[graft] def merge(k: Int, board: List[Det],
      batch: Seq[Det]): List[Det] =
    (board ++ batch).sorted(ord).take(k)

  private def groupFn(k: Int)(streamId: String, it: Iterator[Det],
      state: GroupState[Board]): Iterator[Ranked] = {
    val merged = merge(k, state.getOption.map(_.entries).getOrElse(Nil),
      it.toIndexedSeq)
    state.update(Board(merged))
    merged.iterator.zipWithIndex.map { case (d, i) =>
      Ranked(streamId, i + 1, d.confidence, d.frameId, d.detId)
    }
  }

  /** Current per-key leaderboard after each micro-batch (or, in batch
    * mode, after the single pass — state spans the one "batch").
    */
  def leaderboard(dets: Dataset[Det], k: Int = 3): Dataset[Ranked] = {
    import dets.sparkSession.implicits._
    dets.groupByKey(_.streamId)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(groupFn(k))
  }
}
