package graft.operators

import graft.model.EngineConfig
import graft.streaming.{FrameGenerator, VideoPipeline}
import org.apache.spark.sql.functions._

/** The full video pipeline exposed as batch queries over the seeded
  * synthetic frame stream (the reference's de-facto harness is its mock
  * producer — SURVEY.md §5). Rows-only checks (stateful fold has no
  * ANSI-SQL twin); exact semantics are unit-tested against hand-
  * computed folds in VideoPipelineSpec.
  *
  * 3 streams × 25 fps × 400 s = 30 000 frames → per stream: 2 full
  * 3-minute segments + keyframes from both rules.
  */
object Pipeline {

  private def events(s: org.apache.spark.sql.SparkSession) =
    VideoPipeline.process(
      FrameGenerator.framesDs(s, streams = 3, fps = 25, durationSec = 400),
      EngineConfig())

  val defs: Seq[QueryDef] = Seq(

    QueryDef("q20_pipeline_detections",
      (s, dir) => VideoPipeline.dorisRows(events(s))
        .orderBy(col("stream_id"), col("frame_id"), col("object_class"),
          col("confidence")),
      None),

    QueryDef("q21_pipeline_segments",
      (s, dir) => VideoPipeline.segmentRows(events(s))
        .orderBy(col("stream_id"), col("start_time")),
      None),

    QueryDef("q22_pipeline_stats",
      (s, dir) => events(s).toDF()
        .groupBy(col("streamId").as("stream_id"), col("kind"))
        .agg(count(lit(1)).as("n"),
          min(col("timestamp")).as("min_ts"),
          max(col("timestamp")).as("max_ts"))
        .orderBy(col("stream_id"), col("kind")),
      None),

    // ── Q23: keyframe-extraction rate per stream — the reference's
    // runtime counters (totalFramesProcessed / keyFramesExtracted
    // ratio, function/VideoProcessFunction.java:49-51,133-138) as a
    // relational metric: detections (= keyframes) joined against the
    // generated frame counts.
    QueryDef("q23_pipeline_rates",
      (s, dir) => {
        val frames = FrameGenerator
          .framesDs(s, streams = 3, fps = 25, durationSec = 400).toDF()
          .groupBy(col("streamId").as("stream_id"))
          .agg(count(lit(1)).as("total_frames"))
        val keys = events(s).toDF()
          .filter(col("kind") === "detection")
          .groupBy(col("streamId").as("stream_id"))
          .agg(count(lit(1)).as("key_frames"))
        frames.join(keys, "stream_id")
          .select(col("stream_id"), col("total_frames"), col("key_frames"),
            round(col("key_frames").cast("double") / col("total_frames"), 6)
              .as("keyframe_rate"))
          .orderBy(col("stream_id"))
      },
      None))
}
