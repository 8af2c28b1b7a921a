package graft

import graft.config.{ConnectorConfig, EngineConfigLoader}
import graft.model.EngineConfig
import graft.streaming.{FrameGenerator, VideoPipeline}
import org.scalatest.funsuite.AnyFunSuite

/** Properties-file config loading against the reference's documented
  * key surface (config/VideoStreamConfig.java:68-151), and the loaded
  * values actually driving the processFrames thresholds.
  */
class ConfigLoaderSpec extends AnyFunSuite {

  test("reference keys map onto EngineConfig") {
    val cfg = EngineConfigLoader.fromString(
      """video.segment.duration=60000
        |keyframe.min.interval=2000
        |yolo.confidence.threshold=0.8
        |framerate=30
        |graft.similarity.threshold=0.5
        |graft.iou.threshold=0.3
        |""".stripMargin)
    assert(cfg.engine === EngineConfig(
      segmentDurationMs = 60000L, keyframeMinIntervalMs = 2000L,
      similarityThreshold = 0.5, confidenceThreshold = 0.8,
      iouThreshold = 0.3, frameRate = 30))
  }

  test("missing keys fall back to the reference's defaults") {
    val cfg = EngineConfigLoader.fromString("kafka.topic=my-topic\n")
    assert(cfg.engine === EngineConfig()) // 180000/5000/0.7/0.5/0.45/25
    assert(cfg.connectors.kafkaTopic === "my-topic")
    assert(cfg.connectors === ConnectorConfig(kafkaTopic = "my-topic"))
  }

  test("connector keys map, storage type normalized to lowercase") {
    val cfg = EngineConfigLoader.fromString(
      """kafka.bootstrap.servers=broker1:9092,broker2:9092
        |doris.database=analytics
        |doris.table=detections
        |storage.type=MinIO
        |minio.endpoint=http://minio:9000
        |minio.secure=true
        |rtsp.timeout=60
        |video.bitrate=4096
        |""".stripMargin)
    val c = cfg.connectors
    assert(c.kafkaBootstrapServers === "broker1:9092,broker2:9092")
    assert(c.dorisDatabase === "analytics" && c.dorisTable === "detections")
    assert(c.storageType === "minio" && c.minioSecure)
    assert(c.rtspTimeoutSec === 60 && c.videoBitrateKbps === 4096)
  }

  test("malformed numeric value fails the load, naming the key") {
    val e = intercept[IllegalArgumentException] {
      EngineConfigLoader.fromString("video.segment.duration=three-minutes\n")
    }
    assert(e.getMessage.contains("video.segment.duration"))
    intercept[IllegalArgumentException] {
      EngineConfigLoader.fromString("storage.type=hdfs\n")
    }
  }

  test("missing classpath resource yields all defaults") {
    val cfg = EngineConfigLoader.fromClasspath("no_such_resource.properties")
    assert(cfg.engine === EngineConfig())
    assert(cfg.connectors === ConnectorConfig())
  }

  test("loaded thresholds drive processFrames behavior") {
    val frames = FrameGenerator.frames(streams = 1, fps = 5, durationSec = 600)
    def run(cfg: EngineConfig) = VideoPipeline.processFrames(
      frames.head.streamId, frames, VideoPipeline.initialState, cfg,
      VideoPipeline.defaultDetector(cfg))._1

    // shorter segment duration → more segment flushes
    val shortSeg = EngineConfigLoader.fromString(
      "video.segment.duration=30000\n").engine
    val longSeg = EngineConfigLoader.fromString(
      "video.segment.duration=300000\n").engine
    def nSegs(cfg: EngineConfig) = run(cfg).count(_.kind == "segment")
    assert(nSegs(shortSeg) > nSegs(longSeg))

    // higher confidence threshold → fewer surviving detections
    val loose = EngineConfigLoader.fromString(
      "yolo.confidence.threshold=0.25\n").engine
    val strict = EngineConfigLoader.fromString(
      "yolo.confidence.threshold=0.9\n").engine
    def nDets(cfg: EngineConfig) =
      run(cfg).filter(_.kind == "detection").map(_.detections.size).sum
    assert(nDets(loose) > nDets(strict))

    // longer keyframe interval (with scene rule off) → fewer keyframes
    val fewKeys = EngineConfigLoader.fromString(
      "keyframe.min.interval=60000\ngraft.similarity.threshold=0.0\n").engine
    val manyKeys = EngineConfigLoader.fromString(
      "keyframe.min.interval=1000\ngraft.similarity.threshold=0.0\n").engine
    def nKeyframes(cfg: EngineConfig) = run(cfg).count(_.kind == "detection")
    assert(nKeyframes(manyKeys) > nKeyframes(fewKeys))
  }
}
