package graft.config

import java.io.{FileInputStream, InputStream, StringReader}
import java.util.Properties

import graft.model.EngineConfig

/** Connector/deployment settings from the reference's properties
  * surface that sit OUTSIDE the processing engine proper (reference
  * config/VideoStreamConfig.java:20-63 + application.properties:1-44):
  * Kafka endpoints, Doris target table, object-store selection, and
  * the RTSP/codec transcode knobs. Kept separate from [[EngineConfig]]
  * (the per-frame processing thresholds) so the fold closure
  * serialized to executors never drags endpoint strings along.
  *
  * Credentials (doris.password, *.access.key.secret) are deliberately
  * NOT modeled: the Spark-native deployments these map to (Kafka SASL,
  * S3A, JDBC) source secrets from their own providers, and a config
  * case class that round-trips passwords through logs/toString is a
  * liability. Defaults mirror the reference's own fallback literals.
  */
final case class ConnectorConfig(
    kafkaBootstrapServers: String = "localhost:9092",
    kafkaTopic: String = "video-stream-topic",
    kafkaGroupId: String = "video-processing-group",
    dorisFenodes: String = "localhost:8030",
    dorisDatabase: String = "video_analytics",
    dorisTable: String = "video_detections",
    dorisUsername: String = "root",
    storageType: String = "oss", // "oss" | "minio"
    ossEndpoint: String = "http://oss-cn-hangzhou.aliyuncs.com",
    ossBucket: String = "video-storage",
    minioEndpoint: String = "http://localhost:9000",
    minioBucket: String = "video-storage",
    minioSecure: Boolean = false,
    videoStreamProtocol: String = "rtsp",
    rtspTransport: String = "tcp",
    rtspTimeoutSec: Int = 30,
    videoCodec: String = "libx264",
    pixelFormat: String = "yuv420p",
    videoBitrateKbps: Int = 2048,
    yoloModelPath: String = "models/yolov8n.onnx")

final case class LoadedConfig(engine: EngineConfig,
    connectors: ConnectorConfig)

/** `application.properties` → config loader honoring the reference's
  * documented key surface (config/VideoStreamConfig.java:68-151):
  * same keys, same defaults, same "malformed value fails the load"
  * contract (the reference wraps parse errors in a RuntimeException).
  *
  * Engine-only extension keys (not in the reference, which hardcodes
  * these in the operators): `graft.similarity.threshold` (scene-change
  * histogram cut, KeyFrameDetector's 0.7) and `graft.iou.threshold`
  * (NMS IoU, YOLODetector's 0.45).
  */
object EngineConfigLoader {

  val ResourceName = "application.properties"

  def fromProperties(props: Properties): LoadedConfig = {
    def str(k: String, d: String) = props.getProperty(k, d)
    def num[T](k: String, d: String, parse: String => T): T = {
      val raw = props.getProperty(k, d)
      try parse(raw.trim)
      catch {
        // toBoolean throws a bare IllegalArgumentException (not a
        // NumberFormatException); catch both so every malformed value
        // fails with the key-naming contract documented above
        case e: IllegalArgumentException =>
          throw new IllegalArgumentException(
            s"Failed to load configuration: bad value '$raw' for key '$k'", e)
      }
    }
    val engine = EngineConfig(
      segmentDurationMs = num("video.segment.duration", "180000", _.toLong),
      keyframeMinIntervalMs = num("keyframe.min.interval", "5000", _.toLong),
      similarityThreshold = num("graft.similarity.threshold", "0.7", _.toDouble),
      confidenceThreshold = num("yolo.confidence.threshold", "0.5", _.toDouble),
      iouThreshold = num("graft.iou.threshold", "0.45", _.toDouble),
      frameRate = num("framerate", "25", _.toInt))
    val connectors = ConnectorConfig(
      kafkaBootstrapServers = str("kafka.bootstrap.servers", "localhost:9092"),
      kafkaTopic = str("kafka.topic", "video-stream-topic"),
      kafkaGroupId = str("kafka.group.id", "video-processing-group"),
      dorisFenodes = str("doris.fenodes", "localhost:8030"),
      dorisDatabase = str("doris.database", "video_analytics"),
      dorisTable = str("doris.table", "video_detections"),
      dorisUsername = str("doris.username", "root"),
      storageType = str("storage.type", "oss").toLowerCase,
      ossEndpoint = str("oss.endpoint", "http://oss-cn-hangzhou.aliyuncs.com"),
      ossBucket = str("oss.bucket", "video-storage"),
      minioEndpoint = str("minio.endpoint", "http://localhost:9000"),
      minioBucket = str("minio.bucket", "video-storage"),
      minioSecure = num("minio.secure", "false", _.toBoolean),
      videoStreamProtocol = str("video.stream.protocol", "rtsp"),
      rtspTransport = str("rtsp.transport", "tcp"),
      rtspTimeoutSec = num("rtsp.timeout", "30", _.toInt),
      videoCodec = str("video.codec", "libx264"),
      pixelFormat = str("pixel.format", "yuv420p"),
      videoBitrateKbps = num("video.bitrate", "2048", _.toInt),
      yoloModelPath = str("yolo.model.path", "models/yolov8n.onnx"))
    require(connectors.storageType == "oss" || connectors.storageType == "minio",
      s"storage.type must be 'oss' or 'minio', got '${connectors.storageType}'")
    LoadedConfig(engine, connectors)
  }

  /** Parse a properties-format string (tests, inline config). */
  def fromString(content: String): LoadedConfig = {
    val props = new Properties()
    props.load(new StringReader(content))
    fromProperties(props)
  }

  def fromFile(path: String): LoadedConfig = {
    val in = new FileInputStream(path)
    try fromStream(in) finally in.close()
  }

  /** Classpath route, mirroring the reference's loadConfig(): a missing
    * resource yields ALL defaults (the reference warns and returns the
    * empty config object — here "empty" and "defaults" coincide because
    * defaults live in the loader, not scattered over operators).
    */
  def fromClasspath(resource: String = ResourceName): LoadedConfig =
    Option(getClass.getClassLoader.getResourceAsStream(resource)) match {
      case Some(in) => try fromStream(in) finally in.close()
      case None     => LoadedConfig(EngineConfig(), ConnectorConfig())
    }

  private def fromStream(in: InputStream): LoadedConfig = {
    val props = new Properties()
    props.load(in)
    fromProperties(props)
  }
}
