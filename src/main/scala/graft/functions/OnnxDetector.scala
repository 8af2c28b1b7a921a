package graft.functions

import java.nio.FloatBuffer
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import graft.model.{Detection, EngineConfig, VideoFrame}

/** Inference backend behind the detector: runs the model on one
  * [1, 3, 640, 640] CHW float tensor and returns the raw YOLOv8 output
  * laid out [84, n] row-major plus the anchor count n. Decoupled from
  * ONNX Runtime so unit tests can mock the session and so the adapter
  * compiles with no ONNX jars on the classpath.
  */
trait InferenceSession extends AutoCloseable {
  def run(input: Array[Float]): (Array[Float], Int)
  override def close(): Unit = ()
}

/** Optional ONNX Runtime adapter behind the engine's pluggable
  * `VideoFrame => Seq[Detection]` detector signature, mirroring the
  * reference's session lifecycle (processor/YOLODetector.java:54-96):
  * ONE session per model per JVM (the reference holds one per operator
  * instance; per-executor-JVM is the Spark-native equivalent since
  * tasks of all cores share the JVM), initialized lazily on first use,
  * inference lock-serialized (ONNX sessions are not thread-safe for
  * concurrent run() with shared IO binding; the reference guards with
  * `synchronized (lock)`), 2 intra-op threads, BASIC_OPT.
  *
  * Classpath-guarded: the real backend loads `ai.onnxruntime.*`
  * REFLECTIVELY (this build has no ONNX jars, and the reference ships
  * no model blobs — .MISSING_LARGE_BLOBS:1-2), so
  * [[OnnxDetector.orSynthetic]] degrades to the deterministic synthetic
  * detector whenever the runtime or the model file is absent.
  *
  * Sessions live for the executor JVM (the reference never closes its
  * transient session either); [[OnnxDetector.reset]] exists for tests.
  */
object OnnxDetector {

  val InputSize = 640
  val ModelInputName = "images" // reference YOLODetector.java:133

  /** True when ONNX Runtime is on the classpath. */
  def runtimeAvailable: Boolean =
    try { Class.forName("ai.onnxruntime.OrtEnvironment"); true }
    catch { case _: ClassNotFoundException => false }

  /** Per-JVM session registry keyed by model path: lazy init-once via
    * computeIfAbsent, one lock per session for serialized inference.
    */
  private final class Handle(val session: InferenceSession) {
    val lock = new Object
  }
  private val sessions = new ConcurrentHashMap[String, Handle]()
  private val initCounter = new AtomicInteger(0)

  /** How many sessions this JVM has created (test observability). */
  def sessionInitCount: Int = initCounter.get()

  /** Drop all cached sessions (tests only). */
  def reset(): Unit = {
    sessions.forEach((_, h) => h.session.close())
    sessions.clear()
    initCounter.set(0)
  }

  /** Deterministic stand-in for decode → resize(640x640) → CHW float
    * conversion (reference ImageUtils.java:41-74 via OpenCV — no image
    * codec exists in this build, so the pixel values are a STUB: a
    * repeating normalized byte pattern with the REAL tensor shape and
    * layout, which is what the Spark-side plumbing needs to be honest
    * about).
    */
  def frameToTensor(frameData: Array[Byte]): Array[Float] = {
    val out = new Array[Float](3 * InputSize * InputSize)
    if (frameData != null && frameData.length > 0) {
      var i = 0
      while (i < out.length) {
        out(i) = (frameData(i % frameData.length) & 0xff) / 255.0f
        i += 1
      }
    }
    out
  }

  /** The detector function: lazy per-JVM session via `factory`, then
    * preprocess → lock-serialized run → the shared decode/NMS kernel
    * ([[DetectionKernels.decodeOutput]], parity with
    * YOLODetector.java:234-336). The returned closure is serializable
    * (captures only the model path, thresholds, and the factory).
    */
  def detector(modelPath: String, confThreshold: Float, iouThreshold: Float,
      factory: SessionFactory = ReflectiveOrtSession.factory)
      : VideoFrame => Seq[Detection] = { f =>
    if (f.frameData == null || f.frameData.isEmpty) Seq.empty
    else {
      val h = sessions.computeIfAbsent(modelPath, { p =>
        initCounter.incrementAndGet()
        new Handle(factory(p))
      })
      val input = frameToTensor(f.frameData)
      val (raw, n) = h.lock.synchronized(h.session.run(input))
      val (w, ht) =
        if (f.metadata != null) (f.metadata.width, f.metadata.height)
        else (1920, 1080)
      DetectionKernels.decodeOutput(raw, n, w, ht, confThreshold, iouThreshold)
    }
  }

  /** Deployment entry point: the ONNX path when both the runtime and
    * the model file exist, otherwise the synthetic default — same
    * signature either way, so pipelines are indifferent to which
    * backend they got.
    */
  def orSynthetic(cfg: EngineConfig, modelPath: String)
      : VideoFrame => Seq[Detection] =
    if (runtimeAvailable && new java.io.File(modelPath).isFile)
      detector(modelPath, cfg.confidenceThreshold.toFloat,
        cfg.iouThreshold.toFloat)
    else
      graft.streaming.VideoPipeline.defaultDetector(cfg)
}

/** Serializable session-factory SAM (ships inside the detector closure
  * to executors; reflection happens executor-side on first frame).
  */
trait SessionFactory extends (String => InferenceSession) with Serializable

/** The real backend, built purely via reflection so the engine has no
  * compile-time ONNX dependency. Mirrors YOLODetector.java:68-96:
  * OrtEnvironment.getEnvironment(), SessionOptions with 2 intra-op
  * threads and BASIC_OPT, createSession(modelPath), run("images" ->
  * tensor), output extracted as float[1][84][n] (deep-copied out of
  * ONNX-owned memory before the Result closes, YOLODetector.java:177-206).
  */
final class ReflectiveOrtSession(modelPath: String) extends InferenceSession {
  private val envClass = Class.forName("ai.onnxruntime.OrtEnvironment")
  private val sessClass = Class.forName("ai.onnxruntime.OrtSession")
  private val optsClass = Class.forName("ai.onnxruntime.OrtSession$SessionOptions")
  private val tensorClass = Class.forName("ai.onnxruntime.OnnxTensor")

  private val env = envClass.getMethod("getEnvironment").invoke(null)
  private val session = {
    val opts = optsClass.getConstructor().newInstance()
      .asInstanceOf[AnyRef]
    optsClass.getMethod("setIntraOpNumThreads", classOf[Int])
      .invoke(opts, Integer.valueOf(2))
    val optLevel = Class.forName(
      "ai.onnxruntime.OrtSession$SessionOptions$OptLevel")
    optsClass.getMethod("setOptimizationLevel", optLevel)
      .invoke(opts, optLevel.getMethod("valueOf", classOf[String])
        .invoke(null, "BASIC_OPT"))
    envClass.getMethod("createSession", classOf[String], optsClass)
      .invoke(env, modelPath, opts)
  }

  override def run(input: Array[Float]): (Array[Float], Int) = {
    val shape = Array(1L, 3L, OnnxDetector.InputSize.toLong,
      OnnxDetector.InputSize.toLong)
    val tensor = tensorClass.getMethod("createTensor", envClass,
        classOf[FloatBuffer], classOf[Array[Long]])
      .invoke(null, env, FloatBuffer.wrap(input), shape)
    try {
      val results = sessClass.getMethod("run", classOf[java.util.Map[_, _]])
        .invoke(session,
          java.util.Collections.singletonMap(OnnxDetector.ModelInputName, tensor))
      try {
        val first = results.getClass.getMethod("get", classOf[Int])
          .invoke(results, Integer.valueOf(0))
        val value = first.getClass.getMethod("getValue").invoke(first)
        flatten(value)
      } finally results.asInstanceOf[AutoCloseable].close()
    } finally tensor.asInstanceOf[AutoCloseable].close()
  }

  /** float[1][84][n] (or float[84][n]) → ([84*n] row-major, n). */
  private def flatten(value: AnyRef): (Array[Float], Int) = {
    val m2 = value match {
      case a: Array[Array[Array[Float]]] if a.nonEmpty => a(0)
      case a: Array[Array[Float]] => a
      case other => throw new IllegalStateException(
        s"unexpected ONNX output type: ${other.getClass.getSimpleName}")
    }
    val rows = m2.length
    val n = if (rows == 0) 0 else m2(0).length
    val flat = new Array[Float](rows * n)
    var j = 0
    while (j < rows) {
      System.arraycopy(m2(j), 0, flat, j * n, n)
      j += 1
    }
    (flat, n)
  }

  override def close(): Unit =
    session.asInstanceOf[AutoCloseable].close()
}

object ReflectiveOrtSession {
  val factory: SessionFactory = new SessionFactory {
    override def apply(p: String): InferenceSession =
      new ReflectiveOrtSession(p)
  }
}
