package graft

import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}

import graft.functions.{DetectionKernels, InferenceSession, OnnxDetector, SessionFactory}
import graft.model.{EngineConfig, FrameMetadata, VideoFrame}
import graft.streaming.{FrameGenerator, VideoPipeline}
import org.scalatest.funsuite.AnyFunSuite

/** The ONNX adapter's session lifecycle (lazy init-once per JVM,
  * lock-serialized inference, classpath-guarded fallback) with a mocked
  * backend — the real runtime and model blobs are absent from this
  * build and from the reference (.MISSING_LARGE_BLOBS).
  */
class OnnxDetectorSpec extends AnyFunSuite {

  private val N = 3 // anchors in the mocked output

  /** [84, N] row-major YOLOv8-layout output: anchor 0 = a confident
    * "car" at (320,320) 64x48; anchor 1 = sub-threshold noise;
    * anchor 2 = a slightly-shifted duplicate of anchor 0 that NMS must
    * suppress (IoU > 0.45, same class).
    */
  private def mockOutput: Array[Float] = {
    val out = new Array[Float](84 * N)
    def set(row: Int, anchor: Int, v: Float): Unit = out(row * N + anchor) = v
    set(0, 0, 320f); set(1, 0, 320f); set(2, 0, 64f); set(3, 0, 48f)
    set(4 + 2, 0, 0.9f) // class 2 = "car"
    set(0, 1, 100f); set(1, 1, 100f); set(2, 1, 10f); set(3, 1, 10f)
    set(4 + 7, 1, 0.3f) // below 0.5 threshold
    set(0, 2, 324f); set(1, 2, 322f); set(2, 2, 64f); set(3, 2, 48f)
    set(4 + 2, 2, 0.8f) // near-duplicate of anchor 0
    out
  }

  private class MockSession extends InferenceSession {
    val runs = new AtomicInteger(0)
    val inUse = new AtomicBoolean(false)
    val overlapped = new AtomicBoolean(false)
    var lastInputLen = -1
    override def run(input: Array[Float]): (Array[Float], Int) = {
      if (!inUse.compareAndSet(false, true)) overlapped.set(true)
      try {
        runs.incrementAndGet()
        lastInputLen = input.length
        Thread.sleep(1) // widen the race window for the overlap check
        (mockOutput, N)
      } finally inUse.set(false)
    }
  }

  private class CountingFactory extends SessionFactory {
    val created = new AtomicInteger(0)
    val last = new java.util.concurrent.atomic.AtomicReference[MockSession]()
    override def apply(p: String): InferenceSession = {
      created.incrementAndGet()
      val s = new MockSession; last.set(s); s
    }
  }

  private def frame(id: Long, data: Array[Byte]): VideoFrame =
    VideoFrame("s1", id, 1700000000000L + id, data, id.toInt,
      FrameMetadata(640, 640, 25, "h264"))

  test("mocked inference decodes through the shared YOLO kernel (threshold + NMS)") {
    OnnxDetector.reset()
    val factory = new CountingFactory
    val det = OnnxDetector.detector("model_a.onnx", 0.5f, 0.45f, factory)
    val got = det(frame(1, Array[Byte](1, 2, 3)))
    assert(got.map(d => (d.objectClass, d.confidence)) === Seq(("car", 0.9f)))
    val b = got.head.bbox
    assert((b.x1, b.y1, b.x2, b.y2) === (288f, 296f, 352f, 344f))
    // input tensor has the real [1,3,640,640] volume
    assert(factory.last.get().lastInputLen === 3 * 640 * 640)
  }

  test("session is created lazily, once per model path, and reused across frames") {
    OnnxDetector.reset()
    val factory = new CountingFactory
    val det = OnnxDetector.detector("model_b.onnx", 0.5f, 0.45f, factory)
    assert(factory.created.get() === 0) // lazy: nothing until first frame
    // empty frames short-circuit without initializing a session
    assert(det(frame(0, Array.empty)) === Seq.empty)
    assert(det(frame(0, null)) === Seq.empty)
    assert(factory.created.get() === 0)
    for (i <- 1 to 10) det(frame(i, Array[Byte](i.toByte)))
    assert(factory.created.get() === 1, "init-once")
    assert(factory.last.get().runs.get() === 10, "one run per frame")
    assert(OnnxDetector.sessionInitCount === 1)
    // a second model path gets its own session
    val det2 = OnnxDetector.detector("model_c.onnx", 0.5f, 0.45f, factory)
    det2(frame(1, Array[Byte](9)))
    assert(factory.created.get() === 2)
    OnnxDetector.reset()
  }

  test("concurrent frames share one session and inference is lock-serialized") {
    OnnxDetector.reset()
    val factory = new CountingFactory
    val det = OnnxDetector.detector("model_d.onnx", 0.5f, 0.45f, factory)
    val threads = (1 to 8).map { t =>
      new Thread(() => (1 to 5).foreach(i => det(frame(t * 100 + i, Array[Byte](t.toByte, i.toByte)))))
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(factory.created.get() === 1, "one session despite 8 threads")
    assert(factory.last.get().runs.get() === 40)
    assert(!factory.last.get().overlapped.get(),
      "run() entered concurrently — the per-session lock failed")
    OnnxDetector.reset()
  }

  test("classpath guard: no ONNX runtime here, orSynthetic falls back to the synthetic detector") {
    assert(!OnnxDetector.runtimeAvailable, "this build must not ship ONNX jars")
    val cfg = EngineConfig()
    val fallback = OnnxDetector.orSynthetic(cfg, "/nonexistent/model.onnx")
    val reference = VideoPipeline.defaultDetector(cfg)
    val frames = FrameGenerator.frames(streams = 1, fps = 5, durationSec = 20)
    frames.foreach(f => assert(fallback(f) === reference(f)))
  }
}
