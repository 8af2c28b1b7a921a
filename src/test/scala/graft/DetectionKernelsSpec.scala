package graft

import graft.functions.DetectionKernels._
import graft.model.{BoundingBox, Detection}
import org.scalatest.funsuite.AnyFunSuite

/** Oracle-parity tests for the detection post-processing kernels,
  * mirroring the reference math (processor/YOLODetector.java:289-336):
  * hand-computed IoU, class-local NMS, stable confidence ties, and
  * seeded-random property invariants.
  */
class DetectionKernelsSpec extends AnyFunSuite {

  private def box(x1: Float, y1: Float, x2: Float, y2: Float) =
    BoundingBox(x1, y1, x2, y2)

  test("iou: hand-computed overlaps") {
    // identical boxes
    assert(iou(box(0, 0, 10, 10), box(0, 0, 10, 10)) === 1.0f)
    // disjoint
    assert(iou(box(0, 0, 10, 10), box(20, 20, 30, 30)) === 0.0f)
    // half overlap: inter=50, union=150 → 1/3
    assert(math.abs(iou(box(0, 0, 10, 10), box(5, 0, 15, 10)) - 1f / 3) < 1e-6)
    // touching edges → zero intersection
    assert(iou(box(0, 0, 10, 10), box(10, 0, 20, 10)) === 0.0f)
  }

  test("nms: suppresses same-class above threshold, keeps below") {
    // IoU of these two ≈ 0.466 (> 0.45 → suppress lower-confidence)
    val a = Detection("car", 0.9f, box(0, 0, 100, 100))
    val b = Detection("car", 0.8f, box(30, 0, 130, 100))
    assert(nms(Seq(a, b), 0.45f) === Seq(a))
    // IoU = 6000/14000 ≈ 0.429 (< 0.45 → keep both)
    val c = Detection("car", 0.8f, box(40, 0, 140, 100))
    assert(nms(Seq(a, c), 0.45f).toSet === Set(a, c))
  }

  test("nms: cross-class overlaps always survive") {
    val a = Detection("car", 0.9f, box(0, 0, 100, 100))
    val b = Detection("person", 0.8f, box(0, 0, 100, 100))
    assert(nms(Seq(a, b), 0.45f).toSet === Set(a, b))
  }

  test("nms: confidence ties keep input order (stable sort)") {
    val a = Detection("car", 0.8f, box(0, 0, 100, 100))
    val b = Detection("car", 0.8f, box(10, 0, 110, 100)) // iou > 0.45 with a
    assert(nms(Seq(a, b), 0.45f) === Seq(a)) // a first in input → a wins
    assert(nms(Seq(b, a), 0.45f) === Seq(b))
  }

  test("scaleBox: scales to original dims and clips") {
    // model space 640, image 1280x640: cx=320,cy=320,w=100,h=100
    val Some(bb) = scaleBox(320, 320, 100, 100, 1280, 640)
    assert(bb === BoundingBox(540f, 270f, 740f, 370f))
    // out-of-range box clips to image bounds
    val Some(clipped) = scaleBox(0, 0, 200, 200, 640, 640)
    assert(clipped.x1 === 0f && clipped.y1 === 0f)
    // degenerate (zero-area after clip) → None
    assert(scaleBox(-200, -200, 10, 10, 640, 640).isEmpty)
  }

  test("decodeOutput: argmax over class rows, threshold, first-wins ties") {
    val n = 2 // two anchors
    val data = new Array[Float](84 * n)
    // anchor 0: box (100,100,50,50), class 2 ("car") score 0.9
    data(0) = 100; data(n) = 100; data(2 * n) = 50; data(3 * n) = 50
    data(4 * n) = 0.1f // class 0 score
    data(6 * n) = 0.9f // class 2 score
    // anchor 1: below threshold
    data(1) = 300; data(n + 1) = 300; data(2 * n + 1) = 50; data(3 * n + 1) = 50
    data(4 * n + 1) = 0.3f
    val dets = decodeOutput(data, n, 640, 640, 0.5f, 0.45f)
    assert(dets.length === 1)
    assert(dets.head.objectClass === "car")
    assert(dets.head.confidence === 0.9f)
  }

  test("property: nms output ⊆ input, and pairwise same-class IoU ≤ threshold") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val dets = List.fill(12) {
        val x = rnd.nextFloat() * 500; val y = rnd.nextFloat() * 500
        val w = 10 + rnd.nextFloat() * 110; val h = 10 + rnd.nextFloat() * 110
        Detection(Seq("car", "person", "dog")(rnd.nextInt(3)),
          0.5f + rnd.nextFloat() * 0.5f, box(x, y, x + w, y + h))
      }
      val kept = nms(dets, 0.45f)
      assert(kept.forall(dets.contains))
      for {
        (a, i) <- kept.zipWithIndex
        (b, j) <- kept.zipWithIndex if i < j && a.objectClass == b.objectClass
      } assert(iou(a.bbox, b.bbox) <= 0.45f)
    }
  }

  test("syntheticDetect is deterministic") {
    val bytes = Array.tabulate(256)(i => (i * 7).toByte)
    val d1 = syntheticDetect(bytes, 1920, 1080, 0.5f)
    val d2 = syntheticDetect(bytes, 1920, 1080, 0.5f)
    assert(d1 === d2)
    assert(d1.forall(_.confidence >= 0.5f))
  }
}
