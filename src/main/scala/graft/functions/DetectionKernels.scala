package graft.functions

import graft.model.{BoundingBox, CocoClasses, Detection}

/** Pure detection post-processing kernels, semantics-parity with the
  * reference's YOLO decode path (processor/YOLODetector.java:234-336):
  * argmax over class scores, confidence threshold, box scaling to the
  * original image dims, and class-local greedy NMS with a stable
  * confidence-descending sort. Pure Scala — these run inside UDFs /
  * mapGroups and need no Catalyst integration (they are opaque to the
  * optimizer with no pushdown value; SURVEY.md §4).
  */
object DetectionKernels {

  /** Intersection-over-union of two boxes (reference
    * processor/YOLODetector.java:324-336). Returns 0 when the
    * intersection is empty or the union is non-positive.
    */
  def iou(a: BoundingBox, b: BoundingBox): Float = {
    val ix1 = math.max(a.x1, b.x1)
    val iy1 = math.max(a.y1, b.y1)
    val ix2 = math.min(a.x2, b.x2)
    val iy2 = math.min(a.y2, b.y2)
    val iw = math.max(0f, ix2 - ix1)
    val ih = math.max(0f, iy2 - iy1)
    val inter = iw * ih
    val areaA = math.max(0f, a.x2 - a.x1) * math.max(0f, a.y2 - a.y1)
    val areaB = math.max(0f, b.x2 - b.x1) * math.max(0f, b.y2 - b.y1)
    val union = areaA + areaB - inter
    if (union <= 0f) 0f else inter / union
  }

  /** Class-local greedy NMS (reference processor/YOLODetector.java:289-322):
    * sort by confidence descending (STABLE — ties keep input order, the
    * reference uses List.sort which is stable), greedily keep a box and
    * suppress later same-class boxes with IoU > threshold. Cross-class
    * overlaps always survive.
    */
  def nms(dets: Seq[Detection], iouThreshold: Float): Seq[Detection] = {
    val sorted = dets.sortBy(d => -d.confidence) // stable sort on negated conf
    val kept = scala.collection.mutable.ArrayBuffer.empty[Detection]
    for (d <- sorted) {
      val suppressed = kept.exists(k =>
        k.objectClass == d.objectClass && iou(k.bbox, d.bbox) > iouThreshold)
      if (!suppressed) kept += d
    }
    kept.toSeq
  }

  /** Scale a box from model space (640x640) back to original image dims
    * and clip to the image (reference processor/YOLODetector.java:265-275
    * + the 640x640 letterbox-free resize at ImageUtils.java:41-74).
    * cx,cy,w,h are model-space center coords; returns None for
    * degenerate (non-positive area) boxes, which the reference drops.
    */
  def scaleBox(cx: Float, cy: Float, w: Float, h: Float,
      origW: Int, origH: Int, modelSize: Int = 640): Option[BoundingBox] = {
    val sx = origW.toFloat / modelSize
    val sy = origH.toFloat / modelSize
    val x1 = math.max(0f, math.min((cx - w / 2) * sx, origW.toFloat))
    val y1 = math.max(0f, math.min((cy - h / 2) * sy, origH.toFloat))
    val x2 = math.max(0f, math.min((cx + w / 2) * sx, origW.toFloat))
    val y2 = math.max(0f, math.min((cy + h / 2) * sy, origH.toFloat))
    if (x2 > x1 && y2 > y1) Some(BoundingBox(x1, y1, x2, y2)) else None
  }

  /** Decode one YOLOv8-layout output tensor [84, n] laid out as
    * [cx, cy, w, h, 80 class scores] per anchor (reference
    * processor/YOLODetector.java:20,244-259): per anchor take the
    * argmax class (first-wins on ties, matching the reference's
    * strict `>` comparison), threshold on confidence, scale the box.
    */
  def decodeOutput(data: Array[Float], numAnchors: Int,
      origW: Int, origH: Int, confThreshold: Float,
      iouThreshold: Float): Seq[Detection] = {
    val raw = scala.collection.mutable.ArrayBuffer.empty[Detection]
    var i = 0
    while (i < numAnchors) {
      var maxScore = data(4 * numAnchors + i)
      var maxClass = 0
      var j = 5
      while (j < 84) {
        val s = data(j * numAnchors + i)
        if (s > maxScore) { maxScore = s; maxClass = j - 4 }
        j += 1
      }
      if (maxScore >= confThreshold) {
        scaleBox(data(i), data(numAnchors + i), data(2 * numAnchors + i),
          data(3 * numAnchors + i), origW, origH).foreach { box =>
          raw += Detection(CocoClasses.names(maxClass), maxScore, box)
        }
      }
      i += 1
    }
    nms(raw.toSeq, iouThreshold)
  }

  /** Deterministic synthetic detector standing in for the absent ONNX
    * model blobs (reference ships none — .MISSING_LARGE_BLOBS:1-2;
    * SURVEY.md §2.1.7). Derives a reproducible detection list from a
    * hash of the frame bytes so streaming tests have a stable oracle.
    * The real ONNX path plugs in behind the same `Array[Byte] =>
    * Seq[Detection]` signature.
    */
  def syntheticDetect(frameData: Array[Byte], width: Int, height: Int,
      confThreshold: Float): Seq[Detection] = {
    if (frameData == null || frameData.isEmpty) return Seq.empty
    var h = 1125899906842597L // deterministic FNV-ish rolling hash
    var i = 0
    while (i < frameData.length) { h = 31 * h + frameData(i); i += 1 }
    val n = (math.abs(h) % 4).toInt // 0..3 detections per frame
    (0 until n).flatMap { k =>
      val hk = h * (k + 1)
      val conf = 0.25f + (math.abs(hk) % 75) / 100.0f // 0.25..0.99
      if (conf < confThreshold) None
      else {
        val cls = CocoClasses.names((math.abs(hk / 7) % 80).toInt)
        val x1 = (math.abs(hk / 11) % math.max(1, width - 64)).toFloat
        val y1 = (math.abs(hk / 13) % math.max(1, height - 64)).toFloat
        Some(Detection(cls, conf,
          BoundingBox(x1, y1, x1 + 64f, y1 + 48f)))
      }
    }
  }
}
