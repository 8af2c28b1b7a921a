package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the text-hash kernels
  * (TextKernels.hash64 / mix64) — the base keys of the dedup/sketch
  * family (q41/q48/q49/q56/q58/q65).
  *
  * As Scala UDFs these force a codegen boundary per call site: every
  * row pays catalyst↔scala conversion and a boxed function call, and
  * the surrounding project stage falls out of whole-stage codegen.
  * These expressions emit the same wrapping-long arithmetic inline, so
  * a scan→hash→shuffle stage stays one fused loop.
  *
  * Bit-compatibility contract: identical output to TextKernels for
  * every input (the DuckDB oracle replays of these kernels — see
  * OracleSql — depend on it). hash64 iterates UTF-16 code units
  * exactly like `String.charAt`, which `UTF8String.toString` yields
  * verbatim.
  */
case class TextHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_hash64 needs string, got ${t.catalogString}")
  }

  override def nullSafeEval(a: Any): Any =
    graft.functions.TextKernels.hash64(a.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      s"""
         |java.lang.String $s = $a.toString();
         |long $h = 1125899906842597L;
         |for (int $i = 0; $i < $s.length(); $i++) {
         |  $h = 31L * $h + $s.charAt($i);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TextHash64 =
    copy(child = newChild)

  override def prettyName: String = "graft_hash64"
}

/** splitmix64 finalizer (TextKernels.mix64): the uniformizer applied on
  * top of hash64 wherever hashes feed order statistics or thresholds
  * (KMV, deterministic sampling, LSH band values).
  */
case class Mix64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_mix64 needs bigint, got ${t.catalogString}")
  }

  override def nullSafeEval(a: Any): Any =
    graft.functions.TextKernels.mix64(a.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val z = ctx.freshName("z")
      s"""
         |long $z = $a;
         |$z = ($z ^ ($z >>> 30)) * 0xBF58476D1CE4E5B9L;
         |$z = ($z ^ ($z >>> 27)) * 0x94D049BB133111EBL;
         |${ev.value} = $z ^ ($z >>> 31);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Mix64 =
    copy(child = newChild)

  override def prettyName: String = "graft_mix64"
}

/** Threshold-aware overlap of two SORTED arrays of distinct longs —
  * the verify kernel of the exact set-similarity join (q46).
  *
  * `graft_sorted_overlap(a, b, req)` returns |a ∩ b| when it is ≥
  * `req`, else −1. A two-pointer merge maintains PPJoin's overlap
  * upper bound `inter_so_far + min(remaining_a, remaining_b)` (the
  * positional bound of Xiao et al., WWW'08 §4, applied at EVERY merge
  * position rather than estimated once by the suffix filter's binary
  * search) and aborts the moment the bound drops below `req` — a
  * dissimilar candidate pair is rejected after ~(1−t)·n comparisons
  * instead of a full intersection. Survivors report the EXACT overlap,
  * so downstream jaccard output is byte-identical to
  * `size(array_intersect(a, b))` with a `≥ req` filter.
  *
  * vs `array_intersect`: that builds a per-call hash set (allocation +
  * hashing per element) and cannot early-exit; this is an
  * allocation-free pointer walk over 8-byte keys inside whole-stage
  * codegen.
  *
  * Contract: both arrays sorted ascending with distinct, non-null
  * elements (q46 persists exactly this shape). A null array or null
  * `req` yields null via the standard null-safe wrappers.
  */
case class SortedOverlap(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, r) => TypeCheckResult.TypeCheckFailure(
        "graft_sorted_overlap needs (array<bigint>, array<bigint>, int), " +
          s"got (${a.catalogString}, ${b.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(a: Any, b: Any, r: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val req = r.asInstanceOf[Int]
    val na = x.numElements()
    val nb = y.numElements()
    var ia = 0; var ib = 0; var inter = 0
    var live = true
    while (live && ia < na && ib < nb) {
      val va = x.getLong(ia)
      val vb = y.getLong(ib)
      if (va == vb) { inter += 1; ia += 1; ib += 1 }
      else if (va < vb) ia += 1
      else ib += 1
      if (inter + math.min(na - ia, nb - ib) < req) live = false
    }
    if (inter >= req) inter else -1
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, r) => {
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val ia = ctx.freshName("ia")
      val ib = ctx.freshName("ib")
      val inter = ctx.freshName("inter")
      val va = ctx.freshName("va")
      val vb = ctx.freshName("vb")
      s"""
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |int $ia = 0, $ib = 0, $inter = 0;
         |while ($ia < $na && $ib < $nb) {
         |  long $va = $a.getLong($ia);
         |  long $vb = $b.getLong($ib);
         |  if ($va == $vb) { $inter++; $ia++; $ib++; }
         |  else if ($va < $vb) { $ia++; }
         |  else { $ib++; }
         |  if ($inter + java.lang.Math.min($na - $ia, $nb - $ib) < $r) break;
         |}
         |${ev.value} = ($inter >= $r) ? $inter : -1;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): SortedOverlap =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "graft_sorted_overlap"
}

/** Sorted hash64 values of a document's distinct word k-shingles
  * (TextKernels.sortedShingleHashes) — q46's posting-index row, built
  * inside whole-stage codegen instead of through a ScalaUDF.
  *
  * The kernel itself (tokenize → k-window join → string-set dedup →
  * hash64 → sort) is a per-row scalar map with no pushdown value, so
  * unlike hash64/mix64 it is NOT inlined into generated Java — the
  * generated code calls the static kernel directly. That still removes
  * everything that makes a ScalaUDF a boundary: no catalyst↔scala row
  * conversion, no boxed Function1 dispatch, no codegen-stage split —
  * the scan→shingle→explode stage stays one fused loop and the result
  * lands as an UnsafeArrayData with no per-element boxing.
  *
  * `k` is a constructor constant (the SQL builder requires a foldable
  * int literal) so the generated call site bakes it in.
  *
  * Null contract: standard null-safe propagation (null text → null
  * array). Call sites that need the legacy ScalaUDF behavior on null
  * (hash of the empty shingle) wrap the input in coalesce(text, '') —
  * TextKernels.shingles("") and shingles(null) agree.
  */
case class ShingleHashes(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if k >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"graft_shingle_hashes needs k >= 1, got $k")
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_shingle_hashes needs string, got ${t.catalogString}")
  }

  override def nullSafeEval(a: Any): Any =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
      graft.functions.TextKernels.sortedShingleHashes(
        a.asInstanceOf[UTF8String].toString, k))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(graft.functions.TextKernels
         |    .sortedShingleHashes($a.toString(), $k));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)

  override def prettyName: String = "graft_shingle_hashes"
}

/** Position-ordered hash64 of every word k-shingle
  * (TextKernels.positionalShingleHashes) — [[ShingleHashes]] minus the
  * set/sort semantics: element i is the hash of the shingle STARTING at
  * 0-based token position i, duplicates kept. q83's duplicated-span
  * anchors posexplode this array, so position survives into the plan
  * with no string materialization and no ScalaUDF boundary (the
  * [[ShingleHashes]] codegen rationale applies verbatim).
  */
case class ShingleHashesPos(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if k >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"graft_shingle_hashes_pos needs k >= 1, got $k")
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_shingle_hashes_pos needs string, got ${t.catalogString}")
  }

  override def nullSafeEval(a: Any): Any =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
      graft.functions.TextKernels.positionalShingleHashes(
        a.asInstanceOf[UTF8String].toString, k))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(graft.functions.TextKernels
         |    .positionalShingleHashes($a.toString(), $k));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleHashesPos =
    copy(child = newChild)

  override def prettyName: String = "graft_shingle_hashes_pos"
}

/** Fused text → minhash → LSH band keys (TextKernels.minhashBands) —
  * q42's signature row, built inside whole-stage codegen via a static
  * kernel call instead of a ScalaUDF (the [[ShingleHashes]] pattern
  * and rationale: no catalyst↔scala conversion, no boxed dispatch, no
  * codegen-stage split; the 128-slot mixing loop is the single
  * heaviest per-row map in the engine). Constants are constructor-
  * baked (SQL builder requires foldable int literals).
  */
case class MinhashBands(child: Expression, k: Int, numHashes: Int,
    rowsPerBand: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if k >= 1 && numHashes >= 1 && rowsPerBand >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_bands needs positive (k, numHashes, rowsPerBand), " +
        s"got ($k, $numHashes, $rowsPerBand)")
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_bands needs string, got ${t.catalogString}")
  }

  override def nullSafeEval(a: Any): Any =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
      graft.functions.TextKernels.minhashBands(
        a.asInstanceOf[UTF8String].toString, k, numHashes, rowsPerBand))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(graft.functions.TextKernels
         |    .minhashBands($a.toString(), $k, $numHashes, $rowsPerBand));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinhashBands =
    copy(child = newChild)

  override def prettyName: String = "graft_minhash_bands"
}

/** Fused text → RAW minhash signature (TextKernels.minhashSig) — the
  * un-banded form of [[MinhashBands]], for estimator calibration
  * (q97): component-wise signature agreement is the unbiased MinHash
  * Jaccard estimate, so the audit needs the 128 slots themselves, not
  * the band hashes. Same codegen static-call pattern and rationale.
  */
case class MinhashSig(child: Expression, k: Int, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if k >= 1 && numHashes >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_sig needs positive (k, numHashes), got ($k, $numHashes)")
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_sig needs string, got ${t.catalogString}")
  }

  override def nullSafeEval(a: Any): Any =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
      graft.functions.TextKernels.minhashSig(
        a.asInstanceOf[UTF8String].toString, k, numHashes))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(graft.functions.TextKernels
         |    .minhashSig($a.toString(), $k, $numHashes));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)

  override def prettyName: String = "graft_minhash_sig"
}

/** LSH band keys of an ALREADY-COMPUTED minhash signature column
  * (TextKernels.lshBands) — the banding step alone, so a query that
  * needs both the raw signature and its bands (q97) runs the heavy
  * 128-slot mixing loop ONCE and derives the bands from the stored
  * sig, instead of re-shingling and re-mixing the text a second time
  * through [[MinhashBands]]. Same codegen static-call pattern.
  */
case class LshBandsOf(child: Expression, rowsPerBand: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if rowsPerBand >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckFailure(
      s"graft_lsh_bands needs rowsPerBand >= 1, got $rowsPerBand")
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_lsh_bands needs array<bigint>, got ${t.catalogString}")
  }

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray()
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
      graft.functions.TextKernels.lshBands(arr, rowsPerBand))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(graft.functions.TextKernels
         |    .lshBands($a.toLongArray(), $rowsPerBand));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LshBandsOf =
    copy(child = newChild)

  override def prettyName: String = "graft_lsh_bands"
}

/** 64-bit SimHash over word k-shingles (TextKernels.simhash) — the
  * q43/q63/q68 near-dup key, as a codegen static-call expression
  * (same pattern/rationale as [[ShingleHashes]]).
  */
case class SimHash64(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if k >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash needs k >= 1, got $k")
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash needs string, got ${t.catalogString}")
  }

  override def nullSafeEval(a: Any): Any =
    graft.functions.TextKernels.simhash(a.asInstanceOf[UTF8String].toString, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = graft.functions.TextKernels
         |  .simhash($a.toString(), $k);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)

  override def prettyName: String = "graft_simhash"
}

/** Rolling-hash document fingerprint (TextKernels.fingerprint — min of
  * `window`-token window hashes, winnowing-lite) — q44's grouping key,
  * as a codegen static-call expression (the [[ShingleHashes]] pattern).
  * Note the kernel maps empty/whitespace text to 0L, so the legacy
  * null→0 behavior needs only coalesce(text, '') at the call site.
  */
case class Fingerprint(child: Expression, window: Int) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if window >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"graft_fingerprint needs window >= 1, got $window")
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_fingerprint needs string, got ${t.catalogString}")
  }

  override def nullSafeEval(a: Any): Any =
    graft.functions.TextKernels.fingerprint(
      a.asInstanceOf[UTF8String].toString, window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = graft.functions.TextKernels
         |  .fingerprint($a.toString(), $window);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Fingerprint =
    copy(child = newChild)

  override def prettyName: String = "graft_fingerprint"
}

/** Static kernel behind [[BigramCensus]] — one local hash map per
  * document, no Spark state. Separated so generated code calls a
  * plain static method (the TextKernels pattern).
  */
object BigramCensusKernel {
  private val SPACE = UTF8String.fromString(" ")

  /** Census of adjacent-token bigrams of a token array: returns
    * (nbg, topc, dupc) = (total bigrams = n−1, count of the most
    * frequent bigram string, total count of bigrams occurring more
    * than once). Bigram identity is the STRING `a + " " + b` —
    * byte-identical to `concat(a, ' ', b)` of the relational
    * formulation, so grouping semantics match exactly (hash-collision
    * free by construction: the map keys are the strings themselves).
    * Arrays with fewer than 2 elements yield (0, 0, 0).
    */
  def census(arr: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val n = arr.numElements()
    if (n < 2)
      return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](0L, 0L, 0L))
    val counts = new java.util.HashMap[UTF8String, Integer](
      math.min(n * 2, 1 << 16))
    var i = 0
    while (i < n - 1) {
      val bg = UTF8String.concat(
        arr.getUTF8String(i), SPACE, arr.getUTF8String(i + 1))
      val c = counts.get(bg)
      counts.put(bg, if (c == null) 1 else c + 1)
      i += 1
    }
    var topc = 0L
    var dupc = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().toLong
      if (c > topc) topc = c
      if (c > 1) dupc += c
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any]((n - 1).toLong, topc, dupc))
  }
}

/** Per-document bigram census (q45 / q157's Gopher repetition gate):
  * struct(nbg, topc, dupc) over a token array, computed row-locally.
  *
  * The relational formulation this replaces — explode(bigrams) →
  * groupBy(doc, bigram) → groupBy(doc) — shuffles one row per bigram
  * OCCURRENCE (corpus token mass) and hash-aggregates |docs| ×
  * |distinct bigrams per doc| groups, for an aggregate whose scope is
  * a single document. Per-doc aggregates need no exchange at all:
  * this expression computes the same three numbers in one pass over
  * the row (guide §2.3 "aggregate before you shuffle", taken to its
  * limit — the shuffle disappears). Output is bit-identical to the
  * two-level aggregation: counts are exact string-keyed ints, no
  * hashing shortcut.
  */
case class BigramCensus(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("nbg", LongType, nullable = false),
    StructField("topc", LongType, nullable = false),
    StructField("dupc", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_bigram_census needs array<string>, got ${t.catalogString}")
  }

  override def nullSafeEval(a: Any): Any =
    BigramCensusKernel.census(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = graft.plans.BigramCensusKernel.census($a);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): BigramCensus =
    copy(child = newChild)

  override def prettyName: String = "graft_bigram_census"
}
