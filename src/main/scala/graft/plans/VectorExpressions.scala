package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the embedding hot path.
  *
  * The composable alternative — `aggregate(zip_with(a, b, (x,y) =>
  * x*y), ...)` — is correct but materializes an intermediate array and
  * walks expression-tree plumbing per element. These expressions emit a
  * single fused Java loop via `doGenCode`, so a 64-dim dot product is
  * 64 multiply-adds inside whole-stage codegen with no allocation.
  *
  * FP contract (oracle parity): elements are widened to double BEFORE
  * multiplication and accumulated strictly left-to-right — the same
  * order as both the higher-order-function formulation and the DuckDB
  * twin `CAST(e[1] AS DOUBLE)*q1 + ...`, so results are bit-identical.
  *
  * Array element types may be float or double on either side (embedding
  * columns are array<float>; literal query vectors are array<double>).
  * Null array elements are not expected (embeddings are dense); a null
  * ARRAY yields null via the standard null-safe wrappers.
  */
private[graft] object VectorCodegen {
  def checkArrayNumeric(e: Expression, side: String): TypeCheckResult =
    e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$side must be array<float|double>, got ${t.catalogString}")
    }

  def elemGetter(t: DataType, arr: String, i: String): String =
    t.asInstanceOf[ArrayType].elementType match {
      case FloatType  => s"(double) $arr.getFloat($i)"
      case DoubleType => s"$arr.getDouble($i)"
      case other => throw new IllegalStateException(other.toString)
    }

  def elemAt(t: DataType, arr: ArrayData, i: Int): Double =
    t.asInstanceOf[ArrayType].elementType match {
      case FloatType  => arr.getFloat(i).toDouble
      case DoubleType => arr.getDouble(i)
      case other => throw new IllegalStateException(other.toString)
    }
}

/** dot(a, b) = Σ a_i · b_i over min(len) elements, in double. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    VectorCodegen.checkArrayNumeric(left, "left") match {
      case TypeCheckResult.TypeCheckSuccess =>
        VectorCodegen.checkArrayNumeric(right, "right")
      case f => f
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += VectorCodegen.elemAt(left.dataType, x, i) *
        VectorCodegen.elemAt(right.dataType, y, i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ${VectorCodegen.elemGetter(left.dataType, a, i)}
         |      * ${VectorCodegen.elemGetter(right.dataType, b, i)};
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot"
}

/** l2norm(a) = sqrt(Σ a_i²) in one pass (vs dot(a,a) evaluating the
  * child array expression twice).
  */
case class L2Norm(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    VectorCodegen.checkArrayNumeric(child, "child")

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      val v = VectorCodegen.elemAt(child.dataType, x, i)
      s += v * v
      i += 1
    }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = ${VectorCodegen.elemGetter(child.dataType, a, i)};
         |  $s += $v * $v;
         |}
         |${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): L2Norm =
    copy(child = newChild)

  override def prettyName: String = "graft_norm"
}

/** Random-hyperplane LSH bucket id (VectorKernels.bucketOf) for an
  * embedding — the q53/q54 candidate-pruning key, as a codegen
  * static-call expression. The per-row map is a 64×64 multiply-add
  * against the broadcast-free deterministic plane matrix; as a ScalaUDF
  * it paid Seq[Float] boxing per element and a codegen-stage split.
  * The generated code hands the kernel a primitive float[] straight
  * from ArrayData (exact float→double widening inside the kernel
  * matches the legacy UDF's element-wise conversion bit-for-bit).
  * `nPlanes` is constructor-baked (foldable-literal SQL builder).
  */
case class LshBucket(child: Expression, nPlanes: Int) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) if nPlanes >= 1 && nPlanes <= 64 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckFailure(
      s"graft_lsh_bucket needs 1 <= nPlanes <= 64, got $nPlanes")
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_lsh_bucket needs array<float>, got ${t.catalogString}")
  }

  override def nullSafeEval(a: Any): Any =
    graft.functions.VectorKernels.bucketOf(
      a.asInstanceOf[ArrayData].toFloatArray(), nPlanes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = graft.functions.VectorKernels
         |  .bucketOf($a.toFloatArray(), $nPlanes);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LshBucket =
    copy(child = newChild)

  override def prettyName: String = "graft_lsh_bucket"
}
