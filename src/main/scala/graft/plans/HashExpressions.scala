package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
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
