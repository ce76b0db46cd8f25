package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst dot product over two array<double> columns.
  *
  * The vector-math hot path (ANN scoring is O(pairs × dim)) needs a tight
  * primitive loop: the `zip_with` + `aggregate` higher-order-function
  * equivalent evaluates one lambda call per element outside whole-stage
  * codegen, which measured ~40× slower on the brute-force pair scan. This
  * expression codegens to a plain `for` loop over the unsafe array data (and
  * its interpreted fallback is the same loop), keeping the whole scoring
  * stage inside WholeStageCodegen.
  *
  * Summation is sequential left-to-right — bit-identical to the DuckDB
  * oracle's `list_sum(list_transform(list_zip(a, b), ...))` fold, which the
  * correctness harness relies on.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      // fresh names: several graft_dot calls can share one codegen scope
      // (cosine = dot(a,b) / sqrt(dot(a,a) * dot(b,b)))
      val n = ctx.freshName("dotN")
      val s = ctx.freshName("dotSum")
      val i = ctx.freshName("dotI")
      s"""
         |int $n = Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $x.getDouble($i) * $y.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override def prettyName: String = "graft_dot"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native Catalyst dot product over two array<long> columns — the integer
  * sibling of [[DotProduct]] for quantized (int8-style) embedding scoring.
  *
  * The `zip_with` + `aggregate` HOF equivalent interprets one lambda call per
  * element; on the quantized brute-force scan that measured ~3× the wall time
  * of the codegen'd double kernel on the same join shape. This is the same
  * tight primitive loop over unsafe array data, kept inside
  * WholeStageCodegen. Exact integer arithmetic — no FP summation-order
  * caveat, so results are bit-identical across engines by construction.
  */
case class LongDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_doti expects (array<bigint>, array<bigint>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("dotiN")
      val s = ctx.freshName("dotiSum")
      val i = ctx.freshName("dotiI")
      s"""
         |int $n = Math.min($x.numElements(), $y.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $x.getLong($i) * $y.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override def prettyName: String = "graft_doti"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
