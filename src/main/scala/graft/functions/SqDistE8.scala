package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native Catalyst expression: e8 fixed-point squared L2 distance of two
  * vector columns — Σ floor((x_i − y_i)² · 1e8) as an exact long.
  *
  * Bit-identical to the HOF formulation it replaces
  * (`aggregate(zip_with(a, b, (x, y) => floor((x−y)·(x−y)·1e8)
  * .cast(long)), 0L, _+_)`): per element the SAME IEEE double ops in the
  * SAME association ((x−y)·(x−y) then ·1e8, floor, to-long), then a long
  * sum — order-immune, which is what keeps the distance replayable by a
  * SQL oracle (SURVEY §5.4). Why native: higher-order functions do not
  * participate in whole-stage codegen and allocate a lambda frame per
  * element — the q106 intra-cluster pair stage evaluates pairs × 384 of
  * them, and the centroid argmin k × 384 per row. This is the same
  * escape [[CosineSimilarity]] and [[PqAssign]] make for their loops.
  *
  * Accepts `array<float>` or `array<double>` on either side (the HOF
  * call sites mix a float vector column with a double centroid literal);
  * elements are widened to double exactly as `cast("double")` did.
  * Null if either input is null; arrays of unequal length compare over
  * the common prefix (call sites only ever pass equal-length vectors).
  */
case class SqDistE8(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sq_dist_e8 expects array<float|double> on both sides, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = LongType
  override def prettyName: String = "sq_dist_e8"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val xf = elemType(left).contains(FloatType)
    val yf = elemType(right).contains(FloatType)
    val n = math.min(x.numElements(), y.numElements())
    var d = 0L
    var i = 0
    while (i < n) {
      val xi = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      val diff = xi - yi
      d += math.floor(diff * diff * 1e8).toLong
      i += 1
    }
    d
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xGet = if (elemType(left).contains(FloatType))
      "getFloat" else "getDouble"
    val yGet = if (elemType(right).contains(FloatType))
      "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val diff = ctx.freshName("diff")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |long $d = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $diff = (double) $x.$xGet($i) - (double) $y.$yGet($i);
         |  $d += (long) java.lang.Math.floor($diff * $diff * 1.0E8);
         |}
         |${ev.value} = $d;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDistE8 =
    copy(left = newLeft, right = newRight)
}

object SqDistE8 {
  /** Column-level helper: `SqDistE8(colA, colB)`. */
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(SqDistE8(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}
