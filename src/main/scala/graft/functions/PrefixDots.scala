package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: the dot products of two vector columns at
  * a ladder of prefix lengths — ONE index-order pass emits
  * `[dot(a[0:b₁], b[0:b₁]), …, dot(a[0:b_k], b[0:b_k])]` as
  * `array<double>` (q152's matryoshka truncation audit needs all four
  * prefix cosines per pair; with `left == right` it yields the prefix
  * self-dots a norm ladder is built from).
  *
  * Bit-identical to the HOF formulation it replaces (k independent
  * `aggregate(zip_with(slice(a,1,b), slice(b,1,b), _*_), 0.0, _+_)`
  * folds): the accumulator adds the SAME products in the SAME index
  * order, and a shorter prefix's fold is literally a prefix of the
  * longer one's — so emitting the running value at each boundary equals
  * the per-slice folds double-for-double. Why native: HOFs don't
  * participate in whole-stage codegen and allocate a lambda frame per
  * element; the audit evaluates pairs × dim of them, k times over
  * (the [[CosineSimilarity]] / [[SqDistE8]] escape).
  *
  * `bounds` must be strictly increasing and positive. Boundaries beyond
  * the vectors' common length report the full available prefix dot
  * (mirrors `slice` past-the-end truncation). Null if either input is
  * null.
  */
case class PrefixDots(left: Expression, right: Expression,
    bounds: Seq[Int]) extends BinaryExpression {

  require(bounds.nonEmpty && bounds.head > 0 &&
    bounds.sliding(2).forall(s => s.length < 2 || s(0) < s(1)),
    s"prefix_dots bounds must be strictly increasing positives: $bounds")

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"prefix_dots expects array<float|double> on both sides, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "prefix_dots"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val xf = elemType(left).contains(FloatType)
    val yf = elemType(right).contains(FloatType)
    val n = math.min(x.numElements(), y.numElements())
    val res = Array.ofDim[Double](bounds.length)
    var acc = 0.0
    var bi = 0
    var i = 0
    while (i < n && bi < bounds.length) {
      val xi = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xi * yi
      i += 1
      if (i == bounds(bi)) { res(bi) = acc; bi += 1 }
    }
    while (bi < bounds.length) { res(bi) = acc; bi += 1 }
    new GenericArrayData(res)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xGet = if (elemType(left).contains(FloatType))
      "getFloat" else "getDouble"
    val yGet = if (elemType(right).contains(FloatType))
      "getFloat" else "getDouble"
    val boundsLit = bounds.mkString("new int[]{", ", ", "}")
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val bi = ctx.freshName("bi")
      val bnd = ctx.freshName("bnd")
      val res = ctx.freshName("res")
      s"""
         |int[] $bnd = $boundsLit;
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double[] $res = new double[${bounds.length}];
         |double $acc = 0.0;
         |int $bi = 0;
         |for (int $i = 0; $i < $n && $bi < ${bounds.length}; ) {
         |  $acc += (double) $x.$xGet($i) * (double) $y.$yGet($i);
         |  $i++;
         |  if ($i == $bnd[$bi]) { $res[$bi] = $acc; $bi++; }
         |}
         |for (; $bi < ${bounds.length}; $bi++) { $res[$bi] = $acc; }
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($res);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PrefixDots =
    copy(left = newLeft, right = newRight)
}

object PrefixDots {
  /** Column-level helper: `PrefixDots(colA, colB, bounds)`. */
  def apply(a: Column, b: Column, bounds: Seq[Int]): Column =
    GraftBridge.column(PrefixDots(
      GraftBridge.expression(a), GraftBridge.expression(b), bounds))
}
