package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Native Catalyst expression: product-quantization code assignment of an
  * `array<float>` vector against literal per-subspace codebooks.
  *
  * Why not the `array_min(array(struct(aggregate(zip_with(...)))))`
  * formulation: higher-order functions do not participate in whole-stage
  * codegen, and PQ assignment evaluates m × kSub of them per row — the
  * interpreted lambda frames dominate index build time. This expression
  * generates one tight primitive triple loop (no boxing, no intermediate
  * arrays) and keeps the projection inside WholeStageCodegen.
  *
  * Semantics are bit-identical to the HOF formulation (same double
  * arithmetic in the same order, first minimal index wins ties) — pinned
  * by PqSpec's equivalence test.
  */
case class PqAssign(child: Expression,
    codebooks: Array[Array[Array[Double]]]) extends UnaryExpression {

  private val m = codebooks.length
  private val kSub = codebooks(0).length
  private val subDim = codebooks(0)(0).length
  // flat layout: ((s * kSub) + c) * subDim + j
  private lazy val flat: Array[Double] =
    codebooks.flatten.flatten

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_assign expects array<float>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_assign"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bd = Double.PositiveInfinity
      var c = 0
      while (c < kSub) {
        val base = (s * kSub + c) * subDim
        var d = 0.0
        var j = 0
        while (j < subDim) {
          val diff = v.getFloat(s * subDim + j).toDouble - flat(base + j)
          d += diff * diff
          j += 1
        }
        if (d < bd) { bd = d; best = c }
        c += 1
      }
      codes(s) = best
      s += 1
    }
    new GenericArrayData(codes)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("pqFlat", flat, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val codes = ctx.freshName("codes")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val best = ctx.freshName("best")
      val bd = ctx.freshName("bd")
      val d = ctx.freshName("d")
      val base = ctx.freshName("base")
      val diff = ctx.freshName("diff")
      s"""
         |int[] $codes = new int[$m];
         |for (int $s = 0; $s < $m; $s++) {
         |  int $best = 0;
         |  double $bd = Double.POSITIVE_INFINITY;
         |  for (int $c = 0; $c < $kSub; $c++) {
         |    int $base = ($s * $kSub + $c) * $subDim;
         |    double $d = 0.0;
         |    for (int $j = 0; $j < $subDim; $j++) {
         |      double $diff = (double) $v.getFloat($s * $subDim + $j)
         |        - $flatRef[$base + $j];
         |      $d += $diff * $diff;
         |    }
         |    if ($d < $bd) { $bd = $d; $best = $c; }
         |  }
         |  $codes[$s] = $best;
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqAssign =
    copy(child = newChild)
}

object PqAssign {
  def apply(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    GraftBridge.column(PqAssign(GraftBridge.expression(vec), codebooks))
}
