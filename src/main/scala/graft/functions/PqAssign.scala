package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

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
  * Arithmetic is e6 fixed-point (r10): each vector component quantizes to
  * `floor(x·1e6)` as a long, codebook entries are e6 longs, and every
  * squared distance is an exact integer — order-independent and
  * bit-replayable by a SQL oracle (SURVEY §5.4). First minimal index wins
  * ties. Semantics are identical to the HOF formulation — pinned by
  * PqSpec's equivalence test.
  */
case class PqAssign(child: Expression,
    codebooks: Array[Array[Array[Long]]]) extends UnaryExpression {

  private val m = codebooks.length
  private val kSub = codebooks(0).length
  private val subDim = codebooks(0)(0).length
  // flat layout: ((s * kSub) + c) * subDim + j
  private lazy val flat: Array[Long] =
    codebooks.flatten.flatten

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_assign expects array<float|double>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_assign"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    // Quantize the whole vector ONCE per row (r11) — inside the centroid
    // loop each component's floor(x·1e6) was recomputed kSub (16)×.
    val dim = m * subDim
    val xq = new Array[Long](dim)
    val isF = elemIsFloat
    var i = 0
    while (i < dim) {
      val xd = if (isF) v.getFloat(i).toDouble else v.getDouble(i)
      xq(i) = math.floor(xd * 1e6).toLong
      i += 1
    }
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bd = Long.MaxValue
      var c = 0
      while (c < kSub) {
        val base = (s * kSub + c) * subDim
        var d = 0L
        var j = 0
        while (j < subDim) {
          val diff = xq(s * subDim + j) - flat(base + j)
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
    val flatRef = ctx.addReferenceObj("pqFlat", flat, "long[]")
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
      val xq = ctx.freshName("xq")
      val i = ctx.freshName("i")
      val getter = if (elemIsFloat) "getFloat" else "getDouble"
      s"""
         |long[] $xq = new long[${m * subDim}];
         |for (int $i = 0; $i < ${m * subDim}; $i++) {
         |  $xq[$i] = (long) java.lang.Math.floor(
         |    (double) $v.$getter($i) * 1.0E6);
         |}
         |int[] $codes = new int[$m];
         |for (int $s = 0; $s < $m; $s++) {
         |  int $best = 0;
         |  long $bd = Long.MAX_VALUE;
         |  for (int $c = 0; $c < $kSub; $c++) {
         |    int $base = ($s * $kSub + $c) * $subDim;
         |    long $d = 0L;
         |    for (int $j = 0; $j < $subDim; $j++) {
         |      long $diff = $xq[$s * $subDim + $j] - $flatRef[$base + $j];
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
  def apply(vec: Column, codebooks: Array[Array[Array[Long]]]): Column =
    GraftBridge.column(PqAssign(GraftBridge.expression(vec), codebooks))
}
