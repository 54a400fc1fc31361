package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native Catalyst expression: all LSH band signatures of an
  * `array<float>` vector against a fixed set of hyperplanes, in ONE
  * pass — replaces `bands × rowsPerBand` separate higher-order
  * `aggregate(zip_with(...))` dot products (each a per-element lambda
  * dispatch) with a single codegen'd integer loop.
  *
  * Arithmetic is EXACT fixed-point, not floating: vector components
  * and plane weights are scaled by 1e4 and rounded HALF_UP to longs,
  * and each dot product is an exact 64-bit integer sum (|scaled x| ≤
  * 1e5, |w| ≤ 5e4, dim 64 → max |Σ| ≈ 3e11, far under 2^63). A sign
  * decision on an exact integer cannot vary with fold order or engine
  * — which is what makes the ann_lsh DuckDB oracle possible: the SQL
  * mirror reproduces the same integers and therefore the same
  * signatures bit-for-bit. (A double fold would be at the mercy of
  * each engine's summation order at near-zero dots.)
  *
  * Scaling parity: `x*1e4` is exact in a double (24-bit float
  * mantissa + 14 bits < 53), and the sign-split `Math.round` is
  * HALF_UP away from zero — identical to the oracle's
  * `CAST(round(x*10000, 0) AS BIGINT)`.
  *
  * Output: `array<long>` of length `planes.length / rowsPerBand`;
  * bit r of element b is the sign of plane (b*rowsPerBand + r)'s dot.
  */
case class BandSignatures(child: Expression, planes: Seq[Seq[Long]], rowsPerBand: Int)
  extends UnaryExpression {

  // Seq field (not Array) so case-class equals/hashCode compare plane
  // CONTENTS — Array fields fall back to reference identity, which
  // breaks plan canonicalization / subexpression elimination for two
  // semantically identical instances. Eval and codegen still run on
  // primitive arrays, converted once here.
  @transient private lazy val planesArr: Array[Array[Long]] =
    planes.map(_.toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"band_sigs expects an array<float> argument, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "band_sigs"

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val scaled = new Array[Long](n)
    var i = 0
    while (i < n) {
      val x = arr.getFloat(i).toDouble * 10000.0
      scaled(i) = if (x >= 0) math.round(x) else -math.round(-x)
      i += 1
    }
    val bands = planesArr.length / rowsPerBand
    val sigs = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var sig = 0L
      var r = 0
      while (r < rowsPerBand) {
        val w = planesArr(b * rowsPerBand + r)
        val m = math.min(n, w.length)
        var dot = 0L
        var j = 0
        while (j < m) { dot += scaled(j) * w(j); j += 1 }
        if (dot >= 0L) sig |= (1L << r)
        r += 1
      }
      sigs(b) = sig
      b += 1
    }
    new GenericArrayData(sigs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planesArr, "long[][]")
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val scaled = ctx.freshName("scaled"); val x = ctx.freshName("x")
      val bands = ctx.freshName("bands"); val sigs = ctx.freshName("sigs")
      val b = ctx.freshName("b"); val r = ctx.freshName("r"); val j = ctx.freshName("j")
      val sig = ctx.freshName("sig"); val w = ctx.freshName("w")
      val m = ctx.freshName("m"); val dot = ctx.freshName("dot")
      s"""
         |int $n = $arr.numElements();
         |long[] $scaled = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $arr.getFloat($i) * 10000.0;
         |  $scaled[$i] = $x >= 0 ? java.lang.Math.round($x) : -java.lang.Math.round(-$x);
         |}
         |int $bands = $planesRef.length / $rowsPerBand;
         |long[] $sigs = new long[$bands];
         |for (int $b = 0; $b < $bands; $b++) {
         |  long $sig = 0L;
         |  for (int $r = 0; $r < $rowsPerBand; $r++) {
         |    long[] $w = $planesRef[$b * $rowsPerBand + $r];
         |    int $m = java.lang.Math.min($n, $w.length);
         |    long $dot = 0L;
         |    for (int $j = 0; $j < $m; $j++) { $dot += $scaled[$j] * $w[$j]; }
         |    if ($dot >= 0L) $sig |= (1L << $r);
         |  }
         |  $sigs[$b] = $sig;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sigs);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
