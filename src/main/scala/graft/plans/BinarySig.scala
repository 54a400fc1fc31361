package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Codegen kernels for BINARY quantization (`ann_bq`): 1 bit per
  * embedding component (the sign), 32 sign bits packed per Long word,
  * candidates ranked by Hamming distance (popcount of XOR).
  *
  * Why 32 bits per word and not 64: the DuckDB oracle re-derives the
  * same packed words with `CASE WHEN e >= 0 THEN 1 << i ...` summed
  * in BIGINT — at 32 bits per word every partial sum stays strictly
  * below 2^32, so the oracle never shifts into (or sums across) the
  * sign bit, and word equality between engines is a plain integer
  * equality with no two's-complement edge cases. The Hamming sum is
  * identical either way (popcount is word-splittable).
  *
  * Semantics frozen by the oracle: bit i of word w is set iff
  * `embedding[32w + i] >= 0` — a raw float comparison, no rounding
  * step, so the signature is trivially engine-portable. NaN compares
  * false (bit 0) on both engines' IEEE comparison; negative zero
  * compares `>= 0` true on both.
  */

/** `array<float>` → `array<long>`: pack component sign bits, 32 per
  * word, little-endian within the word (component 32w+i → bit i of
  * word w). The last word of a non-multiple-of-32 embedding leaves
  * its high bits zero on both engines (they contribute 0 to every
  * XOR). One codegen kernel per row — the whole encode is a single
  * map pass at scan speed.
  */
case class SignPack32I64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sign_pack32 expects array<float>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sign_pack32"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val words = (n + 31) / 32
    val out = new Array[Long](words)
    var i = 0
    while (i < n) {
      if (x.getFloat(i) >= 0f) out(i / 32) |= (1L << (i % 32))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      s"""
         |int $n = $arr.numElements();
         |long[] $out = new long[($n + 31) / 32];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($arr.getFloat($i) >= 0f) $out[$i / 32] |= (1L << ($i % 32));
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Hamming distance of two packed sign signatures: Σ popcount(a⊕b)
  * over the word arrays. Mismatched lengths throw loudly (same policy
  * as [[L2UnitsI64]] — a malformed signature must not return a
  * plausible wrong distance). Bounded by the total bit count, so the
  * Long sum can never overflow.
  */
case class HammingPackedI64(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"hamming_packed expects two array<long> arguments, got $l / $r")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "hamming_packed"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = IntegerUnits.requireSameLength(x.numElements(), y.numElements(), "hamming_packed")
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += java.lang.Long.bitCount(x.getLong(i) ^ y.getLong(i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (arr1, arr2) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |${IntegerUnits.sameLengthJava(n, arr1, arr2, "hamming_packed")}
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += java.lang.Long.bitCount($arr1.getLong($i) ^ $arr2.getLong($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BinarySig {
  /** Column API for the sign-bit packer. */
  def signPack(e: Column): Column =
    ColumnBridge.column(SignPack32I64(ColumnBridge.expression(e)))

  /** Column API for the packed Hamming distance. */
  def hammingPacked(a: Column, b: Column): Column =
    ColumnBridge.column(HammingPackedI64(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
