package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Fused PQ encode kernel — the wide-codebook (codebooks-as-DATA)
  * counterpart of the plan-literal `l2Units` kernel grid, for
  * codebook shapes past the ~64-kernel JIT budget (FAISS-standard
  * cb = 256 especially).
  *
  * The shape problem it solves: past the budget, the previous wide
  * path evaluated the per-subspace argmin as a `transform` +
  * `array_sort` HOF over an `array<struct<cl, cu>>` codebook literal
  * — m·cb INTERPRETED lambda dispatches per corpus row (512 at the
  * gate's m=8, cb=64), each boxing a struct and sorting cb of them.
  * Encode is the corpus-sized pass of a 100 TB index build (and runs
  * once per joint-Lloyd training iteration), so the interpreted fold
  * was the dominant build cost (`ann_pq_wide` 9.2 s vs flat PQ's
  * ~2.6 s at bench SF). Here the codebooks ride the plan as ONE
  * `long[]` reference object ([[SqEncodeI64]]'s pattern — plan DATA,
  * zero JIT kernels added per codebook entry) and the m×cb×dsub loop
  * compiles to three nested counted loops inside whole-stage codegen.
  *
  * Bit-parity (spec-pinned both against the plan-literal kernel grid
  * and the HOF path it replaces): the distance is [[L2UnitsI64]]'s
  * exact overflow-checked long Σ(Δ²), and scanning codes ASCENDING
  * with a strict `<` keeps the FIRST minimal distance — exactly the
  * `array_sort`-by-(du, cl) lowest-code tiebreak and `pqArgmin`'s
  * when-chain rule. Overflow: normalized units |u| ≤ 1e8, centroids
  * are means of units, so per-term Δ² ≤ 4e16 and a dsub ≤ 64 sum
  * stays < 2.6e18 < 2⁶³; addExact/multiplyExact fail loudly beyond.
  *
  * Flat layout: `books[(j·cb + c)·dsub + d]` = dimension d of code c
  * of subspace j — m·cb·dsub longs (32 KB at (8, 64, 8); 128 KB at
  * FAISS (16, 256, 8)), far below where a broadcast frame would win
  * over a per-task reference object.
  */
case class PqEncodeI64(child: Expression, books: Array[Long],
                       m: Int, cb: Int, dsub: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"pq_encode expects array<long>, got $t")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(a: Any): Any = {
    val u = a.asInstanceOf[ArrayData]
    IntegerUnits.requireSameLength(u.numElements(), m * dsub, "pq_encode")
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      var bestD = Long.MaxValue
      var bestC = 0
      var c = 0
      while (c < cb) {
        var acc = 0L
        val base = (j * cb + c) * dsub
        var d = 0
        while (d < dsub) {
          val diff = u.getLong(j * dsub + d) - books(base + d)
          acc = Math.addExact(acc, Math.multiplyExact(diff, diff))
          d += 1
        }
        if (acc < bestD) { bestD = acc; bestC = c }
        c += 1
      }
      out(j) = bestC
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("pqBooks", books, "long[]")
    nullSafeCodeGen(ctx, ev, u => {
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val j = ctx.freshName("j"); val c = ctx.freshName("c"); val d = ctx.freshName("d")
      val bestD = ctx.freshName("bestD"); val bestC = ctx.freshName("bestC")
      val acc = ctx.freshName("acc"); val base = ctx.freshName("base")
      val diff = ctx.freshName("diff")
      s"""
         |int $n = $u.numElements();
         |if ($n != ${m * dsub}) throw new IllegalArgumentException(
         |  "pq_encode: vector dim " + $n + " != m*dsub = ${m * dsub}");
         |int[] $out = new int[$m];
         |for (int $j = 0; $j < $m; $j++) {
         |  long $bestD = Long.MAX_VALUE;
         |  int $bestC = 0;
         |  for (int $c = 0; $c < $cb; $c++) {
         |    long $acc = 0L;
         |    int $base = ($j * $cb + $c) * $dsub;
         |    for (int $d = 0; $d < $dsub; $d++) {
         |      long $diff = $u.getLong($j * $dsub + $d) - $booksRef[$base + $d];
         |      $acc = java.lang.Math.addExact($acc, java.lang.Math.multiplyExact($diff, $diff));
         |    }
         |    if ($acc < $bestD) { $bestD = $acc; $bestC = $c; }
         |  }
         |  $out[$j] = $bestC;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused query ADC-TABLE kernel: all m×cb per-subspace partial
  * distances of one query vector — `array<array<long>>`, the qtable
  * the [[PqAdcSumI64]] scan indexes. The work is query-count sized
  * (never the corpus), but the PLAN cost of the HOF construction it
  * replaces grew with cb: per subspace a `transform` over a
  * `typedlit` codebook-as-data literal — m·cb struct literals
  * embedded in the plan (2048 at the FAISS cb=256 shape), which
  * priced analysis/serialization at ~2 s per execution before a
  * single row moved (measured: ann_pq_faiss 4.6 s vs ann_pq_wide's
  * 2.3 s steady-state on a 500-row corpus — pure plan constant).
  * Here the codebooks ride as ONE long[] reference object
  * ([[PqEncodeI64]]'s layout, identical flattening) and the
  * m×cb×dsub loop compiles inside whole-stage codegen.
  *
  * Bit parity with the HOF/literal table builds is exact: the same
  * overflow-checked long Σ(Δ²) per (subspace, code), emitted in the
  * same (j, c) order ([[graft.plans.IntegerUnits]] l2Units math).
  */
case class PqQTableI64(child: Expression, books: Array[Long],
                       m: Int, cb: Int, dsub: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"pq_qtable expects array<long>, got $t")
  }
  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)
  override def prettyName: String = "pq_qtable"

  override def nullSafeEval(a: Any): Any = {
    val u = a.asInstanceOf[ArrayData]
    IntegerUnits.requireSameLength(u.numElements(), m * dsub, "pq_qtable")
    val out = new Array[Any](m)
    var j = 0
    while (j < m) {
      val row = new Array[Long](cb)
      var c = 0
      while (c < cb) {
        var acc = 0L
        val base = (j * cb + c) * dsub
        var d = 0
        while (d < dsub) {
          val diff = u.getLong(j * dsub + d) - books(base + d)
          acc = Math.addExact(acc, Math.multiplyExact(diff, diff))
          d += 1
        }
        row(c) = acc
        c += 1
      }
      out(j) = new GenericArrayData(row)
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("pqBooks", books, "long[]")
    nullSafeCodeGen(ctx, ev, u => {
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val row = ctx.freshName("row")
      val j = ctx.freshName("j"); val c = ctx.freshName("c"); val d = ctx.freshName("d")
      val acc = ctx.freshName("acc"); val base = ctx.freshName("base")
      val diff = ctx.freshName("diff")
      s"""
         |int $n = $u.numElements();
         |if ($n != ${m * dsub}) throw new IllegalArgumentException(
         |  "pq_qtable: vector dim " + $n + " != m*dsub = ${m * dsub}");
         |Object[] $out = new Object[$m];
         |for (int $j = 0; $j < $m; $j++) {
         |  long[] $row = new long[$cb];
         |  for (int $c = 0; $c < $cb; $c++) {
         |    long $acc = 0L;
         |    int $base = ($j * $cb + $c) * $dsub;
         |    for (int $d = 0; $d < $dsub; $d++) {
         |      long $diff = $u.getLong($j * $dsub + $d) - $booksRef[$base + $d];
         |      $acc = java.lang.Math.addExact($acc, java.lang.Math.multiplyExact($diff, $diff));
         |    }
         |    $row[$c] = $acc;
         |  }
         |  $out[$j] = new org.apache.spark.sql.catalyst.util.GenericArrayData($row);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused ADC distance kernel — the corpus-sized pass of the PQ
  * SERVING path. The joined (codes × queries) scan previously
  * summed the per-subspace table lookups as a static m-term
  * `element_at(element_at(qtable, j+1), codes[j]+1)` expression
  * chain: codegen'd, but m separate two-level ArrayData walks per
  * row, each with its own null/bounds machinery, and the plan grows
  * m nodes (16 at the FAISS m=16 shape). Here the whole
  * Σ_j qtable[j][codes[j]] folds into ONE compiled counted loop
  * reading both arrays once — the serve-scan constant that prices a
  * 100 TB codes-table scan.
  *
  * Unlike [[PqEncodeI64]] the table is NOT a plan literal: each
  * query row carries its own m×cb table (built by `pqQueries`
  * against the broadcast query frame), so this is a binary
  * expression over (codes, qtable) columns.
  *
  * Bit parity with the chain it replaces is exact: identical
  * lookups, long addition in the same j = 0..m−1 order (associative
  * and exact on longs regardless). Overflow: every per-subspace du
  * is an exact Σ(Δ²) over its own dims, so the m-term total is
  * bounded by the full-dim distance ≤ 64·(2e8)² ≈ 2.6e18 < 2⁶³;
  * addExact fails loudly beyond (the [[L2UnitsI64]] guard family).
  */
case class PqAdcSumI64(left: Expression, right: Expression, m: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(IntegerType, _), ArrayType(ArrayType(LongType, _), _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"pq_adc_sum expects (array<int>, array<array<long>>), got ($l, $r)")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "pq_adc_sum"

  override def nullSafeEval(codesAny: Any, tableAny: Any): Any = {
    val codes = codesAny.asInstanceOf[ArrayData]
    val table = tableAny.asInstanceOf[ArrayData]
    IntegerUnits.requireSameLength(codes.numElements(), m, "pq_adc_sum codes")
    IntegerUnits.requireSameLength(table.numElements(), m, "pq_adc_sum qtable")
    var acc = 0L
    var j = 0
    while (j < m) {
      val c = codes.getInt(j)
      val row = table.getArray(j)
      if (c < 0 || c >= row.numElements())
        throw new IllegalArgumentException(
          s"pq_adc_sum: code $c out of range for a ${row.numElements()}-entry table (subspace $j)")
      acc = Math.addExact(acc, row.getLong(c))
      j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (codes, table) => {
      val acc = ctx.freshName("acc"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val row = ctx.freshName("row")
      s"""
         |if ($codes.numElements() != $m) throw new IllegalArgumentException(
         |  "pq_adc_sum codes: length " + $codes.numElements() + " != $m");
         |if ($table.numElements() != $m) throw new IllegalArgumentException(
         |  "pq_adc_sum qtable: length " + $table.numElements() + " != $m");
         |long $acc = 0L;
         |for (int $j = 0; $j < $m; $j++) {
         |  int $c = $codes.getInt($j);
         |  org.apache.spark.sql.catalyst.util.ArrayData $row = $table.getArray($j);
         |  if ($c < 0 || $c >= $row.numElements()) throw new IllegalArgumentException(
         |    "pq_adc_sum: code " + $c + " out of range for a " + $row.numElements()
         |      + "-entry table (subspace " + $j + ")");
         |  $acc = java.lang.Math.addExact($acc, $row.getLong($c));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqQuant {

  /** Column API: the asymmetric distance Σ_j qtable[j][codes[j]] in
    * one fused kernel (exact long).
    */
  def pqAdcSum(codes: Column, qtable: Column, m: Int): Column =
    ColumnBridge.column(PqAdcSumI64(ColumnBridge.expression(codes),
      ColumnBridge.expression(qtable), m))

  /** Column API: the full m×cb query ADC table in one fused kernel
    * (exact long Σ(Δ²) per (subspace, code)).
    */
  def pqQTable(un: Column, books: IndexedSeq[IndexedSeq[Array[Long]]],
               dsub: Int): Column =
    ColumnBridge.column(PqQTableI64(ColumnBridge.expression(un),
      flatten(books, dsub), books.size, books.head.size, dsub))

  /** Flatten nested codebooks into the kernel's `[(j·cb + c)·dsub + d]`
    * layout, validating the shape loudly (a ragged codebook would
    * otherwise read a plausible wrong entry).
    */
  private[graft] def flatten(books: IndexedSeq[IndexedSeq[Array[Long]]],
                             dsub: Int): Array[Long] = {
    val m = books.size
    require(m > 0, "pq_encode: empty codebooks")
    val cb = books.head.size
    val flat = new Array[Long](m * cb * dsub)
    for (j <- books.indices) {
      require(books(j).size == cb,
        s"pq_encode: subspace $j has ${books(j).size} codes, expected $cb")
      for (c <- books(j).indices) {
        require(books(j)(c).length == dsub,
          s"pq_encode: entry ($j, $c) has dim ${books(j)(c).length}, expected $dsub")
        System.arraycopy(books(j)(c), 0, flat, (j * cb + c) * dsub, dsub)
      }
    }
    flat
  }

  /** Column API: all m argmin codes of a normalized-units vector in
    * one fused kernel — `array<int>` of length m.
    */
  def pqEncodeCodes(un: Column, books: IndexedSeq[IndexedSeq[Array[Long]]],
                    dsub: Int): Column =
    ColumnBridge.column(PqEncodeI64(ColumnBridge.expression(un),
      flatten(books, dsub), books.size, books.head.size, dsub))
}
