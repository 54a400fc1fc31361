package graft

import graft.plans.BinarySig._
import org.apache.spark.sql.functions._

/** The binary-signature kernels must be bit-equal to the Column-API
  * reference chains the DuckDB oracle replays (sign comparison → 32
  * bits per BIGINT word → popcount-of-XOR Hamming), over the real
  * embeddings corpus plus the edge shapes parquet floats allow.
  */
class BinarySigSpec extends SparkSpec {

  private lazy val emb =
    graft.sources.Tables(spark, "/root/testdata/sf0.001").embeddings

  test("signPack equals the per-word sign-bit fold on the real corpus") {
    val dim = 64 // testdata embeddings are 64-dim (asserted below)
    assert(emb.select(max(size(col("embedding")))).collect()(0).getInt(0) === dim)
    val ref = array((0 until (dim + 31) / 32).map { w =>
      (0 until 32).map { i =>
        when(col("embedding").getItem(w * 32 + i) >= lit(0f), lit(1L << i)).otherwise(lit(0L))
      }.reduce(_ + _)
    }: _*)
    val diff = emb.select(signPack(col("embedding")).as("k"), ref.as("r"))
      .filter(col("k") =!= col("r"))
    assert(diff.count() === 0L)
  }

  test("signPack packs partial last words with high bits zero; -0.0f counts as >= 0") {
    import spark.implicits._
    // 37 dims: word 0 full, word 1 holds 5 bits — positions 5..31 must
    // stay zero. Includes a -0.0f (IEEE: -0.0 >= 0 is true).
    val v: Array[Float] = Array.tabulate(37)(i =>
      if (i == 3) -0.0f else if (i % 2 == 0) 0.5f else -0.5f)
    val got = Seq(Tuple1(v)).toDF("embedding")
      .select(signPack(col("embedding"))).collect()(0).getSeq[Long](0)
    var w0 = 0L; var w1 = 0L
    for (i <- 0 until 37; if v(i) >= 0f) {
      if (i < 32) w0 |= (1L << i) else w1 |= (1L << (i - 32))
    }
    assert(got === Seq(w0, w1))
    assert((got(1) >>> 5) === 0L, "bits past the last component must be zero")
    assert((got(0) & (1L << 3)) !== 0L, "-0.0f must pack as a set sign bit (>= 0)")
  }

  test("hammingPacked equals popcount-of-XOR on collected signatures; length mismatch throws") {
    import spark.implicits._
    val probe = emb.orderBy(col("vec_id")).limit(1)
      .select(signPack(col("embedding"))).collect()(0).getSeq[Long](0).toArray
    val rows = emb.select(col("vec_id"), signPack(col("embedding")).as("sig"),
        hammingPacked(signPack(col("embedding")), lit(probe)).as("h"))
      .collect()
    rows.foreach { r =>
      val sig = r.getSeq[Long](1)
      val want = sig.zip(probe).map { case (a, b) => java.lang.Long.bitCount(a ^ b).toLong }.sum
      assert(r.getLong(2) === want, s"hamming drifted for vec ${r.getLong(0)}")
    }
    val bad = intercept[Exception] {
      Seq((Array(1L, 2L), Array(1L))).toDF("a", "b")
        .select(hammingPacked(col("a"), col("b"))).collect()
    }
    assert(bad.getMessage.contains("hamming_packed") ||
      bad.getCause != null && bad.getCause.getMessage.contains("hamming_packed"),
      "mismatched signature lengths must fail loudly, not truncate")
  }
}
