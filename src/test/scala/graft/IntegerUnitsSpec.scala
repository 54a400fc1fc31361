package graft

import graft.functions.VectorFunctions._
import graft.plans.IntegerUnits._
import org.apache.spark.sql.functions._

/** The integer-units codegen kernels must be bit-equal to the
  * Column-API reference chains they replaced — the DuckDB oracles
  * replay THOSE semantics, so any divergence is an oracle break.
  * Pinned over the real embeddings corpus (all 500 sf0.001 vectors,
  * 64 dims each: every float that actually flows through ann_*).
  */
class IntegerUnitsSpec extends SparkSpec {

  private lazy val emb =
    graft.sources.Tables(spark, "/root/testdata/sf0.001").embeddings

  test("quantizeUnits equals round(double(e) * 1e8) per component") {
    val reference = transform(col("embedding"),
      e => round(e.cast("double") * lit(1e8), 0).cast("long"))
    val diff = emb.select(col("vec_id"), quantizeUnits(col("embedding")).as("k"),
        reference.as("r"))
      .filter(col("k") =!= col("r"))
    assert(diff.count() === 0L)
  }

  test("l2Units equals the integer zip_with/aggregate fold") {
    // distance of every vector to one fixed quantized vector
    val probe = emb.orderBy(col("vec_id")).limit(1)
      .select(quantizeUnits(col("embedding"))).collect()(0).getSeq[Long](0).toArray
    val reference = aggregate(
      zip_with(quantizeUnits(col("embedding")), lit(probe), (a, b) => {
        val d = a - b
        d * d
      }),
      lit(0L), (acc, x) => acc + x)
    val diff = emb.select(l2Units(quantizeUnits(col("embedding")), lit(probe)).as("k"),
        reference.as("r"))
      .filter(col("k") =!= col("r"))
    assert(diff.count() === 0L)
  }

  test("normalizeUnits equals the decimal-norm + quantize reference chain") {
    val nrm = sqrt(decNorm2(col("embedding")).cast("double"))
    val reference = quantizeUnits(
      when(nrm > 0.0, transform(col("embedding"), x => (x.cast("double") / nrm).cast("float")))
        .otherwise(col("embedding")).cast("array<float>"))
    val diff = emb.select(col("vec_id"), normalizeUnits(col("embedding")).as("k"),
        reference.as("r"))
      .filter(col("k") =!= col("r"))
    assert(diff.count() === 0L)
  }

  test("decDot kernel equals the decimal HOF fold (dot and norm forms)") {
    val probe = emb.orderBy(col("vec_id")).limit(1)
      .select(col("embedding")).collect()(0).getSeq[Float](0).toArray
    val diff = emb.select(col("vec_id"),
        decDot(col("embedding"), lit(probe)).as("kd"),
        decDotFold(col("embedding"), lit(probe)).as("rd"),
        decNorm2(col("embedding")).as("kn"),
        decNorm2Fold(col("embedding")).as("rn"))
      .filter(col("kd") =!= col("rd") || col("kn") =!= col("rn"))
    assert(diff.count() === 0L)
  }

  test("normalizeUnits passes a zero vector through unnormalized") {
    import spark.implicits._
    val z = Seq(Tuple1(Array.fill(4)(0.0f))).toDF("embedding")
    val got = z.select(normalizeUnits(col("embedding"))).collect()(0).getSeq[Long](0)
    assert(got === Seq(0L, 0L, 0L, 0L))
  }

  test("fwhtSigns equals the Sylvester bit-count sum the OPQ oracle replays") {
    // y[i] = Σ_j (−1)^popcount(i & j) · s_j · x_j over the real
    // corpus (the butterfly vs the direct O(d²) formula — the SQL
    // side computes the direct form)
    val signs = graft.operators.Similarity.opqSigns(64)
    val rows = emb.select(col("vec_id"),
        normalizeUnits(col("embedding")).as("un"),
        graft.plans.FwhtSignsI64.fwhtSigns(normalizeUnits(col("embedding")), signs).as("y"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val x = r.getSeq[Long](1)
      val y = r.getSeq[Long](2)
      val want = (0 until 64).map { i =>
        (0 until 64).map { j =>
          val h = if (java.lang.Long.bitCount((i & j).toLong) % 2 == 0) 1L else -1L
          h * signs(j) * x(j)
        }.sum
      }
      assert(y === want, s"fwht diverged from the direct form for vec ${r.getLong(0)}")
    }
    // orthogonality at the unnormalized scale: ‖y‖² = 64·‖x‖²
    rows.take(20).foreach { r =>
      val x = r.getSeq[Long](1); val y = r.getSeq[Long](2)
      assert(y.map(v => v * v).sum === 64L * x.map(v => v * v).sum)
    }
    // dimension mismatch fails loudly, never silently truncates
    // (surfaces as IllegalArgumentException directly under local
    // codegen, or wrapped in SparkException from an executor)
    import spark.implicits._
    val bad = Seq(Tuple1(Array.fill(8)(0.1f))).toDF("embedding")
    val e = intercept[Exception] {
      bad.select(graft.plans.FwhtSignsI64.fwhtSigns(
        normalizeUnits(col("embedding")), signs)).collect()
    }
    assert((e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse(""))
      .contains("fwht_signs"), s"unexpected failure: $e")
  }

  test("argminUnits equals the transform+array_min HOF, lowest-cluster tiebreak included") {
    import graft.plans.ArgminL2
    // model: 7 real quantized vectors + a DUPLICATE of centroid 2 at
    // index 5 (forced tie — the kernel must keep the FIRST minimal,
    // i.e. lowest cluster id, exactly array_min over struct(du, id))
    val base = emb.orderBy(col("vec_id")).limit(7)
      .select(quantizeUnits(col("embedding")))
      .collect().map(_.getSeq[Long](0).toArray).toSeq
    val model = base.updated(5, base(2).clone())
    // the HOF reference — the exact expression argminOver built
    val cl = typedlit(model.zipWithIndex.map { case (cu, i) => (i.toLong, cu.toSeq) }
      .map { case (c, cu) => ArgminRef(c, cu) })
    val reference = array_min(transform(cl, c =>
      struct(l2Units(quantizeUnits(col("embedding")), c.getField("cu")).as("du"),
        c.getField("cluster").as("cluster"))))
    val got = emb.select(col("vec_id"),
        ArgminL2.argminUnits(quantizeUnits(col("embedding")), model).as("k"),
        reference.as("r"))
      .select(col("vec_id"), col("k").getItem(0).as("kdu"), col("k").getItem(1).as("kcl"),
        col("r.du").as("rdu"), col("r.cluster").as("rcl"))
    assert(got.filter(col("kdu") =!= col("rdu") || col("kcl") =!= col("rcl")).count() === 0L)
    // the tie is actually exercised: vectors nearest centroid 2 must
    // report cluster 2, never the duplicate at 5
    assert(got.filter(col("kcl") === 5).count() === 0L)
    assert(got.filter(col("kcl") === 2).count() > 0L,
      "tie case never exercised — no vector argmins to the duplicated centroid")
    // dimension mismatch fails loudly
    import spark.implicits._
    val bad = Seq(Tuple1(Array.fill(8)(1L))).toDF("u")
    val e = intercept[Exception] {
      bad.select(ArgminL2.argminUnits(col("u"), model)).collect()
    }
    assert((e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse(""))
      .contains("argmin_l2"), s"unexpected failure: $e")
  }
}

/** typedlit row shape for the argmin HOF reference (a case class is
  * required for typedlit's encoder derivation).
  */
final case class ArgminRef(cluster: Long, cu: Seq[Long])
