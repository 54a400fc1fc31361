package graft

import graft.functions.VectorFunctions._
import graft.plans.GraftExtensions
import org.apache.spark.sql.functions._

/** The native cosine_f64 Catalyst expression must be bit-identical to
  * its higher-order-function reference (same index-order double
  * accumulation), across interpreted eval and codegen.
  */
class CosineKernelSpec extends SparkSpec {
  import spark.implicits._

  private def randVecs(n: Int, dim: Int): Seq[(Long, Array[Float], Array[Float])] = {
    val rng = new scala.util.Random(42)
    (0 until n).map { i =>
      (i.toLong,
        Array.fill(dim)(rng.nextFloat() * 2 - 1),
        Array.fill(dim)(rng.nextFloat() * 2 - 1))
    }
  }

  test("native kernel equals the fold reference bit-for-bit") {
    val df = randVecs(200, 64).toDF("id", "a", "b")
    val bad = df
      .withColumn("native", cosineFast(col("a"), col("b")))
      .withColumn("ref", cosineFold(col("a"), col("b")))
      .filter(col("native") =!= col("ref"))
      .count()
    assert(bad === 0)
  }

  test("null inputs yield null, not a crash") {
    val df = Seq((Some(Array(1f, 2f)), None: Option[Array[Float]])).toDF("a", "b")
    val out = df.select(cosineFast(col("a"), col("b"))).collect()
    assert(out.head.isNullAt(0))
  }

  test("self-cosine is 1.0") {
    val df = randVecs(50, 16).toDF("id", "a", "b")
    val bad = df.select(abs(cosineFast(col("a"), col("a")) - 1.0).as("d"))
      .filter(col("d") > 1e-12).count()
    assert(bad === 0)
  }

  test("native L2 kernel equals the HOF fold bit-for-bit, incl. float-vs-double sides") {
    import org.apache.spark.sql.functions.{aggregate, zip_with, lit => flit}
    val df = randVecs(200, 64).toDF("id", "a", "b")
      .withColumn("bd", org.apache.spark.sql.functions.transform(col("b"), _.cast("double")))
    def foldL2(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(zip_with(x, y, (p, q) => (p.cast("double") - q.cast("double")) * (p.cast("double") - q.cast("double"))),
        flit(0.0), (acc, v) => acc + v)
    val bad = df
      .withColumn("nat_ff", graft.plans.GraftExpressions.l2F64(col("a"), col("b")))
      .withColumn("nat_fd", graft.plans.GraftExpressions.l2F64(col("a"), col("bd")))
      .withColumn("ref_ff", foldL2(col("a"), col("b")))
      .withColumn("ref_fd", foldL2(col("a"), col("bd")))
      .filter(col("nat_ff") =!= col("ref_ff") || col("nat_fd") =!= col("ref_fd"))
      .count()
    assert(bad === 0)
  }

  test("mismatched lengths throw loudly (the requireSameLength policy), both kernels") {
    val df = Seq((Array(1f, 2f, 3f), Array(1f, 2f))).toDF("a", "b")
    val eCos = intercept[Exception] {
      df.select(graft.plans.GraftExpressions.cosineF64(col("a"), col("b"))).collect()
    }
    assert(eCos.getMessage.contains("cosine_f64") || eCos.getCause != null)
    val eL2 = intercept[Exception] {
      df.select(graft.plans.GraftExpressions.l2F64(col("a"), col("b"))).collect()
    }
    assert(eL2.getMessage.contains("l2_f64") || eL2.getCause != null)
  }

  test("SQL registration via GraftExtensions") {
    GraftExtensions.register(spark)
    val r = spark.sql("SELECT cosine_f64(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
      "array(CAST(0.0 AS FLOAT), CAST(1.0 AS FLOAT))) AS c").collect()
    assert(r.head.getDouble(0) === 0.0)
  }
}
