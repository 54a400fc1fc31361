package graft

import java.security.MessageDigest

import graft.operators.Curation

/** Property-style check for the distributed two-pass prefix-sum
  * machinery (range subtotals + broadcast offsets): it must equal
  * the sequential single-stream prefix sum on arbitrary corpora —
  * random sizes, sparse doc_id gaps, and zero-token documents, not
  * just the fixture shapes.
  */
class PrefixSumPropertySpec extends SparkSpec {
  import spark.implicits._

  private val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo",
    "foxtrot", "golf", "hotel")

  /** Random corpus with NON-CONTIGUOUS doc ids and some empty docs. */
  private def corpus(seed: Long): Seq[(Long, String)] = {
    val rng = new scala.util.Random(seed)
    var id = 0L
    Vector.fill(20 + rng.nextInt(280)) {
      id += 1 + rng.nextInt(7)
      val n = rng.nextInt(40) // 0-token docs included
      (id, Vector.fill(n)(vocab(rng.nextInt(vocab.size))).mkString(" "))
    }
  }

  private def nToks(text: String): Long =
    text.trim.split("\\s+").count(_.nonEmpty).toLong

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("packSequences offsets equal the sequential doc_id-order prefix sum") {
    for (seed <- Seq(11L, 12L, 13L)) {
      val c = corpus(seed)
      val inOrder = c.sortBy(_._1).map { case (id, t) => (id, nToks(t)) }
      val expected = inOrder.scanLeft(0L)(_ + _._2).zip(inOrder)
        .map { case (off, (id, _)) => id -> off }.toMap
      val got = Curation.packSequences(c.toDF("doc_id", "text")).collect()
        .map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(got === expected, s"seed $seed")
    }
  }

  test("tokenBudget equals the sequential md5-order cut, crossing doc flagged") {
    for (seed <- Seq(21L, 22L, 23L)) {
      val c = corpus(seed)
      val budget = 50L + new scala.util.Random(seed).nextInt(500)
      val ordered = c.map { case (id, t) => (md5hex(id.toString), id, nToks(t)) }
        .sortBy(x => (x._1, x._2))
      val offs = ordered.scanLeft(0L)(_ + _._3)
      val expected = ordered.zip(offs).collect {
        case ((_, id, n), off) if off < budget => id -> ((n, off, off + n <= budget))
      }.toMap
      val got = Curation.tokenBudget(c.toDF("doc_id", "text"), budget).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
      assert(got === expected, s"seed $seed budget $budget")
    }
  }
}
