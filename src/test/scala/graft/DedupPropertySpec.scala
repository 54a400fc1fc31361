package graft

import graft.operators.Dedup
/** Property-style check: MinHash-LSH must reproduce the brute-force
  * Jaccard answer on arbitrary corpora — random doc lengths and
  * perturbation patterns across several seeds, not just one fixture.
  */
class DedupPropertySpec extends SparkSpec {
  import spark.implicits._

  private val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo",
    "foxtrot", "golf", "hotel", "india", "juliet", "kilo", "lima")

  private def corpus(seed: Long): Seq[(Long, String)] = {
    val rng = new scala.util.Random(seed)
    val nBase = 4 + rng.nextInt(7)
    val bases = Vector.fill(nBase)(Vector.fill(8 + rng.nextInt(25))(vocab(rng.nextInt(vocab.size))))
    val docs = bases.flatMap { b =>
      val variants = Vector.newBuilder[Vector[String]]
      variants += b
      if (rng.nextBoolean()) variants += b.updated(rng.nextInt(b.size), vocab(rng.nextInt(vocab.size)))
      if (rng.nextInt(3) == 0) variants += b.drop(1 + rng.nextInt(3))
      if (rng.nextInt(4) == 0) variants += b // exact duplicate
      variants.result()
    }
    docs.zipWithIndex.map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
  }

  private def shingleSet(text: String, w: Int): Set[String] = {
    val toks = text.trim.split("\\s+").filter(_.nonEmpty)
    if (toks.length < w) Set.empty else toks.sliding(w).map(_.mkString(" ")).toSet
  }

  private def brute(corpus: Seq[(Long, String)], w: Int, t: Double): Set[(Long, Long, Double)] = {
    val sets = corpus.map { case (id, txt) => id -> shingleSet(txt, w) }.toMap
    (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b && sa.nonEmpty && sb.nonEmpty
      inter = (sa & sb).size
      j = BigDecimal(inter.toDouble / (sa.size + sb.size - inter))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if j >= t
    } yield (a, b, j)).toSet
  }

  test("minhashLsh == brute force on arbitrary corpora") {
    for (seed <- 1L to 5L) {
      val c = corpus(seed * 7919)
      val got = Dedup.minhashLsh(c.toDF("doc_id", "text"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got === brute(c, 3, 0.8), s"seed=$seed")
    }
  }

  test("ngramJaccard == brute force on arbitrary corpora") {
    for (seed <- 1L to 5L) {
      val c = corpus(seed * 104729)
      val got = Dedup.ngramJaccard(c.toDF("doc_id", "text"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got === brute(c, 4, 0.5), s"seed=$seed")
    }
  }

  private def bruteOverlap(corpus: Seq[(Long, String)], w: Int, t: Double): Set[(Long, Long, Double)] = {
    val sets = corpus.map { case (id, txt) => id -> shingleSet(txt, w) }.toMap
    (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b && sa.nonEmpty && sb.nonEmpty
      inter = (sa & sb).size
      c = BigDecimal(inter.toDouble / math.min(sa.size, sb.size))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if c >= t
    } yield (a, b, c)).toSet
  }

  test("containment == brute-force overlap on arbitrary corpora incl. embedded quotes") {
    // The standard corpus plus QUOTE variants — short contiguous
    // slices embedded in longer hosts — the asymmetric pairs the
    // one-sided prefix filter exists for.
    for (seed <- 1L to 5L) {
      val rng = new scala.util.Random(seed * 6151)
      val base = corpus(seed * 6151)
      val quotes = base.filter(_._2.split(" ").length >= 12).take(3).zipWithIndex.map {
        case ((_, txt), i) =>
          val toks = txt.split(" ")
          val from = rng.nextInt(toks.length - 8)
          (1000L + i, toks.slice(from, from + 6 + rng.nextInt(3)).mkString(" "))
      }
      val c = base ++ quotes
      val got = Dedup.containment(c.toDF("doc_id", "text"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got === bruteOverlap(c, 4, 0.8), s"seed=$seed")
      assert(got.nonEmpty, s"seed=$seed produced no containment pairs")
    }
  }
}
