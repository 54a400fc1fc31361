package graft

import graft.operators.TextOps

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("tokenStats: whitespace vs BPE-ish pre-tokenizer counts") {
    val docs = Seq((1L, "Hello, world! abc123")).toDF("doc_id", "text")
    val r = TextOps.tokenStats(docs).collect().head
    assert(r.getLong(1) === 20L) // n_chars
    assert(r.getLong(2) === 3L)  // ws tokens: "Hello,", "world!", "abc123"
    // bpe: Hello , world ! abc 123 -> 6
    assert(r.getLong(3) === 6L)
  }

  test("scripts profiles character classes and picks the dominant script") {
    val docs = Seq(
      (1L, "Hello world 123"),            // 10 latin, 3 digit, 2 space
      (2L, "的是了在我 的是"),            // 7 cjk, 1 space
      (3L, "mixed 的是了在我 text here"), // latin-majority with CJK
      (4L, ""),                           // empty
      (5L, "!!! ??? ...")                 // punctuation only -> other
    ).toDF("doc_id", "text")
    val out = TextOps.scripts(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    // exact counts reconcile on the known doc
    val r1 = out(1L)
    assert(r1.getAs[Long]("n_chars") === 15L)
    assert(r1.getAs[Long]("n_latin") === 10L)
    assert(r1.getAs[Long]("n_digit") === 3L)
    assert(r1.getAs[Long]("n_space") === 2L)
    assert(r1.getAs[Long]("n_cjk") === 0L)
    assert(r1.getAs[Long]("n_other") === 0L)
    assert(r1.getAs[String]("main_script") === "latin")
    assert(out(2L).getAs[Long]("n_cjk") === 7L)
    assert(out(2L).getAs[String]("main_script") === "cjk")
    assert(out(3L).getAs[String]("main_script") === "latin")
    assert(out(3L).getAs[Long]("n_cjk") === 5L)
    assert(out(4L).getAs[Any]("latin_ratio") === null)
    assert(out(5L).getAs[String]("main_script") === "other")
    // degenerate docs (empty / whitespace-only: every non-space count
    // is 0) must read "other", not win the cjk branch on 0 >= 0
    assert(out(4L).getAs[String]("main_script") === "other")
    val ws = TextOps.scripts(Seq((6L, "   \t  ")).toDF("doc_id", "text")).collect()(0)
    assert(ws.getAs[String]("main_script") === "other",
      "whitespace-only doc must not be routed to a script pipeline")
    // counts always reconcile (n_other is the exact remainder)
    TextOps.scripts(spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
      .collect().foreach { r =>
        val sum = r.getAs[Long]("n_latin") + r.getAs[Long]("n_digit") +
          r.getAs[Long]("n_cjk") + r.getAs[Long]("n_space") + r.getAs[Long]("n_other")
        assert(sum === r.getAs[Long]("n_chars"))
        assert(r.getAs[Long]("n_other") >= 0L)
      }
  }

  test("quality flags short or punctuation-heavy docs") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "!!! ??? ;;; ::: ..."),
      (3L, "hi")).toDF("doc_id", "text")
    val keep = TextOps.quality(docs).collect().map(r => r.getLong(0) -> r.getBoolean(9)).toMap
    assert(keep === Map(1L -> true, 2L -> false, 3L -> false))
  }

  test("langId scores marker stopwords with multiplicity") {
    val docs = Seq(
      (1L, "the cat of the house is to be found in the garden"),
      (2L, "el gato en la casa es que los perros y el sol"),
      (3L, "der hund und die katze ist nicht ein vogel")).toDF("doc_id", "text")
      .withColumn("lang", org.apache.spark.sql.functions.lit("?"))
    val got = TextOps.langId(docs).collect().map(r => r.getLong(0) -> r.getString(7)).toMap
    assert(got === Map(1L -> "en", 2L -> "es", 3L -> "de"))
  }

  test("quality survives empty and whitespace-only docs (null ratios, keep=false)") {
    val docs = Seq((1L, ""), (2L, "   "), (3L, "normal text here ok fine")).toDF("doc_id", "text")
    val rows = TextOps.quality(docs).collect().map(r => r.getLong(0) ->
      (r.isNullAt(6), r.getBoolean(9))).toMap // (avg_word_len null?, keep)
    assert(rows(1L) === ((true, false)))
    assert(rows(2L) === ((true, false)))
    assert(rows(3L)._2 === true)
  }

  test("winnow: docs sharing a long substring share at least one fingerprint") {
    val shared = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val docs = Seq(
      (1L, s"unique one two three $shared"),
      (2L, s"$shared nine eight seven"),
      (3L, "totally different words entirely here now")).toDF("doc_id", "text")
    val fps = TextOps.winnow(docs).collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((fps(1L) & fps(2L)).nonEmpty, "shared substring must yield a shared fingerprint")
    assert((fps(1L) & fps(3L)).isEmpty)
  }

  test("tfidf ranks rare high-frequency terms first with the log-free idf") {
    val docs = Seq(
      (1L, "apple apple banana"),
      (2L, "banana cherry"),
      (3L, "dog")).toDF("doc_id", "text")
    val got = TextOps.tfidf(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getLong(5)))
    val d1 = got.filter(_._1 == 1L).sortBy(_._6)
    // apple: tf 2, df 1 -> 2*(3+1)/(1+1) = 4.0 beats banana: 1*4/(2+1)
    assert(d1.map(t => (t._2, t._5)).toSeq === Seq(("apple", 4.0), ("banana", 1.333333)))
    // ranks are dense 1..k per doc, never more than k rows
    got.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._6).sorted.toSeq === (1 to rows.length).map(_.toLong))
      assert(rows.length <= 3)
    }
  }

  test("repetition measures token/2-gram duplication and the longest run") {
    val docs = Seq(
      (1L, "a a a b"),   // run of 3, "a a" 2-gram repeats
      (2L, "x y x y")).toDF("doc_id", "text") // tie on counts -> lexicographic top token
    val got = TextOps.repetition(docs).collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getString(2), r.getLong(3), r.getDouble(4),
        r.getDouble(5), r.getDouble(6), r.getLong(7)))).toMap
    // doc 1: 4 tokens (a×3 dup), 2-grams [a a, a a, a b] -> 2/3 dup
    assert(got(1L) === ((4L, "a", 3L, 0.75, 0.75, 0.666667, 3L)))
    // doc 2: all tokens duplicated, "x y" twice of 3, never consecutive
    assert(got(2L) === ((4L, "x", 2L, 0.5, 1.0, 0.666667, 1L)))
  }

  test("repetition top-token packed argmin: ties resolve by full string order, " +
       "including past the 8-byte prefix") {
    // The hash-aggregable rewrite packs (cnt, first-8-UTF-8-bytes)
    // into one decimal and resolves residual ties (same count AND
    // same 8-byte prefix) with the final min(token). Pin every case:
    //  doc 1: count dominance — 'zebra' (3×) beats lexicographically
    //         smaller 1× tokens;
    //  doc 2: tie on count, winner decided INSIDE the 8-byte prefix;
    //  doc 3: tie on count AND on the full 8-byte prefix — the
    //         min(token) pass must look past byte 8 ('aaaaaaaaX' vs
    //         'aaaaaaaaY' differ only at byte 9);
    //  doc 4: prefix-of-each-other ties — 'aaaaaaaa' (8 bytes) vs
    //         'aaaaaaaaa' (9 bytes): shorter sorts first.
    val docs = Seq(
      (1L, "zebra zebra zebra apple banana"),
      (2L, "carrot carrot cabbage cabbage"),
      (3L, "aaaaaaaaY aaaaaaaaX aaaaaaaaY aaaaaaaaX"),
      (4L, "aaaaaaaaa aaaaaaaa aaaaaaaaa aaaaaaaa")).toDF("doc_id", "text")
    val got = TextOps.repetition(docs).collect()
      .map(r => r.getLong(0) -> ((r.getString(2), r.getLong(3)))).toMap
    assert(got(1L) === (("zebra", 3L)))
    assert(got(2L) === (("cabbage", 2L)))
    assert(got(3L) === (("aaaaaaaaX", 2L)))
    assert(got(4L) === (("aaaaaaaa", 2L)))
  }

  test("repetition plan: no corpus-scale sort aggregate and one tokenize pass") {
    val docs = Seq((1L, "a a b"), (2L, "c d")).toDF("doc_id", "text")
    val df = TextOps.repetition(docs)
    val plan = df.queryExecution.executedPlan.toString
    // the token/2-gram/run branches read the checkpointed tokenize
    // frame — the declared plan must not re-tokenize
    assert(!plan.contains("split("), s"tokenization leaked into the declared plan:\n$plan")
    // the only shuffle left is the presentation orderBy; the
    // tokenize checkpoint's re-declared hash(doc_id) partitioning
    // must satisfy every grouping and the two winner-retrieval joins
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 1, s"expected only the orderBy range/hash exchange, got $exchanges:\n$plan")
  }

  test("vocabByLangHeap winner-restricted mapping equals the declared top-k") {
    // winners restricted before the min(token) mapping: results must
    // be identical to a brute-force per-lang top-k with hex60-order
    // tiebreak semantics (the declared contract)
    val docs = Seq(
      (1L, "en", "the the the cat sat"),
      (2L, "en", "the dog sat sat"),
      (3L, "de", "der der die das")).toDF("doc_id", "lang", "text")
    val got = TextOps.vocabByLangHeap(docs, k = 2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.filter(_._1 == "en").map(t => (t._2, t._3, t._4)).toSeq ===
      Seq(("the", 4L, 1L), ("sat", 3L, 2L)))
    assert(got.filter(_._1 == "de").head._2 === "der")
  }

  test("tokenRank concentrates rank on tokens with incoming edges, hand-checked") {
    // graph: a->b (w2), c->b (w1); b dangling; N=3
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "c b")).toDF("doc_id", "text")
    val got = TextOps.tokenRank(docs).collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // iter1: b = 0.05 + 0.85*(1/3 + 1/3); a,c = 0.05 (no in-edges)
    // iter2+: b = 0.05 + 0.85*(0.05 + 0.05) = 0.135
    assert(got.keySet === Set("a", "b", "c"))
    assert(got("b") === 0.135)
    assert(got("a") === 0.05 && got("c") === 0.05)
  }

  test("tokenRank's iteration plan never re-tokenizes the corpus") {
    // edges/nodes/outW are eager localCheckpoints, so the returned
    // plan must reference stored blocks only — zero source re-scans
    // and zero tokenize/split expressions across all 3 iterations
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "c b")).toDF("doc_id", "text")
    val plan = TextOps.tokenRank(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("split("), s"tokenization leaked into the iteration plan:\n$plan")
    assert(!plan.contains("LocalTableScan") || !plan.contains("split("))
  }

  test("fingerprint is identical for identical token streams, and falls back on short docs") {
    val docs = Seq(
      (1L, "a b c d e f g"),
      (2L, "a  b   c d e f g"), // same tokens, different whitespace
      (3L, "tiny doc")).toDF("doc_id", "text")
    val fps = TextOps.fingerprint(docs).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fps(1L) === fps(2L))
    assert(fps(3L).nonEmpty && fps(3L) != fps(1L))
  }

  test("surprisal counts whole bits of inverse unigram frequency, exactly") {
    // corpus: "a a a b" + "b c" -> total 6; f(a)=3, f(b)=2, f(c)=1
    // bits = bitlen(total DIV f) - 1: a -> bitlen(2)-1=1, b -> bitlen(3)-1=1,
    // c -> bitlen(6)-1=2
    val docs = Seq((1L, "a a a b"), (2L, "b c")).toDF("doc_id", "text")
    val got = TextOps.surprisal(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got === Seq(
      (1L, 4L, 4L, 1.0),      // 1+1+1+1 over 4 tokens
      (2L, 2L, 3L, 1.5)))     // 1+2 over 2 tokens
  }

  test("surprisal's scoring plan never re-tokenizes the corpus") {
    val docs = Seq((1L, "a b c a"), (2L, "b c d")).toDF("doc_id", "text")
    val df = TextOps.surprisal(docs)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the tokenize+explode happens ONCE inside the checkpointed
    // count frame; the final plan must only read that RDD back
    assert(!plan.contains("split("),
      s"tokenization leaked into the scoring plan:\n$plan")
  }

  test("tfidf's scoring plan never re-tokenizes the corpus") {
    val docs = Seq((1L, "a b c a"), (2L, "b c d"), (3L, "a d e")).toDF("doc_id", "text")
    val df = TextOps.tfidf(docs)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the tokenize+explode+count chain runs ONCE inside the
    // checkpointed tf frame; both sides of the tf⋈df join and the
    // ranking window read the stored blocks back (round 6 planned the
    // whole chain twice — six source scans)
    assert(!plan.contains("split("),
      s"tokenization leaked into the scoring plan:\n$plan")
  }

  test("surprisal is deterministic across partitionings (integer arithmetic)") {
    val docs = (0 until 200).map(i => (i.toLong, s"w${i % 7} w${i % 13} common common"))
      .toDF("doc_id", "text")
    val a = TextOps.surprisal(docs.repartition(1)).collect().map(_.toString).toSeq
    val b = TextOps.surprisal(docs.repartition(16)).collect().map(_.toString).toSeq
    assert(a === b)
  }

  test("piiScrub counts every injected entity class and the cleaned text is residue-free") {
    val docs = (0L until 64L).map(i => (i, s"plain words only doc $i"))
      .toDF("doc_id", "text")
    val rows = TextOps.piiScrub(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getString(6))).toMap
    assert(rows.size === 64)
    rows.foreach { case (id, (urls, emails, phones, ips, _, _)) =>
      val expect = (id % 4, id % 8) match {
        case (0, _) => (0L, 1L, 0L, 0L)
        case (1, _) => (0L, 0L, 1L, 0L)
        case (2, _) => (0L, 0L, 0L, 1L)
        case (_, 7) => (1L, 1L, 0L, 0L) // url + second entity (email)
        case _      => (1L, 0L, 0L, 0L)
      }
      assert((urls, emails, phones, ips) === expect, s"doc $id")
    }
    // independent JVM-side replay: same injection, java.util.regex
    // replace chain -> identical md5, and no pattern matches remain
    val injected = TextOps.synthesizePii(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    injected.foreach { case (id, text) =>
      val clean = TextOps.piiPatterns.foldLeft(text) { case (t, (_, p, tok)) =>
        t.replaceAll(p, tok)
      }
      TextOps.piiPatterns.foreach { case (name, p, _) =>
        assert(!p.r.findFirstIn(clean).isDefined, s"doc $id: residual $name in '$clean'")
      }
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(clean.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(md5 === rows(id)._6, s"doc $id cleaned md5 mismatch")
      assert(clean.length.toLong === rows(id)._5)
    }
  }

  test("htmlExtract strips markup, drops boilerplate lines, decodes entities — hand-checked") {
    val long = "this content line carries more than thirty characters of prose"
    val docs = (0L until 24L).map(i => (i, s"$long number $i")).toDF("doc_id", "text")
    val rows = TextOps.htmlExtract(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows.size === 24)
    rows.foreach { case (id, r) =>
      assert(r.getLong(1) === 1L, s"doc $id n_scripts")
      assert(r.getLong(2) === 1L, s"doc $id n_styles")
      assert(r.getLong(3) === (if (id % 3 == 0) 1L else 0L), s"doc $id n_comments")
      // entity cluster only on id % 4 == 1: 5 entities (&lt; &gt; &amp; 2×&quot; 2×&#39; = 7)
      assert(r.getLong(5) === (if (id % 4 == 1) 7L else 0L), s"doc $id n_entities")
      // boilerplate dropped: title/nav/h1/footer lines never survive —
      // the only kept line is the <p> content line
      assert(r.getLong(7) === 1L, s"doc $id n_kept")
    }
    // JVM-side replay: same skeleton, java.util.regex chain → same md5;
    // extract starts at the content (no tags, no Copyright, no pipes)
    val skeleton = TextOps.synthesizeHtml(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    skeleton.foreach { case (id, html) =>
      val untagged = TextOps.htmlPatterns.foldLeft(html) { case (t, (_, p)) =>
        t.replaceAll(p, " ")
      }
      val kept = untagged.split("\n", -1).filter { l =>
        l.trim.length >= 30 && !l.contains("|") && !l.trim.startsWith("Copyright")
      }
      val extract = TextOps.htmlEntities.foldLeft(kept.mkString("\n")) {
        case (t, (e, rep)) => t.replace(e, rep)
      }
      assert(!extract.contains("<script") && !extract.contains("Copyright"),
        s"doc $id: boilerplate residue in '$extract'")
      if (id % 4 == 1)
        assert(extract.contains("<cite> & \"quoted\" 'marked'"),
          s"doc $id: entities not decoded in '$extract'")
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(extract.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(md5 === rows(id).getString(9), s"doc $id extract md5 mismatch")
      assert(extract.length.toLong === rows(id).getLong(8), s"doc $id extract_len")
    }
  }
}
