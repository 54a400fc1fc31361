package graft

import graft.operators.{Curation, Skew, Multimodal}
import graft.sources.Formats
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("splitAssign is deterministic, exhaustive, and ~80/10/10") {
    val out = Curation.splitAssign(docs).cache()
    assert(out.count() === docs.count())
    val frac = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(frac("train") > frac("val") && frac("train") > frac("test"))
    // re-run gives identical assignment (content-hash, not rand())
    val again = Curation.splitAssign(docs)
    assert(out.join(again, Seq("doc_id"))
      .filter(out("split") =!= again("split")).count() === 0)
    out.unpersist()
  }

  test("sampleStratified returns k docs per stratum, stable across runs") {
    val s1 = Curation.sampleStratified(docs, k = 5).collect().map(r => (r.getLong(0), r.getString(1)))
    val s2 = Curation.sampleStratified(docs, k = 5).collect().map(r => (r.getLong(0), r.getString(1)))
    assert(s1.toSeq === s2.toSeq)
    assert(s1.groupBy(_._2).forall(_._2.length == 5))
  }

  test("pplBuckets cuts each language at its exact surprisal terciles") {
    val out = Curation.pplBuckets(docs).cache()
    val rows = out.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3)))
    assert(rows.nonEmpty)
    assert(rows.map(_._4).toSet.subsetOf(Set("head", "middle", "tail")))
    // per-language: bucket order is monotone in mean_bits (threshold
    // cut — ties can never straddle buckets)
    rows.groupBy(_._2).foreach { case (lang, rs) =>
      def bits(b: String) = rs.filter(_._4 == b).map(_._3)
      for {
        lo <- Seq(("head", "middle"), ("middle", "tail"))
        (a, b) = lo if bits(a).nonEmpty && bits(b).nonEmpty
      } assert(bits(a).max < bits(b).min, s"$lang: $a overlaps $b")
      // the thresholds are the EXACT local order statistics: replay
      // rank-based terciles over (mean_bits, doc_id) and compare
      val sorted = rs.sortBy(r => (r._3, r._1))
      val n = sorted.length.toLong
      val b1 = sorted(((n + 1) / 3).max(1).toInt - 1)._3
      val b2 = sorted(((2 * n + 2) / 3).max(1).toInt - 1)._3
      rs.foreach { case (id, _, mb, bucket) =>
        val want = if (mb <= b1) "head" else if (mb <= b2) "middle" else "tail"
        assert(bucket === want, s"$lang doc $id: mean_bits $mb -> $bucket, want $want (b1=$b1 b2=$b2)")
      }
    }
    // re-run identical (deterministic two-pass rank location)
    val again = Curation.pplBuckets(docs).collect().map(_.toString)
    assert(again.toSeq === out.collect().map(_.toString).toSeq)
    out.unpersist()
  }

  test("pplFilter keeps buckets at their per-myriad rates deterministically") {
    val buckets = Curation.pplBuckets(docs).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    val out = Curation.pplFilter(docs).cache()
    val kept = out.collect().map(r =>
      (r.getLong(0), r.getString(3), r.getLong(4), r.getLong(5)))
    assert(kept.nonEmpty)
    // rate semantics: every head doc kept, NO tail doc kept, middle
    // kept iff its hash falls under the rate — and the emitted
    // bucket matches the stratification
    kept.foreach { case (id, bucket, rate, hash) =>
      assert(bucket === buckets(id), s"doc $id bucket drifted from pplBuckets")
      assert(hash < rate, s"doc $id kept with hash $hash >= rate $rate")
    }
    val keptIds = kept.map(_._1).toSet
    val heads = buckets.filter(_._2 == "head").keySet
    val tails = buckets.filter(_._2 == "tail").keySet
    assert(heads.subsetOf(keptIds), "a head doc was dropped at rate 10000")
    assert(tails.intersect(keptIds).isEmpty, "a tail doc survived rate 0")
    // the middle keep fraction concentrates near 1/2 (deterministic
    // hash, per-myriad rate 5000)
    val mids = buckets.count(_._2 == "middle").toDouble
    val midKept = kept.count(_._2 == "middle").toDouble
    assert(midKept / mids > 0.3 && midKept / mids < 0.7,
      s"middle keep fraction ${midKept / mids} far from 0.5")
    // re-run identical (pure function of doc_id)
    val again = Curation.pplFilter(docs).collect().map(_.toString)
    assert(again.toSeq === out.collect().map(_.toString).toSeq)
    // unlisted buckets keep everything
    val allKept = Curation.pplFilter(docs, rates = Map("tail" -> 0))
      .collect().map(_.getLong(0)).toSet
    assert(allKept === buckets.keySet -- tails)
    out.unpersist()
  }

  test("mixSources keeps whole-rate sources entirely and respects rates") {
    val out = Curation.mixSources(docs).cache()
    val bySource = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val inSource = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // rate-10000 sources keep every doc
    (0 to 4).foreach(i => assert(bySource(s"src$i") === inSource(s"src$i")))
    // sub-rate sources keep a strict, non-empty subset overall
    val halfKept = (5 to 9).map(i => bySource.getOrElse(s"src$i", 0L)).sum
    val halfIn = (5 to 9).map(i => inSource(s"src$i")).sum
    assert(halfKept > 0 && halfKept < halfIn)
    // re-run is identical (content-hash, not rand())
    val again = Curation.mixSources(docs).collect().map(_.getLong(0)).sorted
    assert(again.toSeq === out.collect().map(_.getLong(0)).sorted.toSeq)
    out.unpersist()
  }

  test("shardManifest partitions the corpus exactly and carries an order-invariant signature") {
    val m = Curation.shardManifest(docs, shards = 8).cache()
    assert(m.count() === 8)
    // manifest totals reconcile with the corpus (no doc lost/duplicated)
    val (nd, tc) = m.agg(sum("n_docs"), sum("total_chars")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).head
    assert(nd === docs.count())
    assert(tc === docs.agg(sum(length(col("text")))).collect().head.getLong(0))
    // signature is invariant to input ordering/partitioning …
    val shuffled = Curation.shardManifest(
      docs.orderBy(col("n_chars"), col("doc_id")).repartition(7), shards = 8)
    assert(m.select("shard", "content_sig").collect().toSet ===
      shuffled.select("shard", "content_sig").collect().toSet)
    // … but detects a dropped document in whichever shard held it
    val victim = docs.limit(1).select("doc_id").collect().head.getLong(0)
    val tampered = Curation.shardManifest(docs.filter(col("doc_id") =!= victim), shards = 8)
    assert(m.select("shard", "content_sig").collect().toSet !==
      tampered.select("shard", "content_sig").collect().toSet)
    // … and detects CONTENT corruption with every id/count/total intact
    // (the signature must cover text, not just the id set)
    val corrupted = Curation.shardManifest(
      docs.withColumn("text",
        when(col("doc_id") === victim,
          concat(expr("substring(text, 1, length(text) - 1)"), lit("X")))
          .otherwise(col("text"))), shards = 8)
    assert(m.select("shard", "content_sig").collect().toSet !==
      corrupted.select("shard", "content_sig").collect().toSet)
    m.unpersist()
  }

  test("oversample brings every stratum to exactly the largest stratum's size") {
    val plan = Curation.oversample(docs).cache()
    assert(plan.count() === docs.count(), "one plan row per doc")
    val perLang = plan.groupBy("lang").agg(sum("copies").as("total")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val target = docs.groupBy("lang").count().collect().map(_.getLong(1)).max
    assert(perLang.values.toSet === Set(target), s"every stratum must sum to $target")
    // the largest stratum is untouched (all copies = 1)
    val biggest = docs.groupBy("lang").count().collect().maxBy(_.getLong(1)).getString(0)
    assert(plan.filter(col("lang") === biggest).filter(col("copies") =!= 1L).count() === 0)
    // deterministic across runs
    val again = Curation.oversample(docs).collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(again.toSeq === plan.collect().map(r => (r.getLong(0), r.getLong(2))).toSeq)
    plan.unpersist()
    // a NULL lang is a stratum, not a silent drop (null-safe join)
    val withNull = docs.withColumn("lang",
      when(col("doc_id") % 7 === 0, lit(null: String)).otherwise(col("lang")))
    val nullPlan = Curation.oversample(withNull)
    assert(nullPlan.count() === docs.count(), "null-lang docs must stay in the plan")
    assert(nullPlan.filter(col("lang").isNull).count() > 0)
  }

  test("mixSources membership is independent of splitAssign buckets") {
    // the :mix salt must decorrelate the two hash decisions: if they
    // shared a hash, every kept doc of a rate-2500 source would land
    // in split buckets 0-24
    val kept = Curation.mixSources(docs).filter(col("rate") === 2500)
      .select(col("doc_id")) // drop mix's own bucket; keep split's
    val withSplit = kept.join(Curation.splitAssign(docs), "doc_id")
    assert(withSplit.filter(col("bucket") >= 25).count() > 0)
  }

  test("balanceStrata yields equal-sized strata of the min size") {
    val out = Curation.balanceStrata(docs)
    val sizes = out.groupBy("lang").count().collect().map(_.getLong(1)).toSet
    val minIn = docs.groupBy("lang").count().collect().map(_.getLong(1)).min
    assert(sizes === Set(minIn))
  }

  test("saltedEnrich equals the plain join") {
    // events is a TIMESTAMP(NANOS) table: must go through the catalog reader
    val t = graft.sources.Tables(spark, "/root/testdata/sf0.001")
    val salted = Skew.saltedEnrich(t.events, t.customer).collect().map(_.toString).sorted
    val plain = graft.operators.FinAnalytics.companyEnrich(t.events, t.customer)
      .collect().map(_.toString).sorted
    assert(salted.toSeq === plain.toSeq)
  }

  test("decodePipeline (mapPartitions kernel) agrees with binaryMeta column algebra") {
    val viaKernel = Multimodal.decodePipeline(docs).collect()
      .map(m => (m.doc_id, m.n_bytes, m.format, m.width, m.height, m.channels)).toSet
    val viaColumns = Multimodal.binaryMeta(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(viaKernel === viaColumns)
  }

  test("resizePlan letterbox-fits every image with centered pads and bounded aspect error") {
    val plans = Multimodal.resizePlan(docs).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
        r.getLong(6), r.getLong(7), r.getBoolean(8)))
    assert(plans.nonEmpty)
    plans.foreach { case (id, w, h, ow, oh, padL, padT, up) =>
      assert(ow >= 1 && ow <= 224 && oh >= 1 && oh <= 224, s"doc $id out of box: ${ow}x$oh")
      assert(ow == 224 || oh == 224, s"doc $id: neither side reaches the box")
      // centered letterbox: pads split the leftover (floor on the odd px)
      assert(padL == (224 - ow) / 2 && padT == (224 - oh) / 2, s"doc $id pads off-center")
      assert(up === (w < 224 && h < 224), s"doc $id upscale flag wrong")
      // aspect preserved within half-pixel rounding of the scaled side
      if (w >= h) assert(math.abs(oh.toDouble - 224.0 * h / w) <= 0.5, s"doc $id aspect drift")
      else assert(math.abs(ow.toDouble - 224.0 * w / h) <= 0.5, s"doc $id aspect drift")
    }
  }

  test("byteHistogram emits 16 dense bins per doc summing to the payload size") {
    val hist = Multimodal.byteHistogram(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val sizes = Multimodal.binaryMeta(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byDoc = hist.groupBy(_._1)
    assert(byDoc.keySet === sizes.keySet)
    byDoc.foreach { case (id, rows) =>
      assert(rows.map(_._2).sorted.toSeq === (0L until 16L), s"doc $id bins not dense")
      assert(rows.map(_._3).sum === sizes(id), s"doc $id histogram mass != n_bytes")
      assert(rows.forall(_._3 >= 0))
    }
  }

  test("payloadNearDup equals a local brute-force histogram compare and plans no BNLJ/cartesian") {
    val df = Multimodal.payloadNearDup(docs)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"pair join must stay an equi-join:\n$plan")
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // local reference: nibble histograms + cross-multiplied L1
    val payloads = Multimodal.synthesize(docs).collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
    val hists = payloads.map { case (id, b) =>
      val h = new Array[Long](16)
      b.foreach(x => h((x & 0xf0) >> 4) += 1)
      (id, b.length.toLong, h)
    }
    val want = (for {
      (ia, la, ha) <- hists; (ib, lb, hb) <- hists if ia < ib
      num = (0 until 16).map(i => math.abs(ha(i) * lb - hb(i) * la)).sum
      if num * 200L <= la * lb
    } yield (ia, ib, num * 1000000L / (la * lb))).toSet
    assert(got === want)
    assert(got.nonEmpty, "threshold should admit some pairs on the test corpus")
  }

  test("payloadNearDupBanded: precision 1.0 (subset of exact, same ppm), high recall, no quadratic join") {
    // Engineered corpus: 40 groups × 5 members sharing a long base
    // text with tiny per-member tails (histogram L1 well under the
    // 1/200 threshold within a group, far across groups) — enough
    // true pairs for recall to mean something, unlike the handful the
    // parquet corpora admit.
    // doc_id stride 5 keeps every group member in the SAME container
    // format (synthesize picks by doc_id % 5), so header bytes differ
    // only in the dimension fields (≤ 16 bytes) — at ~8k chars the
    // header + tail perturbations stay well inside the threshold.
    val rng = new scala.util.Random(7)
    val corpus = (0 until 40).flatMap { g =>
      val base = (0 until 6000).map { _ =>
        val r = rng.nextInt(36)
        if (r < 26) ('a' + r).toChar else ('0' + (r - 26)).toChar
      }.mkString + " the quick brown fox " * 100
      (0 until 5).map(m => (g * 1000L + m * 5, base + ("x" * m)))
    }.toDF("doc_id", "text")
    val exact = Multimodal.payloadNearDup(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(exact.size >= 300, s"corpus must admit many true pairs, got ${exact.size}")
    val bandedDf = Multimodal.payloadNearDupBanded(corpus)
    val plan = bandedDf.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"candidate join must stay an equi-join:\n$plan")
    val banded = bandedDf.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(banded.subsetOf(exact), "banded rows must be a subset of exact with identical ppm values")
    val recall = banded.size.toDouble / exact.size
    assert(recall >= 0.98, s"recall vs exact = $recall")
  }

  test("payloadNearDupBanded recalls every exact pair on the sf0.001 corpus") {
    val exact = Multimodal.payloadNearDup(docs).collect().map(_.toString).toSet
    val banded = Multimodal.payloadNearDupBanded(docs).collect().map(_.toString).toSet
    assert(exact.nonEmpty)
    assert(banded === exact, "on this corpus the banded candidates cover every exact pair")
  }

  test("decodeAvPipeline (mapPartitions kernel) agrees with avMeta column algebra") {
    val viaKernel = Multimodal.decodeAvPipeline(docs).collect()
      .map(m => (m.doc_id, m.n_bytes, m.format, m.sample_rate, m.channels, m.bit_depth, m.width, m.height)).toSet
    val viaColumns = Multimodal.avMeta(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSet
    assert(viaKernel === viaColumns)
    assert(viaKernel.map(_._3) === Set("wav", "mp4", "flac", "ogg"))
    // both Ogg codec-id branches must flow (Opus at doc_id % 8 = 3,
    // Vorbis at % 8 = 7), each with a parsed rate and channels
    val ogg = viaKernel.filter(_._3 == "ogg")
    assert(ogg.exists(_._1 % 8 == 3) && ogg.exists(_._1 % 8 == 7))
    assert(ogg.forall(m => m._4 > 0 && m._5 > 0 && m._6 == 0))
  }

  test("parseAvHeader walks non-canonical container layouts (the general walks)") {
    import Multimodal.parseAvHeader
    def u32le(v: Long) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def u32be(v: Long) = Array[Byte]((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def u16le(v: Long) = Array[Byte](v.toByte, (v >> 8).toByte)

    // WAV with a JUNK chunk (odd size → pad byte) BEFORE fmt — the
    // chunk walk must skip it, a fixed-offset parse would misread.
    val fmtBody = Array[Byte](1, 0) ++ u16le(2) ++ u32le(44100) ++
      u32le(44100 * 2 * 2) ++ u16le(4) ++ u16le(16)
    val wav = "RIFF".getBytes ++ u32le(200) ++ "WAVE".getBytes ++
      "JUNK".getBytes ++ u32le(3) ++ Array[Byte](9, 9, 9, 0) ++ // odd size, padded
      "fmt ".getBytes ++ u32le(16) ++ fmtBody
    val wm = parseAvHeader(1L, wav)
    assert((wm.format, wm.sample_rate, wm.channels, wm.bit_depth) === (("wav", 44100L, 2L, 16L)))

    // FLAC with an APPLICATION block before STREAMINFO — block walk.
    val streaminfo = Array[Byte](0x10, 0, 0x10, 0, 0, 0, 0, 0, 0, 0) ++
      // packed: sr=48000 (0x0BB80), ch=1, bps=24: b0=0x0B, b1=0xB8, b2=0x00|0|1=0x01, b3=0x70
      Array[Byte](0x0b, 0xb8.toByte, 0x01, 0x70, 0, 0, 0, 0) ++ Array.fill(16)(0.toByte)
    val flac = "fLaC".getBytes ++
      Array[Byte](2, 0, 0, 4) ++ "APPL".getBytes ++ // APPLICATION block, len 4
      Array[Byte](0x80.toByte, 0, 0, 34) ++ streaminfo // last | STREAMINFO
    val fm = parseAvHeader(2L, flac)
    assert((fm.format, fm.sample_rate, fm.channels, fm.bit_depth) === (("flac", 48000L, 1L, 24L)))

    // MP4 with a free box between ftyp and moov, an mvhd sibling
    // before trak, and a VERSION-1 tkhd (64-bit times → dims 12
    // bytes further out) — the box walk must descend correctly.
    val tkhdV1Body = Array[Byte](1, 0, 0, 0) ++ Array.fill(8 + 8)(0.toByte) ++ // v1, creation/mod u64
      u32be(1) ++ u32be(0) ++ Array.fill(8)(0.toByte) ++ // track, reserved, duration u64
      Array.fill(8)(0.toByte) ++ Array.fill(2 + 2 + 2 + 2)(0.toByte) ++ // reserved, layer/alt/vol/res
      Array.fill(36)(0.toByte) ++ // matrix
      u32be(1280L << 16) ++ u32be(720L << 16)
    val tkhd = u32be(8 + tkhdV1Body.length) ++ "tkhd".getBytes ++ tkhdV1Body
    val mvhd = u32be(16) ++ "mvhd".getBytes ++ Array.fill(8)(0.toByte)
    val trak = u32be(8 + tkhd.length) ++ "trak".getBytes ++ tkhd
    val moov = u32be(8 + mvhd.length + trak.length) ++ "moov".getBytes ++ mvhd ++ trak
    val mp4 = u32be(16) ++ "ftyp".getBytes ++ "isom".getBytes ++ u32be(0) ++
      u32be(12) ++ "free".getBytes ++ u32be(0) ++ moov
    val mm = parseAvHeader(3L, mp4)
    assert((mm.format, mm.width, mm.height) === (("mp4", 1280L, 720L)))

    // Ogg first page: OggS header with a 1-entry segment table, then
    // the codec id header — OpusHead (channels u8 @9, input rate
    // u32le @12) and ␁vorbis (channels u8 @11, rate u32le @12).
    def oggPage(payload: Array[Byte]): Array[Byte] =
      "OggS".getBytes ++ Array[Byte](0, 2) ++ Array.fill(8)(0.toByte) ++ // ver, BOS, granule
        Array.fill(12)(0.toByte) ++ Array[Byte](1, payload.length.toByte) ++ payload
    val opus = oggPage("OpusHead".getBytes ++ Array[Byte](1, 2) ++ u16le(312) ++
      u32le(48000) ++ Array[Byte](0, 0, 0))
    val om = parseAvHeader(4L, opus)
    assert((om.format, om.sample_rate, om.channels, om.bit_depth) === (("ogg", 48000L, 2L, 0L)))
    val vorbis = oggPage(Array[Byte](1) ++ "vorbis".getBytes ++ u32le(0) ++
      Array[Byte](1) ++ u32le(44100) ++ Array.fill(13)(0.toByte))
    val vm = parseAvHeader(5L, vorbis)
    assert((vm.format, vm.sample_rate, vm.channels, vm.bit_depth) === (("ogg", 44100L, 1L, 0L)))
  }

  test("parseHeader reads real PNG/GIF/BMP/JPEG header bytes") {
    import Multimodal.parseHeader
    // PNG 640x480 RGBA, built per spec: magic, IHDR len+tag, dims,
    // bit depth 8, color type 6
    val png = (Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a,
      0x00, 0x00, 0x00, 0x0d, 0x49, 0x48, 0x44, 0x52,
      0x00, 0x00, 0x02, 0x80, 0x00, 0x00, 0x01, 0xe0,
      0x08, 0x06, 0x00, 0x00, 0x00).map(_.toByte))
    val p = parseHeader(1L, png)
    assert((p.format, p.width, p.height, p.channels) === (("png", 640L, 480L, 4L)))
    // GIF89a 320x200 (little-endian u16)
    val gif = "GIF89a".getBytes ++ Array(0x40, 0x01, 0xc8, 0x00).map(_.toByte)
    val g = parseHeader(2L, gif)
    assert((g.format, g.width, g.height) === (("gif", 320L, 200L)))
    // BMP 100x50: BM, 12 filler bytes, DIB size 40, dims i32le
    val bmp = ("BM".getBytes ++ Array.fill(12)(0.toByte)
      ++ Array(0x28, 0, 0, 0, 100, 0, 0, 0, 50, 0, 0, 0).map(_.toByte))
    val b = parseHeader(3L, bmp)
    assert((b.format, b.width, b.height) === (("bmp", 100L, 50L)))
    // JPEG: SOI, APP0 (16 bytes), then SOF0 800x600 3-component —
    // exercises the marker WALK, not a fixed offset
    val jpeg = (Array(0xff, 0xd8, // SOI
      0xff, 0xe0, 0x00, 0x10) ++ Array.fill(14)(0) ++ // APP0 len 16
      Array(0xff, 0xc0, 0x00, 0x11, 0x08, 0x02, 0x58, 0x03, 0x20, 0x03) ++ // SOF0: h=600 w=800 c=3
      Array.fill(14)(0)).map(_.toByte)
    val j = parseHeader(4L, jpeg)
    assert((j.format, j.width, j.height, j.channels) === (("jpeg", 800L, 600L, 3L)))
    // truncated/garbage bytes classify as unknown without throwing
    assert(parseHeader(5L, Array[Byte](1, 2, 3)).format === "unknown")
    // JPEG with FF fill padding between segments and a standalone TEM
    // marker before SOF — the walk must skip both without reading a
    // bogus length (real-world encoder quirks the spec permits)
    val jpegPadded = (Array(0xff, 0xd8, // SOI
      0xff, 0xe0, 0x00, 0x04, 0x00, 0x00, // APP0 len 4
      0xff, 0xff, 0xff, 0x01, // two fill bytes + standalone TEM
      0xff, 0xff, 0xc0, 0x00, 0x11, 0x08, 0x02, 0x58, 0x03, 0x20, 0x03) ++ // fill + SOF0
      Array.fill(14)(0)).map(_.toByte)
    val jp = parseHeader(6L, jpegPadded)
    assert((jp.format, jp.width, jp.height, jp.channels) === (("jpeg", 800L, 600L, 3L)))
  }

  test("parseHeader walks real WebP RIFF chunks and TIFF IFDs (both byte orders)") {
    import Multimodal.parseHeader
    // WebP VP8X 1000x500 with alpha, preceded by a junk chunk the
    // walk must skip (fourcc JUNK, odd size 3 -> even-padded to 4)
    def rb(s: String) = s.getBytes("ISO-8859-1")
    val vp8x = (rb("RIFF") ++ Array[Byte](0, 0, 0, 0) ++ rb("WEBP")
      ++ rb("JUNK") ++ Array[Byte](3, 0, 0, 0) ++ Array.fill(4)(0.toByte)
      ++ rb("VP8X") ++ Array[Byte](10, 0, 0, 0)
      ++ Array(0x10, 0, 0, 0, 0xe7, 0x03, 0x00, 0xf3, 0x01, 0x00).map(_.toByte)) // 999/499 u24le
    val wx = parseHeader(1L, vp8x)
    assert((wx.format, wx.width, wx.height, wx.channels) === (("webp", 1000L, 500L, 4L)))
    // WebP VP8L (lossless) 2x2 without alpha: sig 0x2F, then
    // 14-bit w-1=1, 14-bit h-1=1 LSB-first => bytes 01 40 00 00
    val vp8l = (rb("RIFF") ++ Array[Byte](0, 0, 0, 0) ++ rb("WEBP")
      ++ rb("VP8L") ++ Array[Byte](5, 0, 0, 0)
      ++ Array(0x2f, 0x01, 0x40, 0x00, 0x00).map(_.toByte))
    val wl = parseHeader(2L, vp8l)
    assert((wl.format, wl.width, wl.height, wl.channels) === (("webp", 2L, 2L, 3L)))
    // WebP VP8 (lossy) 640x480: 3-byte frame tag, start code
    // 9D 01 2A, then u16le dims
    val vp8 = (rb("RIFF") ++ Array[Byte](0, 0, 0, 0) ++ rb("WEBP")
      ++ rb("VP8 ") ++ Array[Byte](10, 0, 0, 0)
      ++ Array(0, 0, 0, 0x9d, 0x01, 0x2a, 0x80, 0x02, 0xe0, 0x01).map(_.toByte))
    val wv = parseHeader(3L, vp8)
    assert((wv.format, wv.width, wv.height) === (("webp", 640L, 480L)))
    // TIFF little-endian: IFD @8, entries for width 320 / height 200
    // (SHORT) / samples 4, plus an unrelated tag the walk skips
    def entryLE(tag: Int, v: Int) = Array[Byte](
      (tag & 0xff).toByte, (tag >> 8).toByte, 3, 0, 1, 0, 0, 0,
      (v & 0xff).toByte, (v >> 8).toByte, 0, 0)
    val tiffLE = (rb("II") ++ Array[Byte](42, 0, 8, 0, 0, 0, 4, 0)
      ++ entryLE(256, 320) ++ entryLE(257, 200) ++ entryLE(259, 1) ++ entryLE(277, 4)
      ++ Array[Byte](0, 0, 0, 0))
    val tl = parseHeader(4L, tiffLE)
    assert((tl.format, tl.width, tl.height, tl.channels) === (("tiff", 320L, 200L, 4L)))
    // TIFF big-endian (MM): same image, LONG-typed width
    def entryBEShort(tag: Int, v: Int) = Array[Byte](
      (tag >> 8).toByte, (tag & 0xff).toByte, 0, 3, 0, 0, 0, 1,
      (v >> 8).toByte, (v & 0xff).toByte, 0, 0)
    def entryBELong(tag: Int, v: Int) = Array[Byte](
      (tag >> 8).toByte, (tag & 0xff).toByte, 0, 4, 0, 0, 0, 1,
      (v >>> 24).toByte, ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val tiffBE = (rb("MM") ++ Array[Byte](0, 42, 0, 0, 0, 8, 0, 3)
      ++ entryBELong(256, 320) ++ entryBEShort(257, 200) ++ entryBEShort(277, 1)
      ++ Array[Byte](0, 0, 0, 0))
    val tb = parseHeader(5L, tiffBE)
    assert((tb.format, tb.width, tb.height, tb.channels) === (("tiff", 320L, 200L, 1L)))
    // untrusted oversized chunk size (u32le >= 2^31): the walk must
    // stop and degrade to the zero-dims fallback, never cast the size
    // through Int (which went negative and threw AIOOBE)
    val huge = (rb("RIFF") ++ Array[Byte](0, 0, 0, 0) ++ rb("WEBP")
      ++ rb("JUNK") ++ Array(0xff, 0xff, 0xff, 0xff).map(_.toByte)
      ++ Array.fill(4)(0.toByte))
    val hw = parseHeader(6L, huge)
    assert((hw.format, hw.width, hw.height, hw.channels) === (("webp", 0L, 0L, 0L)))
  }

  test("packSequences is the concat-then-chunk packing with exact offsets") {
    val d = Seq(
      (0L, "a b c"),        // 3 tokens
      (1L, "   "),          // 0 tokens
      (2L, "p q r s t"),    // 5 tokens -> straddles the budget-4 boundary
      (3L, "x")             // 1 token
    ).toDF("doc_id", "text")
    val got = Curation.packSequences(d, budget = 4, chunk = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq === Seq(
      (0L, 3L, 0L, 0L, 0L, 1L),
      (1L, 0L, 3L, 0L, 3L, 0L),
      (2L, 5L, 3L, 0L, 3L, 2L), // tokens 3..7 span sequences 0 and 1
      (3L, 1L, 8L, 2L, 0L, 1L)))
  }

  test("packSequences two-pass prefix sum equals the single global window") {
    import org.apache.spark.sql.expressions.Window
    val got = Curation.packSequences(docs).select("doc_id", "off").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w = Window.partitionBy(lit(0)).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = docs
      .select(col("doc_id"),
        size(graft.functions.Hashing.tokens(col("text"))).cast("long").as("n_toks"))
      .withColumn("off", coalesce(sum(col("n_toks")).over(w), lit(0L)))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got === want)
  }

  test("frameSample chunks payloads and keeps every Nth frame") {
    val docs = Seq((1L, "a" * 40), (2L, "xy")).toDF("doc_id", "text")
    val got = Multimodal.frameSample(docs, frameBytes = 16, everyN = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc 1: 40 chars -> frames 0..2 (16,16,8); keep idx 0,2. doc 2: frame 0 only.
    assert(got.toSeq === Seq((1L, 0L, 16L), (1L, 2L, 8L), (2L, 0L, 2L)))
  }

  test("tokenBudget keeps the md5-ordered prefix and flags the crossing doc") {
    val six = (1L to 6L).map(i => (i, "t1 t2 t3 t4 t5")).toDF("doc_id", "text")
    val got = Curation.tokenBudget(six, budget = 12L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    // 5 tokens per doc: offsets 0, 5, 10 fit under 12; the doc at 10
    // crosses the budget (kept, incomplete); offset 15 is cut
    assert(got.map(t => (t._2, t._3, t._4)).toSeq === Seq(
      (5L, 0L, true), (5L, 5L, true), (5L, 10L, false)))
    // deterministic selection (md5 order, not ingest order)
    val again = Curation.tokenBudget(six, budget = 12L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(got.toSeq === again.toSeq)
    // a budget beyond the corpus keeps everything, all complete
    val all = Curation.tokenBudget(six, budget = 1000L).collect()
    assert(all.length === 6 && all.forall(_.getBoolean(3)))
    assert(all.map(_.getLong(2)).sorted.toSeq === Seq(0L, 5L, 10L, 15L, 20L, 25L))
  }

  test("filterGate combines quality, repetition, and language verdicts into one keep") {
    val crafted = Seq(
      // good: english markers, varied tokens, long enough
      (1L, "the quick brown fox jumps over the lazy dog in a field of green grass", "en"),
      // repetitive: one token dominates -> top_frac way over 0.15
      (2L, "spam spam spam spam spam spam spam spam the to of", "en"),
      // junk: too short -> quality keep = false
      (3L, "hi there", "en"),
      // wrong language tag: english text labeled es
      (4L, "the cat and the dog sit in the house of a friend", "es"),
    ).toDF("doc_id", "text", "lang")
    val got = Curation.filterGate(crafted).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(2), r.getBoolean(3), r.getBoolean(4), r.getBoolean(5)))).toMap
    assert(got(1L) === ((true, true, true, true)))
    assert(got(2L)._2 === false && got(2L)._4 === false) // repetition kills it
    assert(got(3L)._1 === false && got(3L)._4 === false) // quality kills it
    assert(got(4L)._3 === false && got(4L)._4 === false) // language mismatch kills it
  }

  test("timeSplit reproduces TimeSeriesSplit fold boundaries, gap, and train clamp") {
    // 20 rows on an hourly lattice; nSplits=2, gap=3, maxTrainSize=5,
    // testSize=4. sklearn semantics, hand-computed:
    //   fold 0: test_start = 20-2*4 = 12 -> test [12,16), train end
    //           12-3 = 9, start max(0, 9-5) = 4 -> train [4,9)
    //   fold 1: test_start = 16 -> test [16,20), train [8,13)
    val events = (0 until 20).map { i =>
      (i.toLong, new java.sql.Timestamp(1704067200000L + i * 3600000L))
    }.toDF("event_id", "ts")
    val got = Curation.timeSplit(events, nSplits = 2, gap = 3, maxTrainSize = 5, testSize = 4)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toSet
    val want =
      ((4 until 9).map(i => (0L, "train", i.toLong)) ++
        (12 until 16).map(i => (0L, "test", i.toLong)) ++
        (8 until 13).map(i => (1L, "train", i.toLong)) ++
        (16 until 20).map(i => (1L, "test", i.toLong))).toSet
    assert(got === want)
    // gap rows [9,12) and [13,16) serve NO role in their folds
    assert(!got.exists { case (f, r, i) => f == 0L && i >= 9 && i < 12 })
    // train clamps at 0 when the corpus is shorter than maxTrainSize
    val tiny = Curation.timeSplit(events, nSplits = 1, gap = 1, maxTrainSize = 100, testSize = 4)
      .collect().map(r => (r.getString(1), r.getLong(3)))
    assert(tiny.filter(_._1 == "train").map(_._2).toSeq.sorted === (0L until 15L))
  }

  test("csv and json round-trips preserve data with explicit schemas") {
    val df = Seq((1L, "a,b\"c", 1.5), (2L, "plain", -0.25)).toDF("id", "s", "v")
    val dir = java.nio.file.Files.createTempDirectory("graft_fmt").toString
    Formats.writeCsv(df, s"$dir/csv")
    Formats.writeJsonLines(df, s"$dir/json")
    Formats.writeOrc(df, s"$dir/orc")
    val csvBack = Formats.readCsv(spark, s"$dir/csv", df.schema).collect().map(_.toString).sorted
    val jsonBack = Formats.readJsonLines(spark, s"$dir/json", df.schema).collect().map(_.toString).sorted
    val orcBack = Formats.readOrc(spark, s"$dir/orc", df.schema).collect().map(_.toString).sorted
    val want = df.collect().map(_.toString).sorted
    assert(csvBack.toSeq === want.toSeq)
    assert(jsonBack.toSeq === want.toSeq)
    assert(orcBack.toSeq === want.toSeq)
  }

  test("pipeline composes filter, dedup, and split into one verdict per doc") {
    import graft.operators.Dedup
    val docs = Seq(
      (1L, "en", "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "en", "the quick brown fox jumps over the lazy dog again and again today"),
      (3L, "en", "an entirely different document with plenty of normal english words inside"),
      (4L, "en", "xy")
    ).toDF("doc_id", "lang", "text").withColumn("source", lit("src0"))
    val comps = Dedup.components(docs)
    val out = Curation.pipeline(docs, comps).collect()
    assert(out.length === 4, "one verdict row per input doc")
    val byId = out.map(r => r.getLong(0) -> r).toMap
    // doc 2 is an exact near-dup of doc 1 -> loses to keeper 1
    assert(byId(2L).getLong(7) === 1L && !byId(2L).getBoolean(8))
    assert(byId(1L).getBoolean(8), "keeper survives dedup")
    // keep == filter_ok && dedup_kept, row by row
    out.foreach { r =>
      assert(r.getBoolean(9) === (r.getBoolean(6) && r.getBoolean(8)))
    }
    // split column is one of the three partitions
    assert(out.forall(r => Set("train", "val", "test")(r.getString(2))))
    // the composition tokenizes ONCE, inside the checkpointed shared
    // projection — no regex split survives into the verdict plan
    val plan = Curation.pipeline(docs, comps).queryExecution.executedPlan.toString
    assert(!plan.contains("split("), s"tokenization leaked into the pipeline plan:\n$plan")
  }
}
