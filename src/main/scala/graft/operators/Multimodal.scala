package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY §2 #32): treat media as opaque
  * `binary` columns + typed metadata, with decode/feature-extract as
  * distributed per-partition kernels.
  *
  * Header PARSING is real byte arithmetic — PNG / GIF / BMP carry
  * their dimensions at fixed offsets (big- and little-endian), and
  * the typed kernel additionally walks JPEG segment markers to SOF.
  * Only pixel DECODE would need a codec library (absent in this
  * container), so payloads are synthesized: the corpus has no image
  * bytes, and [[binaryMeta]] deterministically wraps each document's
  * text in a real PNG/GIF/BMP header (dimensions derived from
  * doc_id) before parsing it back. Both construction and parse are
  * pure byte algebra any engine replays — the oracle builds and
  * parses the identical bytes in DuckDB.
  */
object Multimodal {

  /** A "media file" row: opaque payload + metadata. */
  final case class MediaRow(doc_id: Long, payload: Array[Byte])

  /** Extracted features (the header-parse output schema). */
  final case class MediaMeta(doc_id: Long, n_bytes: Long, format: String,
                             width: Long, height: Long, channels: Long)

  /** Deterministic synthetic payload: doc_id picks the container
    * (mod 5: PNG, GIF89a, BMP, WebP/VP8X, TIFF/II), dimensions are
    * doc_id-derived, text bytes follow the header as the "pixel
    * data". Emitted as a real `binary` column via unhex so everything
    * downstream exercises binary plumbing, not strings.
    *
    * WebP is the RIFF extended-format layout (VP8X chunk: canvas
    * width−1 / height−1 as u24le, alpha flag 0x10 on even doc_ids);
    * TIFF is a little-endian ("II") file with one IFD @8 carrying
    * SHORT entries for ImageWidth(256) / ImageLength(257) /
    * SamplesPerPixel(277) — real layouts per their public specs.
    */
  def synthesize(documents: DataFrame): DataFrame = {
    def byteHexLe(c: Column, nBytes: Int): Column =
      concat((0 until nBytes).map(k =>
        lpad(hex(shiftright(c, 8 * k) % 256), 2, "0")): _*)
    val w = (col("doc_id") % 1000 + 1).cast("long")
    val h = (col("doc_id") % 777 + 1).cast("long")
    val png = concat(
      lit("89504E470D0A1A0A"), // magic
      lit("0000000D49484452"), // IHDR length 13 + "IHDR"
      lpad(hex(w), 8, "0"), lpad(hex(h), 8, "0"), // big-endian u32 dims
      lit("0802000000")) // bit depth 8, color type 2 (truecolor), c/f/i
    val gif = concat(
      lit("474946383961"), // "GIF89a"
      byteHexLe(w, 2), byteHexLe(h, 2)) // little-endian u16 dims
    val bmp = concat(
      lit("424D"), lit("0" * 24), // "BM", size/reserved/offset zeroed
      lit("28000000"), // BITMAPINFOHEADER size 40
      byteHexLe(w, 4), byteHexLe(h, 4)) // little-endian i32 dims
    val webp = concat(
      lit("52494646"), lit("00000000"), // "RIFF", size zeroed
      lit("57454250"), lit("56503858"), // "WEBP", "VP8X"
      lit("0A000000"), // VP8X chunk length 10 (u32le)
      when(col("doc_id") % 2 === 0, lit("10")).otherwise(lit("00")), // alpha flag
      lit("000000"), // reserved
      byteHexLe(w - 1, 3), byteHexLe(h - 1, 3)) // canvas−1, u24le
    val tiff = concat(
      lit("49492A00"), lit("08000000"), // "II", magic 42, IFD @ 8
      lit("0300"), // 3 IFD entries (u16le)
      lit("0001"), lit("0300"), lit("01000000"), byteHexLe(w, 4), // 256 ImageWidth SHORT
      lit("0101"), lit("0300"), lit("01000000"), byteHexLe(h, 4), // 257 ImageLength SHORT
      lit("1501"), lit("0300"), lit("01000000"), lit("03000000"), // 277 SamplesPerPixel = 3
      lit("00000000")) // next-IFD terminator
    val headerHex = when(col("doc_id") % 5 === 0, png)
      .when(col("doc_id") % 5 === 1, gif)
      .when(col("doc_id") % 5 === 2, bmp)
      .when(col("doc_id") % 5 === 3, webp)
      .otherwise(tiff)
    documents.select(col("doc_id"),
      unhex(concat(headerHex, hex(col("text")))).as("payload"))
  }

  /** Parse container magic + dimensions from the byte layout — pure
    * Column algebra over hex(payload): byte k of the payload is hex
    * chars [2k−1, 2k], big-endian fields read left-to-right,
    * little-endian fields reverse byte pairs. No codec, no UDF; the
    * whole parse stays inside whole-stage codegen.
    *
    * Offsets (1-based bytes): PNG w/h = u32be @17/@21, color type
    * @26 (→ channels 0→1, 2→3, 4→2, 6→4); GIF w/h = u16le @7/@9
    * (palette → 3 channels); BMP w/h = i32le @19/@23 (synthesized
    * 24bpp → 3); WebP/VP8X w/h = u24le canvas−1 @25/@28, alpha flag
    * bit 0x10 @21 (→ 4 channels else 3); TIFF ("II", IFD @8 with
    * the synthesized 3-entry layout) w/h = SHORT values @19/@31,
    * samples @43 — the GENERAL IFD walk lives in [[parseHeader]];
    * the Column path reads the fixed layout [[synthesize]] emits,
    * like the other containers. Digest is md5 of the hex (DuckDB's
    * md5 is VARCHAR-only, so the oracle-parity digest hashes the hex
    * form).
    */
  def binaryMeta(documents: DataFrame): DataFrame = {
    val media = synthesize(documents)
    val hx = hex(col("payload"))
    def be(startByte: Int, nBytes: Int): Column =
      conv(substring(hx, (startByte - 1) * 2 + 1, nBytes * 2), 16, 10).cast("long")
    def le(startByte: Int, nBytes: Int): Column =
      conv(concat(((nBytes - 1) to 0 by -1).map(k =>
        substring(hx, (startByte - 1 + k) * 2 + 1, 2)): _*), 16, 10).cast("long")
    val isPng = substring(hx, 1, 16) === "89504E470D0A1A0A"
    val isGif = substring(hx, 1, 12).isin("474946383761", "474946383961")
    val isBmp = substring(hx, 1, 4) === "424D"
    val isWebp = substring(hx, 1, 8) === "52494646" &&
      substring(hx, 17, 8) === "57454250" && substring(hx, 25, 8) === "56503858"
    val isTiff = substring(hx, 1, 8).isin("49492A00", "4D4D002A")
    media.select(
        col("doc_id"),
        length(col("payload")).cast("long").as("n_bytes"),
        md5(hx).as("digest"),
        when(isPng, "png").when(isGif, "gif").when(isBmp, "bmp")
          .when(isWebp, "webp").when(isTiff, "tiff")
          .otherwise("unknown").as("format"),
        when(isPng, be(17, 4)).when(isGif, le(7, 2)).when(isBmp, le(19, 4))
          .when(isWebp, le(25, 3) + 1).when(isTiff, le(19, 2)).as("width"),
        when(isPng, be(21, 4)).when(isGif, le(9, 2)).when(isBmp, le(23, 4))
          .when(isWebp, le(28, 3) + 1).when(isTiff, le(31, 2)).as("height"),
        when(isPng, // color type → sample count
          when(be(26, 1) === 0, 1L).when(be(26, 1) === 2, 3L)
            .when(be(26, 1) === 4, 2L).when(be(26, 1) === 6, 4L))
          .when(isGif, 3L).when(isBmp, 3L)
          .when(isWebp, when(be(21, 1).bitwiseAND(16) =!= 0, 4L).otherwise(3L))
          .when(isTiff, le(43, 2)).as("channels"))
      .withColumn("n_pixels", (col("width") * col("height")).cast("long"))
      .orderBy(col("doc_id"))
  }

  /** Decode-free resize PLANNER — the metadata half of the resize
    * step in an image-training pipeline: aspect-preserving letterbox
    * fit of each image into a `target`×`target` box, from the header
    * dimensions alone. Emits the scaled size (exact half-up integer
    * rounding — `(2·w·t + h) DIV (2·h)` keeps every engine
    * bit-identical, clamped to ≥ 1 px), the centering pads, and an
    * upscale flag. The pixel resample itself needs a codec (out of
    * scope, like pixel decode in [[decodePipeline]]); at 100 TB this
    * planner is the cheap metadata pass that sizes batches and
    * buffers BEFORE any pixel work is scheduled.
    */
  def resizePlan(documents: DataFrame, target: Int = 224): DataFrame = {
    val t = lit(target.toLong)
    binaryMeta(documents)
      .select(col("doc_id"), col("format"), col("width"), col("height"),
        when(col("width") >= col("height"), t)
          .otherwise(greatest(lit(1L), expr(s"(2 * width * $target + height) DIV (2 * height)")))
          .as("out_w"),
        when(col("width") >= col("height"),
          greatest(lit(1L), expr(s"(2 * height * $target + width) DIV (2 * width)")))
          .otherwise(t).as("out_h"))
      .select(col("doc_id"), col("format"), col("width"), col("height"),
        col("out_w"), col("out_h"),
        expr(s"($target - out_w) DIV 2").as("pad_left"),
        expr(s"($target - out_h) DIV 2").as("pad_top"),
        (col("width") < t && col("height") < t).as("upscale"))
      .orderBy(col("doc_id"))
  }

  /** Feature-extraction stub with REAL distributed plumbing: a 16-bin
    * byte-class histogram per payload (high nibble of each byte — a
    * deterministic, decode-free stand-in for the per-image feature
    * vector a codec-backed extractor would emit). All 16 bin counts
    * are computed INSIDE the row over the hex form (`size(filter(…))`
    * per bin — no per-byte explode, so the shuffle carries 16 rows
    * per document, not one row per byte; at 100 TB that is the
    * difference between a metadata-sized and a corpus-sized
    * exchange). Bins with zero hits are emitted (fixed 16-row shape
    * per doc — the downstream feature matrix is dense).
    */
  def byteHistogram(documents: DataFrame): DataFrame =
    synthesize(documents)
      .select(col("doc_id"),
        posexplode(graft.plans.NibbleHistogram.nibbleHistogram(col("payload")))
          .as(Seq("bin", "n")))
      .select(col("doc_id"), col("bin").cast("long").as("bin"), col("n"))
      .orderBy(col("doc_id"), col("bin"))

  /** Near-duplicate payload pairs by byte-class histogram distance —
    * the decode-free perceptual-dup pass of an image/media pipeline
    * (the pHash-bucket analog): two payloads whose length-normalized
    * 16-bin nibble histograms sit within `1/thresholdDen` L1 distance
    * are near-dups. ENTIRELY integer arithmetic: normalized L1 ≤ 1/t
    * ⟺ t·Σᵢ|hᵃᵢ·lenᵇ − hᵇᵢ·lenᵃ| ≤ lenᵃ·lenᵇ (cross-multiplied — no
    * division, bit-exact in any engine), and the reported distance is
    * integer-floor ppm. The 16-term sum is UNROLLED over `element_at`
    * columns so it stays inside whole-stage codegen (a `zip_with`/
    * `aggregate` HOF here would run interpreted per pair — the §5
    * perf trap).
    *
    * Scale shape mirrors [[graft.operators.Similarity.embeddingNearDup]]:
    * the histogram frame is metadata-sized (17 longs/doc, computed by
    * the one-pass [[graft.plans.NibbleHistogram]] kernel at scan
    * speed), and the Θ(n²) pair space is spread over a block-pair
    * triangle equi-join — no BNLJ, no cartesian, no full-corpus
    * broadcast. The same auto-sizing rule applies (~200k rows per
    * block side), though a histogram row is ~20× smaller than an
    * embedding row.
    */
  def payloadNearDup(documents: DataFrame, thresholdDen: Long = 200L,
                     blocks: Int = 0): DataFrame = {
    // Exactness domain, enforced LOUDLY (the addExact/2^52 policy):
    // num = Σ|hᵃᵢ·lᵇ − hᵇᵢ·lᵃ| ≤ 2·lᵃ·lᵇ, and the ppm projection
    // computes num·10⁶ on pairs that survive num·den ≤ lᵃ·lᵇ, i.e.
    // num ≤ lᵃ·lᵇ/den — so Long holds everything iff
    // lᵃ·lᵇ ≤ 9.2e18·den/10⁶; at den = 200 that is ~1.8e15, met by
    // capping each payload at 4e7 bytes (40 MB). A payload past the
    // cap (or empty — it would reach the DIV as a 0 divisor) errors
    // loudly instead of overflowing or crashing mid-plan. The guard
    // rides the len projection so column pruning cannot drop it.
    val lenRaw = length(col("payload")).cast("long")
    val lenGuarded = when(lenRaw.between(1L, 40000000L), lenRaw)
      .otherwise(raise_error(format_string(
        "payload_neardup: payload length %d outside the exact-ppm Long bound [1, 4e7]",
        lenRaw)).cast("long"))
    val hists = synthesize(documents).select(
      col("doc_id"),
      lenGuarded.as("len"),
      graft.plans.NibbleHistogram.nibbleHistogram(col("payload")).as("hist"))
    val b =
      if (blocks > 0) blocks
      else {
        val n = documents.select(col("doc_id")).count()
        math.max(16L, (n + 199999L) / 200000L).toInt
      }
    val e = hists.withColumn("blk", pmod(xxhash64(col("doc_id")), lit(b)).cast("int"))
    val sideA = e.select(col("doc_id").as("ia"), col("len").as("la"),
        col("hist").as("ha"), col("blk").as("bi"))
      .withColumn("bj", explode(sequence(col("bi"), lit(b - 1))))
    val sideB = e.select(col("doc_id").as("ib"), col("len").as("lb"),
        col("hist").as("hb"), col("blk").as("bj"))
      .withColumn("bi", explode(sequence(lit(0), col("bj"))))
    val num = (0 until 16).map(i =>
      abs(element_at(col("ha"), i + 1) * col("lb")
        - element_at(col("hb"), i + 1) * col("la"))).reduce(_ + _)
    sideA.join(sideB, Seq("bi", "bj"))
      .filter(col("bi") =!= col("bj") || col("ia") < col("ib"))
      .withColumn("num", num)
      .filter(col("num") * thresholdDen <= col("la") * col("lb"))
      .select(least(col("ia"), col("ib")).as("a"), greatest(col("ia"), col("ib")).as("b"),
        expr("(num * 1000000) DIV (la * lb)").as("dist_ppm"))
      .orderBy(col("a"), col("b"))
  }

  /** Frame sampling over binary payloads: split each payload into
    * fixed-size frames (a stand-in for video GOP/frame boundaries),
    * keep every Nth, emit per-frame metadata. Pure Column algebra —
    * `sequence`+`transform`+`posexplode` — so the fan-out happens
    * executor-side at scan speed with no UDF; the frame list is never
    * materialized per row beyond the generator.
    */
  def frameSample(documents: DataFrame, frameBytes: Int = 16, everyN: Int = 4): DataFrame = {
    val n = length(col("text"))
    // (n-1)/frameBytes is DOUBLE division; for n=0 it truncates to 0
    // and sequence(0,0) would fabricate one empty frame (and the
    // oracle's floor division would not). Count frames with integer
    // arithmetic and guard empty payloads to an empty array.
    val nFrames = ((n + (frameBytes - 1)).cast("long") / frameBytes).cast("int")
    val frames = when(n > 0,
      transform(sequence(lit(0), nFrames - 1),
        i => col("text").substr(i * frameBytes + 1, lit(frameBytes))))
      .otherwise(array().cast("array<string>"))
    documents
      .select(col("doc_id"), posexplode(frames).as(Seq("frame_idx", "frame")))
      .filter(col("frame_idx") % everyN === 0)
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        length(col("frame")).cast("long").as("frame_chars"),
        md5(col("frame")).as("digest"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  /** The distributed decode pipeline: binary batches → per-partition
    * kernel → typed rows. [[parseHeader]] is a REAL byte-level
    * header parser (PNG/GIF/BMP fixed offsets plus the JPEG marker
    * walk the Column-algebra path can't express); only pixel decode
    * remains out of scope without a codec. Partitioning, iterator
    * streaming, encoders, and schema are production-shaped.
    */
  def decodePipeline(documents: DataFrame): Dataset[MediaMeta] = {
    val spark = documents.sparkSession
    import spark.implicits._
    synthesize(documents).as[MediaRow]
      .mapPartitions { rows => rows.map(m => parseHeader(m.doc_id, m.payload)) }
  }

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be32(b: Array[Byte], i: Int): Long =
    ((u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3))
  private def le16(b: Array[Byte], i: Int): Long = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong | (u8(b, i + 1).toLong << 8) | (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24))

  /** Byte-level header parse: PNG, GIF, BMP at fixed offsets, JPEG
    * via the segment-marker walk (FF xx + big-endian length) to the
    * first SOF0-SOF15 frame header, which carries height u16be @+5,
    * width @+7, components @+9 — exactly how `identify`-style tools
    * read dimensions without decoding.
    */
  def parseHeader(docId: Long, b: Array[Byte]): MediaMeta = {
    def meta(fmt: String, w: Long, h: Long, c: Long) =
      MediaMeta(docId, b.length.toLong, fmt, w, h, c)
    if (b.length >= 26 && be32(b, 0) == 0x89504e47L && be32(b, 4) == 0x0d0a1a0aL) {
      val channels = u8(b, 25) match {
        case 0 => 1L; case 2 => 3L; case 4 => 2L; case 6 => 4L; case _ => 0L
      }
      meta("png", be32(b, 16), be32(b, 20), channels)
    } else if (b.length >= 10 &&
        (b.startsWith("GIF87a".getBytes) || b.startsWith("GIF89a".getBytes))) {
      meta("gif", le16(b, 6), le16(b, 8), 3L)
    } else if (b.length >= 26 && u8(b, 0) == 'B' && u8(b, 1) == 'M') {
      meta("bmp", le32(b, 18), le32(b, 22), 3L)
    } else if (b.length >= 16 && b.startsWith("RIFF".getBytes) &&
        b.slice(8, 12).sameElements("WEBP".getBytes)) {
      // WebP: real RIFF chunk walk — fourcc(4) size(u32le) payload
      // (odd sizes pad to even) — until a dimensioned chunk: VP8X
      // (canvas−1 u24le ×2 + alpha flag 0x10), VP8L (lossless: 14-bit
      // w−1 / h−1 + alpha bit packed after the 0x2F signature), or
      // VP8 (lossy: start code 9D 01 2A then 14-bit dims, u16le).
      def u24le(i: Int): Long = u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16)
      var i = 12
      var out: MediaMeta = null
      while (out == null && i + 8 <= b.length) {
        val fourcc = new String(b.slice(i, i + 4), "ISO-8859-1")
        val size = le32(b, i + 4)
        val p = i + 8 // payload start
        fourcc match {
          case "VP8X" if p + 10 <= b.length =>
            val channels = if ((u8(b, p) & 0x10) != 0) 4L else 3L
            out = meta("webp", u24le(p + 4) + 1, u24le(p + 7) + 1, channels)
          case "VP8L" if p + 5 <= b.length && u8(b, p) == 0x2f =>
            val w = (u8(b, p + 1) | ((u8(b, p + 2) & 0x3f) << 8)) + 1L
            val h = ((u8(b, p + 2) >> 6) | (u8(b, p + 3) << 2) |
              ((u8(b, p + 4) & 0x0f) << 10)) + 1L
            out = meta("webp", w, h, if (((u8(b, p + 4) >> 4) & 1) != 0) 4L else 3L)
          case "VP8 " if p + 10 <= b.length && u8(b, p + 3) == 0x9d &&
              u8(b, p + 4) == 0x01 && u8(b, p + 5) == 0x2a =>
            out = meta("webp", le16(b, p + 6) & 0x3fff, le16(b, p + 8) & 0x3fff, 3L)
          case _ =>
            // untrusted u32le chunk size: values >= 2^31 cast toInt go
            // negative and would walk the cursor backwards into an
            // ArrayIndexOutOfBounds. Advance in Long space and stop
            // the walk (zero-dims fallback) when the skip leaves the
            // buffer.
            val next = p.toLong + size + (size & 1L)
            i = if (next < 0 || next > b.length.toLong) b.length else next.toInt
        }
      }
      if (out != null) out else meta("webp", 0L, 0L, 0L)
    } else if (b.length >= 8 &&
        ((u8(b, 0) == 'I' && u8(b, 1) == 'I' && u8(b, 2) == 42 && u8(b, 3) == 0) ||
         (u8(b, 0) == 'M' && u8(b, 1) == 'M' && u8(b, 2) == 0 && u8(b, 3) == 42))) {
      // TIFF: real IFD walk honoring the file's byte order — entry
      // count u16 at the IFD offset, then 12-byte entries
      // (tag, type, count, value); SHORT values sit in the value
      // field's first two bytes in file order, LONGs use all four.
      val le = u8(b, 0) == 'I'
      def u16(i: Int): Long = if (le) le16(b, i) else ((u8(b, i) << 8) | u8(b, i + 1)).toLong
      def u32(i: Int): Long = if (le) le32(b, i) else be32(b, i)
      val ifd = u32(4).toInt
      if (ifd + 2 <= b.length) {
        val n = u16(ifd).toInt
        var width = 0L; var height = 0L
        var samples = 1L // TIFF default SamplesPerPixel
        var e = 0
        while (e < n && ifd + 2 + 12 * (e + 1) <= b.length) {
          val off = ifd + 2 + 12 * e
          val tag = u16(off); val typ = u16(off + 2)
          val value = if (typ == 3L) u16(off + 8) else u32(off + 8)
          tag match {
            case 256L => width = value
            case 257L => height = value
            case 277L => samples = value
            case _ => ()
          }
          e += 1
        }
        meta("tiff", width, height, samples)
      } else meta("tiff", 0L, 0L, 0L)
    } else if (b.length >= 4 && u8(b, 0) == 0xff && u8(b, 1) == 0xd8 && u8(b, 2) == 0xff) {
      // JPEG: walk FF-marker segments to the first SOFn (C0-CF minus
      // the non-frame C4/C8/CC); each non-entropy segment is
      // FF marker len_hi len_lo payload(len-2). Real-world encoders
      // may pad BETWEEN segments with extra FF fill bytes (the spec
      // allows any number before a marker), and TEM (0x01) / RSTn /
      // SOI / EOI are standalone markers with no length field — both
      // must be skipped without reading a bogus length. The SOF
      // payload is precision(1) height(u16be) width(u16be)
      // components(1).
      def be16(i: Int): Long = ((u8(b, i) << 8) | u8(b, i + 1)).toLong
      var i = 2
      var out: MediaMeta = null
      var halted = false
      while (out == null && !halted && i < b.length && u8(b, i) == 0xff) {
        var m = i + 1
        while (m < b.length && u8(b, m) == 0xff) m += 1 // FF fill bytes
        if (m >= b.length) halted = true
        else {
          val marker = u8(b, m)
          if (marker >= 0xc0 && marker <= 0xcf && marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
            out =
              if (m + 8 < b.length)
                meta("jpeg", be16(m + 6), be16(m + 4), u8(b, m + 8).toLong)
              else meta("jpeg", 0L, 0L, 0L)
          } else if (marker == 0x01 || marker == 0x00 ||
              (marker >= 0xd0 && marker <= 0xd9)) {
            i = m + 1 // standalone: TEM / stuffed 00 / RSTn / SOI / EOI
          } else if (m + 2 < b.length) {
            i = m + 1 + ((u8(b, m + 1) << 8) | u8(b, m + 2))
          } else halted = true
        }
      }
      if (out != null) out else meta("jpeg", 0L, 0L, 0L)
    } else meta("unknown", 0L, 0L, 0L)
  }
}
