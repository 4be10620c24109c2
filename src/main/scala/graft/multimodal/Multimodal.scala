package graft.multimodal

import graft.functions.HashFunctions
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode/feature-extract/sample
  * operators.
  *
  * The Spark-side plumbing (schemas, partition-preserving batch
  * shape, deterministic sampling) is real, and so is one codec per
  * modality — PCM16 WAV (audio), 24-bit BMP (image), uncompressed
  * AVI (video): the formats a pure JVM encodes AND decodes exactly,
  * each graded by a roundtrip whose oracle recomputes the stats from
  * the generator formula alone. The remaining stand-ins
  * (`fakeDecode`'s histogram, `perceptualPixels`' grid) mark where a
  * heavyweight library codec (JPEG, H.264) would bind in
  * `mapPartitions`; everything downstream of them is production
  * plumbing.
  */
object Multimodal {

  val MediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("mime", StringType, nullable = true),
    StructField("byte_len", LongType, nullable = true)))

  /** Attach a binary payload column (here derived from text — in a
    * real corpus this is the raw media bytes from the object store)
    * plus typed metadata. Map-only. */
  def withBinaryPayload(docs: DataFrame, contentCol: String = "text"): DataFrame =
    docs
      .withColumn("payload", encode(col(contentCol), "UTF-8"))
      .withColumn("byte_len", octet_length(col("payload")).cast("long"))
      .withColumn("mime",
        when(col("doc_id") % 3 === 0, lit("image/jpeg"))
          .when(col("doc_id") % 3 === 1, lit("audio/wav"))
          .otherwise(lit("video/mp4")))

  /** Typed metadata extraction: deterministic pseudo-dimensions from
    * the payload hash (a real decoder reads the container header
    * here; the derivation is the stand-in). */
  def extractMeta(media: DataFrame): DataFrame =
    media
      .withColumn("width", (HashFunctions.md5Long(concat(lit("w:"), col("doc_id"))) % 1280 + 64).cast("long"))
      .withColumn("height", (HashFunctions.md5Long(concat(lit("h:"), col("doc_id"))) % 720 + 64).cast("long"))

  /** Deterministic frame/byte sampling: every `stride`-th offset of
    * the payload with its byte value. Map-only fan-out (one row per
    * sampled offset) — the shape a video frame-sampler produces. */
  def sampleFrames(media: DataFrame, stride: Int = 64): DataFrame =
    media
      // byte_len=0 would make sequence() throw (0 to -1); an empty
      // payload must sample zero frames, matching the oracle's
      // range(0, byte_len) which yields no rows.
      .withColumn("offset", explode(
        when(col("byte_len") > 0,
          sequence(lit(0L), col("byte_len") - 1, lit(stride.toLong)))
          .otherwise(array().cast("array<long>"))))
      // index the BINARY payload directly (substring slices bytes on
      // BinaryType) — decoding to string and indexing chars would
      // return codepoints, wrong for any multibyte payload
      .withColumn("byte_val", conv(hex(substring(
        col("payload"), (col("offset") + 1).cast("int"), lit(1))), 16, 10).cast("long"))
      .select(col("doc_id"), col("offset"), col("byte_val"))

  /** Feature extraction over binary payloads via mapPartitions — the
    * batch shape for a real decoder (one codec instance per
    * partition, rows streamed through it). The "decoder" here is a
    * deterministic 16-bin byte histogram. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("features", ArrayType(LongType, containsNull = false), nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    media.select(col("doc_id"), col("payload")).mapPartitions { rows =>
      // real codec init would happen once per partition here
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        Row(id, fakeDecode(bytes))
      }
    }(enc)
  }

  /** Audio-style fixed framing via mapPartitions: the payload splits
    * into non-overlapping `frameLen`-byte frames, each emitting its
    * length and energy (byte-value sum) — the batch shape an audio
    * feature extractor (MFCC, VAD) runs in, with the codec stubbed
    * as plain byte arithmetic. One row per frame, partition-
    * preserving fan-out; empty payloads emit no frames. */
  def frameEnergy(media: DataFrame, frameLen: Int = 256): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("frame_idx", LongType, nullable = false),
      StructField("n_bytes", LongType, nullable = false),
      StructField("energy", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    media.select(col("doc_id"), col("payload")).mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        if (bytes == null || bytes.isEmpty) Iterator.empty
        else bytes.grouped(frameLen).zipWithIndex.map { case (fr, i) =>
          Row(id, i.toLong, fr.length.toLong,
            fr.foldLeft(0L)((acc, b) => acc + (b & 0xff)))
        }
      }
    }(enc)
  }

  /** Keyframe/scene-change detection over the framed payload: a
    * frame is a keyframe if it opens the stream or its integer mean
    * energy jumps more than `threshold` against the previous frame —
    * the shape a video curation pipeline uses to pick which frames
    * to caption/embed (a real decoder supplies per-frame luma here;
    * the byte-energy stub keeps the plumbing testable). Per-doc lag
    * window only — embarrassingly parallel at any corpus size. */
  def keyframes(media: DataFrame, frameLen: Int = 256, threshold: Long = 8): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    frameEnergy(media, frameLen)
      .withColumn("mean_e", expr("energy div n_bytes"))
      .withColumn("prev_e", lag(col("mean_e"), 1).over(w))
      .withColumn("delta", abs(col("mean_e") - col("prev_e")))
      .where(col("prev_e").isNull || col("delta") > threshold)
      .select(col("doc_id"), col("frame_idx"), col("mean_e"), col("delta"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  // ── REAL codec: PCM16 WAV (RIFF) ─────────────────────────────────
  // The one media format a pure JVM can encode AND decode exactly, so
  // the codec seam stops being a stub for audio: wavRoundtrip below
  // synthesizes a deterministic PCM signal per doc, serializes it into
  // spec-compliant RIFF/WAVE bytes, and re-parses those bytes with a
  // real chunk-walking decoder — everything between synth and stats
  // crosses the wire as actual container bytes, and the oracle
  // recomputes the stats from the generator formula alone, so any
  // header-layout or sample-extraction bug fails the hash compare.

  /** Spec-compliant mono PCM16 WAV bytes for the deterministic test
    * signal s_k = ((docId·31 + k·7) mod 65536) − 32768. */
  def wavEncode(docId: Long, nSamples: Int, rate: Int = 16000): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44 + 2 * nSamples)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + 2 * nSamples)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(2 * nSamples)
    var k = 0
    while (k < nSamples) {
      bb.putShort((((docId * 31 + k * 7) % 65536) - 32768).toShort)
      k += 1
    }
    bb.array()
  }

  /** A real RIFF/WAVE parser: validates the container magics, walks
    * chunks (fmt consumed field-by-field, unknown chunks skipped with
    * the odd-size pad byte the RIFF spec requires), and extracts the
    * little-endian 16-bit samples. Returns (sampleRate, channels,
    * samples). Throws on non-PCM / non-16-bit / missing chunks —
    * a codec must fail loudly, never yield silent garbage. */
  def wavDecode(bytes: Array[Byte]): (Int, Int, Array[Short]) = {
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val b = new Array[Byte](4); bb.get(b); new String(b, "US-ASCII")
    }
    require(fourcc() == "RIFF", "not a RIFF container")
    bb.getInt // riff size
    require(fourcc() == "WAVE", "not a WAVE stream")
    var rate = -1
    var channels = -1
    var samples: Array[Short] = null
    while (bb.remaining() >= 8) {
      val id = fourcc()
      val size = bb.getInt
      // bound EVERY declared chunk size against the container before
      // consuming it (a lying header must fail the same loud way a
      // bad magic does, not BufferUnderflow mid-sample — and a
      // NEGATIVE size would cancel the 8-byte header advance and
      // loop the walker forever)
      require(size >= 0 && size <= bb.remaining(),
        s"chunk '$id' declares $size bytes but only ${bb.remaining()} remain")
      id match {
        case "fmt " =>
          require(size >= 16, s"fmt chunk too short: $size bytes")
          val start = bb.position()
          val audioFormat = bb.getShort
          require(audioFormat == 1, s"not PCM: wFormatTag=$audioFormat")
          channels = bb.getShort
          rate = bb.getInt
          bb.getInt; bb.getShort // byte rate, block align
          val bits = bb.getShort
          require(bits == 16, s"only PCM16 supported, got $bits bits")
          bb.position(start + size)
        case "data" =>
          // advance past the RIFF odd-size pad byte afterwards so a
          // chunk FOLLOWING an odd data chunk still parses aligned
          val start = bb.position()
          val n = size / 2
          samples = new Array[Short](n)
          var i = 0
          while (i < n) { samples(i) = bb.getShort; i += 1 }
          bb.position(math.min(start + size + (size & 1), bb.limit()))
        case _ =>
          bb.position(math.min(bb.position() + size + (size & 1), bb.limit()))
      }
    }
    require(rate > 0, "no fmt chunk")
    require(samples != null, "no data chunk")
    (rate, channels, samples)
  }

  /** The codec roundtrip as a graded operator: per doc, synthesize →
    * ENCODE to WAV bytes → DECODE with the real parser → signal
    * stats. mapPartitions is the batch shape a real codec binding
    * uses (one decoder instance per partition). */
  def wavRoundtrip(docs: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("n_samples", LongType, nullable = false),
      StructField("byte_len", LongType, nullable = false),
      StructField("sample_rate", LongType, nullable = false),
      StructField("rms", DoubleType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    docs.select(col("doc_id")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val n = (id % 50 + 10).toInt
        val bytes = wavEncode(id, n)
        val (rate, channels, smp) = wavDecode(bytes)
        require(channels == 1 && smp.length == n,
          s"roundtrip mismatch for doc $id: $channels ch, ${smp.length}/$n samples")
        var sumSq = 0L
        smp.foreach(s => sumSq += s.toLong * s)
        val rms = BigDecimal(math.sqrt(sumSq.toDouble / smp.length))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        Row(id, smp.length.toLong, bytes.length.toLong, rate.toLong, rms)
      }
    }(enc)
  }

  // ── REAL codec: 24-bit BMP ───────────────────────────────────────
  // The image twin of the WAV pair: BMP (BITMAPINFOHEADER, 24-bit
  // BGR, bottom-up rows padded to 4 bytes) is the one image container
  // a pure JVM encodes and decodes exactly. The deliberately awkward
  // parts of the format — bottom-up row order and per-row padding —
  // are exactly what the roundtrip grades: get either wrong and the
  // decoded luminance diverges from the generator formula.

  /** Spec-compliant 24-bit BMP bytes for the deterministic grayscale
    * test image g(x,y) = (docId + x·7 + y·13) mod 256 (all three
    * channels equal). */
  def bmpEncode(docId: Long, width: Int, height: Int): Array[Byte] = {
    val rowBytes = width * 3
    val pad = (4 - rowBytes % 4) % 4
    val imageSize = (rowBytes + pad) * height
    val bb = java.nio.ByteBuffer.allocate(54 + imageSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + imageSize)
      .putShort(0).putShort(0).putInt(54) // reserved, pixel-array offset
    bb.putInt(40).putInt(width).putInt(height) // BITMAPINFOHEADER, positive height = bottom-up
      .putShort(1).putShort(24).putInt(0).putInt(imageSize)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = height - 1 // bottom-up: the LAST image row is stored first
    while (y >= 0) {
      var x = 0
      while (x < width) {
        val g = ((docId + x * 7 + y * 13) % 256).toByte
        bb.put(g).put(g).put(g) // B, G, R
        x += 1
      }
      var p = 0
      while (p < pad) { bb.put(0.toByte); p += 1 }
      y -= 1
    }
    bb.array()
  }

  /** A real BMP parser: validates the BM magic and BITMAPINFOHEADER,
    * honors the header's pixel-array offset, un-pads and un-flips the
    * bottom-up rows, and returns (width, height, pixels) with pixels
    * in natural (row-major, top-down) order as (b, g, r) triples
    * flattened. Throws on compressed or non-24-bit images. */
  def bmpDecode(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(bb.get() == 'B'.toByte && bb.get() == 'M'.toByte, "not a BMP")
    bb.getInt; bb.getShort; bb.getShort
    val pixelOffset = bb.getInt
    val dibSize = bb.getInt
    require(dibSize >= 40, s"unsupported DIB header ($dibSize bytes)")
    val width = bb.getInt
    val heightRaw = bb.getInt
    require(heightRaw > 0, "top-down BMPs not produced by this writer")
    val height = heightRaw
    bb.getShort // planes
    val bpp = bb.getShort
    require(bpp == 24, s"only 24-bit supported, got $bpp")
    val compression = bb.getInt
    require(compression == 0, s"compressed BMP not supported ($compression)")
    val rowBytes = width * 3
    val stride = rowBytes + (4 - rowBytes % 4) % 4
    val out = new Array[Byte](rowBytes * height)
    var y = 0
    while (y < height) {
      // stored row (height-1-y) is image row y: un-flip while copying
      val src = pixelOffset + (height - 1 - y) * stride
      System.arraycopy(bytes, src, out, y * rowBytes, rowBytes)
      y += 1
    }
    (width, height, out)
  }

  /** The image-codec roundtrip as a graded operator: synthesize →
    * ENCODE to BMP → DECODE with the real parser → luminance stats
    * (mean over the blue channel — all channels equal by
    * construction, so a channel-order bug still changes nothing
    * while a row-order or padding bug changes everything). */
  def bmpRoundtrip(docs: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("width", LongType, nullable = false),
      StructField("height", LongType, nullable = false),
      StructField("byte_len", LongType, nullable = false),
      StructField("mean_lum", DoubleType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    docs.select(col("doc_id")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val w = (id % 9 + 4).toInt // w*3 mod 4 varies → padding exercised
        val h = (id % 7 + 3).toInt
        val bytes = bmpEncode(id, w, h)
        val (dw, dh, px) = bmpDecode(bytes)
        require(dw == w && dh == h, s"roundtrip mismatch for doc $id: ${dw}x$dh")
        var sum = 0L
        var i = 0
        while (i < px.length) { sum += px(i) & 0xff; i += 3 } // blue channel
        val meanLum = BigDecimal(sum.toDouble / (w * h))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        Row(id, w.toLong, h.toLong, bytes.length.toLong, meanLum)
      }
    }(enc)
  }

  // ── REAL codec: uncompressed AVI (RIFF, raw 24-bit DIB frames) ───
  // The video rung of the codec ladder, completing it (WAV = audio,
  // BMP = image): AVI is RIFF again — the same chunk-walk idiom the
  // WAV parser owns, plus NESTED lists (hdrl holding avih and a strl
  // per stream; movi holding the frame chunks) — and an uncompressed
  // 'DIB ' video stream stores each frame exactly like a headerless
  // BMP pixel array (bottom-up rows, 4-byte stride padding). The
  // roundtrip grades container structure (header sizes, list
  // nesting), stream metadata (vids/'DIB '/24bpp gates), and the
  // per-frame row un-flip/un-pad, against an oracle that recomputes
  // every stat from the generator formula alone.

  /** Frame pixel formula: g(x, y, f) = (docId + 7x + 13y + 29f) mod
    * 256 (all three channels equal) — frame f differs from f-1 in a
    * pattern the decoded-motion stat reproduces only if frames come
    * back in order. */
  private def aviPixel(docId: Long, x: Int, y: Int, f: Int): Byte =
    ((docId + x * 7 + y * 13 + f * 29) % 256).toByte

  /** Spec-compliant uncompressed AVI bytes: RIFF('AVI ') → LIST hdrl
    * (avih + LIST strl(strh 'vids'/'DIB ', strf BITMAPINFOHEADER))
    * → LIST movi ('00db' raw DIB frame chunks, bottom-up padded
    * rows). Fixed 10 fps; no idx1 (optional per spec — a streaming
    * writer omits it). */
  def aviEncode(docId: Long, width: Int, height: Int, nFrames: Int): Array[Byte] = {
    val rowBytes = width * 3
    val stride = rowBytes + (4 - rowBytes % 4) % 4
    val frameBytes = stride * height
    val hdrlTotal = 8 + (4 + (8 + 56) + (8 + (4 + (8 + 56) + (8 + 40))))
    val moviTotal = 8 + 4 + nFrames * (8 + frameBytes)
    val total = 12 + hdrlTotal + moviTotal
    val bb = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def cc(s: String): Unit = bb.put(s.getBytes("US-ASCII"))
    cc("RIFF"); bb.putInt(total - 8); cc("AVI ")
    cc("LIST"); bb.putInt(hdrlTotal - 8); cc("hdrl")
    cc("avih"); bb.putInt(56)
    bb.putInt(100000).putInt(0).putInt(0).putInt(0) // usec/frame, maxbps, padding, flags
      .putInt(nFrames).putInt(0).putInt(1).putInt(frameBytes) // total, initial, STREAMS=1, bufsize
      .putInt(width).putInt(height).putInt(0).putInt(0).putInt(0).putInt(0) // dims + reserved
    cc("LIST"); bb.putInt(4 + (8 + 56) + (8 + 40)); cc("strl")
    cc("strh"); bb.putInt(56)
    cc("vids"); cc("DIB ")
    bb.putInt(0).putShort(0).putShort(0).putInt(0) // flags, priority, language, initialFrames
      .putInt(1).putInt(10).putInt(0).putInt(nFrames) // scale, rate (10 fps), start, length
      .putInt(frameBytes).putInt(0).putInt(0) // bufsize, quality, sampleSize
      .putShort(0).putShort(0).putShort(width.toShort).putShort(height.toShort) // rcFrame
    cc("strf"); bb.putInt(40)
    bb.putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
      .putInt(0).putInt(frameBytes).putInt(2835).putInt(2835).putInt(0).putInt(0)
    cc("LIST"); bb.putInt(moviTotal - 8); cc("movi")
    var f = 0
    while (f < nFrames) {
      cc("00db"); bb.putInt(frameBytes)
      var y = height - 1 // bottom-up: last image row stored first
      while (y >= 0) {
        var x = 0
        while (x < width) {
          val g = aviPixel(docId, x, y, f)
          bb.put(g).put(g).put(g)
          x += 1
        }
        var p = rowBytes
        while (p < stride) { bb.put(0.toByte); p += 1 }
        y -= 1
      }
      f += 1
    }
    bb.array()
  }

  /** A real AVI parser: validates the RIFF/'AVI ' magics, walks the
    * nested lists (hdrl → avih + strl → strh/strf; unknown chunks
    * skipped with the RIFF odd-size pad), gates on exactly one
    * uncompressed 24-bit 'vids'/'DIB ' stream, then un-pads and
    * un-flips every '00db' frame. Returns (width, height, frames)
    * with each frame's pixels in natural row-major top-down order
    * as flattened BGR triples. Throws on compressed streams
    * ('00dc' chunks or a non-zero biCompression), non-24-bit depth,
    * multi-stream files, or frame/header size disagreements —
    * a codec fails loudly, never yields silent garbage. */
  def aviDecode(bytes: Array[Byte]): (Int, Int, Array[Array[Byte]]) = {
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val b = new Array[Byte](4); bb.get(b); new String(b, "US-ASCII")
    }
    require(fourcc() == "RIFF", "not a RIFF container")
    bb.getInt
    require(fourcc() == "AVI ", "not an AVI stream")
    var width = -1; var height = -1
    var haveAvih = false; var haveStrh = false; var haveStrf = false
    val frames = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    def unflip(raw: Array[Byte]): Array[Byte] = {
      val rowBytes = width * 3
      val stride = rowBytes + (4 - rowBytes % 4) % 4
      require(raw.length == stride * height,
        s"frame chunk is ${raw.length} bytes; header geometry needs ${stride * height}")
      val out = new Array[Byte](rowBytes * height)
      var y = 0
      while (y < height) {
        System.arraycopy(raw, (height - 1 - y) * stride, out, y * rowBytes, rowBytes)
        y += 1
      }
      out
    }
    // walk [from, to): chunks at one nesting level; recurse into the
    // lists that matter, skip everything else with the pad byte
    def walk(from: Int, to: Int): Unit = {
      bb.position(from)
      while (bb.position() + 8 <= to) {
        val id = fourcc()
        val size = bb.getInt
        require(size >= 0 && bb.position() + size <= to,
          s"chunk $id declares $size bytes but only ${to - bb.position()} remain")
        val start = bb.position()
        id match {
          case "LIST" =>
            val listType = fourcc()
            listType match {
              case "hdrl" | "strl" | "movi" => walk(bb.position(), start + size)
              case _ => () // e.g. INFO — skipped
            }
          case "avih" =>
            bb.getInt; bb.getInt; bb.getInt; bb.getInt // usec, maxbps, padding, flags
            bb.getInt; bb.getInt // totalFrames, initialFrames
            val streams = bb.getInt
            require(streams == 1, s"only single-stream AVIs supported, got $streams")
            bb.getInt // bufsize
            width = bb.getInt; height = bb.getInt
            haveAvih = true
          case "strh" =>
            val fccType = fourcc(); val handler = fourcc()
            require(fccType == "vids", s"not a video stream: $fccType")
            require(handler == "DIB " || handler == "\u0000\u0000\u0000\u0000",
              s"only raw DIB streams supported, got '$handler'")
            haveStrh = true
          case "strf" =>
            bb.getInt // biSize
            val w = bb.getInt; val h = bb.getInt
            require(haveAvih && w == width && h == height,
              s"strf geometry ${w}x$h disagrees with avih ${width}x$height")
            bb.getShort
            val bpp = bb.getShort
            require(bpp == 24, s"only 24-bit supported, got $bpp")
            val compression = bb.getInt
            require(compression == 0, s"compressed AVI not supported ($compression)")
            haveStrf = true
          case "00db" =>
            require(haveStrf, "frame chunk before the stream format header")
            val raw = new Array[Byte](size)
            bb.get(raw)
            frames += unflip(raw)
          case "00dc" =>
            throw new IllegalArgumentException(
              "compressed frame chunks (00dc) not supported")
          case _ => () // JUNK and friends — skipped below
        }
        bb.position(math.min(start + size + (size & 1), to))
      }
    }
    walk(bb.position(), bytes.length)
    require(haveAvih && haveStrh && haveStrf, "missing avih/strh/strf headers")
    require(frames.nonEmpty, "no frame chunks")
    (width, height, frames.toArray)
  }

  /** The video-codec roundtrip as a graded operator: synthesize →
    * ENCODE to AVI → DECODE with the real parser → per-video stats:
    * geometry, container size, mean luminance over every frame, and
    * MOTION (mean |Δ| between consecutive frames' pixels — correct
    * only if the frames come back complete and in order). */
  def aviRoundtrip(docs: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("width", LongType, nullable = false),
      StructField("height", LongType, nullable = false),
      StructField("n_frames", LongType, nullable = false),
      StructField("byte_len", LongType, nullable = false),
      StructField("mean_lum", DoubleType, nullable = false),
      StructField("motion", DoubleType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    docs.select(col("doc_id")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val w = (id % 6 + 4).toInt  // w*3 mod 4 varies → padding exercised
        val h = (id % 5 + 3).toInt
        val nf = (id % 4 + 2).toInt // ≥ 2 frames → motion always defined
        val bytes = aviEncode(id, w, h, nf)
        val (dw, dh, fr) = aviDecode(bytes)
        require(dw == w && dh == h && fr.length == nf,
          s"roundtrip mismatch for doc $id: ${dw}x$dh, ${fr.length}/$nf frames")
        var sum = 0L
        fr.foreach { px =>
          var i = 0
          while (i < px.length) { sum += px(i) & 0xff; i += 3 } // blue channel
        }
        var dsum = 0L
        var f = 1
        while (f < nf) {
          val a = fr(f - 1); val b = fr(f)
          var i = 0
          while (i < a.length) { dsum += math.abs((b(i) & 0xff) - (a(i) & 0xff)); i += 3 }
          f += 1
        }
        val n = w.toLong * h
        val meanLum = BigDecimal(sum.toDouble / (n * nf))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        val motion = BigDecimal(dsum.toDouble / (n * (nf - 1)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        Row(id, w.toLong, h.toLong, nf.toLong, bytes.length.toLong, meanLum, motion)
      }
    }(enc)
  }

  // ── REAL codec: PNG (entropy-coded — zlib DEFLATE + row filters) ─
  // The ladder's missing rung: WAV/BMP/AVI are all RAW formats; PNG
  // is a genuinely COMPRESSED decode — zlib inflate
  // (java.util.zip.Inflater, zero new dependencies) under the chunk
  // walk (length/type/data/CRC — the RIFF idiom with big-endian
  // lengths and a checksum per chunk), plus the per-scanline
  // unfilter pass (None/Sub/Up/Average/Paeth). The encoder filters
  // each row with type y mod 5, so ONE roundtrip exercises every
  // unfilter branch, and the n_filters output column proves it to
  // the oracle (LEAST(h, 5) — replayable from the geometry alone).

  private val PngSig: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def pngChunk(out: java.io.ByteArrayOutputStream, typ: String,
                       data: Array[Byte]): Unit = {
    val len = java.nio.ByteBuffer.allocate(4).putInt(data.length).array()
    out.write(len)
    val tb = typ.getBytes("US-ASCII")
    out.write(tb)
    out.write(data)
    val crc = new java.util.zip.CRC32()
    crc.update(tb); crc.update(data)
    out.write(java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
  }

  /** Spec-compliant 8-bit RGB PNG bytes for the deterministic test
    * image g(x,y) = (docId + x·7 + y·13) mod 256 (all three channels
    * equal). Row y is filtered with type y mod 5 before the zlib
    * deflate — a real compressed encode whose decode must run every
    * unfilter branch. */
  def pngEncode(docId: Long, width: Int, height: Int): Array[Byte] = {
    val bpp = 3
    val stride = width * bpp
    def g(x: Int, y: Int): Int = (((docId + x * 7 + y * 13) % 256) + 256).toInt % 256
    val raw = Array.tabulate(height, stride)((y, i) => g(i / bpp, y))
    val filtered = new Array[Byte](height * (1 + stride))
    var o = 0
    (0 until height).foreach { y =>
      val ft = y % 5
      filtered(o) = ft.toByte; o += 1
      (0 until stride).foreach { i =>
        val cur = raw(y)(i)
        val left = if (i >= bpp) raw(y)(i - bpp) else 0
        val up = if (y > 0) raw(y - 1)(i) else 0
        val ul = if (y > 0 && i >= bpp) raw(y - 1)(i - bpp) else 0
        val f = ft match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - (left + up) / 2
          case 4 => cur - paeth(left, up, ul)
        }
        filtered(o) = (f & 0xff).toByte; o += 1
      }
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(filtered); defl.finish()
    val zbuf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!defl.finished()) zbuf.write(tmp, 0, defl.deflate(tmp))
    defl.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(PngSig)
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(width).putInt(height)
      .put(8.toByte)  // bit depth
      .put(2.toByte)  // color type: truecolor RGB
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate, adaptive filter, no interlace
      .array()
    pngChunk(out, "IHDR", ihdr)
    pngChunk(out, "IDAT", zbuf.toByteArray)
    pngChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** A real PNG parser: signature + chunk walk with PER-CHUNK CRC32
    * verification and declared-length bounds, IHDR validation
    * (8-bit truecolor, no interlace), zlib INFLATE of the
    * concatenated IDAT stream to exactly h·(1+w·3) bytes, and the
    * per-scanline unfilter. Returns (width, height, row-major RGB
    * bytes, distinct filter types seen). Throws on any malformation
    * — a codec must fail loudly, never yield silent garbage. */
  def pngDecode(bytes: Array[Byte]): (Int, Int, Array[Byte], Int) = {
    require(bytes.length >= 8 && PngSig.indices.forall(i => bytes(i) == PngSig(i)),
      "not a PNG stream")
    val bb = java.nio.ByteBuffer.wrap(bytes, 8, bytes.length - 8)
    var width = -1; var height = -1
    val idat = new java.io.ByteArrayOutputStream()
    var ended = false
    while (!ended) {
      require(bb.remaining() >= 12, "truncated chunk header")
      val len = bb.getInt
      require(len >= 0 && len <= bb.remaining() - 8,
        s"chunk declares $len bytes but only ${bb.remaining() - 8} remain")
      val tb = new Array[Byte](4); bb.get(tb)
      val typ = new String(tb, "US-ASCII")
      val data = new Array[Byte](len); bb.get(data)
      val want = bb.getInt
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      require(crc.getValue.toInt == want, s"CRC mismatch on chunk '$typ'")
      typ match {
        case "IHDR" =>
          val hb = java.nio.ByteBuffer.wrap(data)
          width = hb.getInt; height = hb.getInt
          val (depth, color) = (hb.get(), hb.get())
          val (comp, filt, inter) = (hb.get(), hb.get(), hb.get())
          require(width > 0 && height > 0, s"bad geometry ${width}x$height")
          require(depth == 8 && color == 2,
            s"only 8-bit truecolor supported, got depth=$depth color=$color")
          require(comp == 0 && filt == 0 && inter == 0,
            "unsupported compression/filter/interlace method")
        case "IDAT" => require(width > 0, "IDAT before IHDR"); idat.write(data)
        case "IEND" => ended = true
        case _ => () // ancillary chunk: CRC-checked, skipped
      }
    }
    require(width > 0 && idat.size() > 0, "missing IHDR or IDAT")
    val stride = width * 3
    val expect = height * (1 + stride)
    val infl = new java.util.zip.Inflater()
    infl.setInput(idat.toByteArray)
    val filtered = new Array[Byte](expect)
    var got = 0
    while (!infl.finished() && got < expect) {
      val n = infl.inflate(filtered, got, expect - got)
      require(n > 0 || infl.finished(), "truncated or corrupt IDAT stream")
      got += n
    }
    val done = infl.finished()
    infl.end()
    require(got == expect && done,
      s"IDAT inflates to $got bytes; expected exactly $expect")
    val px = new Array[Byte](height * stride)
    val seen = scala.collection.mutable.SortedSet.empty[Int]
    (0 until height).foreach { y =>
      val ft = filtered(y * (1 + stride)) & 0xff
      require(ft <= 4, s"unknown filter type $ft on row $y")
      seen += ft
      (0 until stride).foreach { i =>
        val f = filtered(y * (1 + stride) + 1 + i) & 0xff
        val left = if (i >= 3) px(y * stride + i - 3) & 0xff else 0
        val up = if (y > 0) px((y - 1) * stride + i) & 0xff else 0
        val ul = if (y > 0 && i >= 3) px((y - 1) * stride + i - 3) & 0xff else 0
        val recon = ft match {
          case 0 => f
          case 1 => f + left
          case 2 => f + up
          case 3 => f + (left + up) / 2
          case 4 => f + paeth(left, up, ul)
        }
        px(y * stride + i) = (recon & 0xff).toByte
      }
    }
    (width, height, px, seen.size)
  }

  /** The entropy-coded roundtrip as a graded operator: synthesize →
    * PNG-encode (deflate) → decode with the real parser → stats.
    * n_filters pins that every unfilter branch min(h,5) reaches ran;
    * mean_lum pins pixel fidelity through compress + unfilter. */
  def pngRoundtrip(docs: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("width", LongType, nullable = false),
      StructField("height", LongType, nullable = false),
      StructField("n_filters", LongType, nullable = false),
      StructField("mean_lum", DoubleType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    docs.select(col("doc_id")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val w = (id % 9 + 4).toInt
        val h = (id % 7 + 3).toInt
        val bytes = pngEncode(id, w, h)
        val (dw, dh, px, nf) = pngDecode(bytes)
        require(dw == w && dh == h, s"roundtrip mismatch for doc $id: ${dw}x$dh")
        var sum = 0L
        var i = 0
        while (i < px.length) { sum += px(i) & 0xff; i += 3 }
        val meanLum = BigDecimal(sum.toDouble / (w * h))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        Row(id, w.toLong, h.toLong, nf.toLong, meanLum)
      }
    }(enc)
  }

  // ── transform coding: integer 8×8 DCT + quantization + zigzag +
  //    DEFLATE — the JPEG-shaped lossy rung of the codec ladder
  //    (raw: WAV/BMP/AVI; entropy: PNG; transform: this). Every
  //    arithmetic step is EXACT integer math (the only divisions are
  //    floor-divs of longs far below 2^52, evaluated identically in
  //    any engine), so the DuckDB oracle replays the full
  //    forward-quantize-inverse chain and the PSNR inputs from the
  //    pixel formula alone; the zigzag+RLE+DEFLATE byte stream is
  //    roundtripped bit-exactly Spark-side (require + malformed-
  //    stream rejection specs), like the PNG codec.

  /** The integer DCT basis: T[u][x] = round(64·B[u][x]) where B is
    * the orthonormal 8-point DCT-II basis — so T·Tᵀ ≈ 64²·I and the
    * forward/inverse pair carries an exact 64⁴ scale. Computed once;
    * the oracle injects THESE values as literals, so both engines
    * share one matrix (no per-engine cos calls anywhere). */
  val DctT: Array[Array[Long]] = Array.tabulate(8, 8) { (u, x) =>
    val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    math.round(64.0 * 0.5 * cu * math.cos((2 * x + 1) * u * math.Pi / 16.0))
  }

  /** Flat quantization step on the T-scaled coefficients: 32768 =
    * 64²·8, i.e. step 8 in orthonormal units — visibly lossy
    * (PSNR ≈ 40 dB) but structure-preserving, the JPEG mid-quality
    * regime. */
  val DctQ: Long = 32768L
  private val DctScale2 = 64L * 64L * 64L * 64L // T applied 4× end to end

  /** The JPEG zigzag scan order over an 8×8 block (index = scan
    * position, value = y*8+x). */
  private[multimodal] val Zigzag: Array[Int] = {
    val order = for {
      s <- 0 to 14
      i <- 0 to s
      y = if (s % 2 == 0) s - i else i
      x = if (s % 2 == 0) i else s - i
      if y < 8 && x < 8
    } yield y * 8 + x
    order.toArray
  }

  /** floor((n + half) / d) on longs — the shared rounding division
    * of the quantizer and the inverse rescale. */
  private[multimodal] def rdiv(n: Long, d: Long): Long = Math.floorDiv(n + d / 2, d)

  /** Forward T·X·Tᵀ (exact longs). */
  private[multimodal] def dctForward(px: Array[Array[Long]]): Array[Array[Long]] = {
    val a = Array.ofDim[Long](8, 8) // A[u][x] = Σ_y T[u][y]·X[y][x]
    for (u <- 0 until 8; x <- 0 until 8) {
      var s = 0L
      for (y <- 0 until 8) s += DctT(u)(y) * px(y)(x)
      a(u)(x) = s
    }
    val out = Array.ofDim[Long](8, 8) // Y[u][v] = Σ_x A[u][x]·T[v][x]
    for (u <- 0 until 8; v <- 0 until 8) {
      var s = 0L
      for (x <- 0 until 8) s += a(u)(x) * DctT(v)(x)
      out(u)(v) = s
    }
    out
  }

  /** Inverse Tᵀ·Y'·T with the 64⁴ rescale and [0,255] clamp. */
  private[multimodal] def dctInverse(yq: Array[Array[Long]]): Array[Array[Long]] = {
    val a = Array.ofDim[Long](8, 8) // A[y][v] = Σ_u T[u][y]·Y'[u][v]
    for (y <- 0 until 8; v <- 0 until 8) {
      var s = 0L
      for (u <- 0 until 8) s += DctT(u)(y) * yq(u)(v)
      a(y)(v) = s
    }
    val out = Array.ofDim[Long](8, 8)
    for (y <- 0 until 8; x <- 0 until 8) {
      var s = 0L
      for (v <- 0 until 8) s += a(y)(v) * DctT(v)(x)
      out(y)(x) = math.max(0L, math.min(255L, rdiv(s, DctScale2)))
    }
    out
  }

  /** Encode one 8×8 gray block: forward → quantize → zigzag →
    * (run-of-zeros, value) RLE shorts → DEFLATE, framed as
    * `GDC1 | docId(8) | q(4) | rawLen(4) | crc32(4) | deflate`. */
  def dctEncode(docId: Long): Array[Byte] = {
    val px = Array.tabulate(8, 8)((y, x) => (((docId + x * 7 + y * 13) % 256) + 256) % 256)
    val q = dctForward(px).map(_.map(v => rdiv(v, DctQ)))
    val zz = Zigzag.map(i => q(i / 8)(i % 8))
    val rle = new java.io.ByteArrayOutputStream()
    val dd = new java.io.DataOutputStream(rle)
    var run = 0
    zz.foreach { v =>
      if (v == 0L) run += 1
      else {
        while (run > 255) { dd.writeByte(255); dd.writeShort(0); run -= 255 }
        dd.writeByte(run); dd.writeShort(v.toInt)
        run = 0
      }
    }
    dd.writeByte(255); dd.writeShort(-32768) // EOB sentinel
    dd.flush()
    val raw = rle.toByteArray
    // the CRC covers header fields AND payload: any single-byte
    // corruption anywhere in the frame is rejected, never silently
    // decoded into a wrong id/quantizer/pixels (CRC32 detects all
    // single-byte errors)
    val crc = new java.util.zip.CRC32()
    crc.update(java.nio.ByteBuffer.allocate(16)
      .putLong(docId).putInt(DctQ.toInt).putInt(raw.length).array())
    crc.update(raw)
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val zbuf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](4096)
    while (!defl.finished()) zbuf.write(tmp, 0, defl.deflate(tmp))
    defl.end()
    val z = zbuf.toByteArray
    val bb = java.nio.ByteBuffer.allocate(4 + 8 + 4 + 4 + 4 + z.length)
    bb.put("GDC1".getBytes("US-ASCII")).putLong(docId)
      .putInt(DctQ.toInt).putInt(raw.length).putInt(crc.getValue.toInt).put(z)
    bb.array()
  }

  /** Decode: validate frame, inflate to exactly rawLen, CRC-check,
    * un-RLE to exactly 64 zigzag values, dequantize, inverse. Throws
    * on ANY malformation — truncated frame, bad magic, CRC mismatch,
    * run past the block, missing EOB. */
  def dctDecode(bytes: Array[Byte]): (Long, Array[Array[Long]]) = {
    require(bytes.length >= 24, "truncated DCT frame")
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val magic = new Array[Byte](4); bb.get(magic)
    require(new String(magic, "US-ASCII") == "GDC1", "not a GDC1 stream")
    val docId = bb.getLong
    val q = bb.getInt.toLong
    // upper bound keeps dequant·inverse inside long range on HOSTILE
    // frames: |zz| ≤ 2^15 and the inverse multiplies by ≤ 512² ≈ 2^18,
    // so q ≤ 2^20 bounds the accumulation at ~2^53 ≪ Long.MaxValue
    require(q > 0 && q <= (1L << 20), s"bad quantizer $q")
    val rawLen = bb.getInt
    require(rawLen >= 3 && rawLen <= 64 * 3 + 3, s"implausible payload length $rawLen")
    val wantCrc = bb.getInt
    val z = new Array[Byte](bb.remaining()); bb.get(z)
    val infl = new java.util.zip.Inflater()
    infl.setInput(z)
    val raw = new Array[Byte](rawLen)
    var got = 0
    while (!infl.finished() && got < rawLen) {
      val n = infl.inflate(raw, got, rawLen - got)
      require(n > 0 || infl.finished(), "truncated or corrupt DEFLATE stream")
      got += n
    }
    val done = infl.finished()
    infl.end()
    require(got == rawLen && done, s"payload inflates to $got bytes; declared $rawLen")
    val crc = new java.util.zip.CRC32()
    crc.update(java.nio.ByteBuffer.allocate(16)
      .putLong(docId).putInt(q.toInt).putInt(rawLen).array())
    crc.update(raw)
    require(crc.getValue.toInt == wantCrc, "frame CRC mismatch")
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(raw))
    val zz = new Array[Long](64)
    var pos = 0
    var eob = false
    while (!eob) {
      require(in.available() >= 3, "RLE stream ends without EOB")
      val run = in.readUnsignedByte()
      val v = in.readShort().toLong
      if (run == 255 && v == -32768L) eob = true
      else {
        require(pos + run + (if (v == 0) 0 else 1) <= 64,
          s"RLE run past the block at position $pos")
        pos += run
        if (v != 0) { zz(pos) = v; pos += 1 }
      }
    }
    require(in.available() == 0, "trailing bytes after EOB")
    val coef = Array.ofDim[Long](8, 8)
    Zigzag.zipWithIndex.foreach { case (i, p) => coef(i / 8)(i % 8) = zz(p) * q }
    (docId, dctInverse(coef))
  }

  /** The transform-coding roundtrip as a graded operator: per doc,
    * the 8×8 block forward-coded, byte-framed through DEFLATE,
    * decoded back, and graded on EXACT integer stats the oracle
    * replays from the pixel formula — nonzero quantized coefficients
    * (the rate proxy) and the reconstruction error (sse / max_err,
    * the distortion). The byte stream itself is require()-verified
    * in-line (decode must reproduce the id and the coefficients the
    * quantizer kept). */
  def dctRoundtrip(docs: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("n_nonzero", LongType, nullable = false),
      StructField("sse", LongType, nullable = false),
      StructField("max_err", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    docs.select(col("doc_id")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val px = Array.tabulate(8, 8)((y, x) => (((id + x * 7 + y * 13) % 256) + 256) % 256)
        val bytes = dctEncode(id)
        val (did, rec) = dctDecode(bytes)
        require(did == id, s"roundtrip id mismatch: $did != $id")
        val nz = dctForward(px).map(_.count(v => rdiv(v, DctQ) != 0L).toLong).sum
        var sse = 0L; var maxe = 0L
        for (y <- 0 until 8; x <- 0 until 8) {
          val e = math.abs(rec(y)(x) - px(y)(x))
          sse += e * e; maxe = math.max(maxe, e)
        }
        Row(id, nz, sse, maxe)
      }
    }(enc)
  }

  /** Deterministic stand-in for an image/audio decoder: 16-bin byte
    * histogram. Replace with a real codec (e.g. JNI-bound) without
    * touching the plumbing above. */
  def fakeDecode(bytes: Array[Byte]): Seq[Long] = {
    val hist = new Array[Long](16)
    if (bytes != null) bytes.foreach(b => hist((b & 0xff) % 16) += 1)
    hist.toSeq
  }

  /** Stubbed "decode to an 8×8 grayscale grid": pixel i is the
    * integer mean of the payload bytes in lane i (offset mod 64) —
    * a real image decoder + downscale slots in here; everything
    * downstream (hashing, banding, the pair join) is the real
    * production plumbing. Map-only, one row in → one row out. */
  def perceptualPixels(media: DataFrame, lanes: Int = 64): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("pixels", ArrayType(LongType, containsNull = false), nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    media.select(col("doc_id"), col("payload")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val sums = new Array[Long](lanes)
        val counts = new Array[Long](lanes)
        if (bytes != null) bytes.zipWithIndex.foreach { case (b, i) =>
          sums(i % lanes) += (b & 0xff); counts(i % lanes) += 1
        }
        Row(id, sums.indices.map(i => if (counts(i) == 0) 0L else sums(i) / counts(i)))
      }
    }(enc)
  }

  /** Perceptual-hash (aHash) near-duplicate pairs over the decoded
    * grid: bit i set iff pixel i exceeds the grid mean — compared
    * cross-multiplied in integers (pix·64 > Σpix), so no float mean
    * decides a bit. The 64 bits pack into two 32-bit words (a set
    * bit 63 would need the sign bit of one BIGINT), candidates block
    * on four 16-bit bands, and the exact bit_count hamming gate runs
    * only on band collisions — by pigeonhole the blocking is
    * RECALL-EXACT for ham ≤ 3 (4 bands, ≤3 flips leave a clean
    * band); beyond that it is the same recall trade SimHash banding
    * makes (see dedup_simhash). Everything after the stub decode is
    * builtin codegen'd bit arithmetic; the join is per-(band, key),
    * never corpus × corpus. */
  def phashPairs(media: DataFrame, maxHam: Int = 3): DataFrame = {
    val laneIdx = typedlit((0L until 64L).toSeq)
    def packWord(fromBit: Int): Column = aggregate(
      zip_with(col("pixels"), laneIdx, (x, i) =>
        when(i >= fromBit && i < fromBit + 32 && x * 64 > col("total"),
          call_function("shiftleft", lit(1L), (i - fromBit).cast("int")))
          .otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)
    val px = perceptualPixels(media)
      .withColumn("total", aggregate(col("pixels"), lit(0L), (acc, x) => acc + x))
      .withColumn("lo", packWord(0))
      .withColumn("hi", packWord(32))
    val bands = px.select(col("doc_id"), col("lo"), col("hi"),
      posexplode(array(
        col("lo").bitwiseAND(lit(65535L)),
        shiftright(col("lo"), 16).bitwiseAND(lit(65535L)),
        col("hi").bitwiseAND(lit(65535L)),
        shiftright(col("hi"), 16).bitwiseAND(lit(65535L)))).as(Seq("b", "bkey")))
    val cand = bands.as("a").join(bands.as("b"),
        col("a.b") === col("b.b") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        col("a.lo").as("alo"), col("a.hi").as("ahi"),
        col("b.lo").as("blo"), col("b.hi").as("bhi"))
      .distinct()
    cand.select(col("id_a"), col("id_b"),
        (bit_count(col("alo").bitwiseXOR(col("blo"))) +
          bit_count(col("ahi").bitwiseXOR(col("bhi")))).cast("long").as("ham"))
      .where(col("ham") <= maxHam)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Byte-budget shard plan per modality: assets are md5-shuffled
    * within their mime group and packed into ~`budgetBytes` shards by
    * a running byte sum — the batch plan a GPU decode/feature fleet
    * consumes (each shard is one work unit of bounded bytes).
    *
    * The running sum is the two-phase banded prefix sum
    * ([[graft.operators.Ranks.withGlobalPrefixSum]]) over the order
    * (mime, shuffle-key): fully parallel, no empty-partition window,
    * corpus-scale safe. Per-mime relative offsets come from one
    * O(mimes) aggregate joined back as a broadcast. */
  def shardPlan(docs: DataFrame, budgetBytes: Long = 8192L): DataFrame = {
    val media = withBinaryPayload(docs.where(col("text").isNotNull))
      .select(col("doc_id"), col("mime"), col("byte_len"),
        md5(concat(lit("shard:"), col("doc_id"))).as("sk"))
    // band monotone in the (mime, sk) sort order: mime index by the
    // groups' lexicographic order × 16 + the first shuffle-hex digit
    val mimeIdx = when(col("mime") === "audio/wav", 0L)
      .when(col("mime") === "image/jpeg", 1L).otherwise(2L)
    val band = mimeIdx * 16 +
      conv(substring(col("sk"), 1, 1), 16, 10).cast("long")
    val (pref, _) = graft.operators.Ranks.withGlobalPrefixSum(media, band,
      Seq(col("mime"), col("sk"), col("doc_id")), col("byte_len"), "acc")
    val starts = pref.groupBy(col("mime")).agg(min(col("acc")).as("start"))
    pref.join(broadcast(starts), "mime")
      .withColumn("shard_id", expr(s"(acc - start) DIV $budgetBytes"))
      .groupBy(col("mime"), col("shard_id"))
      .agg(count(lit(1)).as("n_assets"), sum(col("byte_len")).as("shard_bytes"))
      .orderBy(col("mime"), col("shard_id"))
  }
}
