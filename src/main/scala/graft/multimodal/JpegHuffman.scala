package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** JPEG-style Huffman/RLE entropy coding over the quantized DCT
  * block (round 14 — the rung `mm_dct_roundtrip` left open: it
  * DEFLATEs the zigzag stream; the production JPEG shape codes
  * (run, size) SYMBOLS against the standard Huffman tables and
  * appends the value bits, ITU-T T.81 Annex F/K).
  *
  * What is implemented, spec-faithfully:
  *  - DC coded as its size category + value bits (single-block
  *    stream ⇒ predictor 0, so DIFF = DC) against the standard
  *    LUMINANCE DC table (Annex K.3.1);
  *  - AC run-length symbols RRRRSSSS — run of zeros (0–15) × value
  *    size (1–10) — against the standard luminance AC table
  *    (K.3.2), with ZRL (0xF0) for 16-zero runs and EOB (0x00)
  *    closing a block whose trailing coefficients are zero (omitted
  *    when position 63 is nonzero, per F.1.2.2);
  *  - value bits in the T.81 mapping: v > 0 → v, v < 0 → v+2^s−1;
  *  - the bitstream padded to a byte boundary with 1-bits (F.1.2.3)
  *    and bit-packed MSB-first.
  *
  * Both tables derive CANONICALLY from the spec's (BITS, HUFFVAL)
  * lists — the same derivation a JPEG encoder runs — and the class
  * initializer asserts the spec's counts, so a transcription error
  * fails loudly, not silently. The oracle replays the whole chain in
  * SQL: the quantized coefficients from the pixel formula, the
  * symbol stream from zigzag windows, the codes from the SAME
  * injected (symbol, code) literals, and the md5 of the padded
  * bitstring — one hash pins every bit of every frame. Everything
  * is exact integer/bit work: no float enters the coder. */
object JpegHuffman {

  // ── ITU-T T.81 Annex K tables (public spec constants) ──
  private val DcBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals = (0 to 11).toArray
  private val AcBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125)
  private val AcVals: Array[Int] = {
    val prefix = Array(
      0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
      0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
      0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
      0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
      0x25, 0x26, 0x27, 0x28, 0x29, 0x2a)
    // the regular tail is row-structured: 34–3A, 43–4A, 53–5A, 63–6A,
    // 73–7A, 83–8A, 92–9A, A2–AA, B2–BA, C2–CA, D2–DA, E1–EA, F1–FA
    val reg =
      (4 to 10).map(s => 0x30 + s) ++
      (3 to 10).map(s => 0x40 + s) ++
      (3 to 10).map(s => 0x50 + s) ++
      (3 to 10).map(s => 0x60 + s) ++
      (3 to 10).map(s => 0x70 + s) ++
      (3 to 10).map(s => 0x80 + s) ++
      (2 to 10).map(s => 0x90 + s) ++
      (2 to 10).map(s => 0xa0 + s) ++
      (2 to 10).map(s => 0xb0 + s) ++
      (2 to 10).map(s => 0xc0 + s) ++
      (2 to 10).map(s => 0xd0 + s) ++
      (1 to 10).map(s => 0xe0 + s) ++
      (1 to 10).map(s => 0xf0 + s)
    (prefix ++ reg).toArray
  }
  require(AcBits.sum == AcVals.length && AcVals.length == 162,
    s"AC table transcription broke: ${AcBits.sum} codes vs ${AcVals.length} symbols")
  require(DcBits.sum == DcVals.length && DcVals.length == 12,
    "DC table transcription broke")

  /** Canonical code assignment (T.81 C.2): ascending code lengths,
    * counter shifts left at each length boundary. */
  private def canonical(bits: Array[Int], vals: Array[Int]): Map[Int, String] = {
    var code = 0
    var vi = 0
    val out = Map.newBuilder[Int, String]
    (1 to 16).foreach { len =>
      (0 until bits(len - 1)).foreach { _ =>
        val s = code.toBinaryString
        out += vals(vi) -> ("0" * (len - s.length) + s)
        vi += 1
        code += 1
      }
      code <<= 1
    }
    out.result()
  }

  val DcCodes: Map[Int, String] = canonical(DcBits, DcVals)
  val AcCodes: Map[Int, String] = canonical(AcBits, AcVals)

  /** The zigzag scan order, re-exported for the oracle builder
    * (Multimodal.Zigzag is package-private). */
  val ZigzagOrder: Array[Int] = Multimodal.Zigzag

  /** T.81 value coding: size category + the SSSS bits. */
  private[multimodal] def valueBits(v: Long): (Int, String) = {
    if (v == 0) return (0, "")
    val s = 64 - java.lang.Long.numberOfLeadingZeros(math.abs(v))
    val mapped = if (v > 0) v else v + (1L << s) - 1
    val b = mapped.toBinaryString
    (s, "0" * (s - b.length) + b)
  }

  /** One quantized zigzag block (64 values, DC first) to its padded
    * bitstring and the number of Huffman codes emitted. */
  def encodeBlockBits(zz: Array[Long]): (String, Int, Int) = {
    require(zz.length == 64, "a block is 64 zigzag coefficients")
    val sb = new StringBuilder
    var nCodes = 0
    val (dcSize, dcBits) = valueBits(zz(0))
    require(dcSize <= 11, s"DC size $dcSize outside the DC table")
    sb ++= DcCodes(dcSize) ++= dcBits
    nCodes += 1
    var run = 0
    var lastNonzero = 0
    (1 to 63).foreach(p => if (zz(p) != 0) lastNonzero = p)
    (1 to 63).foreach { p =>
      val v = zz(p)
      if (p <= lastNonzero) {
        if (v == 0) run += 1
        else {
          while (run >= 16) { sb ++= AcCodes(0xf0); nCodes += 1; run -= 16 }
          val (s, vb) = valueBits(v)
          require(s >= 1 && s <= 10, s"AC size $s outside the AC table")
          sb ++= AcCodes(run * 16 + s) ++= vb
          nCodes += 1
          run = 0
        }
      }
    }
    if (lastNonzero < 63) { sb ++= AcCodes(0x00); nCodes += 1 } // EOB
    val nBits = sb.length
    while (sb.length % 8 != 0) sb += '1' // F.1.2.3: pad with 1-bits
    (sb.toString, nCodes, nBits)
  }

  /** MSB-first bit packing. */
  def packBits(bits: String): Array[Byte] = {
    require(bits.length % 8 == 0)
    bits.grouped(8).map(b => Integer.parseInt(b, 2).toByte).toArray
  }

  /** Decode a packed block back to its 64 zigzag coefficients — a
    * real bit-walking Huffman decoder (prefix match against the
    * canonical tables, value bits unmapped per T.81), used by the
    * graded roundtrip require. Padding bits are ignored once the
    * block completes, as a JPEG decoder does. */
  def decodeBlock(bytes: Array[Byte]): Array[Long] = {
    val bits = bytes.map(b => {
      val s = (b & 0xff).toBinaryString
      "0" * (8 - s.length) + s
    }).mkString
    var pos = 0
    def readCode(codes: Map[Int, String]): Int = {
      val rev = codes.map(_.swap)
      var len = 1
      while (len <= 16) {
        val cand = bits.substring(pos, math.min(pos + len, bits.length))
        if (cand.length == len && rev.contains(cand)) {
          pos += len
          return rev(cand)
        }
        len += 1
      }
      throw new IllegalArgumentException(s"no Huffman code matches at bit $pos")
    }
    def readValue(size: Int): Long = {
      if (size == 0) return 0L
      require(pos + size <= bits.length, "value bits past end of stream")
      val raw = java.lang.Long.parseLong(bits.substring(pos, pos + size), 2)
      pos += size
      if (raw >= (1L << (size - 1))) raw else raw - (1L << size) + 1
    }
    val zz = new Array[Long](64)
    zz(0) = readValue(readCode(DcCodes))
    var p = 1
    var eob = false
    while (p <= 63 && !eob) {
      val sym = readCode(AcCodes)
      if (sym == 0x00) eob = true
      else if (sym == 0xf0) { require(p + 16 <= 64, "ZRL past block"); p += 16 }
      else {
        val (run, size) = (sym >> 4, sym & 0xf)
        p += run
        require(p <= 63, "AC run past block")
        zz(p) = readValue(size)
        p += 1
      }
    }
    zz
  }

  /** The graded operator: per doc, the SAME quantized block as
    * `mm_dct_roundtrip` entropy-coded with the standard JPEG tables,
    * bit-packed, decoded back through the real bit-walking decoder
    * (roundtrip require — any packing or table slip explodes), and
    * graded on (code count, bit length, byte length, md5 of the
    * padded bitstring) — the oracle rebuilds the identical bitstring
    * from the coefficient replay and the injected code literals.
    * Map-only: one row in, one row out, no shuffle. */
  def dctHuffman(docs: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("n_codes", LongType, nullable = false),
      StructField("n_bits", LongType, nullable = false),
      StructField("n_bytes", LongType, nullable = false),
      StructField("bits_md5", StringType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    docs.select(col("doc_id")).mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val id = r.getLong(0)
        val px = Array.tabulate(8, 8)((y, x) => (((id + x * 7 + y * 13) % 256) + 256) % 256)
        val q = Multimodal.dctForward(px)
          .map(_.map(v => Multimodal.rdiv(v, Multimodal.DctQ)))
        val zz = Multimodal.Zigzag.map(i => q(i / 8)(i % 8))
        val (bits, nCodes, nBits) = encodeBlockBits(zz)
        val packed = packBits(bits)
        require(java.util.Arrays.equals(decodeBlock(packed), zz),
          s"Huffman roundtrip diverged for doc $id")
        md.reset()
        val digest = md.digest(bits.getBytes("US-ASCII"))
          .map("%02x".format(_)).mkString
        Row(id, nCodes.toLong, nBits.toLong, packed.length.toLong, digest)
      }
    }(enc)
  }
}
