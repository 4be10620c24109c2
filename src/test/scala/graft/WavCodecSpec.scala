package graft

import graft.multimodal.Multimodal

/** The real PCM16/WAV codec behind the multimodal decode seam:
  * byte-exact roundtrips, RIFF chunk-walk robustness (unknown chunks,
  * odd-size padding), and loud failure on malformed containers. */
class WavCodecSpec extends SparkSpec {

  test("encode → decode roundtrips every sample bit-exactly") {
    (Seq(0L, 1L, 7L, 123L, 99999L)).foreach { id =>
      val n = (id % 50 + 10).toInt
      val bytes = Multimodal.wavEncode(id, n)
      assert(bytes.length == 44 + 2 * n)
      val (rate, channels, smp) = Multimodal.wavDecode(bytes)
      assert(rate == 16000 && channels == 1 && smp.length == n)
      (0 until n).foreach { k =>
        val want = (((id * 31 + k * 7) % 65536) - 32768).toShort
        assert(smp(k) == want, s"doc $id sample $k")
      }
    }
  }

  test("the parser walks unknown chunks (with RIFF odd-size padding) to reach data") {
    val base = Multimodal.wavEncode(42L, 20)
    // splice a 5-byte vendor chunk (odd size → 1 pad byte) between
    // the fmt and data chunks; a chunk-walking parser must skip it
    val fmtEnd = 12 + 8 + 16
    val extra = java.nio.ByteBuffer.allocate(8 + 6)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    extra.put("JUNK".getBytes("US-ASCII")).putInt(5)
      .put(Array[Byte](1, 2, 3, 4, 5, 0))
    val spliced = base.take(fmtEnd) ++ extra.array() ++ base.drop(fmtEnd)
    val (_, _, smp) = Multimodal.wavDecode(spliced)
    assert(smp.toSeq == Multimodal.wavDecode(base)._3.toSeq)
  }

  test("an odd-sized data chunk pads out so a trailing chunk still parses") {
    // data declares 25 bytes (12 samples + 1 odd byte) followed by a
    // LIST chunk: without the RIFF pad-byte advance the walker would
    // misalign into the pad and die on garbage fourcc bytes
    val body = java.nio.ByteBuffer.allocate((8 + 16) + (8 + 26) + (8 + 4))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    body.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(25)
    (0 until 12).foreach(k => body.putShort((k * 3).toShort))
    body.put(9.toByte).put(0.toByte) // odd leftover byte + pad
    body.put("LIST".getBytes("US-ASCII")).putInt(4).put("INFO".getBytes("US-ASCII"))
    val riff = java.nio.ByteBuffer.allocate(12 + body.position())
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    riff.put("RIFF".getBytes("US-ASCII")).putInt(4 + body.position())
      .put("WAVE".getBytes("US-ASCII")).put(body.array(), 0, body.position())
    val (rate, _, smp) = Multimodal.wavDecode(riff.array())
    assert(rate == 8000 && smp.toSeq == (0 until 12).map(k => (k * 3).toShort))
  }

  test("a data chunk declaring more bytes than remain fails loudly") {
    val good = Multimodal.wavEncode(7L, 12)
    val lying = good.clone()
    // the data size field sits right before the samples (offset 40)
    val bb = java.nio.ByteBuffer.wrap(lying).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(40, 1000000)
    val e = intercept[IllegalArgumentException](Multimodal.wavDecode(lying))
    assert(e.getMessage.contains("declares"))
  }

  test("a NEGATIVE chunk size fails loudly instead of looping the walker forever") {
    // size -8 cancels the 8-byte chunk-header advance: an unbounded
    // walker would re-read the same chunk forever. Every branch of
    // the walk must reject it — data, fmt, and the unknown-chunk skip
    val good = Multimodal.wavEncode(7L, 12)
    for (offset <- Seq(40 /*data size*/, 16 /*fmt size*/)) {
      val lying = good.clone()
      java.nio.ByteBuffer.wrap(lying).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putInt(offset, -8)
      val e = intercept[IllegalArgumentException](Multimodal.wavDecode(lying))
      assert(e.getMessage.contains("declares"), e.getMessage)
    }
    // an unknown chunk with a negative size, spliced before data
    val body = java.nio.ByteBuffer.allocate(64).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    body.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort).putShort(1.toShort).putInt(8000).putInt(16000)
      .putShort(2.toShort).putShort(16.toShort)
    body.put("junk".getBytes("US-ASCII")).putInt(-8)
    val riff = java.nio.ByteBuffer.allocate(12 + body.position())
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    riff.put("RIFF".getBytes("US-ASCII")).putInt(4 + body.position())
      .put("WAVE".getBytes("US-ASCII")).put(body.array(), 0, body.position())
    val e = intercept[IllegalArgumentException](Multimodal.wavDecode(riff.array()))
    assert(e.getMessage.contains("declares"), e.getMessage)
  }

  test("malformed containers fail loudly, never yield silent garbage") {
    val good = Multimodal.wavEncode(7L, 12)
    val notRiff = good.clone(); notRiff(0) = 'X'.toByte
    intercept[IllegalArgumentException](Multimodal.wavDecode(notRiff))
    // IEEE-float format tag (3) instead of PCM (1)
    val floatFmt = good.clone(); floatFmt(20) = 3
    intercept[IllegalArgumentException](Multimodal.wavDecode(floatFmt))
    // 8-bit samples claimed in the header
    val eightBit = good.clone(); eightBit(34) = 8
    intercept[IllegalArgumentException](Multimodal.wavDecode(eightBit))
  }

  test("the graded roundtrip operator is partition-invariant") {
    val docs = Tables.documents(spark, sf)
    val one = Multimodal.wavRoundtrip(docs.coalesce(1))
      .orderBy("doc_id").collect().map(_.toString).toSeq
    val many = Multimodal.wavRoundtrip(docs.repartition(7))
      .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(one == many && one.nonEmpty)
  }

  // ── the BMP (image) twin ─────────────────────────────────────────

  test("BMP encode → decode un-flips bottom-up rows and strips padding, pixel-exact") {
    Seq(0L, 1L, 5L, 51L, 1234L).foreach { id =>
      val (w, h) = ((id % 9 + 4).toInt, (id % 7 + 3).toInt)
      val bytes = Multimodal.bmpEncode(id, w, h)
      val rowBytes = w * 3
      assert(bytes.length == 54 + (rowBytes + (4 - rowBytes % 4) % 4) * h)
      val (dw, dh, px) = Multimodal.bmpDecode(bytes)
      assert(dw == w && dh == h && px.length == rowBytes * h)
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
        val want = ((id + x * 7 + y * 13) % 256).toByte
        assert(px(y * rowBytes + x * 3 + c) == want, s"doc $id px($x,$y) ch$c")
      }
    }
  }

  test("BMP parser rejects compressed, non-24-bit, and top-down containers loudly") {
    val good = Multimodal.bmpEncode(9L, 7, 5)
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    intercept[IllegalArgumentException](Multimodal.bmpDecode(badMagic))
    val eightBit = good.clone(); eightBit(28) = 8
    intercept[IllegalArgumentException](Multimodal.bmpDecode(eightBit))
    val rle = good.clone(); rle(30) = 1 // BI_RLE8
    intercept[IllegalArgumentException](Multimodal.bmpDecode(rle))
  }

  test("the graded BMP roundtrip is partition-invariant") {
    val docs = Tables.documents(spark, sf)
    val one = Multimodal.bmpRoundtrip(docs.coalesce(1))
      .orderBy("doc_id").collect().map(_.toString).toSeq
    val many = Multimodal.bmpRoundtrip(docs.repartition(7))
      .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(one == many && one.nonEmpty)
  }

  // ── the AVI (video) rung, completing the ladder ──────────────────

  test("AVI encode → decode returns every frame pixel-exact, in order") {
    Seq(0L, 1L, 5L, 42L, 999L).foreach { id =>
      val (w, h, nf) = ((id % 6 + 4).toInt, (id % 5 + 3).toInt, (id % 4 + 2).toInt)
      val bytes = Multimodal.aviEncode(id, w, h, nf)
      val stride = w * 3 + (4 - (w * 3) % 4) % 4
      assert(bytes.length == 224 + nf * (8 + stride * h))
      val (dw, dh, frames) = Multimodal.aviDecode(bytes)
      assert(dw == w && dh == h && frames.length == nf)
      for (f <- 0 until nf; y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
        val want = ((id + x * 7 + y * 13 + f * 29) % 256).toByte
        assert(frames(f)(y * w * 3 + x * 3 + c) == want, s"doc $id f$f px($x,$y) ch$c")
      }
    }
  }

  test("the AVI walker skips foreign chunks and rejects malformed containers loudly") {
    val good = Multimodal.aviEncode(7L, 5, 4, 3)
    // splice a JUNK chunk (odd size → pad byte) between hdrl and movi
    val hdrlEnd = 12 + 200
    val junk = java.nio.ByteBuffer.allocate(8 + 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    junk.put("JUNK".getBytes("US-ASCII")).putInt(7)
      .put(Array[Byte](1, 2, 3, 4, 5, 6, 7, 0))
    val spliced = good.take(hdrlEnd) ++ junk.array() ++ good.drop(hdrlEnd)
    assert(Multimodal.aviDecode(spliced)._3.map(_.toSeq).toSeq ==
      Multimodal.aviDecode(good)._3.map(_.toSeq).toSeq)
    // not an AVI
    val notAvi = good.clone(); notAvi(8) = 'X'.toByte
    intercept[IllegalArgumentException](Multimodal.aviDecode(notAvi))
    // a compressed frame chunk: 00db → 00dc
    val dc = good.clone()
    val frameOff = 12 + 200 + 12
    dc(frameOff + 3) = 'c'.toByte
    intercept[IllegalArgumentException](Multimodal.aviDecode(dc))
    // two streams claimed in avih (offset: 12 RIFF + 12 LIST/hdrl +
    // 8 avih header + 6 ints)
    val multi = good.clone()
    val bbm = java.nio.ByteBuffer.wrap(multi).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bbm.putInt(12 + 12 + 8 + 24, 2)
    intercept[IllegalArgumentException](Multimodal.aviDecode(multi))
    // a frame chunk lying about its size
    val lying = good.clone()
    val bbl = java.nio.ByteBuffer.wrap(lying).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bbl.putInt(frameOff + 4, 1000000)
    intercept[IllegalArgumentException](Multimodal.aviDecode(lying))
  }

  test("the graded AVI roundtrip is partition-invariant") {
    val docs = Tables.documents(spark, sf)
    val one = Multimodal.aviRoundtrip(docs.coalesce(1))
      .orderBy("doc_id").collect().map(_.toString).toSeq
    val many = Multimodal.aviRoundtrip(docs.repartition(7))
      .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(one == many && one.nonEmpty)
  }

  test("PNG encode → inflate → unfilter returns every pixel exactly, all five filters") {
    // tall enough that the rotating y%5 filter schedule covers
    // None/Sub/Up/Average/Paeth
    val (w, h) = (11, 9)
    val bytes = Multimodal.pngEncode(5L, w, h)
    val (dw, dh, px, nf) = Multimodal.pngDecode(bytes)
    assert(dw == w && dh == h && nf == 5)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
      val want = ((5L + x * 7 + y * 13) % 256).toInt
      assert((px((y * w + x) * 3 + c) & 0xff) == want,
        s"pixel ($x,$y,$c): got ${px((y * w + x) * 3 + c) & 0xff}, want $want")
    }
    // the stream is genuinely entropy-coded: a larger uniform-ish
    // image deflates well below its raw pixel payload
    val big = Multimodal.pngEncode(3L, 64, 64)
    assert(big.length < 64 * 64 * 3 / 2, s"deflate did not compress: ${big.length}")
    val (_, _, bigPx, _) = Multimodal.pngDecode(big)
    assert(bigPx.length == 64 * 64 * 3)
  }

  test("PNG parser rejects malformed streams loudly") {
    val good = Multimodal.pngEncode(7L, 8, 6)
    // not a PNG
    val notPng = good.clone(); notPng(0) = 'X'.toByte
    intercept[IllegalArgumentException](Multimodal.pngDecode(notPng))
    // corrupt a data byte inside IDAT → the chunk CRC must catch it
    val idatOff = 8 + (12 + 13) + 8 // sig, IHDR chunk, IDAT len+type
    val crcBad = good.clone(); crcBad(idatOff + 2) = (crcBad(idatOff + 2) ^ 0x41).toByte
    val e = intercept[IllegalArgumentException](Multimodal.pngDecode(crcBad))
    assert(e.getMessage.contains("CRC"), e.getMessage)
    // a chunk declaring more bytes than remain
    val lying = good.clone()
    java.nio.ByteBuffer.wrap(lying).putInt(8, 1000000) // IHDR length field
    intercept[IllegalArgumentException](Multimodal.pngDecode(lying))
    // truncated mid-IDAT (drop the tail): either the chunk header
    // bound or the inflate-length check must fire
    intercept[IllegalArgumentException](
      Multimodal.pngDecode(good.take(good.length - 16)))
    // unsupported color type (grayscale) — flip IHDR byte + fix CRC
    val gray = good.clone()
    gray(8 + 8 + 9) = 0.toByte // color type byte inside IHDR data
    val crc = new java.util.zip.CRC32()
    crc.update(gray, 8 + 4, 4 + 13) // type + data
    java.nio.ByteBuffer.wrap(gray).putInt(8 + 8 + 13, crc.getValue.toInt)
    val e2 = intercept[IllegalArgumentException](Multimodal.pngDecode(gray))
    assert(e2.getMessage.contains("truecolor"), e2.getMessage)
  }

  test("the graded PNG roundtrip is partition-invariant") {
    val docs = Tables.documents(spark, sf)
    val one = Multimodal.pngRoundtrip(docs.coalesce(1))
      .orderBy("doc_id").collect().map(_.toString).toSeq
    val many = Multimodal.pngRoundtrip(docs.repartition(7))
      .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(one == many && one.nonEmpty)
  }

  test("DCT transform coding: lossy but bounded, decode reproduces the quantizer's pick") {
    // the integer transform + step-8 quantizer must lose SOMETHING
    // (it is the lossy rung) but stay in the JPEG mid-quality regime:
    // bounded max error, small per-pixel rms
    (0L until 32L).foreach { id =>
      val px = Array.tabulate(8, 8)((y, x) => (((id + x * 7 + y * 13) % 256) + 256) % 256)
      val bytes = Multimodal.dctEncode(id)
      val (did, rec) = Multimodal.dctDecode(bytes)
      assert(did == id)
      var sse = 0L
      for (y <- 0 until 8; x <- 0 until 8) {
        val e = rec(y)(x) - px(y)(x)
        assert(math.abs(e) <= 32, s"doc $id pixel ($y,$x) err $e out of regime")
        sse += e * e
      }
      assert(sse <= 64 * 64, s"doc $id sse $sse out of the step-8 regime")
      // the byte frame is deterministic: same block, same stream
      assert(java.util.Arrays.equals(bytes, Multimodal.dctEncode(id)))
    }
  }

  test("DCT parser rejects malformed frames loudly") {
    val good = Multimodal.dctEncode(7L)
    // magic
    val notDct = good.clone(); notDct(0) = 'X'.toByte
    intercept[IllegalArgumentException](Multimodal.dctDecode(notDct))
    // payload CRC flip
    val crcBad = good.clone(); crcBad(good.length - 1) = (crcBad(good.length - 1) ^ 0x40).toByte
    intercept[Exception](Multimodal.dctDecode(crcBad))
    // truncated deflate stream
    intercept[IllegalArgumentException](Multimodal.dctDecode(good.take(good.length - 4)))
    // lying raw length (declares more than the stream inflates to)
    val lying = good.clone()
    val bb = java.nio.ByteBuffer.wrap(lying)
    bb.putInt(16, bb.getInt(16) + 7)
    intercept[Exception](Multimodal.dctDecode(lying))
    // truncated header
    intercept[IllegalArgumentException](Multimodal.dctDecode(good.take(10)))
    // hostile quantizer: a huge q would overflow the dequant·inverse
    // accumulation — bounded at 2^20, rejected loudly
    val hostile = good.clone()
    java.nio.ByteBuffer.wrap(hostile).putInt(12, Int.MaxValue)
    val eq = intercept[IllegalArgumentException](Multimodal.dctDecode(hostile))
    assert(eq.getMessage.contains("bad quantizer"))
  }

  test("DCT frame integrity: EVERY single-byte mutation is rejected, none decodes silently") {
    // the CRC spans header fields and payload, and CRC32 detects all
    // single-byte errors — so no bit-flip anywhere in the frame may
    // yield a successful decode with wrong id/quantizer/pixels
    val good = Multimodal.dctEncode(11L)
    (0 until good.length).foreach { i =>
      (1 to 2).foreach { bit =>
        val mut = good.clone()
        mut(i) = (mut(i) ^ (1 << bit)).toByte
        val r = try { Multimodal.dctDecode(mut); None } catch {
          case e: Exception => Some(e)
        }
        assert(r.isDefined, s"mutation at byte $i bit $bit decoded silently")
      }
    }
  }

  test("the graded DCT roundtrip is partition-invariant") {
    val docs = Tables.documents(spark, sf)
    val one = Multimodal.dctRoundtrip(docs.coalesce(1))
      .orderBy("doc_id").collect().map(_.toString).toSeq
    val many = Multimodal.dctRoundtrip(docs.repartition(7))
      .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(one == many && one.nonEmpty)
  }

  test("JPEG Huffman tables derive the PUBLISHED standard codes") {
    import graft.multimodal.JpegHuffman
    // spot-pins straight out of ITU-T T.81 Annex K: the canonical
    // derivation must land the exact codes every baseline JPEG
    // decoder hardcodes
    assert(JpegHuffman.DcCodes(0) == "00")
    assert(JpegHuffman.DcCodes(1) == "010")
    assert(JpegHuffman.DcCodes(11) == "111111110")
    assert(JpegHuffman.AcCodes(0x00) == "1010", "EOB must be 1010")
    assert(JpegHuffman.AcCodes(0x01) == "00")
    assert(JpegHuffman.AcCodes(0xf0) == "11111111001", "ZRL must be 11111111001")
    assert(JpegHuffman.AcCodes.size == 162 && JpegHuffman.DcCodes.size == 12)
    // prefix-freeness: no code is a prefix of another (within a table)
    for (codes <- Seq(JpegHuffman.DcCodes.values.toSeq, JpegHuffman.AcCodes.values.toSeq);
         a <- codes; b <- codes if a != b)
      assert(!b.startsWith(a), s"$a prefixes $b")
  }

  test("Huffman block coding roundtrips adversarial blocks exactly") {
    import graft.multimodal.JpegHuffman
    def rt(zz: Array[Long]): Unit = {
      val (bits, _, nBits) = JpegHuffman.encodeBlockBits(zz)
      assert(bits.length % 8 == 0 && bits.length - nBits < 8)
      assert(bits.drop(nBits).forall(_ == '1'), "padding must be 1-bits")
      val back = JpegHuffman.decodeBlock(JpegHuffman.packBits(bits))
      assert(back.toSeq == zz.toSeq, s"roundtrip broke for ${zz.mkString(",")}")
    }
    rt(Array.fill(64)(0L))                         // all-zero: DC 0 + EOB
    rt(Array(513L) ++ Array.fill(63)(0L))          // DC only
    rt(Array.fill(64)(1L))                         // fully dense, no EOB
    rt(Array(100L) ++ Array.fill(62)(0L) ++ Array(5L)) // 62-zero run: 3 ZRLs + sym
    rt(Array(-37L) ++ Array.fill(16)(0L) ++ Array(-1L) ++ Array.fill(46)(0L)) // negatives + one ZRL
    rt((0 until 64).map(i => if (i % 7 == 0) (i - 30).toLong else 0L).toArray)
    // a value outside the AC table's size range is refused loudly
    intercept[IllegalArgumentException](
      JpegHuffman.encodeBlockBits(Array(0L, 1024L) ++ Array.fill(62)(0L)))
  }

  test("the graded Huffman stream is partition-invariant and decodes under mutation or not at all") {
    import graft.multimodal.JpegHuffman
    val docs = Tables.documents(spark, sf)
    val one = JpegHuffman.dctHuffman(docs.coalesce(1))
      .orderBy("doc_id").collect().map(_.toString).toSeq
    val many = JpegHuffman.dctHuffman(docs.repartition(7))
      .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(one == many && one.nonEmpty)
    // the entropy layer has no CRC (JPEG's doesn't either): a bit
    // flip must either throw (prefix walks off the table / run past
    // block) or decode to a DIFFERENT block — never the original
    val zz = Array(131L, 4L, -2L, 0L, 0L, 3L) ++ Array.fill(58)(0L)
    val (bits, _, _) = JpegHuffman.encodeBlockBits(zz)
    val good = JpegHuffman.packBits(bits)
    var changed = 0
    // the last byte may hold 1-padding, whose flips legitimately
    // decode to the original (a JPEG decoder never reads pad bits) —
    // sweep the data bytes
    for (i <- 0 until good.length - 1; bit <- 0 to 1) {
      val mut = good.clone()
      mut(i) = (mut(i) ^ (1 << bit)).toByte
      val r = try Some(JpegHuffman.decodeBlock(mut)) catch { case _: Exception => None }
      r.foreach { dec => if (dec.toSeq != zz.toSeq) changed += 1 }
      assert(r.isEmpty || r.get.toSeq != zz.toSeq ||
        mut.toSeq == good.toSeq, s"mutation at byte $i bit $bit decoded to the original")
    }
    assert(changed > 0, "the sweep never produced a decodable mutant - weak test")
  }
}
