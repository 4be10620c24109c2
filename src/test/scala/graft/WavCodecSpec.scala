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
}
