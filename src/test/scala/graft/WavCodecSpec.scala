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
}
