package graft

import graft.operators.Chunker
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the pure (driver-side) algorithms — plain
  * ScalaCheck generators sampled under fixed seeds (the
  * scalatest-scalacheck bridge isn't on the offline classpath). */
class PropertySpec extends AnyFunSuite {

  private val textGen: Gen[String] = for {
    n <- Gen.choose(0, 600)
    chars <- Gen.listOfN(n, Gen.frequency(
      8 -> Gen.alphaNumChar, 2 -> Gen.const(' '),
      1 -> Gen.const('\n'), 1 -> Gen.oneOf(".,!?;:".toSeq)))
  } yield chars.mkString

  private def samples[T](g: Gen[T], n: Int = 200): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("recursive splitter: chunks are bounded and non-empty") {
    samples(textGen).foreach { text =>
      val chunks = Chunker.splitRecursive(text, size = 100, overlap = 10)
      assert(chunks.forall(c => c.nonEmpty && c.length <= 110),
        s"bad chunks for input: ${text.take(80)}")
    }
  }

  test("recursive splitter: short texts come back whole") {
    samples(textGen).map(_.take(100)).filter(_.nonEmpty).foreach { text =>
      assert(Chunker.splitRecursive(text, size = 100, overlap = 10) == Seq(text))
    }
  }

  test("recursive splitter: every chunk's novel tail is from the input") {
    samples(textGen).filter(_.nonEmpty).foreach { text =>
      val chunks = Chunker.splitRecursive(text, size = 80, overlap = 8)
      chunks.zipWithIndex.foreach { case (c, i) =>
        val novel = if (i == 0) c else c.drop(8)
        assert(novel.isEmpty || text.contains(novel),
          s"chunk fragment not from input: ${novel.take(60)}")
      }
    }
  }

  test("hyperplanes are deterministic and seed-sensitive") {
    val a = graft.functions.VectorFunctions.hyperplanes(4, 16)
    val b = graft.functions.VectorFunctions.hyperplanes(4, 16)
    val c = graft.functions.VectorFunctions.hyperplanes(4, 16, seed = "x:")
    assert(a == b && a != c)
    assert(a.flatten.forall(v => v >= -0.5 && v <= 0.5))
  }

  test("fakeDecode histogram conserves mass") {
    samples(Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue))).foreach { bytes =>
      val hist = graft.multimodal.Multimodal.fakeDecode(bytes.toArray)
      assert(hist.sum == bytes.length && hist.length == 16)
    }
  }

  // ── codec roundtrips over RANDOM geometries (the graded entries
  // pin the formula-derived dims; these pin the codecs themselves
  // across arbitrary widths — every padding/stride case — heights,
  // frame counts, and signal lengths) ─────────────────────────────

  private val geoGen: Gen[(Long, Int, Int, Int)] = for {
    id <- Gen.choose(0L, 1000000000L)
    w <- Gen.choose(1, 64)
    h <- Gen.choose(1, 48)
    nf <- Gen.choose(1, 6)
  } yield (id, w, h, nf)

  test("WAV roundtrips any sample count bit-exactly") {
    samples(Gen.zip(Gen.choose(0L, 1000000000L), Gen.choose(1, 4000)), 60)
      .foreach { case (id, n) =>
        val (rate, ch, smp) = graft.multimodal.Multimodal.wavDecode(
          graft.multimodal.Multimodal.wavEncode(id, n))
        assert(rate == 16000 && ch == 1 && smp.length == n)
        (0 until n).foreach { k =>
          assert(smp(k) == (((id * 31 + k * 7) % 65536) - 32768).toShort)
        }
      }
  }

  test("BMP roundtrips any geometry pixel-exactly (all four pad widths)") {
    val seen = scala.collection.mutable.Set[Int]()
    samples(geoGen, 80).foreach { case (id, w, h, _) =>
      seen += (w * 3) % 4
      val (dw, dh, px) = graft.multimodal.Multimodal.bmpDecode(
        graft.multimodal.Multimodal.bmpEncode(id, w, h))
      assert(dw == w && dh == h && px.length == w * 3 * h)
      (0 until h).foreach { y =>
        (0 until w).foreach { x =>
          assert(px(y * w * 3 + x * 3) == ((id + x * 7 + y * 13) % 256).toByte)
        }
      }
    }
    assert(seen.size == 4, s"pad widths exercised: $seen") // 0,1,2,3 byte pads
  }

  test("AVI roundtrips any geometry frame- and pixel-exactly") {
    samples(geoGen, 50).foreach { case (id, w, h, nf) =>
      val bytes = graft.multimodal.Multimodal.aviEncode(id, w, h, nf)
      val stride = w * 3 + (4 - (w * 3) % 4) % 4
      assert(bytes.length == 224 + nf * (8 + stride * h))
      val (dw, dh, fr) = graft.multimodal.Multimodal.aviDecode(bytes)
      assert(dw == w && dh == h && fr.length == nf)
      (0 until nf).foreach { f =>
        (0 until h).foreach { y =>
          (0 until w).foreach { x =>
            assert(fr(f)(y * w * 3 + x * 3) ==
              ((id + x * 7 + y * 13 + f * 29) % 256).toByte)
          }
        }
      }
    }
  }

  test("PNG roundtrips any geometry pixel-exactly through deflate + unfilter") {
    samples(geoGen, 50).foreach { case (id, w, h, _) =>
      val bytes = graft.multimodal.Multimodal.pngEncode(id, w, h)
      val (dw, dh, px, nf) = graft.multimodal.Multimodal.pngDecode(bytes)
      assert(dw == w && dh == h && px.length == w * 3 * h)
      assert(nf == math.min(h, 5)) // the rotating filter schedule ran
      (0 until h).foreach { y =>
        (0 until w).foreach { x =>
          assert(px((y * w + x) * 3) == ((id + x * 7 + y * 13) % 256).toByte)
        }
      }
    }
  }
}
