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
}
