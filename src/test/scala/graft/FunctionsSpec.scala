package graft

import graft.functions.HashFunctions._
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("normalizeText strips, lowercases and collapses whitespace") {
    val got = Seq("  Hello,   Wörld! <TAG> ok  ").toDF("t")
      .select(normalizeText($"t")).as[String].head()
    assert(got == "hello, w rld! tag ok")
  }

  test("tokens drops empties; tokenCount counts") {
    val got = Seq("  a  b   c ").toDF("t").select(tokens($"t")).as[Seq[String]].head()
    assert(got == Seq("a", "b", "c"))
    val n = Seq("one two  three").toDF("t").select(tokenCount($"t")).as[Long].head()
    assert(n == 3L)
  }

  test("bpeTokens splits words and punctuation marks") {
    val got = Seq("don't stop, ok?").toDF("t").select(bpeTokens($"t")).as[Seq[String]].head()
    assert(got == Seq("don", "'", "t", "stop", ",", "ok", "?"))
  }

  test("shingles builds word trigrams; short docs yield empty") {
    val got = Seq("a b c d").toDF("t").select(shingles(tokens($"t"), 3)).as[Seq[String]].head()
    assert(got == Seq("a b c", "b c d"))
    val short = Seq("a b").toDF("t").select(shingles(tokens($"t"), 3)).as[Seq[String]].head()
    assert(short.isEmpty)
  }

  test("fingerprint is whitespace/order independent over the token bag") {
    val df = Seq(("b a  c", "c  b a")).toDF("x", "y")
    val Array(fx, fy) = df.select(fingerprint(tokens($"x")), fingerprint(tokens($"y")))
      .as[(String, String)].head() match { case (a, b) => Array(a, b) }
    assert(fx == fy)
  }

  test("langId votes marker words with precedence, und when silent") {
    val got = Seq("the cat is on the mat", "der hund ist nicht das",
      "xyzzy qwerty").toDF("t").select(langId($"t")).as[String].collect().toSeq
    assert(got == Seq("en", "de", "und"))
  }

  test("md5Long/md5Int are stable and in range") {
    val (a, b) = Seq("x").toDF("t").select(md5Long($"t"), md5Int($"t")).as[(Long, Long)].head()
    assert(a >= 0 && a < (1L << 48) && b >= 0 && b < (1L << 32))
    // regression pin: md5("x") = 9dd4e461268c8034f5c8564e155c67a6
    assert(a == java.lang.Long.parseLong("9dd4e461268c", 16))
  }

  test("minhash signature: identical docs collide, k entries") {
    val df = Seq("a b c d e f", "a b c d e f", "z y x w v u").toDF("t")
      .select(minhashSignature(shingles(tokens($"t"), 3), 8).as("sig"))
    val sigs = df.as[Seq[Long]].collect()
    assert(sigs(0).length == 8 && sigs(0) == sigs(1) && sigs(0) != sigs(2))
  }

  test("simhash: identical token bags give hamming 0, disjoint differ") {
    val df = Seq("a b c d", "a b c d", "p q r s").toDF("t")
      .select(simhash32(tokens($"t")).as("s"))
    val s = df.as[Long].collect()
    assert(s(0) == s(1))
    assert(java.lang.Long.bitCount(s(0) ^ s(2)) > 0)
  }

  test("vector dot/norm/cosine on known values") {
    val df = Seq((Seq(1.0f, 2.0f, 2.0f), Seq(2.0f, 1.0f, 2.0f))).toDF("a", "b")
    val (d, n, c) = df.select(
      VectorFunctions.dot($"a", $"b"), VectorFunctions.norm($"a"),
      VectorFunctions.cosine($"a", $"b")).as[(Double, Double, Double)].head()
    assert(d == 8.0 && n == 3.0 && math.abs(c - 8.0 / 9.0) < 1e-12)
  }

  test("signBucket deterministic and bounded") {
    val planes = VectorFunctions.hyperplanes(4, 3)
    val df = Seq(Seq(1.0f, -2.0f, 0.5f), Seq(1.0f, -2.0f, 0.5f)).toDF("v")
      .select(VectorFunctions.signBucket($"v", planes).as("b"))
    val b = df.as[Long].collect()
    assert(b(0) == b(1) && b(0) >= 0 && b(0) < 16)
  }
}
