package graft

import graft.operators.{Embedder, ProcessTextEncoder}
import org.apache.spark.sql.functions._

/** The external-process TextEncoder binding, driven by a real POSIX
  * process (awk) standing in for a model runner: correct vectors
  * through the full Embedder.mapPartitions path, batch framing under
  * multi-partition parallelism, and one shared session per JVM. */
class ProcessEncoderSpec extends SparkSpec {
  import spark.implicits._

  // a 2-"dimensional" model: [char length, word count] — trivially
  // recomputable JVM-side. `-W interactive` + fflush(): mawk
  // otherwise block-buffers BOTH directions of the pipe and the
  // first batch deadlocks waiting for replies that sit in a buffer
  private val awkModel = Seq("awk", "-W", "interactive",
    "{printf \"%d %d\\n\", length($0), NF; fflush()}")

  test("encodes through a live external process, batch-framed") {
    val enc = ProcessTextEncoder(awkModel, dim = 2)
    val got = enc.encode(Seq("hello world", "a", "one two three"))
    assert(got.map(_.toSeq) == Seq(Seq(11f, 2f), Seq(1f, 1f), Seq(13f, 3f)))
  }

  test("drives the full Embedder path across partitions with one JVM session") {
    val docs = (1 to 200).map(i => (i.toLong, ("w " * (i % 7 + 1)).trim))
      .toDF("doc_id", "text").repartition(8)
    val out = Embedder.embed(docs, "text", Seq("doc_id"),
        ProcessTextEncoder(awkModel, dim = 2), batchSize = 16)
      .select($"doc_id", $"embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    (1 to 200).foreach { i =>
      val words = i % 7 + 1
      assert(out(i.toLong) == Seq((2 * words - 1).toFloat, words.toFloat), s"doc $i")
    }
    // local-mode executor == this JVM: all 8 partitions shared a session
    assert(ProcessTextEncoder.liveSessions == 1)
  }

  test("newlines in text stay one wire frame (escaped), count as one vector") {
    val enc = ProcessTextEncoder(awkModel, dim = 2)
    val got = enc.encode(Seq("line1\nline2", "x"))
    // the escaped frame is "line1\\nline2" → 12 chars, 1 word
    assert(got.length == 2 && got(1).toSeq == Seq(1f, 1f))
  }

  test("a dim mismatch from the process fails loudly, not silently") {
    val enc = ProcessTextEncoder(awkModel, dim = 3)
    val e = intercept[IllegalArgumentException](enc.encode(Seq("abc")))
    assert(e.getMessage.contains("expected 3"))
  }

  test("a batch larger than OS pipe capacity round-trips (no write-all deadlock)") {
    // ~400 texts × ~600 bytes ≈ 240KB of request bytes — several times
    // the ~64KB pipe buffer. A write-everything-then-read loop hangs
    // here; the writer-thread roundTrip must not.
    val enc = ProcessTextEncoder(awkModel, dim = 2)
    val texts = (1 to 400).map(i => s"t$i " + ("word " * 120).trim)
    val got = enc.encode(texts)
    assert(got.length == 400)
    texts.zip(got).foreach { case (t, v) =>
      assert(v.toSeq == Seq(t.length.toFloat, 121f), t.take(10))
    }
  }

  test("a dead runner is evicted and the next encode respawns it") {
    // `head -1` answers one line then exits: the first call succeeds,
    // the child dies, and without eviction every later call would
    // throw 'died mid-batch' forever.
    val oneShot = Seq("sh", "-c", "head -1 | awk '{printf \"%d %d\\n\", length($0), NF}'")
    val enc = ProcessTextEncoder(oneShot, dim = 2)
    assert(enc.encode(Seq("abc")).head.toSeq == Seq(3f, 1f))
    // the child exits after its single reply; a two-text batch now
    // hits the corpse (or its already-evicted slot) and fails…
    intercept[IllegalStateException](enc.encode(Seq("first", "second")))
    // …but the pool slot was evicted, so a fresh single-line batch
    // respawns and succeeds
    assert(enc.encode(Seq("wxyz")).head.toSeq == Seq(4f, 1f))
  }
}
