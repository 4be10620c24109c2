package graft

import graft.operators.{Embedder, ProcessTextEncoder}
import org.apache.spark.sql.functions._

/** The external-process encoder binding driven by a REAL model
  * runner in another language at gate scale: tools/encoder.py — a
  * Python feature-hashing embedder (signed hashing trick over char
  * 3-grams, Weinberger et al. 2009, L2-normalized) speaking the line
  * protocol — encodes the full sf0.01 documents corpus through the
  * Embedder mapPartitions path. A Scala mirror of the model verifies
  * every vector: the runner is doing real numeric work the JVM side
  * must agree with bit-for-bit at float precision, which is the
  * production contract an ONNX/sentence-transformers runner slots
  * into (same command seam, same framing, same batching). */
class ProcessEncoderGateSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 64
  private val runner = Seq("python3",
    new java.io.File("tools/encoder.py").getAbsolutePath, dim.toString)

  /** Driver-side mirror of tools/encoder.py's model: signed md5
    * 3-gram hashing, floorMod bucketing, L2 norm — the cross-impl
    * agreement IS the test. */
  private def mirror(text: String): Array[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val v = new Array[Double](dim)
    val t = " " + text + " "
    // iterate Unicode CODE POINTS, not UTF-16 units: encoder.py's
    // t[i:i+3] slices code points, so a substring-based mirror would
    // split surrogate pairs on supplementary-plane text and silently
    // hold only for BMP corpora
    val cps = t.codePoints().toArray
    (0 until cps.length - 2).foreach { i =>
      md.reset()
      val d = md.digest(new String(cps, i, 3).getBytes("UTF-8"))
      val h = java.nio.ByteBuffer.wrap(d, 0, 8).getLong
      v(java.lang.Math.floorMod(h, dim.toLong).toInt) += (if (h < 0) -1.0 else 1.0)
    }
    val nrm = math.sqrt(v.map(x => x * x).sum)
    if (nrm > 0) v.map(_ / nrm) else v
  }

  test("a Python model runner encodes the gate corpus; the Scala mirror agrees") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
      .select(col("doc_id"), col("text")).repartition(8)
    val out = Embedder.embed(docs, "text", Seq("doc_id"),
        ProcessTextEncoder(runner, dim), batchSize = 64)
      .select(col("doc_id"), col("embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.size == texts.size && out.nonEmpty)
    texts.foreach { case (id, text) =>
      val got = out(id)
      val want = mirror(text)
      assert(got.length == dim, s"doc $id dim")
      // unit-norm (the runner normalizes; a non-trivial text always
      // has at least one 3-gram)
      val nrm = math.sqrt(got.map(x => x.toDouble * x).sum)
      assert(math.abs(nrm - 1.0) < 1e-4, s"doc $id norm $nrm")
      got.indices.foreach { j =>
        assert(math.abs(got(j) - want(j)) < 1e-5,
          s"doc $id dim $j: runner ${got(j)} vs mirror ${want(j)}")
      }
    }
  }

  test("a real NEURAL runner (numpy MLP) serves the gate corpus through the same seam") {
    // tools/encoder_mlp.py: hashed 3-gram features → 256→128 tanh →
    // dim → L2-normalize, seeded weights — a real dense forward pass
    // with a nonlinearity, the compute shape an ONNX or
    // sentence-transformers runner has. Graded at library level
    // (determinism, norm, discrimination, throughput); the DuckDB
    // oracle path keeps the LINEAR model because cross-language
    // bit-equality is a property linear pipelines have and tanh
    // networks don't.
    val mlp = Seq("python3",
      new java.io.File("tools/encoder_mlp.py").getAbsolutePath, dim.toString)
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
      .select(col("doc_id"), col("text")).repartition(8)
    val nDocs = docs.count()
    val t0 = System.nanoTime()
    val out = Embedder.embed(docs, "text", Seq("doc_id"),
        ProcessTextEncoder(mlp, dim), batchSize = 64)
      .select(col("doc_id"), col("embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toList).toMap
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"MLP encoder: ${nDocs / secs}%.0f docs/s over $nDocs docs (${secs}%.1f s)")
    assert(out.size == nDocs && nDocs > 0)
    out.values.foreach { v =>
      assert(v.length == dim)
      val nrm = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(nrm - 1.0) < 1e-4, s"norm $nrm")
    }
    // the network discriminates: (near-)distinct texts land on
    // distinct vectors
    assert(out.values.toSet.size > nDocs * 0.9)
    // deterministic across partitionings (seeded weights, one model
    // process per executor JVM)
    val again = Embedder.embed(docs.coalesce(1), "text", Seq("doc_id"),
        ProcessTextEncoder(mlp, dim), batchSize = 16)
      .select(col("doc_id"), col("embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toList).toMap
    assert(again == out)
  }

  test("supplementary-plane text agrees across the runner and the mirror") {
    // surrogate-pair corpus: a UTF-16-unit mirror would split the
    // pairs into lone surrogates (md5 over '?' bytes) and disagree
    val texts = Seq("ice 🧊 cream", "𝕊park 𝄞 notes",
      "🙂", "mixed é🍦e")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val out = Embedder.embed(df, "text", Seq("doc_id"),
        ProcessTextEncoder(runner, dim), batchSize = 2)
      .select(col("doc_id"), col("embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val got = out(i.toLong)
      val want = mirror(t)
      got.indices.foreach { j =>
        assert(math.abs(got(j) - want(j)) < 1e-5,
          s"text $i dim $j: runner ${got(j)} vs mirror ${want(j)}")
      }
    }
  }

  test("the runner is deterministic across partitionings and sessions") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    def run(df: org.apache.spark.sql.DataFrame) =
      Embedder.embed(df, "text", Seq("doc_id"), ProcessTextEncoder(runner, dim),
          batchSize = 16)
        .select(col("doc_id"), col("embedding"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toList).toMap
    assert(run(docs.repartition(7)) == run(docs.coalesce(1)))
  }
}
