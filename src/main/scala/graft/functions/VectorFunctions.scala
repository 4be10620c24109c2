package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, as pure
  * Catalyst expressions (codegen'd higher-order functions — no UDF,
  * no serialization off the Tungsten row).
  *
  * All arithmetic is double-precision with a strict left-to-right
  * fold, so an oracle engine replaying the same formula produces
  * bit-identical values.
  */
object VectorFunctions {

  /** Left-fold dot product in double precision. Runs as a native
    * Catalyst expression (graft.plans.NativeExprs.DotProduct) with
    * the same fold order as the composed
    * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` form — bit-identical
    * result, ~20× less per-element overhead. */
  def dot(a: Column, b: Column): Column =
    graft.plans.NativeExprs.dotProduct(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Null divisor for a zero-norm operand: the cosine of a zero
    * vector is NULL (undefined) on both engines — Spark 4's ANSI
    * mode would otherwise raise DIVIDE_BY_ZERO where DuckDB yields
    * NULL. NULL similarities drop out of every threshold filter and
    * top-k ranking. */
  private def nzProduct(normA: Column, normB: Column): Column = {
    val p = normA * normB
    when(p =!= 0.0, p)
  }

  def cosine(a: Column, b: Column): Column = dot(a, b) / nzProduct(norm(a), norm(b))

  /** Cosine given precomputed norms (compute the norm once per row —
    * at corpus scale the norm is materialized a single time, not once
    * per candidate pair). */
  def cosinePrenormed(dotAB: Column, normA: Column, normB: Column): Column =
    dotAB / nzProduct(normA, normB)

  /** Deterministic pseudo-random hyperplanes for sign-LSH: component
    * (s, i) comes from md5 bytes of "s:i" mapped into [-0.5, 0.5].
    * No RNG state — identical planes on every executor and every run. */
  def hyperplanes(nbits: Int, dim: Int, seed: String = ""): Seq[Seq[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until nbits).map { s =>
      (0 until dim).map { i =>
        val h = md.digest(s"$seed$s:$i".getBytes("UTF-8"))
        val v = java.nio.ByteBuffer.wrap(h).getLong(0) >>> 16 // 48 bits
        v.toDouble / Math.pow(2.0, 48.0) - 0.5
      }
    }
  }

  /** Random-hyperplane LSH bucket: `planes.size` sign bits. Vectors
    * in the same bucket are ANN candidates; bucketing first means a
    * probe touches ~corpus/2^nbits instead of the whole corpus. */
  def signBucket(vec: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, s) =>
      val d = graft.plans.NativeExprs.dotProduct(vec, typedlit(p))
      when(d > 0, lit(1L << s)).otherwise(lit(0L))
    }.reduce(_ + _)
}
