package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable hashes.
  *
  * Built on md5 (identical bytes-in/hex-out in every engine) rather
  * than murmur/xxhash (whose seeds and variants differ across
  * engines), so oracle replays in DuckDB produce bit-identical
  * values. 48-bit values keep everything in a signed 64-bit lane.
  */
object HashFunctions {

  /** First 12 hex chars (48 bits) of md5, as a non-negative long. */
  def md5Long(c: Column): Column =
    conv(substring(md5(c), 1, 12), 16, 10).cast("long")

  /** Seeded variant: hash of "seed:value". */
  def md5Long(seed: Column, c: Column): Column =
    md5Long(concat(seed.cast("string"), lit(":"), c))

  /** 32-bit variant (first 8 hex chars) — used for simhash bit lanes. */
  def md5Int(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** SPEC-ONLY MinHash (md5-seeded): kept as the readable composed
    * form the tests cross-check primitives against. NOT the
    * production path and NOT signature-compatible with
    * `NativeExprs.MinHashSig` (affine mod-P), which every Dedup
    * operator and oracle uses — never mix the two in one pipeline.
    */
  def minhashSignature(shingleCol: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      s => array_min(transform(shingleCol, x => md5Long(s, x))))

  /** LSH band keys: the signature split into `bands` contiguous rows,
    * each band hashed to one long. Docs sharing any band key are
    * near-dup candidates (banding amplifies Jaccard similarity). */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map(b =>
      md5Long(concat_ws(",", slice(sig, b * rowsPerBand + 1, rowsPerBand)))): _*)

  /** 32-bit SimHash over a precomputed token-hash array: per bit, the
    * sign of the ±1 sum across tokens. SPEC-ONLY composed form —
    * production and oracles use `NativeExprs.SimHash32`
    * (bit-identical; the tests assert that equivalence). */
  def simhashFromHashes(hashes: Column): Column =
    (0 until 32).map { b =>
      val signSum = aggregate(hashes, lit(0L),
        (acc, h) => acc + (shiftright(h, b).bitwiseAND(lit(1L)) * 2 - 1))
      when(signSum > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)

  def simhash32(toks: Column): Column =
    simhashFromHashes(transform(toks, t => md5Int(t)))

  /** Hamming distance between two simhash values. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b)).cast("long")

  /** Byte-bands of a 32-bit simhash (pigeonhole blocking: hamming ≤ 3
    * ⇒ at least one of the 4 bytes is identical, so a join on band
    * keys has perfect recall for distance ≤ 3). */
  def simhashBands(sim: Column): Column =
    array((0 until 4).map(b => shiftright(sim, b * 8).bitwiseAND(lit(255L))): _*)
}
