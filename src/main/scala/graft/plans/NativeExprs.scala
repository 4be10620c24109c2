package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._

import java.security.MessageDigest

/** Native Catalyst expressions for the hot loops.
  *
  * The composed-builtin forms (nested `transform`/`aggregate` higher-
  * order functions) evaluate interpreted, one closure dispatch per
  * element — profiled at ~13µs per seeded hash, which made MinHash
  * signatures the bench bottleneck. These expressions do the same
  * arithmetic in a tight JVM loop (~100× less per-element overhead)
  * while computing *bit-identical* values to the md5-based SQL
  * formulas the DuckDB oracles replay.
  *
  * All are CodegenFallback: the per-row fallback cost is irrelevant
  * because each row does O(k·n) work inside the eval; the loops
  * themselves are the codegen.
  */
object NativeExprs {

  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** 48-bit prefix of md5(bytes) — matches
    * `CAST('0x' || substr(md5(x), 1, 12) AS BIGINT)`. */
  def md5Prefix48(bytes: Array[Byte]): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(bytes)
    var m = 0L
    var j = 0
    while (j < 6) { m = (m << 8) | (d(j) & 0xffL); j += 1 }
    m
  }

  /** 32-bit prefix of md5(bytes) — matches `substr(md5(x), 1, 8)`. */
  def md5Prefix32(bytes: Array[Byte]): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(bytes)
    var m = 0L
    var j = 0
    while (j < 4) { m = (m << 8) | (d(j) & 0xffL); j += 1 }
    m
  }

  val MinHashP: Long = 2147483647L // 2^31 − 1

  /** k-permutation MinHash over a *hashed* shingle array (longs from
    * `Md5Array`): k affine universal hashes
    * h_s(m) = ((2s+1)·m + 7919s + 1) mod P over m reduced mod P.
    * SQL-oracle equivalent (replayed verbatim in DuckDB):
    *   list_transform(range(0,k), s -> list_min(list_transform(shh,
    *     m -> ((2*s+1) * (m % P) + s*7919 + 1) % P)))
    */
  case class MinHashSig(child: Expression, k: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(v: Any): Any = {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (n == 0) return null // parity with list_min over an empty list
      val mins = Array.fill(k)(Long.MaxValue)
      var i = 0
      while (i < n) {
        val m = arr.getLong(i) % MinHashP
        var s = 0
        while (s < k) {
          val h = ((2L * s + 1) * m + s * 7919L + 1) % MinHashP
          if (h < mins(s)) mins(s) = h
          s += 1
        }
        i += 1
      }
      new GenericArrayData(mins)
    }
    override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
  }

  /** 32-bit SimHash over a string (token) array: per token the 32-bit
    * md5 prefix; per bit, sign of the ±1 sum. Matches the composed
    * `simhashFromHashes` formula bit for bit. */
  case class SimHash32(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullSafeEval(v: Any): Any = {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val counts = new Array[Long](32)
      var i = 0
      while (i < n) {
        val m = md5Prefix32(arr.getUTF8String(i).getBytes)
        var b = 0
        while (b < 32) {
          counts(b) += ((m >> b) & 1L) * 2 - 1
          b += 1
        }
        i += 1
      }
      var sim = 0L
      var b = 0
      while (b < 32) {
        if (counts(b) > 0) sim |= 1L << b
        b += 1
      }
      java.lang.Long.valueOf(sim)
    }
    override protected def withNewChildInternal(c: Expression): SimHash32 = copy(child = c)
  }

  /** Fused md5 prefix over a BINARY input: one digest + integer fold
    * instead of the composed hex-string round trip
    * `CAST(conv(substring(md5(x), 1, hexLen), 16, 10) AS BIGINT)`.
    * Bit-identical to that chain for hexLen 12 (48-bit) and 8
    * (32-bit) — `FuseMd5Prefix` rewrites the composed form to this
    * node in every optimized plan. */
  case class Md5Prefix(child: Expression, hexLen: Int)
      extends UnaryExpression with CodegenFallback {
    require(hexLen == 12 || hexLen == 8, "only the 48/32-bit prefixes are fused")
    override def dataType: DataType = LongType
    override def nullSafeEval(v: Any): Any = {
      val bytes = v.asInstanceOf[Array[Byte]]
      if (hexLen == 12) md5Prefix48(bytes) else md5Prefix32(bytes)
    }
    override def prettyName: String = "graft_md5_prefix"
    override protected def withNewChildInternal(c: Expression): Md5Prefix = copy(child = c)
  }

  /** Map each string element to its 48-bit md5 prefix — the hashed
    * shingle representation (long compares beat string compares in
    * every downstream join/intersect). */
  case class Md5Array(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(v: Any): Any = {
      val arr = v.asInstanceOf[ArrayData]
      val out = new Array[Long](arr.numElements())
      var i = 0
      while (i < out.length) {
        out(i) = md5Prefix48(arr.getUTF8String(i).getBytes)
        i += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): Md5Array = copy(child = c)
  }

  /** Distinct hashed word-n-gram shingles straight from a token
    * array: join n consecutive tokens with a single space, take the
    * 48-bit md5 prefix, de-duplicate. One pass, no intermediate
    * string arrays. Oracle form:
    *   list_distinct(list_transform(<shingles(tk)>, x -> md5_48(x)))
    */
  case class HashedShingles(child: Expression, n: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(v: Any): Any = {
      val arr = v.asInstanceOf[ArrayData]
      val nt = arr.numElements()
      val out = new java.util.LinkedHashSet[java.lang.Long]()
      var i = 0
      while (i + n <= nt) {
        val sb = new java.io.ByteArrayOutputStream(64)
        var j = 0
        while (j < n) {
          if (j > 0) sb.write(' ')
          sb.write(arr.getUTF8String(i + j).getBytes)
          j += 1
        }
        out.add(md5Prefix48(sb.toByteArray))
        i += 1
      }
      val res = new Array[Long](out.size)
      val it = out.iterator()
      var idx = 0
      while (it.hasNext) { res(idx) = it.next(); idx += 1 }
      new GenericArrayData(res)
    }
    override protected def withNewChildInternal(c: Expression): HashedShingles = copy(child = c)
  }

  /** Left-fold double dot product over two float/double arrays —
    * identical fold order (and hence bit pattern) to
    * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` and the DuckDB
    * `list_reduce(list_prepend(0.0, ...))` oracle form. */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (y.numElements() != n)
        throw new IllegalArgumentException(
          s"graft_dot: array length mismatch ($n vs ${y.numElements()})")
      val xf = leftFloat
      val yf = rightFloat
      var acc = 0.0
      var i = 0
      while (i < n) {
        val xv = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
        val yv = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
        acc = acc + xv * yv
        i += 1
      }
      java.lang.Double.valueOf(acc)
    }
    private def elemIsFloat(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    private lazy val leftFloat = elemIsFloat(left)
    private lazy val rightFloat = elemIsFloat(right)
    override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
      copy(left = l, right = r)
  }

  /** Intersection size of two long arrays treated as sets (inputs are
    * already distinct). Replaces `size(array_intersect(...))` in the
    * Jaccard verify step. */
  case class IntersectSize(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData].toLongArray()
      val y = b.asInstanceOf[ArrayData].toLongArray()
      val set = new java.util.HashSet[Long](x.length * 2)
      x.foreach(set.add)
      var n = 0L
      y.foreach(v => if (set.contains(v)) n += 1)
      java.lang.Long.valueOf(n)
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): IntersectSize =
      copy(left = l, right = r)
  }

  // Column wrappers
  def minhashSig(c: Column, k: Int): Column =
    GraftBridge.column(MinHashSig(GraftBridge.expression(c), k))
  def simhash32(c: Column): Column =
    GraftBridge.column(SimHash32(GraftBridge.expression(c)))
  def md5Array(c: Column): Column =
    GraftBridge.column(Md5Array(GraftBridge.expression(c)))
  def hashedShingles(c: Column, n: Int): Column =
    GraftBridge.column(HashedShingles(GraftBridge.expression(c), n))
  def dotProduct(a: Column, b: Column): Column =
    GraftBridge.column(DotProduct(GraftBridge.expression(a), GraftBridge.expression(b)))
  def intersectSize(a: Column, b: Column): Column =
    GraftBridge.column(IntersectSize(GraftBridge.expression(a), GraftBridge.expression(b)))
}
