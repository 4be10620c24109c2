package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
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
  * Every expression implements `doGenCode`: the generated code is a
  * single static call into the same JVM loop the interpreted path
  * uses (Scala's static forwarders on this object), so a stage
  * containing these nodes stays inside WholeStageCodegen. Round 4
  * measured the cost of NOT doing this — the CodegenFallback
  * versions knocked every containing project/filter out of
  * whole-stage codegen and slowed md5-heavy queries 15-40%.
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

  // ---------------------------------------------------------------------
  // Static eval bodies. Each expression's interpreted `nullSafeEval` AND
  // its generated code call the same method (via the static forwarders
  // scalac emits for a top-level object), so the two paths cannot drift.
  // ---------------------------------------------------------------------

  /** Returns null for an empty input (parity with list_min over an
    * empty list in the oracle). */
  def minHashSigEval(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return null
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

  def simHash32Eval(arr: ArrayData): Long = {
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
    sim
  }

  def md5PrefixEval(bytes: Array[Byte], hexLen: Int): Long =
    if (hexLen == 12) md5Prefix48(bytes) else md5Prefix32(bytes)

  def md5ArrayEval(arr: ArrayData): ArrayData = {
    val out = new Array[Long](arr.numElements())
    var i = 0
    while (i < out.length) {
      out(i) = md5Prefix48(arr.getUTF8String(i).getBytes)
      i += 1
    }
    new GenericArrayData(out)
  }

  def hashedShinglesEval(arr: ArrayData, n: Int): ArrayData = {
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

  def dotProductEval(x: ArrayData, y: ArrayData, xf: Boolean, yf: Boolean): Double = {
    val n = x.numElements()
    if (y.numElements() != n)
      throw new IllegalArgumentException(
        s"graft_dot: array length mismatch ($n vs ${y.numElements()})")
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      acc = acc + xv * yv
      i += 1
    }
    acc
  }

  /** Recursive character split (paragraph → sentence → word fallback
    * with greedy repack and overlap carry) — delegates to the single
    * source of truth `Chunker.splitRecursive`, so the expression, the
    * library helper, and the DuckDB oracle replay stay value-identical. */
  def recursiveSplitEval(s: org.apache.spark.unsafe.types.UTF8String,
                         size: Int, overlap: Int): ArrayData = {
    val chunks = graft.operators.Chunker.splitRecursive(s.toString, size, overlap)
    val out = new Array[Any](chunks.length)
    var i = 0
    while (i < chunks.length) {
      out(i) = org.apache.spark.unsafe.types.UTF8String.fromString(chunks(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  def intersectSizeEval(a: ArrayData, b: ArrayData): Long = {
    val x = a.toLongArray()
    val y = b.toLongArray()
    val set = new java.util.HashSet[Long](x.length * 2)
    x.foreach(set.add)
    var n = 0L
    y.foreach(v => if (set.contains(v)) n += 1)
    n
  }

  private val Self = "graft.plans.NativeExprs"

  /** k-permutation MinHash over a *hashed* shingle array (longs from
    * `Md5Array`): k affine universal hashes
    * h_s(m) = ((2s+1)·m + 7919s + 1) mod P over m reduced mod P.
    * SQL-oracle equivalent (replayed verbatim in DuckDB):
    *   list_transform(range(0,k), s -> list_min(list_transform(shh,
    *     m -> ((2*s+1) * (m % P) + s*7919 + 1) % P)))
    */
  case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    // non-null input can still yield null (empty shingle list)
    override def nullable: Boolean = true
    override def nullSafeEval(v: Any): Any =
      minHashSigEval(v.asInstanceOf[ArrayData], k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = $Self.minHashSigEval($c, $k);
        if (${ev.value} == null) { ${ev.isNull} = true; }
      """)
    override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
  }

  /** 32-bit SimHash over a string (token) array: per token the 32-bit
    * md5 prefix; per bit, sign of the ±1 sum. Matches the composed
    * `simhashFromHashes` formula bit for bit. */
  case class SimHash32(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(v: Any): Any =
      java.lang.Long.valueOf(simHash32Eval(v.asInstanceOf[ArrayData]))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Self.simHash32Eval($c)")
    override protected def withNewChildInternal(c: Expression): SimHash32 = copy(child = c)
  }

  /** Fused md5 prefix over a BINARY input: one digest + integer fold
    * instead of the composed hex-string round trip
    * `CAST(conv(substring(md5(x), 1, hexLen), 16, 10) AS BIGINT)`.
    * Bit-identical to that chain for hexLen 12 (48-bit) and 8
    * (32-bit) — `FuseMd5Prefix` rewrites the composed form to this
    * node in every optimized plan. */
  case class Md5Prefix(child: Expression, hexLen: Int) extends UnaryExpression {
    require(hexLen == 12 || hexLen == 8, "only the 48/32-bit prefixes are fused")
    override def dataType: DataType = LongType
    override def nullSafeEval(v: Any): Any =
      java.lang.Long.valueOf(md5PrefixEval(v.asInstanceOf[Array[Byte]], hexLen))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Self.md5PrefixEval($c, $hexLen)")
    override def prettyName: String = "graft_md5_prefix"
    override protected def withNewChildInternal(c: Expression): Md5Prefix = copy(child = c)
  }

  /** Map each string element to its 48-bit md5 prefix — the hashed
    * shingle representation (long compares beat string compares in
    * every downstream join/intersect). */
  case class Md5Array(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      md5ArrayEval(v.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Self.md5ArrayEval($c)")
    override protected def withNewChildInternal(c: Expression): Md5Array = copy(child = c)
  }

  /** Distinct hashed word-n-gram shingles straight from a token
    * array: join n consecutive tokens with a single space, take the
    * 48-bit md5 prefix, de-duplicate. One pass, no intermediate
    * string arrays. Oracle form:
    *   list_distinct(list_transform(<shingles(tk)>, x -> md5_48(x)))
    */
  case class HashedShingles(child: Expression, n: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      hashedShinglesEval(v.asInstanceOf[ArrayData], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Self.hashedShinglesEval($c, $n)")
    override protected def withNewChildInternal(c: Expression): HashedShingles = copy(child = c)
  }

  /** Left-fold double dot product over two float/double arrays —
    * identical fold order (and hence bit pattern) to
    * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` and the DuckDB
    * `list_reduce(list_prepend(0.0, ...))` oracle form. */
  case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any =
      java.lang.Double.valueOf(
        dotProductEval(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], leftFloat, rightFloat))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"$Self.dotProductEval($a, $b, $leftFloat, $rightFloat)")
    private def elemIsFloat(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    private lazy val leftFloat = elemIsFloat(left)
    private lazy val rightFloat = elemIsFloat(right)
    override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
      copy(left = l, right = r)
  }

  /** Hilbert curve index of (x, y) on a 2^bits × 2^bits grid — the
    * classic iterative xy2d transform (per-level quadrant digit +
    * rotation; cf. Hamilton & Rau-Chaplin's compact Hilbert indices
    * and the formulation every liquid-clustering engine uses).
    * Out-of-range inputs clamp to the grid, matching how a
    * clustering OPTIMIZE treats outliers (they sort to the edge,
    * never error). Inherently a per-level loop carrying rotated
    * (x, y) state — as composed Columns the unrolled expression tree
    * grows ~3^bits, so a native loop is the only codegen-clean form. */
  def hilbertEval(xIn: Long, yIn: Long, bits: Int): Long = {
    val max = (1L << bits) - 1
    var x = math.min(math.max(xIn, 0L), max)
    var y = math.min(math.max(yIn, 0L), max)
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** N-dimensional Hilbert index via Skilling's transpose algorithm
    * ("Programming the Hilbert curve", AIP Conf. Proc. 707, 2004):
    * per-level invert/exchange undo, Gray decode, then MSB-first bit
    * interleave of the transposed axes. A different (but equally
    * valid) curve orientation than the 2-D xy2d form above — both
    * satisfy the bijection + unit-step adjacency invariants the specs
    * pin, which is all clustering quality depends on. Coordinates
    * clamp to [0, 2^bits); n·bits must fit a positive long. */
  def hilbertEvalN(xs: Array[Long], bits: Int): Long = {
    val n = xs.length
    val max = (1L << bits) - 1
    val x = new Array[Long](n)
    var i = 0
    while (i < n) { x(i) = math.min(math.max(xs(i), 0L), max); i += 1 }
    // inverse undo: top-down invert/exchange against axis 0
    var q = 1L << (bits - 1)
    while (q > 1) {
      val p = q - 1
      i = 0
      while (i < n) {
        if ((x(i) & q) != 0) x(0) ^= p
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    // Gray decode
    i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t = 0L
    q = 1L << (bits - 1)
    while (q > 1) { if ((x(n - 1) & q) != 0) t ^= q - 1; q >>= 1 }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }
    // MSB-first interleave of the transposed axes
    var d = 0L
    var lvl = bits - 1
    while (lvl >= 0) {
      i = 0
      while (i < n) { d = (d << 1) | ((x(i) >> lvl) & 1L); i += 1 }
      lvl -= 1
    }
    d
  }

  case class HilbertIndexN(coords: Seq[Expression], bits: Int) extends Expression {
    require(coords.size >= 2 && coords.size <= 8, "hilbert needs 2-8 coordinates")
    require(bits >= 1 && coords.size * bits <= 62,
      s"${coords.size} coords x $bits bits exceeds a positive long")
    override def children: Seq[Expression] = coords
    override def dataType: DataType = LongType
    override def nullable: Boolean = coords.exists(_.nullable)
    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val arr = new Array[Long](coords.size)
      var i = 0
      while (i < coords.size) {
        val v = coords(i).eval(input)
        if (v == null) return null
        arr(i) = v.asInstanceOf[Long]
        i += 1
      }
      java.lang.Long.valueOf(hilbertEvalN(arr, bits))
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val evals = coords.map(_.genCode(ctx))
      val arr = ctx.freshName("hcoords")
      val anyNull = ctx.freshName("hnull")
      val fill = evals.zipWithIndex.map { case (e, i) =>
        s"""${e.code}
           |if (${e.isNull}) { $anyNull = true; } else { $arr[$i] = ${e.value}; }
           |""".stripMargin
      }.mkString("\n")
      ev.copy(code = org.apache.spark.sql.catalyst.expressions.codegen.Block.BlockHelper(
        new StringContext(
          s"""
             |boolean $anyNull = false;
             |long[] $arr = new long[${coords.size}];
             |$fill
             |boolean ${ev.isNull} = $anyNull;
             |long ${ev.value} = $anyNull ? -1L : $Self.hilbertEvalN($arr, $bits);
             |""".stripMargin)).code())
    }
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): HilbertIndexN = copy(coords = newChildren)
  }

  case class HilbertIndex(left: Expression, right: Expression, bits: Int)
      extends BinaryExpression {
    require(bits >= 1 && bits <= 31, s"hilbert bits must be in [1, 31], got $bits")
    override def dataType: DataType = LongType
    override def nullSafeEval(a: Any, b: Any): Any =
      java.lang.Long.valueOf(
        hilbertEval(a.asInstanceOf[Long], b.asInstanceOf[Long], bits))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"$Self.hilbertEval($a, $b, $bits)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): HilbertIndex =
      copy(left = l, right = r)
  }

  /** Intersection size of two long arrays treated as sets (inputs are
    * already distinct). Replaces `size(array_intersect(...))` in the
    * Jaccard verify step. */
  case class IntersectSize(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(a: Any, b: Any): Any =
      java.lang.Long.valueOf(
        intersectSizeEval(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"$Self.intersectSizeEval($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): IntersectSize =
      copy(left = l, right = r)
  }

  /** Native recursive-splitter expression — replaces the last ScalaUDF
    * in the codebase (the gold-zone reference-faithful chunker). The
    * per-row work is inherently imperative (recursive descent +
    * greedy repack), so the win here is plan quality, not arithmetic:
    * no closure dispatch, no Option boxing, and the containing
    * project/generate stays inside WholeStageCodegen instead of being
    * fenced off by a ScalaUDF node. */
  case class RecursiveSplit(child: Expression, size: Int, overlap: Int)
      extends UnaryExpression {
    require(size > overlap && overlap >= 0, "chunk size must exceed overlap")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      recursiveSplitEval(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], size, overlap)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Self.recursiveSplitEval($c, $size, $overlap)")
    override def prettyName: String = "graft_recursive_split"
    override protected def withNewChildInternal(c: Expression): RecursiveSplit = copy(child = c)
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
  def recursiveSplit(c: Column, size: Int, overlap: Int): Column =
    GraftBridge.column(RecursiveSplit(GraftBridge.expression(c), size, overlap))
}
