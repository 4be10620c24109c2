package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL registration for the engine's native expressions, so the
  * whole library surface is reachable from pure `spark.sql(...)`:
  *
  *   SELECT graft_simhash32(tokens), graft_dot(a, b) FROM t
  *
  * Two paths:
  *  - `GraftExtensions`: `SparkSessionExtensions` injector for
  *    cluster-wide setup (`spark.sql.extensions=graft.plans.GraftExtensions`)
  *  - `GraftFunctions.register(spark)`: runtime registration on an
  *    already-built session (what the driver-adopted sessions use).
  */
object GraftFunctions {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_minhash_sig" -> (es => NativeExprs.MinHashSig(es.head, intLit(es(1), "k"))),
    "graft_simhash32" -> (es => NativeExprs.SimHash32(es.head)),
    "graft_md5_array" -> (es => NativeExprs.Md5Array(es.head)),
    "graft_hashed_shingles" -> (es => NativeExprs.HashedShingles(es.head, intLit(es(1), "n"))),
    "graft_dot" -> (es => NativeExprs.DotProduct(es.head, es(1))),
    "graft_intersect_size" -> (es => NativeExprs.IntersectSize(es.head, es(1))),
    "graft_recursive_split" -> (es => NativeExprs.RecursiveSplit(es.head,
      intLit(es(1), "size"), intLit(es(2), "overlap"))),
    "graft_hilbert" -> (es => NativeExprs.HilbertIndex(es.head, es(1),
      intLit(es(2), "bits"))),
    // N-ary: graft_hilbert_n(c1, ..., cN, bits) — last arg is bits
    "graft_hilbert_n" -> (es => NativeExprs.HilbertIndexN(es.dropRight(1),
      intLit(es.last, "bits"))))

  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}

/** `spark.sql.extensions` injector. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name), builder))
    }
    e.injectOptimizerRule(_ => FuseMd5Prefix)
    e.injectPlannerStrategy(_ => new AsOfJoinStrategy)
  }
}
