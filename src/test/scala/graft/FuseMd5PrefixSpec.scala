package graft

import graft.functions.HashFunctions
import org.apache.spark.sql.functions._

/** Guards for the injected FuseMd5Prefix optimizer rule: it fires on
  * the exact composed shape, stays away from everything else, and
  * the fused values are bit-identical to the composed formula (the
  * full oracle gate re-proves the latter on all 194 queries). */
class FuseMd5PrefixSpec extends SparkSpec {
  import spark.implicits._

  private def optimized(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  // plan checks read the parquet-backed table: a literal-backed
  // LocalRelation constant-folds to rows before any plan inspection
  test("the composed 48-bit chain rewrites to the native node") {
    val docs = Tables.documents(spark, sf)
    val plan = optimized(docs.select(HashFunctions.md5Long($"text").as("h")))
    assert(plan.contains("graft_md5_prefix"), plan)
    assert(!plan.contains("conv("), plan)
  }

  test("the 32-bit variant rewrites too; an 11-char prefix does not") {
    val docs = Tables.documents(spark, sf)
    val fused = optimized(docs.select(HashFunctions.md5Int($"text")))
    assert(fused.contains("graft_md5_prefix"))
    val other = optimized(docs
      .select(conv(substring(md5($"text"), 1, 11), 16, 10).cast("long")))
    assert(!other.contains("graft_md5_prefix") && other.contains("conv("))
  }

  test("fused values equal a JVM-side digest of the same formula") {
    val gotMap = Seq("alpha", "beta", "", "数据 🚀").toDF("s")
      .select($"s", HashFunctions.md5Long($"s"), HashFunctions.md5Int($"s"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    for (s <- Seq("alpha", "beta", "", "数据 🚀")) {
      val d = md.digest(s.getBytes("UTF-8"))
      val h48 = d.take(6).foldLeft(0L)((a, b) => (a << 8) | (b & 0xffL))
      val h32 = d.take(4).foldLeft(0L)((a, b) => (a << 8) | (b & 0xffL))
      assert(gotMap(s) == ((h48, h32)), s"mismatch for '$s'")
    }
  }

  test("pure SQL through the composed formula gets the fused plan as well") {
    Tables.documents(spark, sf).createOrReplaceTempView("fuse_probe")
    val df = spark.sql(
      "SELECT CAST(conv(substring(md5(text), 1, 12), 16, 10) AS BIGINT) AS h FROM fuse_probe")
    assert(optimized(df).contains("graft_md5_prefix"))
  }
}
