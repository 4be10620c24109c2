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

  // Round 4 measured a 15-40% regression because Md5Prefix was a
  // CodegenFallback node, which knocked every containing stage out of
  // whole-stage codegen. These guards pin the fix: the fused project
  // stays INSIDE a WholeStageCodegen span, and every native
  // expression compiles and runs under forced codegen (no silent
  // interpreted fallback) with values bit-equal to interpreted eval.
  test("the fused project runs inside WholeStageCodegen") {
    val docs = Tables.documents(spark, sf)
    val df = docs.select(graft.functions.HashFunctions.md5Long($"text").as("h"))
    df.collect() // finalize the AQE plan so WholeStageCodegen spans are visible
    val plan = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[graft_md5_prefix""".r.findFirstIn(plan).isDefined, plan)
  }

  private def nativeCols(df: org.apache.spark.sql.DataFrame) = {
    import graft.plans.NativeExprs._
    df.select(
      md5Array($"tk").as("ha"),
      minhashSig(md5Array($"tk"), 16).as("mh"),
      simhash32($"tk").as("sh"),
      hashedShingles($"tk", 3).as("hs"),
      dotProduct($"va", $"vb").as("dp"),
      intersectSize(md5Array($"tk"), md5Array($"tk2")).as("is"),
      recursiveSplit(concat_ws("\n\n", $"tk"), 8, 2).as("rs"))
  }

  test("all native expressions run under forced codegen, bit-equal to interpreted") {
    val rows = Seq(
      (Seq("a", "b", "c", "d", "e"), Seq("c", "d", "x"), Seq(1.0f, 2.0f, -0.5f), Seq(0.5f, -1.0f, 4.0f)),
      (Seq("数据", "🚀", "", "q"), Seq("q"), Seq(0.0f, 0.0f, 0.0f), Seq(1.0f, 1.0f, 1.0f)),
      (Seq.empty[String], Seq("z"), Seq(3.5f), Seq(-3.5f)))
    val df = rows.toDF("tk", "tk2", "va", "vb")
    def run(mode: String, wscgFallback: String): Seq[String] = {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      spark.conf.set("spark.sql.codegen.fallback", wscgFallback)
      try nativeCols(df).collect().map(_.toString).toSeq
      finally {
        spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
        spark.conf.set("spark.sql.codegen.fallback", "true")
      }
    }
    val gen = run("CODEGEN_ONLY", "false") // throws if any doGenCode is broken
    val interp = run("NO_CODEGEN", "true")
    assert(gen == interp, s"codegen/interpreted divergence:\n$gen\n$interp")
    assert(gen.size == 3)
  }

  // Round 5's last UDF (Chunker.recursive) is now the native
  // RecursiveSplit expression: pin that the gold recursive-chunk plan
  // carries no ScalaUDF node and that the expression matches the
  // library splitter row for row.
  test("Chunker.recursive plans with no ScalaUDF and matches splitRecursive") {
    val docs = Tables.documents(spark, sf).limit(50)
    val df = graft.operators.Chunker.recursive(
      graft.operators.Medallion.silverNormalize(graft.operators.Medallion.bronze(docs)), "content")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), plan)
    assert(plan.contains("graft_recursive_split"), plan)
    val got = df.select($"doc_id", $"chunk").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    val want = graft.operators.Medallion.silverNormalize(graft.operators.Medallion.bronze(docs))
      .select($"doc_id", $"content").collect()
      .flatMap(r => graft.operators.Chunker.splitRecursive(r.getString(1))
        .map(c => (r.getLong(0), c))).toSeq.sorted
    assert(got == want)
  }
}
