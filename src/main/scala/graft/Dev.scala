package graft

import graft.functions.HashFunctions._
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Scratch dev entrypoint (not part of the library surface). */
object Dev {
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[dev] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate("local[16]", 16)
    val d = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, d)
    time("docs.count")(docs.count())
    val sets = Dedup.shingleSets(docs, "text", "doc_id", 3)
    time("sets")(sets.count())
    val sigs = sets.withColumn("sig", minhashSignature(col("sh"), 16))
    time("sigs")(sigs.count())
    time("sigs.force")(sigs.select(sum(element_at(col("sig"), 1))).collect())
    val banded = sigs.select(col("id"),
      posexplode(bandKeys(col("sig"), 4, 4)).as(Seq("band", "bkey")))
    time("banded.force")(banded.select(sum(col("bkey"))).collect())
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
    time("cand")(println("cand=" + cand.count()))
    time("full")(Dedup.minhashLshPairs(docs).count())
    spark.stop()
  }
}
