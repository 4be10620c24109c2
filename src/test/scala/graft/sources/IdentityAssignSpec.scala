package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, MetadataBuilder, StructField}

/** The columnar identity assigner: dense start/step values in
  * (partition, row) order, stable under partition count, and a plan
  * that never leaves Tungsten (no RDD scan, no shuffle of data
  * rows, no window). */
class IdentityAssignSpec extends SparkSpec {

  private val field = StructField("rid", LongType, nullable = false,
    new MetadataBuilder().putLong("graft.identity.start", 100L).build())

  test("dense start/step assignment across many partitions") {
    val df = spark.range(0, 1000).repartition(13).toDF("id")
      .withColumn("rid", lit(null).cast(LongType))
    val out = DeltaSource.assignIdentity(df, field, 100L, 3L)
    val vals = out.select("rid").collect().map(_.getLong(0)).sorted
    assert(vals.toSeq == (0 until 1000).map(i => 100L + 3L * i))
    // values are unique and paired 1:1 with rows
    assert(out.select("id").distinct().count() == 1000)
  }

  test("empty batch assigns nothing and keeps the schema") {
    val df = spark.range(0, 0).toDF("id").withColumn("rid", lit(null).cast(LongType))
    val out = DeltaSource.assignIdentity(df, field, 1L, 1L)
    assert(out.count() == 0 && out.columns.toSeq == Seq("id", "rid"))
  }

  test("assignment plan is columnar: no RDD scan, no exchange, no window") {
    val df = spark.range(0, 100).repartition(4).toDF("id")
      .withColumn("rid", lit(null).cast(LongType))
    val plan = DeltaSource.assignIdentity(df, field, 1L, 1L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ExistingRDD"), s"RDD round-trip crept back in:\n$plan")
    assert(!plan.contains("Window"), s"no window allowed:\n$plan")
    // the assignment itself adds no exchange beyond the input's own
    // repartition — count the exchanges against the input plan
    val inputExchanges = "Exchange".r.findAllIn(
      df.queryExecution.executedPlan.toString).size
    val outExchanges = "Exchange".r.findAllIn(plan).size
    assert(outExchanges <= inputExchanges,
      s"assignment added an exchange:\n$plan")
  }
}
