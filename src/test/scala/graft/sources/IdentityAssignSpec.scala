package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, MetadataBuilder, StructField}

/** The columnar identity assigner: dense start/step values in
  * (partition, row) order, stable under partition count, and a plan
  * that never shuffles data rows and never ranks through a window.
  * The batch is PINNED by an eager localCheckpoint before the count
  * job (round 9): the checkpoint's block scan is what GUARANTEES the
  * count job and the projection job enumerate identical partitions
  * (AQE or a non-deterministic upstream could otherwise silently
  * assign duplicate ids) — the blocks hold Tungsten UnsafeRows, so
  * no encoder round-trip is paid. */
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

  test("assignment plan: pinned scan, no exchange, no window") {
    val df = spark.range(0, 100).repartition(4).toDF("id")
      .withColumn("rid", lit(null).cast(LongType))
    val plan = DeltaSource.assignIdentity(df, field, 1L, 1L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"no window allowed:\n$plan")
    // the projection runs over the PINNED blocks: zero exchanges in
    // the output plan (the input's own repartition was materialized
    // away by the pin), and the scan is the checkpoint's UnsafeRow
    // blocks — the pin IS the partitioning guarantee
    assert(!plan.contains("Exchange"), s"assignment must not shuffle:\n$plan")
    assert(plan.contains("ExistingRDD") || plan.contains("LocalTableScan"),
      s"expected the pinned-block scan in:\n$plan")
  }

  test("assignment is stable when the upstream would re-plan between jobs") {
    // the scenario the pin exists for: an input whose partitioning
    // is decided at execution time (AQE coalescing a shuffle) must
    // still get unique dense ids — the count job and the projection
    // both read the SAME materialized blocks
    val df = spark.range(0, 500).toDF("id")
      .repartition(col("id") % 17) // AQE may coalesce this exchange
      .withColumn("rid", lit(null).cast(LongType))
    val out = DeltaSource.assignIdentity(df, field, 7L, 2L)
    val vals = out.select("rid").collect().map(_.getLong(0)).sorted
    assert(vals.toSeq == (0 until 500).map(i => 7L + 2L * i))
  }
}
