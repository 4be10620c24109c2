package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's scale-oriented defaults.
  *
  * Locally we run `local[32]`; on a cluster the same confs apply with
  * `shuffle.partitions` scaled to ~2-3x total executor cores. AQE is
  * on everywhere so runtime stats re-plan skewed joins and coalesce
  * post-shuffle partitions — the knob that matters most at 100 TB.
  */
object GraftSession {

  /** Confs applied to any session the engine creates or adopts. */
  val tuning: Seq[(String, String)] = Seq(
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.session.timeZone" -> "UTC",
    // dims (region/nation/supplier/part) stay broadcast-able well past
    // the default 10MB at higher SFs:
    "spark.sql.autoBroadcastJoinThreshold" -> (64L * 1024 * 1024).toString,
    "spark.sql.parquet.filterPushdown" -> "true",
    "spark.sql.parquet.aggregatePushdown" -> "true",
    // int64-micros timestamps (not INT96): footers then carry real
    // min/max stats — the Delta writer's per-file `stats` and any
    // engine's row-group skipping depend on them — and delta-rs /
    // DuckDB read int64 natively
    "spark.sql.parquet.outputTimestampType" -> "TIMESTAMP_MICROS",
    // static conf: only binds when the session is BUILT with it (the
    // adopted-session path below swallows the runtime-set failure);
    // brings the graft_* SQL functions and the FuseMd5Prefix rule
    "spark.sql.extensions" -> "graft.plans.GraftExtensions",
  )

  def builder(master: String = "local[32]", shufflePartitions: Int = 32): SparkSession.Builder = {
    val b = SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.ui.enabled", "false")
    tuning.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }
  }

  def getOrCreate(master: String = "local[32]", shufflePartitions: Int = 32): SparkSession = {
    val spark = builder(master, shufflePartitions).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Adopted sessions (driver-created) still get the tuning confs that
    // are settable at runtime:
    tuning.foreach { case (k, v) =>
      try spark.conf.set(k, v)
      catch { case _: org.apache.spark.sql.AnalysisException => () }
    }
    // Planner strategies can't ride a static conf onto an adopted
    // session; the experimental hook is the runtime path. Append
    // idempotently: an adopting application's own strategies survive,
    // and repeat getOrCreate calls (or the GraftExtensions-injected
    // copy on built sessions) don't stack duplicates.
    if (!spark.experimental.extraStrategies.exists(_.isInstanceOf[graft.plans.AsOfJoinStrategy]))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ new graft.plans.AsOfJoinStrategy
    spark
  }
}
