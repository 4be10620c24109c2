package graft.operators

import org.apache.spark.sql.SparkSession

/** Scale-adaptive shuffle sizing for ITERATIVE model-scale batch
  * loops — the batch mirror of the streaming runners' source-sized
  * state partitioning (round 15, guide §2.2).
  *
  * AQE coalesces a one-shot query's post-shuffle partitions, but an
  * iterative loop whose per-round state is localCheckpoint'd keeps
  * paying `spark.sql.shuffle.partitions`-many map AND reduce tasks
  * every round: the checkpointed RDD inherits the session partition
  * count, so a model-sized frontier pays full task fan-out per
  * iteration (r14 scaling block: dedup_pagerank_conv ran 2.9× FASTER
  * at 8 cores than 32 — pure per-task overhead on tiny stages).
  *
  * The count is derived from DATA (the row count of the iterated
  * state), never from the host: `rows / rowsPerPartition + 1`,
  * clamped to [1, defaultParallelism]. A 100 TB state clamps to the
  * session's full parallelism; a fixture graph stops paying 32 tasks
  * per kilobyte stage. Execution layout only: every caller's results
  * are partition-count invariant by the engine's rounding discipline
  * (order-free DECIMAL sums, exact-integer convergence tests).
  */
object LoopShuffle {

  def partitionsFor(spark: SparkSession, rows: Long,
                    rowsPerPartition: Long = 1L << 16): Int = {
    val cap = spark.sparkContext.defaultParallelism
    math.max(1L, math.min(cap.toLong, rows / rowsPerPartition + 1)).toInt
  }

  /** Run `body` with `spark.sql.shuffle.partitions` sized for a loop
    * over a `rows`-row state table; the conf is restored after.
    * Serial use within one session only (the same contract as the
    * streaming runners' withStreamShuffle). */
  def sized[T](spark: SparkSession, rows: Long,
               rowsPerPartition: Long = 1L << 16)(body: Int => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val before = spark.conf.get(key)
    val n = partitionsFor(spark, rows, rowsPerPartition)
    spark.conf.set(key, n.toString)
    try body(n) finally spark.conf.set(key, before)
  }
}
