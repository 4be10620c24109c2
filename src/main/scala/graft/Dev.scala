package graft
import org.apache.spark.sql.SparkSession
object Dev {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate("local[8]", 8)
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    for (q <- Seq("ann_pq_topk", "rag_hybrid", "dedup_lines", "ev_hopping_agg", "samp_temperature")) {
      println(s"======== $q")
      val plan = SparkEntry.queries(q)(spark, d).queryExecution.executedPlan.toString
      // condensed: exchanges + broadcasts + scans
      plan.linesIterator.filter(l =>
        l.contains("Exchange") || l.contains("BroadcastHashJoin") ||
        l.contains("BroadcastNestedLoop") || l.contains("SortMergeJoin") ||
        l.contains("PushedFilters") || l.contains("Scan parquet"))
        .take(40).foreach(l => println(l.replaceAll("#\\d+", "")))
    }
    spark.stop()
  }
}
