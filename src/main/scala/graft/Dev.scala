package graft

import org.apache.spark.sql.execution.ExplainMode

/** Scratch main for plan audits — overwrite freely. */
object Dev {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate("local[8]", 8)
    val d = "/root/testdata/sf0.01"
    val targets = Seq("ev_funnel", "ev_retention", "q_cube", "txt_tfidf_topterms",
      "pipe_pack_sequences", "samp_stratified")
    targets.foreach { name =>
      val plan = SparkEntry.queries(name)(spark, d)
        .queryExecution.explainString(ExplainMode.fromString("formatted"))
      val smj = "SortMergeJoin".r.findAllIn(plan).size
      val bhj = "BroadcastHashJoin".r.findAllIn(plan).size
      val ex = "Exchange".r.findAllIn(plan).size
      val pushed = plan.linesIterator.filter(_.contains("PushedFilters")).take(2).mkString(" | ")
      println(s"== $name: SMJ=$smj BHJ=$bhj Exchange=$ex")
      if (pushed.nonEmpty) println(s"   $pushed")
    }
    spark.stop()
  }
}
