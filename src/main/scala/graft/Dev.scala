package graft
object Dev {
  def main(args: Array[String]): Unit = {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    val orphanOracles = o.diff(q)
    val rowsOnly = q.diff(o)
    println(s"queries=${q.size} oracles=${o.size}")
    println(s"orphan oracles (BUG if nonempty): ${orphanOracles.toSeq.sorted.mkString(",")}")
    println(s"rows-only queries: ${rowsOnly.toSeq.sorted.mkString(",")}")
  }
}
