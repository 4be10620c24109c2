package graft
object Dev {
  def main(args: Array[String]): Unit = {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    println(s"queries=${q.size} oracles=${o.size}")
    println(s"oracle-without-query: ${o -- q}")
    println(s"rows-only (query without oracle): ${(q -- o).toSeq.sorted.mkString(", ")}")
  }
}
