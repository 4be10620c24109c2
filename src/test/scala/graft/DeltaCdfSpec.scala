package graft

import java.nio.file.Files
import graft.sources.DeltaSource
import org.apache.spark.sql.functions._

/** Change-Data-Feed contracts (`delta.enableChangeDataFeed` + cdc
  * actions + `_change_data/` files): a CDF MERGE materializes true
  * update pre/post images and inserts; a CDF DELETE materializes the
  * deleted rows; commits WITHOUT cdc actions derive their changes
  * (adds→insert, removes→delete, same-path rewrites→row diff); the
  * writer gate rides the first cdc commit; layout swaps stay
  * invisible. */
class DeltaCdfSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(): String =
    Files.createTempDirectory("graft_cdf").toString + "/t"

  private def mk(): String = {
    val tbl = tmpTable()
    DeltaSource.writeDelta(
      spark.range(10).selectExpr("id as k", "CAST(id * 10 AS LONG) as v"), tbl)
    DeltaSource.setTableProperties(spark, tbl,
      Map("delta.enableChangeDataFeed" -> "true"))
    tbl
  }

  private def feedAfter(tbl: String, v: Long) =
    DeltaSource.changesCdf(spark, tbl, Some(v))._2.get

  test("a CDF merge materializes pre/post images and inserts") {
    val tbl = mk()
    val vBefore = DeltaSource.latestVersion(spark, tbl).get
    // update k=3 (v 30 -> 300), insert k=100
    DeltaSource.mergeDelta(spark, tbl,
      Seq((3L, 300L), (100L, 1000L)).toDF("k", "v"), Seq("k"))
    val log = Files.readString(java.nio.file.Paths.get(
      tbl, "_delta_log", f"${vBefore + 1}%020d.json"))
    assert(log.contains("\"cdc\""), "merge commit must carry cdc actions")
    val ch = feedAfter(tbl, vBefore)
      .select(col("k"), col("v"), col("_change_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(ch == Set(
      (3L, 30L, "update_preimage"),
      (3L, 300L, "update_postimage"),
      (100L, 1000L, "insert")), s"got $ch")
  }

  test("a CDF DV delete materializes the deleted rows with full values") {
    val tbl = mk()
    val vBefore = DeltaSource.latestVersion(spark, tbl).get
    DeltaSource.deleteDelta(spark, tbl, col("k") % 4 === 0)
    val ch = feedAfter(tbl, vBefore)
      .select(col("k"), col("v"), col("_change_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(ch == Set((0L, 0L, "delete"), (4L, 40L, "delete"), (8L, 80L, "delete")),
      s"got $ch")
    // the table itself no longer holds them
    assert(DeltaSource.readDelta(spark, tbl).count() == 7)
  }

  test("the changeDataFeed writer gate rides the first cdc commit") {
    val tbl = mk()
    val v = DeltaSource.latestVersion(spark, tbl).get + 1
    DeltaSource.mergeDelta(spark, tbl, Seq((1L, 11L)).toDF("k", "v"), Seq("k"))
    val log = Files.readString(java.nio.file.Paths.get(
      tbl, "_delta_log", f"$v%020d.json"))
    assert(log.contains("\"protocol\""), "first cdc commit must gate the protocol")
  }

  test("commits without cdc actions derive: appends insert, DV deletes diff, optimize invisible") {
    val tbl = tmpTable() // CDF never enabled: everything derives
    DeltaSource.writeDelta(
      spark.range(6).selectExpr("id as k", "id as v"), tbl)
    val all0 = feedAfter(tbl, -1L)
    assert(all0.where(col("_change_type") =!= "insert").count() == 0)
    assert(all0.count() == 6)
    // append derives inserts
    DeltaSource.writeDelta(spark.range(6, 9).selectExpr("id as k", "id as v"),
      tbl, overwrite = false)
    val app = feedAfter(tbl, 0L)
    assert(app.select(col("k"), col("_change_type")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((6L, "insert"), (7L, "insert"), (8L, "insert")))
    // DV delete without CDF: same-path remove+re-add nets to the diff
    val v1 = DeltaSource.latestVersion(spark, tbl).get
    DeltaSource.deleteDelta(spark, tbl, col("k") === 2)
    val del = feedAfter(tbl, v1)
    assert(del.select(col("k"), col("_change_type")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet == Set((2L, "delete")))
    // optimize is dataChange=false → invisible
    val v2 = DeltaSource.latestVersion(spark, tbl).get
    DeltaSource.optimizeDelta(spark, tbl)
    assert(DeltaSource.changesCdf(spark, tbl, Some(v2))._2.forall(_.isEmpty))
  }

  test("CDC replication: the change feed rebuilds a replica through updates and deletes") {
    // the full stack end to end: source table evolves (insert /
    // update / delete), a streaming readChangeFeed consumer applies
    // each batch to a REPLICA via merge + delete, and the replica
    // converges to the source byte-for-byte
    val src = mk()
    DeltaSource.mergeDelta(spark, src,
      Seq((3L, 333L), (77L, 770L)).toDF("k", "v"), Seq("k"))
    DeltaSource.deleteDelta(spark, src, col("k").isin(1L, 5L))
    DeltaSource.writeDelta(Seq((200L, 2L)).toDF("k", "v"), src, overwrite = false)

    val replica = tmpTable()
    val q = spark.readStream.format("graft-delta")
      .option("readChangeFeed", "true")
      .load(src)
      .writeStream
      .option("checkpointLocation", Files.createTempDirectory("graft_cdfrepl").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // apply in commit order; preimages are informational
        batch.select(col("k"), col("v"), col("_change_type"), col("_commit_version"))
          .collect().groupBy(_.getLong(3)).toSeq.sortBy(_._1).foreach {
            case (_, rows) =>
              val upserts = rows.filter(r =>
                r.getString(2) == "insert" || r.getString(2) == "update_postimage")
                .map(r => (r.getLong(0), r.getLong(1))).toSeq
              val deletes = rows.filter(_.getString(2) == "delete")
                .map(_.getLong(0)).toSeq
              val exists = DeltaSource.latestVersion(spark, replica).isDefined
              if (upserts.nonEmpty) {
                val df = upserts.toDF("k", "v")
                if (!exists) DeltaSource.writeDelta(df, replica)
                else DeltaSource.mergeDelta(spark, replica, df, Seq("k"))
              }
              if (deletes.nonEmpty && DeltaSource.latestVersion(spark, replica).isDefined)
                DeltaSource.deleteDelta(spark, replica, col("k").isin(deletes: _*))
          }
        ()
      }
      .start()
    assert(q.awaitTermination(180000))
    val srcRows = DeltaSource.readDelta(spark, src)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val repRows = DeltaSource.readDelta(spark, replica)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(repRows == srcRows,
      s"replica diverged: missing ${srcRows -- repRows}, extra ${repRows -- srcRows}")
  }

  test("an overwrite derives deletes of the old snapshot plus inserts of the new") {
    val tbl = tmpTable()
    DeltaSource.writeDelta(spark.range(4).selectExpr("id as k", "id as v"), tbl)
    DeltaSource.writeDelta(spark.range(100, 102).selectExpr("id as k", "id as v"),
      tbl, overwrite = true)
    val ch = feedAfter(tbl, 0L)
      .select(col("k"), col("_change_type"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(ch == Set((0L, "delete"), (1L, "delete"), (2L, "delete"), (3L, "delete"),
      (100L, "insert"), (101L, "insert")), s"got $ch")
  }

  test("spec layout: cdc files are hive-partitioned, partition values in the action not the file") {
    val tbl = tmpTable()
    DeltaSource.writeDelta(
      spark.range(20).selectExpr("id as k", "id % 2 as part", "id * 10 as v"),
      tbl, partitionBy = Seq("part"))
    DeltaSource.setTableProperties(spark, tbl,
      Map("delta.enableChangeDataFeed" -> "true"))
    val vBefore = DeltaSource.latestVersion(spark, tbl).get
    DeltaSource.deleteDelta(spark, tbl, col("k") < 4)
    // the cdc action carries partitionValues and points under the
    // partitioned _change_data layout
    val log = Files.readString(java.nio.file.Paths.get(
      tbl, "_delta_log", f"${vBefore + 1}%020d.json"))
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val cdcNodes = log.linesIterator.filter(_.nonEmpty).map(mapper.readTree)
      .filter(_.path("cdc").isObject).map(_.path("cdc")).toSeq
    assert(cdcNodes.nonEmpty)
    val pvs = cdcNodes.map(n => n.path("partitionValues").path("part").asText()).toSet
    assert(pvs == Set("0", "1"), s"got $pvs")
    cdcNodes.foreach { n =>
      val p = n.path("path").asText()
      assert(p.startsWith("_change_data/"), p)
      assert(p.contains("part=") || p.contains("part%3D"),
        s"cdc file should live under a hive partition dir: $p")
    }
    // the staged file itself holds only data columns + _change_type
    val onePath = java.net.URLDecoder.decode(cdcNodes.head.path("path").asText(), "UTF-8")
    val raw = spark.read.parquet(s"$tbl/$onePath")
    assert(raw.columns.toSet == Set("k", "v", "_change_type"),
      s"partition column must NOT be materialized in-file: ${raw.columns.toSeq}")
    // and the feed reconstructs partition values through the action
    val ch = feedAfter(tbl, vBefore)
      .select(col("k"), col("part"), col("v"), col("_change_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(ch == (0L until 4L).map(k => (k, k % 2, k * 10, "delete")).toSet, s"got $ch")
  }
}
