package graft

import java.nio.file.Files
import graft.sources.ZoneCache
import org.apache.hadoop.fs.Path

/** Build-once zone cache: first ensure builds, second skips, a
  * corpus change (fingerprint flip) wipes and rebuilds, and a build
  * that dies before the marker lands is retried. */
class ZoneCacheSpec extends SparkSpec {

  private def freshDir(tag: String): String =
    Files.createTempDirectory(s"graft_zc_$tag").toString

  test("ensure builds once per corpus fingerprint, then skips") {
    val docs = Tables.documents(spark, sf)
    val zone = freshDir("once") + "/zone"
    var builds = 0
    assert(ZoneCache.ensure(docs, zone) { builds += 1 })
    assert(!ZoneCache.ensure(docs, zone) { builds += 1 })
    assert(!ZoneCache.ensure(docs, zone) { builds += 1 })
    assert(builds == 1)
  }

  test("a regenerated corpus (different input files) forces a rebuild") {
    val docs = Tables.documents(spark, sf)
    // a corpus with a different file listing → different fingerprint
    val other = Tables.documents(spark, "/root/testdata/sf0.01")
    val zone = freshDir("regen") + "/zone"
    var builds = 0
    assert(ZoneCache.ensure(docs, zone) { builds += 1 })
    assert(ZoneCache.ensure(other, zone) { builds += 1 })
    // and the new generation is now the cached one
    assert(!ZoneCache.ensure(other, zone) { builds += 1 })
    assert(builds == 2)
  }

  test("a crash before the marker (no marker file) retries the build") {
    val docs = Tables.documents(spark, sf)
    val zone = freshDir("crash") + "/zone"
    intercept[RuntimeException] {
      ZoneCache.ensure(docs, zone) { sys.error("killed mid-build") }
    }
    val marker = new Path(zone, "_graft_corpus_fp")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(marker))
    var builds = 0
    assert(ZoneCache.ensure(docs, zone) { builds += 1 })
    assert(builds == 1)
  }

  test("fingerprint is order-sensitive metadata, stable across re-reads") {
    val a = ZoneCache.corpusFingerprint(Tables.documents(spark, sf))
    val b = ZoneCache.corpusFingerprint(Tables.documents(spark, sf))
    val c = ZoneCache.corpusFingerprint(Tables.documents(spark, "/root/testdata/sf0.01"))
    assert(a == b)
    assert(a != c)
    assert(a.matches("[0-9a-f]{32}"))
  }
}
