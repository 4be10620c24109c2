package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's emitted JSON contract: a failed query (sentinel -1.0)
  * must be LOUD — named in `failed`, counted in `n_failed`, and
  * excluded from the total — never a fast-looking timing that makes
  * a broken query read as a 2-second improvement (the round-9
  * txt_unigram_* failures were only visible as -1 entries a reader
  * had to notice). */
class BenchJsonSpec extends AnyFunSuite {

  test("failures are excluded from the total and listed by name") {
    val (stdout, full) = Bench.renderJson(
      Seq("q_ok" -> 1.25, "q_broken" -> -1.0, "q_slow" -> 2.25, "z_broken" -> -1.0),
      "/data/sf")
    for (line <- Seq(stdout, full)) {
      assert(line.contains("\"value\":3.5"), line)       // 1.25 + 2.25, no -1s
      assert(line.contains("\"n_queries\":4"), line)
      assert(line.contains("\"n_failed\":2"), line)
      assert(line.contains("\"failed\":[\"q_broken\",\"z_broken\"]"), line)
    }
    // the full line still carries every query, sentinel included
    assert(full.contains("\"q_broken\":-1"), full)
  }

  test("no failures emits an empty failed list and the plain total") {
    val (stdout, _) = Bench.renderJson(Seq("a" -> 0.5, "b" -> 1.0), "/data/sf")
    assert(stdout.contains("\"value\":1.5") && stdout.contains("\"n_failed\":0")
      && stdout.contains("\"failed\":[]"), stdout)
  }

  test("mass failure keeps the stdout line bounded but the count honest") {
    // worst case: every query fails — the query map shrinks to 1
    // entry, so an uncapped failed array would be the overflow
    val many = (1 to 300).map(i => f"query_with_a_long_name_$i%03d" -> -1.0)
    val (stdout, full) = Bench.renderJson(many, "/data/sf")
    assert(stdout.length <= 1500 + 100, s"stdout line too long: ${stdout.length}")
    assert(stdout.contains("\"n_failed\":300"), stdout)   // true count survives the cap
    assert(stdout.contains("query_with_a_long_name_001"), stdout)
    assert(full.contains("query_with_a_long_name_300"), full) // stderr keeps them all
  }

  test("the stdout line stays under the driver's capture window") {
    val many = (1 to 300).map(i => f"query_with_a_long_name_$i%03d" -> (i / 100.0))
    val (stdout, full) = Bench.renderJson(many, "/data/sf")
    assert(stdout.length <= 1500 + 100, s"stdout line too long: ${stdout.length}")
    assert(full.length > stdout.length)
  }

  test("reruns are listed as [first, second] pairs with an honest count") {
    val (stdout, full) = Bench.renderJson(
      Seq("q_noisy" -> 2.4, "q_ok" -> 1.0), "/data/sf",
      reruns = Map("q_noisy" -> (50.7, 2.4)))
    for (line <- Seq(stdout, full)) {
      assert(line.contains("\"n_reruns\":1"), line)
      assert(line.contains("\"reruns\":{\"q_noisy\":[50.7,2.4]}"), line)
      // the reported time is the min — the eviction-storm 50.7 never
      // becomes the number of record
      assert(line.contains("\"q_noisy\":2.4"), line)
    }
    val (noRerun, _) = Bench.renderJson(Seq("a" -> 1.0), "/data/sf")
    assert(noRerun.contains("\"n_reruns\":0") && noRerun.contains("\"reruns\":{}"), noRerun)
  }

  test("rerun trigger: min(3x prior, prior + 15s), floored at 5s, memo-warm exempt") {
    // below the floor: never
    assert(!Bench.shouldRerun("q_a", 4.9, Some(1.0)))
    // no prior artifact: never (nothing to compare against)
    assert(!Bench.shouldRerun("q_a", 50.0, None))
    // small prior: the 3x bound is the binding one (3*2=6 < 2+15=17)
    assert(Bench.shouldRerun("q_a", 6.1, Some(2.0)))
    assert(!Bench.shouldRerun("q_a", 5.9, Some(2.0)))
    // large prior: the +15s additive cap binds where the pure 3x rule
    // let r12's ann_graph_incr_build (31.2 vs 11.26) escape
    assert(Bench.shouldRerun("q_a", 31.2, Some(11.26)))
    assert(!Bench.shouldRerun("q_a", 26.0, Some(11.26)))
    // memoized / fingerprint-guarded queries never re-run: the second
    // same-JVM run would time the warm skip path, not the work
    assert(!Bench.shouldRerun("emb_glove_train", 31.2, Some(5.0)))
    assert(!Bench.shouldRerun("txt_unigram_segment", 31.2, Some(5.0)))
    assert(!Bench.shouldRerun("ann_graph_incr_build", 31.2, Some(5.0)))
    assert(!Bench.shouldRerun("ann_index_build", 31.2, Some(5.0)))
    // but the SERVE paths of the same families still re-measure
    assert(Bench.shouldRerun("ann_graph_topk", 31.2, Some(5.0)))
  }

  test("prior timings parse round artifacts and take the per-query min") {
    // the driver artifact shape: parsed.queries carries real times,
    // while `tail` holds an ESCAPED stdout capture that must not
    // false-match the queries extractor
    val r10 =
      """{"n":10,"tail":"...\"queries\":{\"dedup_substrings\":9.9}...",
        |"parsed":{"metric":"total","value":344.2,
        |"queries": {"dedup_substrings": 2.4, "dedup_survivors": 3.5, "q_x": 1.0}}}""".stripMargin
    val r11 =
      """{"n":11,"parsed":{"queries":{"dedup_substrings":50.7,"dedup_survivors":24.4}}}"""
    val dir = java.nio.file.Files.createTempDirectory("bench_prior")
    java.nio.file.Files.write(dir.resolve("BENCH_r10.json"), r10.getBytes("UTF-8"))
    java.nio.file.Files.write(dir.resolve("BENCH_r11.json"), r11.getBytes("UTF-8"))
    java.nio.file.Files.write(dir.resolve("BENCH_notes.txt"), "ignore me".getBytes("UTF-8"))
    val prior = Bench.priorTimings(dir.toString)
    // min across rounds: the r11 anomaly (50.7) must not become the
    // yardstick when r10 recorded the quiet-host 2.4
    assert(prior.get("dedup_substrings").contains(2.4), prior)
    assert(prior.get("dedup_survivors").contains(3.5), prior)
    assert(prior.get("q_x").contains(1.0), prior)
    assert(Bench.priorTimings("/nonexistent-dir").isEmpty)
    // parsing is resilient: a missing outer brace still yields the
    // complete inner map, and garbage degrades to empty, never throws
    val torn = Bench.parseQueryTimes("""{"queries":{"a":1.5,"b":2}""")
    assert(torn == Map("a" -> 1.5, "b" -> 2.0))
    assert(Bench.parseQueryTimes("""{"queries":{"a":1.5,"b":""").isEmpty)
    assert(Bench.parseQueryTimes("not json at all").isEmpty)
  }
}
