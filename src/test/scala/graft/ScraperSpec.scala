package graft

import graft.operators.Scraper
import org.apache.spark.sql.functions._

/** The scraper's computable half: extraction semantics (skip
  * schemes, relative resolution, domain gate, key sanitation),
  * malformed-HTML tolerance of the regex extractor, and the BFS
  * frontier's min-depth / existence-gating contract. */
class ScraperSpec extends SparkSpec {
  import spark.implicits._

  test("extraction keeps internal links, resolves relatives, sanitizes keys") {
    val docs = Seq((7L, "alpha beta")).toDF("doc_id", "text")
    val out = Scraper.linkExtract(docs).collect()
    val links = out.map(_.getString(2)).toSet
    assert(links == Set(
      "http://site.example/doc/8",          // /doc/{id+1} root-relative
      "http://site.example/doc/14",         // absolute internal (7*2 % 937)
      "http://site.example/doc/sub/item-2", // document-relative
      "http://site.example/doc/21",         // ../doc/{id*3 % 411} — dot-folded
      "http://site.example/doc/rel-0"       // ./rel-{id % 7} — dot-folded
    ))
    // external host, #fragment, javascript:, mailto:, tel: all dropped
    assert(!links.exists(_.contains("other.example")))
    val keys = out.map(_.getString(3)).toSet
    assert(keys.contains("http_site.example_doc_8"))
  }

  test("dot segments fold per RFC 3986 remove_dot_segments") {
    // the stack fold is fully general, not just the two forms the
    // synthesized corpus emits: chained ../, pops past the root
    // clamp at /, trailing /. and /.. keep the slash
    val cases = Seq(
      "http://h.x/a/b/c/../../d" -> "http://h.x/a/d",
      "http://h.x/a/./b/./c" -> "http://h.x/a/b/c",
      "http://h.x/../x" -> "http://h.x/x",            // never above root
      "http://h.x/a/../../../y" -> "http://h.x/y",
      "http://h.x/a/.." -> "http://h.x/",
      "http://h.x/a/b/.." -> "http://h.x/a/",         // trailing slash kept
      "http://h.x/a/b/." -> "http://h.x/a/b/",
      "http://h.x/a//b" -> "http://h.x/a/b",          // empty-segment collapse
      "http://h.x/plain/path" -> "http://h.x/plain/path",
      "http://h.x/..a/b..c/d" -> "http://h.x/..a/b..c/d", // dots INSIDE names survive
      "http://h.x" -> "http://h.x",                   // no path → untouched
      // RFC 3986: remove_dot_segments applies to the PATH only —
      // dot segments and empty segments inside the query or fragment
      // survive verbatim
      "http://h.x/a/./b?u=./x" -> "http://h.x/a/b?u=./x",
      "http://h.x/a/b/../c?a=//b#f/../g" -> "http://h.x/a/c?a=//b#f/../g",
      "http://h.x/a//b#..//c" -> "http://h.x/a/b#..//c",
      "http://h.x?a=./x" -> "http://h.x?a=./x",       // no path → untouched
      "http://h.x/a/..?q=1" -> "http://h.x/?q=1")     // trailing slash kept, query kept
    val df = cases.map(_._1).toDF("u")
      .select(col("u"), Scraper.removeDotSegments(col("u")).as("f"))
    val got = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (in, want) =>
      assert(got(in) == want, s"$in -> ${got(in)}, want $want")
    }
  }

  test("malformed HTML never throws; hrefs survive broken markup around them") {
    val pages = Seq(
      // unclosed tags, stray brackets, nested element inside <a>
      (1L, "http://site.example/doc/1",
        """<html><body><h1>broken <a href="/ok/1"><b>x</a><p><<<>>>"""),
      // href with query string (sanitizer must flatten ? and &)
      (2L, "http://site.example/doc/2",
        """<a href="/search?q=1&lang=en">q</a>"""),
      // empty href, unterminated quote at EOF, attribute soup
      (3L, "http://site.example/doc/3",
        """<a href="">e</a><a class="x" href="/ok/3" data-y>k</a><a href="/trunc"""),
      // no links at all
      (4L, "http://site.example/doc/4", "<html><body>plain</body></html>"),
      // skip schemes mixed with a keeper
      (5L, "http://site.example/doc/5",
        """<a href="#f">f</a><a href="mailto:x@y">m</a><a href="sub/z">z</a>"""))
      .toDF("doc_id", "url", "html")
    val out = Scraper.extractLinks(pages).collect()
    val byDoc = out.groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(2)).toSet).toMap
    assert(byDoc(1L) == Set("http://site.example/ok/1"))
    assert(byDoc(2L) == Set("http://site.example/search?q=1&lang=en"))
    assert(out.filter(_.getLong(0) == 2L).head.getString(3) ==
      "http_site.example_search_q=1_lang=en")
    // the unterminated-quote trailing href has no closing quote → not
    // a well-formed attribute → dropped; the clean one survives
    assert(byDoc(3L) == Set("http://site.example/ok/3"))
    assert(!byDoc.contains(4L))
    assert(byDoc(5L) == Set("http://site.example/doc/sub/z"))
  }

  test("frontier stamps minimum depth and expands only through existing pages") {
    // a 6-doc corpus: the +1 chain and the *2%937 link interact; doc
    // ids beyond the corpus are discovered but never expanded
    val docs = (0L to 5L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val rows = Scraper.crawlFrontier(docs, seedDocId = 0L, maxDepth = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows("http://site.example/doc/0") == 0L)
    assert(rows("http://site.example/doc/1") == 1L)   // 0 → +1
    assert(rows("http://site.example/doc/2") == 2L)   // 1 → +1 (and 1 → *2)
    assert(rows("http://site.example/doc/3") == 2L)   // 1 → ../doc/3 (dot-folded up-link)
    assert(rows("http://site.example/doc/4") == 3L)   // via 2 → *2 at depth 3
    // depth-capped: nothing within 3 hops links to doc/5
    assert(!rows.contains("http://site.example/doc/5"))
    // discovered-but-missing pages are LEAVES: doc/6 arrives via the
    // up-link from doc/2 (3·2 % 411) but, having no page, never
    // expands — doc/7 (6+1) must stay absent
    assert(rows("http://site.example/doc/6") == 3L)
    assert(!rows.contains("http://site.example/doc/7"))
    // sub/item and ./rel- leaves are discovered from expanded pages
    assert(rows.contains("http://site.example/doc/sub/item-0"))
    assert(rows("http://site.example/doc/rel-0") == 1L) // ./ dot-folded
  }

  test("the frontier walk is partition-invariant") {
    val docs = Tables.documents(spark, sf)
    def run(df: org.apache.spark.sql.DataFrame) =
      Scraper.crawlFrontier(df).collect().map(_.toString).toSeq
    assert(run(docs.repartition(7)) == run(docs.coalesce(1)))
  }

  test("content extraction NULLs each selector key independently below the length floor") {
    // doc 1: long text → every selector lands; doc 2: 15-char text →
    // title (Doc 2 = 5 chars) NULL, heading/body (15 chars) kept;
    // doc 3: 5-char text → only nothing ≥ 10 except… nothing
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "fifteen chars x"),
      (3L, "tiny!")).toDF("doc_id", "text")
    val out = Scraper.contentExtract(docs, minContentLength = 10)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getString(2)), Option(r.getString(3)), Option(r.getString(4))))).toMap
    val (t1, h1, b1) = out(1L)
    assert(t1.isEmpty && h1.contains("alpha beta gamma delta epsilon zeta eta") &&
      b1.exists(_.startsWith("alpha beta gamma")))
    val (t2, h2, b2) = out(2L)
    assert(t2.isEmpty && h2.contains("fifteen chars x") && b2.contains("fifteen chars x"))
    val (t3, h3, b3) = out(3L)
    assert(t3.isEmpty && h3.isEmpty && b3.isEmpty)
    // the reference default floor (50) drops the 40-char h1 everywhere
    val strict = Scraper.contentExtract(docs, minContentLength = 50)
      .collect().map(r => r.getLong(0) -> Option(r.getString(3))).toMap
    assert(strict.values.forall(_.isEmpty))
  }

  test("robots gating is longest-prefix-match with allow winning ties") {
    // ids chosen so the extracted links hit every rule class:
    // 0 → /doc/1 (prefix-disallowed) + sub/item-0 (subtree-disallowed)
    // 2 → sub/item-2 (the Allow override INSIDE the disallowed subtree)
    // 9 → /doc/10 (PREFIX semantics: '/doc/1' blocks it too)
    // 3 → /doc/4 (no rule → default allow)
    val docs = Seq(0L, 2L, 3L, 9L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val v = Scraper.robotsGate(docs).collect()
      .map(r => r.getString(0) -> ((r.getBoolean(1), r.getString(2)))).toMap
    assert(v("http://site.example/doc/1") == ((false, "/doc/1")))
    assert(v("http://site.example/doc/10") == ((false, "/doc/1"))) // prefix, not equality
    assert(v("http://site.example/doc/sub/item-0") == ((false, "/doc/sub/")))
    assert(v("http://site.example/doc/sub/item-2") == ((true, "/doc/sub/item-2"))) // longest wins
    assert(v("http://site.example/doc/4") == ((true, "-"))) // default allow
    // equal-length allow/disallow rules: allow takes the tie
    val tied = Scraper.robotsGate(docs,
      rules = Seq(("/doc/4", false), ("/doc/4", true))).collect()
      .map(r => r.getString(0) -> ((r.getBoolean(1), r.getString(2)))).toMap
    assert(tied("http://site.example/doc/4") == ((true, "/doc/4")))
  }

  test("the shuffle-join frontier branch is identical to the broadcast branch") {
    // maxBroadcastFrontier = 0 forces every round's frontier probe
    // and seen anti-join onto shuffle joins — the branch a web-scale
    // crawl (millions of URLs per round) serves on. Execution
    // strategy only; the frontier must not move.
    val docs = Tables.documents(spark, sf)
    val bc = Scraper.crawlFrontier(docs).collect().map(_.toString).toSeq
    val sh = Scraper.crawlFrontier(docs, maxBroadcastFrontier = 0L)
      .collect().map(_.toString).toSeq
    assert(bc == sh && bc.nonEmpty)
  }
}
