package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The scraper's COMPUTABLE half as distributed operators — link
  * extraction, URL resolution/sanitation, and the crawl frontier —
  * over a stored HTML corpus. The reference's scraper
  * (scraper.py:194 `crawl_site`, :275 `_extract_internal_links`,
  * :102 `_sanitize_url`) interleaves HTTP fetches with this logic;
  * the fetch half is out of scope for a Spark engine (and for this
  * sandbox), but everything between response body and frontier is
  * pure data transformation, so it runs here as set-oriented jobs
  * over a pages table — the shape a production crawl actually uses
  * at scale (fetch fleet writes pages; a Spark job extracts links
  * and emits the next frontier round).
  *
  * HTML corpus: pages are synthesized deterministically from the
  * documents table (one page per doc at
  * `http://site.example/doc/<id>`, anchors in every form the
  * extractor must handle: fragment/javascript/mailto/tel to skip,
  * root-relative and document-relative to resolve, absolute
  * internal to keep, absolute external to drop). The EXTRACTION is
  * the real thing — regexp over the html string, resolution,
  * domain gating — and the DuckDB oracle re-runs the same regex
  * over the identically-synthesized page, so a parsing bug on
  * either side diverges.
  *
  * URL resolution implements RFC 3986 relative resolution:
  * scheme-qualified hrefs pass through, `/rooted` paths resolve
  * against the authority, bare relative paths resolve against the
  * page's directory, and dot segments fold per §5.2.4
  * remove_dot_segments (`.` drops, `..` pops the segment stack —
  * never past the root — and a trailing `/.`/`/..` keeps the
  * trailing slash), matching the reference's urljoin. One
  * deliberate normalization beyond the RFC: empty segments
  * collapse (`a//b` → `a/b`), the canonicalization every crawler's
  * seen-set wants.
  */
object Scraper {

  val Domain = "site.example"
  val Origin = s"http://$Domain"

  /** One synthetic HTML page per document. Mirrored verbatim by the
    * oracle's SQL string construction — both sides then PARSE it. */
  def pages(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text"))
      .withColumn("url", concat(lit(s"$Origin/doc/"), col("doc_id")))
      .withColumn("html", concat(
        lit("<html><head><title>Doc "), col("doc_id"),
        lit("</title></head><body><h1>"), substring(col("text"), 1, 40),
        lit("</h1><a href=\"#top\">top</a>"),
        lit("<a href=\"mailto:team@site.example\">mail</a>"),
        lit("<a href=\"javascript:void(0)\">js</a>"),
        lit("<a href=\"tel:+1555"), col("doc_id"), lit("\">call</a>"),
        lit("<a href=\"/doc/"), col("doc_id") + 1, lit("\">next</a>"),
        lit("<a href=\"http://site.example/doc/"), pmod(col("doc_id") * 2, lit(937)),
        lit("\">rel</a>"),
        lit("<a href=\"http://other.example/p/"), pmod(col("doc_id"), lit(10)),
        lit("\">ext</a>"),
        lit("<a href=\"sub/item-"), pmod(col("doc_id"), lit(5)), lit("\">sub</a>"),
        lit("<a href=\"../doc/"), pmod(col("doc_id") * 3, lit(411)), lit("\">up</a>"),
        lit("<a href=\"./rel-"), pmod(col("doc_id"), lit(7)), lit("\">dot</a>"),
        lit("<p>"), col("text"), lit("</p></body></html>")))

  /** scraper.py:102 `_sanitize_url` — the object-store key for a
    * fetched page. */
  def sanitizeUrl(u: Column): Column =
    regexp_replace(regexp_replace(u, "://", "_"), "[/?&]", "_")

  /** RFC 3986 §5.2.4 remove_dot_segments over an absolute URL, plus
    * empty-segment collapse: the path's `.` segments drop, `..` pops
    * the segment stack (never past the root), and a path ending in
    * `/`, `/.` or `/..` keeps its trailing slash. Declarative — one
    * split + one aggregate fold per URL, map-only, no UDF — so the
    * fold rides whole-stage scans at any corpus size. */
  private[graft] def removeDotSegments(u: Column): Column = {
    // RFC 3986 applies remove_dot_segments to the PATH only: split
    // off the query/fragment first so `a?u=./x` or `#//b` never get
    // folded, and re-append them verbatim afterwards
    val qf = regexp_extract(u, "([?#].*)$", 1)
    val base = regexp_replace(u, "[?#].*", "")
    val origin = regexp_extract(base, "^([a-z][a-z0-9+.-]*://[^/]*)", 1)
    val path = regexp_extract(base, "^[a-z][a-z0-9+.-]*://[^/]*(/.*)$", 1)
    val segs = filter(split(path, "/"), s => s =!= "" && s =!= ".")
    val folded = aggregate(segs, array().cast("array<string>"),
      (acc, s) => when(s === "..",
          slice(acc, lit(1), greatest(size(acc) - 1, lit(0))))
        .otherwise(concat(acc, array(s))))
    val trail = when(path.rlike("(/|/\\.|/\\.\\.)$") && size(folded) > 0, lit("/"))
      .otherwise(lit(""))
    when(path === "", u)
      .otherwise(concat(origin, lit("/"), array_join(folded, "/"), trail, qf))
  }

  private def resolve(pageUrl: Column, href: Column): Column =
    removeDotSegments(
      when(href.rlike("^[a-z][a-z0-9+.-]*://"), href)
        .when(href.startsWith("/"), concat(lit(Origin), href))
        .otherwise(concat(regexp_replace(pageUrl, "/[^/]*$", "/"), href)))

  /** Link extraction over the stored corpus (scraper.py:275): every
    * href pulled by regex, skip-scheme anchors dropped
    * (#/javascript:/mailto:/tel:), relative forms resolved against
    * the page URL, and only same-domain results kept — plus the
    * sanitized object-store key each would land under. Map-only
    * fan-out (regex + explode per page), embarrassingly parallel at
    * any corpus size. */
  def linkExtract(docs: DataFrame): DataFrame =
    extractLinks(pages(docs))

  /** The extraction itself over arbitrary (doc_id, url, html) pages —
    * the seam a REAL fetched corpus plugs into. Regex-based href
    * pulling tolerates malformed markup by construction: an unclosed
    * tag or stray bracket can at worst hide or surface an
    * `href="…"` attribute, never throw, and an empty or
    * skip-scheme href is dropped by the filters. */
  def extractLinks(pageDf: DataFrame): DataFrame =
    pageDf
      .withColumn("href",
        explode(expr("""regexp_extract_all(html, 'href="([^"]*)"', 1)""")))
      .where(col("href") =!= "" &&
        !col("href").startsWith("#") &&
        !col("href").startsWith("javascript:") &&
        !col("href").startsWith("mailto:") &&
        !col("href").startsWith("tel:"))
      .withColumn("link_url", resolve(col("url"), col("href")))
      .where(col("link_url").startsWith(s"$Origin/"))
      .select(col("doc_id"), col("url").as("page_url"), col("link_url"),
        sanitizeUrl(col("link_url")).as("file_key"))
      .distinct()
      .orderBy(col("doc_id"), col("link_url"))

  /** Selector-driven content extraction (scraper.py:119
    * `_extract_content`): per page, one column per selector — here
    * the three the synthetic pages carry (`title`, `h1`, `p`) —
    * with the element's trimmed text, NULLed when shorter than
    * `minContentLength` (config.py:22 default 50), exactly the
    * too-short filter the reference applies per key. A real corpus
    * swaps the regex pulls for a selector engine inside the same
    * map-only shape; everything downstream (the NULL-per-key
    * contract, the metadata record) is the production behavior.
    * One row per page, embarrassingly parallel. */
  def contentExtract(docs: DataFrame, minContentLength: Int = 50): DataFrame = {
    def sel(tag: String): Column = {
      val t = trim(regexp_extract(col("html"), s"<$tag>(.*?)</$tag>", 1))
      when(length(t) >= minContentLength, t).otherwise(lit(null))
    }
    pages(docs)
      .select(col("doc_id"), col("url"),
        sel("title").as("title"), sel("h1").as("heading"), sel("p").as("body"),
        sanitizeUrl(col("url")).as("file_key"))
      .orderBy(col("doc_id"))
  }

  /** The site's synthetic robots ruleset: (path-prefix, allow) pairs
    * mirroring a parsed robots.txt's Allow/Disallow lines for `*`.
    * The Allow override nested INSIDE a Disallowed subtree is the
    * case longest-match semantics exist for. */
  val RobotsRules: Seq[(String, Boolean)] = Seq(
    ("/doc/sub/", false),       // Disallow: /doc/sub/
    ("/doc/sub/item-2", true),  // Allow:    /doc/sub/item-2 (longer → wins)
    ("/doc/1", false))          // Disallow: /doc/1 (PREFIX: also /doc/1*, /doc/10…)

  /** robots.txt gating (scraper.py:74 `_can_crawl` /
    * RobotFileParser.can_fetch), set-oriented: every extracted link
    * decided by LONGEST-PREFIX-MATCH over the ruleset (the
    * REP/Google rule; allow wins length ties), default allow when no
    * rule matches. The ruleset is model-sized, so it folds into one
    * nested CASE expression ordered by precedence — map-only,
    * codegen'd, no join; fetching robots.txt itself is the out-of-
    * scope HTTP half, exactly like the page fetches. Returns every
    * distinct link with its verdict and the rule that decided it. */
  def robotsGate(docs: DataFrame,
                 rules: Seq[(String, Boolean)] = RobotsRules): DataFrame = {
    // precedence: longer prefix first; on equal length, allow first
    val ordered = rules.sortBy { case (p, a) => (-p.length, !a) }
    val default = struct(lit(true).as("allow"), lit("-").as("rule"))
    val verdict = ordered.foldRight(default) { case ((p, a), els) =>
      when(col("path").startsWith(p),
        struct(lit(a).as("allow"), lit(p).as("rule"))).otherwise(els)
    }
    linkExtract(docs)
      .select(col("link_url")).distinct()
      .withColumn("path", regexp_replace(col("link_url"), s"^http://${Domain.replace(".", "\\.")}", ""))
      .withColumn("v", verdict)
      .select(col("link_url"), col("v.allow").as("allowed"), col("v.rule").as("rule"))
      .orderBy(col("link_url"))
  }

  /** The crawl frontier as per-depth BFS rounds (scraper.py:194):
    * the reference walks a FIFO `to_visit` with a page cap — an
    * inherently sequential loop; the distributed equivalent (and how
    * production crawls actually batch) is depth rounds with a depth
    * cap: every URL discovered within `maxDepth` hops of the seed,
    * stamped with its minimum depth. Expansion happens only through
    * URLs that exist as pages (a discovered-but-missing URL is a
    * frontier leaf — the fetch would 404), exactly like `visited`
    * gating. The links table never exceeds O(pages · links-per-page)
    * and is built once; each round joins the frontier against it and
    * anti-joins the seen set. SIZE-ROUTED like the graph walk's
    * frontier: below `maxBroadcastFrontier` rows the frontier and
    * seen set ride broadcast joins (one probe per round, no
    * shuffle); above it — a web-scale crawl where a round discovers
    * millions of URLs — both joins fall back to shuffles on the URL
    * key, so no round ever materializes the frontier on one node.
    * Branch choice is an execution-strategy swap, never a result
    * change (spec-pinned). */
  def crawlFrontier(docs: DataFrame, seedDocId: Long = 0L,
                    maxDepth: Int = 6,
                    maxBroadcastFrontier: Long = 1000000L): DataFrame = {
    val spark = docs.sparkSession
    val links = linkExtract(docs)
      .select(col("page_url"), col("link_url"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    links.count() // materialize once; every round probes the cached rows
    var seen = spark.range(1).select(
      lit(s"$Origin/doc/$seedDocId").as("url"), lit(0L).as("depth"))
      .localCheckpoint(true)
    var frontier = seen
    var frontierRows = 1L
    var seenRows = 1L
    var d = 1
    while (d <= maxDepth && frontierRows > 0) {
      // exhausted-frontier rounds are no-ops — stop instead of
      // running empty joins to maxDepth (round 14; result unchanged)
      def sized(df: DataFrame, n: Long): DataFrame =
        if (n <= maxBroadcastFrontier) broadcast(df) else df
      val next = sized(frontier.select(col("url")), frontierRows)
        .join(links, col("url") === col("page_url"))
        .select(col("link_url").as("url"), lit(d.toLong).as("depth"))
        .distinct()
        .join(sized(seen.select(col("url").as("v")), seenRows),
          col("url") === col("v"), "left_anti")
        .localCheckpoint(true)
      frontierRows = next.count() // cheap: counts the checkpointed blocks
      seenRows += frontierRows
      // union of already-checkpointed rounds: the lineage stays at
      // most maxDepth checkpointed legs — re-checkpointing the whole
      // union each round recopied every block (round 14: up to 6
      // materializations of the full seen set removed)
      seen = seen.unionByName(next)
      frontier = next
      d += 1
    }
    links.unpersist(false)
    seen.orderBy(col("depth"), col("url"))
  }
}
