package graft.sources

import graft.functions.VectorFunctions._
import graft.operators.Similarity
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Persisted small-world graph index — the build / serve split for
  * the NSW family (the graph twin of [[AnnIndex]]'s IVF-PQ layout,
  * same reference anchor: /root/reference/README.md:25,111 — the
  * vector store persists its index and serves queries from it).
  *
  *   layout/
  *     edges/   pb=K/ (src, dst, dv, dnrm, dcodes, kind, owner, gen)
  *              — directed edges with the destination's RAW VECTOR
  *              and its PQ CODES both inline, partitioned by
  *              pb = src mod pBuckets; the raw path reads
  *              (src,dst,dv,dnrm), the compressed path reads
  *              (src,dst,dcodes) — COLUMN PRUNING picks the
  *              residency footprint
  *     nodes/   nb=K/ (id, v, nrm) — id-bucketed raw vectors: the
  *              compressed path's full-precision RERANK fetch
  *     codebook/ (code, sub, cv) — the frozen PQ codebook
  *     buckets/ tbl=T/ (bucket, id, v, nrm) — the frozen LSH
  *              assignment (maintenance hashes new vectors into
  *              these buckets; the planes never retrain in place)
  *     entries/ (id, v, nrm) — the first `entryCap` nodes: the
  *              deterministic beam entry points
  *     retired/ ret-*.parquet (owner, before_gen) — tombstones: a
  *              maintenance pass that RECOMPUTED owner's adjacency
  *              list masks the list's older generations at read time
  *     meta/    (m, tables, n_bits, dim, p_buckets, entry_cap,
  *              pq_m, n_codes, corpus_fp, applied_fps)
  *
  * Why vectors ride ON the edges: a beam step expands frontier →
  * neighbors → scores them, and the expensive half at scale is
  * fetching neighbor vectors. With `dv` inline, one partition-pruned
  * probe of `edges/` yields candidates AND their vectors — a search
  * never touches the corpus, and never re-joins a vector table. The
  * duplication factor is the out-degree (~m+2), the classic
  * space-for-locality trade every disk-resident graph index makes
  * (DiskANN stores vectors next to adjacency for the same reason).
  *
  * Why tombstones instead of rewrites: maintenance must REPLACE the
  * adjacency lists of nodes whose buckets received new vectors.
  * Rewriting their partitions in place is not crash-safe without a
  * commit log; instead every write is an APPEND (new list edges at
  * generation g, a tombstone (owner, g) masking generations < g) and
  * the read path filters — the deletion-vector discipline from the
  * Delta half of this engine applied to the index. A scheduled
  * rebuild compacts tombstones away. Masking is a literal-map probe
  * when the tombstone set is map-sized, and a broadcast anti-join
  * above [[GraphAnnIndex.MaskMapLimit]] — the same dual the DV scan
  * path uses.
  *
  * Search cost: each of the `steps` beam rounds reads only the
  * `pb` partitions the frontier hashes into (static isin pruning —
  * the frontier is queries×beam, model-sized, known on the driver)
  * and row-group-prunes on `src`. At a billion vectors a search
  * touches O(steps·beam·degree) edge rows and ZERO corpus rows;
  * corpus-scale work happens exactly once, at build. When a caller
  * serves a query batch too large to hold the frontier driver-side
  * (beyond `maxDriverFrontier` rows), the loop degrades to the
  * distributed shape: pinned frontier, pb-pruned edge scan (the
  * frontier's distinct pb set is ≤ pBuckets rows — one cheap
  * aggregate per round), and a SIZE-ROUTED probe — the frontier
  * broadcasts only below `maxBroadcastFrontier` rows; above it the
  * join shuffles on src (sort-merge), so no step ever materializes
  * the frontier on the driver. Still one scan per step, never per
  * query, and branch choice is an execution-strategy swap, never a
  * result change (spec-pinned).
  */
object GraphAnnIndex {

  /** Above this many tombstoned owners the read mask switches from a
    * literal-map probe to a broadcast anti-join. */
  private[graft] val MaskMapLimit = 65536

  final case class Meta(m: Int, tables: Int, nBits: Int, dim: Int,
                        pBuckets: Int, entryCap: Int,
                        pqM: Int, nCodes: Int,
                        corpusFp: String, appliedFps: Seq[String])

  /** Dev-only stage timer (set GRAFT_PROBE=1): stderr wall-clock per
    * labelled stage, zero cost otherwise. */
  private def probe[T](tag: String)(f: => T): T =
    if (sys.env.contains("GRAFT_PROBE")) {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"PROBE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    } else f

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private[graft] def readMeta(spark: SparkSession, dir: String): Meta = {
    val r = spark.read.parquet(s"$dir/meta").head()
    Meta(r.getAs[Int]("m"), r.getAs[Int]("tables"), r.getAs[Int]("n_bits"),
      r.getAs[Int]("dim"), r.getAs[Int]("p_buckets"), r.getAs[Int]("entry_cap"),
      r.getAs[Int]("pq_m"), r.getAs[Int]("n_codes"),
      r.getAs[String]("corpus_fp"),
      Option(r.getAs[String]("applied_fps")).filter(_.nonEmpty)
        .map(_.split(",").toSeq).getOrElse(Nil))
  }

  private def writeMeta(spark: SparkSession, dir: String, meta: Meta): Unit = {
    import spark.implicits._
    Seq((meta.m, meta.tables, meta.nBits, meta.dim, meta.pBuckets, meta.entryCap,
      meta.pqM, meta.nCodes, meta.corpusFp, meta.appliedFps.mkString(",")))
      .toDF("m", "tables", "n_bits", "dim", "p_buckets", "entry_cap",
        "pq_m", "n_codes", "corpus_fp", "applied_fps")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  /** The frozen assignment read back in [[Similarity.bucketAssign]]
    * shape (tbl restored from its partition directory). */
  private def loadBuckets(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/buckets")
      .select(col("id").cast("long"), col("v"), col("nrm"),
        col("tbl").cast("int"), col("bucket").cast("long"))

  /** (id, v, nrm) — every node exactly once (tbl=0 slice: partition
    * pruning reads 1/tables of the assignment). */
  private def loadNodes(spark: SparkSession, dir: String): DataFrame =
    loadBuckets(spark, dir).where(col("tbl") === 0)
      .select(col("id"), col("v"), col("nrm"))

  /** The deterministic PQ codebook shared with the fused
    * [[Similarity.graphPqTopK]]: the `nCodes` lowest-id vectors'
    * subvectors — (code, sub, cv). Model-sized; broadcast at use. */
  private def pqCodebook(nodes: DataFrame, pqM: Int, subDim: Int,
                         nCodes: Int): DataFrame =
    Similarity.subVectors(nodes.select(col("id"), col("v")), pqM, subDim, "cv")
      .where(col("id") < nCodes)
      .select(col("id").as("code"), col("sub"), col("cv"))

  /** PQ codes per node against a FROZEN codebook, as a sub-ordered
    * array — the per-neighbor payload the compressed serving path
    * reads instead of `dv`. Encoding is deterministic (6-dp L2,
    * ties to the lowest code), so re-encoding an old node during
    * maintenance reproduces its build-time codes exactly. */
  private def pqCodesArr(nodes: DataFrame, cb: DataFrame, pqM: Int,
                         subDim: Int): DataFrame =
    // one exchange (round 14): the per-(id, sub) argmin and the
    // per-id code collection fold into a single groupBy(id) with one
    // conditional min per sub — min(struct(l2, code)) per sub slot is
    // exactly the former two-level agg, and the array is born
    // sub-ordered (no sort_array/collect_list)
    Similarity.subVectors(nodes.select(col("id"), col("v")), pqM, subDim, "sv")
      .join(broadcast(cb), "sub")
      .select(col("id"), col("sub"), col("code"), Similarity.pqL2.as("l2"))
      .groupBy(col("id"))
      .agg(array((0 until pqM).map(i =>
        min(when(col("sub") === i, struct(col("l2"), col("code")))).getField("code")): _*)
        .as("codes"))

  /** Adjacency lists → directed edges with dst vectors AND dst PQ
    * codes inline. Each list edge u→v materializes BOTH directions
    * under owner u (the NSW reverse-link trick), so replacing u's
    * list later means masking owner u — provenance is what makes the
    * tombstone exact. `nodesC` carries (id, v, nrm, codes). */
  private def listEdges(lists: DataFrame, nodesC: DataFrame, gen: Int): DataFrame = {
    val vecs = nodesC.select(col("id").as("nid"), col("v").as("nv"),
      col("nrm").as("nnrm"), col("codes").as("ncodes"))
    // round 15: union the (direction-swapped) id pairs FIRST, then
    // attach the dst payload with ONE join — the fwd/rev form paid
    // two joins against the vector table for identical output rows
    val pairs = lists
      .select(col("src"), col("dst"), col("src").as("owner"))
      .unionByName(lists
        .select(col("dst").as("src"), col("src").as("dst"), col("src").as("owner")))
    pairs.join(vecs, col("dst") === col("nid"))
      .select(col("src"), col("dst"), col("nv").as("dv"), col("nnrm").as("dnrm"),
        col("ncodes").as("dcodes"),
        lit("l").as("kind"), col("owner"), lit(gen).as("gen"))
  }

  /** Backbone edges u ↔ ⌊u/2⌋ for `ids` (>0), dst payloads from
    * `nodesC`. Owner −1: the backbone is immutable, never tombstoned. */
  private def treeEdges(ids: DataFrame, nodesC: DataFrame, gen: Int): DataFrame = {
    val pairs = ids.where(col("id") > 0)
      .select(col("id").as("src"), floor(col("id") / 2).cast("long").as("dst"))
    val both = pairs.unionByName(
      pairs.select(col("dst").as("src"), col("src").as("dst")))
    val vecs = nodesC.select(col("id").as("nid"), col("v").as("nv"),
      col("nrm").as("nnrm"), col("codes").as("ncodes"))
    both.join(vecs, col("dst") === col("nid"))
      .select(col("src"), col("dst"), col("nv").as("dv"), col("nnrm").as("dnrm"),
        col("ncodes").as("dcodes"),
        lit("b").as("kind"), lit(-1L).as("owner"), lit(gen).as("gen"))
  }

  /** Build the graph over `emb` and persist the full layout. The ONE
    * corpus-scale job: assignment, bucket-bounded pair scoring,
    * top-m lists, vector attachment — everything downstream serves
    * from the persisted bytes. `nbits` < 0 sizes the hash from the
    * corpus ([[Similarity.autoBits]]); pass it explicitly to size
    * for PROJECTED capacity when increments will follow (the planes
    * freeze at build — retraining is a scheduled rebuild, the same
    * contract as [[AnnIndex]]'s centroids). */
  def buildAndSave(emb: DataFrame, dir: String,
                   m: Int = 8, nbits: Int = -1, tables: Int = 4, dim: Int = 64,
                   pBuckets: Int = 32, entryCap: Int = 64,
                   pqM: Int = 8, nCodes: Int = 16,
                   idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val spark = emb.sparkSession
    val nRows = emb.count()
    val bits = if (nbits > 0) nbits else Similarity.autoBits(nRows)
    // round 15 (guide §2.2): the build is a chain of ~8 jobs over
    // corpus-derived tables; size their shuffles from the corpus row
    // count (clamped to session parallelism) instead of paying the
    // session's full fan-out per stage on a small corpus. At 100 TB
    // the clamp lands on full parallelism — layout only, the build
    // output is partition-count invariant (deterministic scoring +
    // per-key writes).
    graft.operators.LoopShuffle.sized(spark, nRows) { _ =>
    val assign = Similarity.bucketAssign(emb, bits, tables, dim, idCol, vecCol)
    assign.repartition(col("tbl"), col("bucket"))
      .write.mode("overwrite").partitionBy("tbl").parquet(s"$dir/buckets")
    // everything below reads the PERSISTED assignment — the build
    // verifies its own bytes, and the lineage never recomputes the
    // hash job (at 100 TB that job is the thing you only run once)
    val bk = loadBuckets(spark, dir)
    val nodes = loadNodes(spark, dir)
    // the id-bucketed vector table: the full-precision RERANK's
    // partition-pruned fetch path (nb isin + id isin)
    nodes.withColumn("nb", pmod(col("id"), lit(pBuckets.toLong)))
      .repartition(col("nb"))
      .write.mode("overwrite").partitionBy("nb").parquet(s"$dir/nodes")
    val subDim = dim / pqM
    val cb = pqCodebook(nodes, pqM, subDim, nCodes)
    cb.coalesce(1).write.mode("overwrite").parquet(s"$dir/codebook")
    val nodesC = nodes.join(pqCodesArr(nodes, cb, pqM, subDim), Seq("id"))
    // materialize the adjacency lists once (round 14): listEdges
    // consumes `lists` in BOTH union branches (fwd + rev), so the
    // bucket-bounded pair-scoring join — the build's dominant
    // compute — would otherwise run twice inside the edges write.
    // O(n·m) id pairs: bounded, tiny next to the edge payloads.
    // round 15 (re-adjudicating r14's eager checkpoint, which the
    // driver measured as a 17 % build regression): with listEdges
    // fused to one pair-union the lists feed a SINGLE write action,
    // and its two pair-union branches share the top-k aggregate's
    // exchange (ReusedExchange) — the bucket-bounded scoring join
    // runs once with no materialization job
    val lists = Similarity.localLists(bk, bk, m)
    val edges = listEdges(lists, nodesC, gen = 0)
      .unionByName(treeEdges(nodes.select(col("id")), nodesC, gen = 0))
      .withColumn("pb", pmod(col("src"), lit(pBuckets.toLong)))
    // repartition ON the layout key before the partitioned write:
    // one file per pb dir instead of tasks×dirs small files — the
    // object-store request count IS the build cost at scale
    // cluster by src within each pb file (guide §6): every serve
    // round row-group-prunes on src.isin(frontier), so tight per-
    // row-group src bounds are the read-path footprint
    edges.repartition(col("pb")).sortWithinPartitions(col("src"))
      .write.mode("overwrite").partitionBy("pb").parquet(s"$dir/edges")
    nodes.where(col("id") < entryCap)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/entries")
    fs(spark, dir).delete(new Path(s"$dir/retired"), true)
    writeMeta(spark, dir, Meta(m, tables, bits, dim, pBuckets, entryCap,
      pqM, nCodes, ZoneCache.corpusFingerprint(emb), Nil))
    }
  }

  /** Build only if absent or stale (corpus fingerprint mismatch) —
    * the serving guard, verbatim the [[AnnIndex.ensureBuilt]]
    * contract. */
  def ensureBuilt(emb: DataFrame, dir: String,
                  m: Int = 8, nbits: Int = -1, tables: Int = 4, dim: Int = 64,
                  pBuckets: Int = 32, entryCap: Int = 64,
                  pqM: Int = 8, nCodes: Int = 16,
                  idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val spark = emb.sparkSession
    val p = new Path(s"$dir/meta")
    // an unreadable/older-layout meta is just "stale" — rebuild
    val fresh = fs(spark, dir).exists(p) &&
      (try {
        val meta = readMeta(spark, dir)
        meta.appliedFps.isEmpty && meta.corpusFp == ZoneCache.corpusFingerprint(emb)
      } catch { case scala.util.control.NonFatal(_) => false })
    if (!fresh) buildAndSave(emb, dir, m, nbits, tables, dim, pBuckets, entryCap,
      pqM, nCodes, idCol, vecCol)
  }

  /** DELETE vectors from the index by id (round 14 — the production
    * vector-store contract Chroma gives the reference for free): a
    * node-level tombstone batch lands as one overwrite-idempotent
    * parquet under `deleted/` (same batchTag → same path, so a
    * retried delete never double-writes), the SERVE paths mask the
    * ids automatically (raw and PQ walks both: excluded from the
    * entry round AND from every round's candidate union, so the walk
    * navigates the surviving subgraph exactly as it would after the
    * physical reclaim), and [[compactTombstones]] reclaims — edges
    * incident to a deleted node, its bucket assignments (so later
    * increments can never link to it), its node rows, and its entry
    * rows all rewritten away, `deleted/` dropped LAST so every crash
    * point still serves correctly off the mask. Zero corpus work at
    * delete time: the tombstone write is O(batch). */
  def deleteVectors(spark: SparkSession, dir: String, ids: DataFrame,
                    batchTag: String = "default"): Unit = {
    ids.select(col("id").cast("long"))
      .distinct()
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/deleted/del-$batchTag")
  }

  private def deletedDf(spark: SparkSession, dir: String): Option[DataFrame] = {
    val p = new Path(s"$dir/deleted")
    if (!fs(spark, dir).exists(p)) None
    else Some(spark.read.option("recursiveFileLookup", "true")
      .parquet(p.toString).select(col("id").cast("long")).distinct())
  }

  /** The delete mask, SIZED before any driver materialization (the
    * retiredDf routing verbatim): ≤ [[MaskMapLimit]] ids collect to
    * a literal In-set probe; above it the mask stays a DataFrame and
    * candidates anti-join against it. None when nothing is deleted. */
  private def deleteMask(spark: SparkSession, dir: String)
      : Option[Either[Array[Long], DataFrame]] =
    deletedDf(spark, dir).flatMap { del =>
      val sample = del.limit(MaskMapLimit + 1).collect()
      if (sample.isEmpty) None
      else if (sample.length <= MaskMapLimit) Some(Left(sample.map(_.getLong(0))))
      else Some(Right(del.localCheckpoint(true)))
    }

  /** Apply the delete mask to a candidate frame on column `idc`. */
  private def maskDeleted(df: DataFrame, idc: String,
                          mask: Option[Either[Array[Long], DataFrame]]): DataFrame =
    mask match {
      case None => df
      case Some(Left(ids)) => df.where(!col(idc).isin(ids.map(Long.box): _*))
      case Some(Right(del)) => df.join(
        broadcast(del.select(col("id").as("__del"))),
        col(idc) === col("__del"), "left_anti")
    }

  /** The tombstone table, reduced to owner → lowest generation still
    * visible, GATED to committed increments (`before_gen <= gens`):
    * an in-flight increment's tombstone must not mask the old lists
    * before its replacement edges are committed via meta. */
  private def retiredDf(spark: SparkSession, dir: String, gens: Int): Option[DataFrame] = {
    val p = new Path(s"$dir/retired")
    if (!fs(spark, dir).exists(p)) None
    else Some(spark.read.option("recursiveFileLookup", "true").parquet(p.toString)
      .where(col("before_gen") <= gens)
      .groupBy(col("owner")).agg(max(col("before_gen")).as("r_gen"))
      .select(col("owner").as("r_owner"), col("r_gen")))
  }

  private def loadEdges(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/edges")
      .select(col("src").cast("long"), col("dst").cast("long"),
        col("dv"), col("dnrm"), col("dcodes"), col("kind"),
        col("owner").cast("long"), col("gen").cast("int"),
        col("pb").cast("long"))

  /** Edges with retired generations masked out. Heals a torn
    * compaction first — a sealed stage left by a dead maintainer is
    * the live edge set.
    *
    * Reader visibility is gated on META's committed generation
    * (= applied increments): an in-flight [[appendIncremental]] has
    * already appended gen-(g+1) edge files and may have written its
    * tombstone, but until meta commits, a concurrent search must see
    * exactly the pre-increment index — never old AND new adjacency
    * lists unioned. Both filters ride the parquet scan (gen/
    * before_gen predicates push down), so the gate costs nothing.
    *
    * The tombstone mask is SIZED before any driver materialization:
    * a literal-map probe only under [[MaskMapLimit]] owners; above
    * it, a broadcast anti-join straight off the parquet read — no
    * collect of the retired table on any serve path, whatever its
    * cardinality. */
  private def liveEdges(spark: SparkSession, dir: String,
                        metaOpt: Option[Meta] = None): DataFrame = {
    recoverCompaction(spark, dir)
    val gens = metaOpt.getOrElse(readMeta(spark, dir)).appliedFps.size
    val all = loadEdges(spark, dir).where(col("gen") <= gens)
    retiredDf(spark, dir, gens) match {
      case None => all
      case Some(ret) =>
        // ONE job sizes AND fetches the mask: collect at most
        // limit+1 rows — empty ⇒ no debt, ≤limit ⇒ literal-map
        // probe from the rows already in hand, limit+1 ⇒ the
        // anti-join path (never a full collect of the retired table)
        val sample = ret.limit(MaskMapLimit + 1).collect()
        if (sample.isEmpty) all
        else if (sample.length <= MaskMapLimit) {
          val m = sample.map(r => r.getLong(0) -> r.getInt(1)).toMap
          all.where(col("gen") >=
            coalesce(element_at(typedLit(m), col("owner")), lit(0)))
        } else
          all.join(broadcast(ret),
            col("owner") === col("r_owner") && col("gen") < col("r_gen"), "left_anti")
    }
  }

  /** Beam search over the persisted graph. `queries` is (query_id,
    * qv) — external vectors; the corpus is never read. Bit-identical
    * to [[Similarity.graphTopK]] on the same corpus and parameters:
    * same candidate sets, same 6-dp rounding, same (sim DESC, node)
    * ties. */
  def search(spark: SparkSession, dir: String, queries: DataFrame,
             k: Int = 10, beam: Int = 32, steps: Int = 8, entries: Int = 16,
             maxDriverFrontier: Int = 100000,
             maxBroadcastFrontier: Long = 1000000L,
             candidateFilter: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    val meta = readMeta(spark, dir)
    // node-level delete tombstones mask AUTOMATICALLY on every serve
    // path — a deleted vector must never be returned, whoever calls
    val delMask = deleteMask(spark, dir)
    // pin the live edge table for the duration of the search: a
    // serving process holds its edge working set in the block cache
    // (RAM/SSD — the HNSW/DiskANN residency model), so the `steps`
    // probes hit memory, not parquet listings. persist() keeps the
    // LOGICAL plan (lineage still reads only index bytes — the
    // GraphAnnSpec input-file pin holds); unpersist below is
    // non-blocking, and any post-return consumer of the lazy result
    // simply re-reads its one pruned slice from disk.
    val edges = liveEdges(spark, dir, Some(meta))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val q = queries
      .select(col("query_id").cast("long"), col("qv"), norm(col("qv")).as("qnrm"))
      .localCheckpoint(true)
    val nq = q.count()
    val scoreSchema = StructType(Seq(StructField("query_id", LongType),
      StructField("node", LongType), StructField("sim", DoubleType)))
    // every nq-proportional side is SIZE-ROUTED: broadcast below
    // `maxBroadcastFrontier` rows, sort-merge shuffle above — a
    // broadcast() collects to the driver and ships whole to every
    // executor, the exact materialization the distributed regime
    // exists to avoid (the Scraper.crawlFrontier dual)
    def sized(df: DataFrame, rows: Long): DataFrame =
      if (rows <= maxBroadcastFrontier) broadcast(df) else df.hint("merge")
    def score(cand: DataFrame): DataFrame =
      cand.join(sized(q, nq), Seq("query_id"))
        .select(col("query_id"), col("node"),
          round(cosinePrenormed(dot(col("qv"), col("dv")), col("qnrm"), col("dnrm")), 6)
            .as("sim"))
    // round 0: the scattered entry points, scored for every query
    // deleted entries are excluded from ROUND 0 (unlike the metadata
    // candidateFilter, which starts at round 1): this is what makes
    // the masked serve bit-equal to the post-compaction serve — in
    // the reclaimed layout the entry row is physically gone, so its
    // out-edges must not seed the walk here either
    val ent = maskDeleted(spark.read.parquet(s"$dir/entries")
      .select(col("id").cast("long"), col("v"), col("nrm"))
      .where(col("id") < math.min(entries, meta.entryCap)), "id", delMask)
    var beamScored: DataFrame = score(
      q.select(col("query_id")).crossJoin(
        ent.select(col("id").as("node"), col("v").as("dv"), col("nrm").as("dnrm"))))
    val driverSide = nq * beam <= maxDriverFrontier && nq * entries <= maxDriverFrontier
    // the driver-side path carries the frontier ROWS between steps —
    // one Spark job per step (the topB collect), no re-collect of the
    // local relation it just built
    var frontierRows: Array[Row] = null
    // the frontier can never exceed nq·max(beam, entries) rows — an
    // ANALYTIC bound, so size-routing costs zero extra jobs (routing
    // on it errs only toward the shuffle branch this regime prefers)
    val frontierBound = nq * math.max(beam, entries)
    if (driverSide) {
      frontierRows = beamScored.collect()
      beamScored = spark.createDataFrame(
        java.util.Arrays.asList(frontierRows: _*), scoreSchema)
    } else beamScored = beamScored.localCheckpoint(true)
    var lastScored: DataFrame = beamScored
    (1 to steps).foreach { step =>
      val expanded =
        if (driverSide) {
          // the frontier is model-sized and ON the driver: prune the
          // edge scan STATICALLY — partition isin on pb, row-group
          // isin on src — so a step touches O(frontier·degree) rows
          val nodes = frontierRows.map(_.getLong(1)).distinct
          val pbs = nodes.map(n => ((n % meta.pBuckets) + meta.pBuckets) % meta.pBuckets)
            .distinct
          edges.where(col("pb").isin(pbs: _*) && col("src").isin(nodes: _*))
            .join(broadcast(beamScored.select(col("query_id"), col("node"))),
              col("src") === col("node"))
            .select(col("query_id"), col("dst").as("node"),
              col("dv"), col("dnrm"))
        } else {
          // distributed frontier: the pb prune still applies — the
          // frontier's distinct pb set is ≤ pBuckets rows, one cheap
          // per-round aggregate — and the size-routed probe keeps the
          // frontier off the driver when it outgrows the broadcast
          // budget. Either way: one pruned edge scan per step, never
          // the corpus.
          val pbs = beamScored
            .select(pmod(col("node"), lit(meta.pBuckets.toLong)).as("fpb"))
            .distinct().collect().map(_.getLong(0))
          sized(beamScored.select(col("query_id"), col("node")), frontierBound)
            .join(edges.where(col("pb").isin(pbs: _*)), col("node") === col("src"))
            .select(col("query_id"), col("dst").as("node"), col("dv"), col("dnrm"))
        }
      // duplicates of a (query, node) pair score IDENTICALLY (the
      // scorer is deterministic), so the per-round dedup exchanges
      // are fused into the beam cut: score everything, let the
      // DISTINCT-id top-k aggregate dedup inside its one exchange —
      // 1 shuffle per round where the dedup→union→dedup→topK chain
      // paid 3 (guide §2.4: remove shuffles outright)
      val newScored = score(expanded)
      // the metadata filter (the vector store's `where=` on the
      // serving path): the walk NAVIGATES through allowed nodes only
      // — applied to the whole candidate union each round, entry
      // points included from round 1 on
      val unioned = beamScored.select(col("query_id"), col("node"), col("sim"))
        .unionByName(newScored)
      val scoredRound = maskDeleted(
          candidateFilter.fold(unioned)(unioned.where), "node", delMask)
      lastScored = scoredRound
      if (step < steps) {
        val topB = scoredRound.groupBy(col("query_id"))
          .agg(graft.plans.TopKAgg.topKDistinct(col("sim"), col("node"), beam).as("top"))
          .select(col("query_id"), explode(col("top")).as("t"))
          .select(col("query_id"), col("t.id").as("node"), col("t.score").as("sim"))
        if (driverSide) {
          frontierRows = topB.collect()
          beamScored = spark.createDataFrame(
            java.util.Arrays.asList(frontierRows: _*), scoreSchema)
        } else beamScored = topB.localCheckpoint(true)
      }
    }
    edges.unpersist(false)
    // the final candidate union still carries duplicate (query, node)
    // rows (identical sims) — the DISTINCT-id rank dedups them inside
    // the one top-k exchange
    Similarity.rankTopK(
      lastScored.where(col("node") =!= col("query_id"))
        .select(col("query_id"), col("node").as("neighbor_id"), col("sim")), k,
      dedup = true)
  }

  /** Self-query serving: queries are the index's own lowest
    * `nQueries` ids, fetched from the ENTRIES table — the whole
    * search runs off the persisted layout. */
  def searchSelf(spark: SparkSession, dir: String, nQueries: Int = 5,
                 k: Int = 10, beam: Int = 32, steps: Int = 8,
                 entries: Int = 16, maxDriverFrontier: Int = 100000,
                 maxBroadcastFrontier: Long = 1000000L): DataFrame = {
    // the query frame below reads entries/ BEFORE search() runs its
    // own recovery — heal a torn reclaim swap first
    recoverCompaction(spark, dir)
    search(spark, dir,
      spark.read.parquet(s"$dir/entries")
        .select(col("id").cast("long").as("query_id"), col("v").as("qv"))
        .where(col("query_id") < nQueries),
      k, beam, steps, entries, maxDriverFrontier, maxBroadcastFrontier)
  }

  /** PQ-compressed serving over the SAME persisted layout (the
    * DiskANN memory model — see [[Similarity.graphPqTopK]] for the
    * algorithm): the beam walk reads ONLY (src, dst, dcodes, pb)
    * from the edge table — COLUMN PRUNING is the footprint win, the
    * pqM-codes payload instead of `dim` doubles both on disk and in
    * the pinned working set — scores by asymmetric distance against
    * the broadcast per-query LUT, and reranks the final candidate
    * set at full precision from the id-bucketed `nodes/` table (one
    * partition-pruned fetch). Bit-identical to the fused
    * [[Similarity.graphPqTopK]] on the same corpus and parameters. */
  def searchPq(spark: SparkSession, dir: String, queries: DataFrame,
               k: Int = 10, beam: Int = 32, steps: Int = 8, entries: Int = 16,
               maxDriverFrontier: Int = 100000,
               maxBroadcastFrontier: Long = 1000000L,
               candidateFilter: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    val meta = readMeta(spark, dir)
    val delMask = deleteMask(spark, dir) // the raw walk's delete contract, verbatim
    val subDim = meta.dim / meta.pqM
    val cb = spark.read.parquet(s"$dir/codebook")
      .select(col("code").cast("long"), col("sub").cast("int"), col("cv"))
    val edges = liveEdges(spark, dir, Some(meta))
      .select(col("src"), col("dst"), col("dcodes"), col("pb"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val q = queries
      .select(col("query_id").cast("long"), col("qv"), norm(col("qv")).as("qnrm"))
      .localCheckpoint(true)
    val nq = q.count()
    // per-query LUT FLATTENED to one array row per query (sub-major,
    // code-minor: index = sub·nCodes + code): ADC then scores as a
    // broadcast join + one codegen array fold instead of a
    // posexplode → LUT join → groupBy-sum re-shuffle of every
    // candidate each round (guide §2.3/§2.4 — the shuffle per round
    // carried candidates·pqM rows; now the only per-round exchange
    // is the beam cut). The decimal fold order is sub 0..pqM-1 —
    // decimal addition is exact, so the sum equals the groupBy form.
    val lut = Similarity
      .subVectors(q.select(col("query_id").as("id"), col("qv").as("v")),
        meta.pqM, subDim, "sv")
      .join(broadcast(cb), "sub")
      .select(col("id").as("query_id"), col("sub"), col("code"),
        round(dot(col("sv"), col("cv")), 6).as("lv"))
      .groupBy(col("query_id"))
      .agg(sort_array(collect_list(struct(col("sub"), col("code"), col("lv"))))
        .as("scl"))
      .select(col("query_id"), expr("transform(scl, x -> x.lv)").as("lutv"))
      .localCheckpoint(true) // nq rows, pqM·nCodes doubles each
    val scoreSchema = StructType(Seq(StructField("query_id", LongType),
      StructField("node", LongType), StructField("sim", DoubleType)))
    // nq-proportional sides are SIZE-ROUTED exactly as in [[search]]:
    // broadcast below `maxBroadcastFrontier` rows, sort-merge above
    def sized(df: DataFrame, rows: Long): DataFrame =
      if (rows <= maxBroadcastFrontier) broadcast(df) else df.hint("merge")
    val nCodes = meta.nCodes
    def adc(cand: DataFrame): DataFrame =
      cand.join(sized(lut, nq), Seq("query_id"))
        .select(col("query_id"), col("node"),
          expr(s"""cast(aggregate(
            transform(dcodes, (c, s) -> element_at(lutv,
              cast(s * $nCodes + c + 1 as int))),
            cast(0 as decimal(28,6)),
            (acc, v) -> cast(acc + cast(v as decimal(18,6)) as decimal(28,6)),
            acc -> acc) as double)""").as("sim"))
    // entry payloads: one model-sized fetch + frozen-codebook encode
    // (deterministic — identical to the stored codes)
    val ent = maskDeleted(spark.read.parquet(s"$dir/entries")
      .select(col("id").cast("long"), col("v"))
      .where(col("id") < math.min(entries, meta.entryCap)), "id", delMask)
    val entC = ent.join(pqCodesArr(ent, cb, meta.pqM, subDim), Seq("id"))
      .select(col("id").as("node"), col("codes").as("dcodes"))
    var beamScored: DataFrame = adc(
      q.select(col("query_id")).crossJoin(entC))
    val driverSide = nq * beam <= maxDriverFrontier && nq * entries <= maxDriverFrontier
    var frontierRows: Array[Row] = null
    // the frontier can never exceed nq·max(beam, entries) rows — an
    // ANALYTIC bound, so size-routing costs zero extra jobs (routing
    // on it errs only toward the shuffle branch this regime prefers)
    val frontierBound = nq * math.max(beam, entries)
    if (driverSide) {
      frontierRows = beamScored.collect()
      beamScored = spark.createDataFrame(
        java.util.Arrays.asList(frontierRows: _*), scoreSchema)
    } else beamScored = beamScored.localCheckpoint(true)
    var lastScored: DataFrame = beamScored
    (1 to steps).foreach { step =>
      val expanded =
        if (driverSide) {
          val nodes = frontierRows.map(_.getLong(1)).distinct
          val pbs = nodes.map(n => ((n % meta.pBuckets) + meta.pBuckets) % meta.pBuckets)
            .distinct
          edges.where(col("pb").isin(pbs: _*) && col("src").isin(nodes: _*))
            .join(broadcast(beamScored.select(col("query_id"), col("node"))),
              col("src") === col("node"))
            .select(col("query_id"), col("dst").as("node"), col("dcodes"))
        } else {
          // distributed frontier: pb-pruned scan (≤ pBuckets distinct
          // values, one cheap per-round aggregate) + size-routed probe
          // — see [[search]]
          val pbs = beamScored
            .select(pmod(col("node"), lit(meta.pBuckets.toLong)).as("fpb"))
            .distinct().collect().map(_.getLong(0))
          sized(beamScored.select(col("query_id"), col("node")), frontierBound)
            .join(edges.where(col("pb").isin(pbs: _*)), col("node") === col("src"))
            .select(col("query_id"), col("dst").as("node"), col("dcodes"))
        }
      // the metadata filter composes with the COMPRESSED walk the
      // same way as with the raw one (filtered-DiskANN over PQ): the
      // whole candidate union filters each round, entry points
      // included from round 1 on, so the ADC-guided beam navigates
      // the allowed subgraph
      // dedup is fused into the DISTINCT-id beam cut exactly as in
      // [[search]] — duplicates of a (query, node) pair carry the
      // same deterministic ADC sim, so one exchange replaces the
      // dedup→union→dedup→topK chain's three
      val unioned = beamScored.select(col("query_id"), col("node"), col("sim"))
        .unionByName(adc(expanded))
      val scoredRound = maskDeleted(
          candidateFilter.fold(unioned)(unioned.where), "node", delMask)
      lastScored = scoredRound
      if (step < steps) {
        val topB = scoredRound.groupBy(col("query_id"))
          .agg(graft.plans.TopKAgg.topKDistinct(col("sim"), col("node"), beam).as("top"))
          .select(col("query_id"), explode(col("top")).as("t"))
          .select(col("query_id"), col("t.id").as("node"), col("t.score").as("sim"))
        if (driverSide) {
          frontierRows = topB.collect()
          beamScored = spark.createDataFrame(
            java.util.Arrays.asList(frontierRows: _*), scoreSchema)
        } else beamScored = topB.localCheckpoint(true)
      }
    }
    edges.unpersist(false)
    // full-precision rerank from the id-bucketed node table — the
    // one fetch of raw vectors a compressed search pays
    val nodesTbl = spark.read.parquet(s"$dir/nodes")
      .select(col("id").cast("long"), col("v"), col("nrm"),
        col("nb").cast("long"))
    // one dedup at walk end (the per-round dedups are fused into the
    // beam cut): the rerank join must not multiply duplicate
    // candidate rows into the fetch
    val candKeys = lastScored.select(col("query_id"), col("node")).distinct()
    // the static-pruned fetch collects only the DISTINCT candidate
    // ids (never the scored rows — the final candidate union is
    // ~nq·beam·degree rows, NOT bounded by the frontier guard), and
    // only up to the same maxDriverFrontier budget: one id over and
    // the fetch degrades to the distributed scan, like the walk
    val fetch =
      if (driverSide) {
        val ids = lastScored.select(col("node")).distinct()
          .limit(maxDriverFrontier + 1).collect().map(_.getLong(0))
        if (ids.length > maxDriverFrontier) nodesTbl
        else {
          val nbs = ids.map(n => ((n % meta.pBuckets) + meta.pBuckets) % meta.pBuckets)
            .distinct
          nodesTbl.where(col("nb").isin(nbs: _*) && col("id").isin(ids: _*))
        }
      } else nodesTbl
    // candKeys is the final candidate union (~nq·beam·degree rows —
    // NOT frontier-bounded): broadcast only on the driver branch,
    // where nq·beam is under the guard; distributed serving shuffles
    val rr = fetch
      .join(if (driverSide) broadcast(candKeys) else candKeys.hint("merge"),
        col("node") === col("id"))
      .join(sized(q, nq), Seq("query_id"))
      .where(col("node") =!= col("query_id"))
      .select(col("query_id"), col("node").as("neighbor_id"),
        round(cosinePrenormed(dot(col("qv"), col("v")), col("qnrm"), col("nrm")), 6)
          .as("sim"))
    Similarity.rankTopK(rr, k)
  }

  /** Self-query PQ serving: queries from the entries table, the
    * whole search off the persisted layout. */
  def searchPqSelf(spark: SparkSession, dir: String, nQueries: Int = 5,
                   k: Int = 10, beam: Int = 32, steps: Int = 8,
                   entries: Int = 16, maxDriverFrontier: Int = 100000,
                   maxBroadcastFrontier: Long = 1000000L): DataFrame = {
    recoverCompaction(spark, dir) // see searchSelf: heal before the entries read
    searchPq(spark, dir,
      spark.read.parquet(s"$dir/entries")
        .select(col("id").cast("long").as("query_id"), col("v").as("qv"))
        .where(col("query_id") < nQueries),
      k, beam, steps, entries, maxDriverFrontier, maxBroadcastFrontier)
  }

  /** The DISTINCT live (src, dst) set — the spec surface for
    * rebuild-equivalence proofs. */
  private[graft] def liveEdgeSet(spark: SparkSession, dir: String): DataFrame =
    liveEdges(spark, dir).select(col("src"), col("dst")).distinct()

  /** Out-degree histogram of the DISTINCT live edge set, read from
    * the persisted bytes — the build's verifiable surface (a healthy
    * small-world graph concentrates around m·2+backbone; one giant
    * or empty degree bucket means the hash mis-fit). */
  def stats(spark: SparkSession, dir: String): DataFrame =
    liveEdges(spark, dir)
      .select(col("src"), col("dst")).distinct()
      .groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .groupBy(col("deg").as("out_degree"))
      .agg(count(lit(1)).as("n_nodes"))
      .orderBy(col("out_degree"))

  /** Compact the tombstone debt away WITHOUT retraining: rewrite
    * `edges/` to exactly the LIVE edge rows at generation 0, drop
    * `retired/`. The applied-increments chain in meta is PRESERVED —
    * replayed increments must keep skipping — and a post-compaction
    * increment's generation is still strictly above 0, so masking
    * stays correct. Buckets/entries/planes are untouched (this is
    * maintenance of the MASK, not the model; retraining remains a
    * scheduled [[buildAndSave]]).
    *
    * Crash contract (single maintainer): the live rows land fully in
    * a stage dir sealed with a marker BEFORE the live dir is
    * replaced, and retired/ is deleted WHILE edges/ is still absent
    * — order: seal stage → delete edges/ → delete retired/ → rename
    * stage→edges. Every crash inside that window leaves (no edges/,
    * sealed stage), which [[recoverCompaction]] heals by replaying
    * the same tail. The old order (rename before the retired/
    * delete) had an unhealable window: compacted gen-0 edges live
    * with stale tombstones still masking them — recovery can't fire
    * (edges/ exists) and the NEXT compaction would rewrite edges/
    * from the masked view, losing those lists permanently. */
  def compactTombstones(spark: SparkSession, dir: String): Boolean = {
    val hfs = fs(spark, dir)
    recoverCompaction(spark, dir)
    val gens = readMeta(spark, dir).appliedFps.size
    val del = deletedDf(spark, dir)
    val hasRetired = retiredDf(spark, dir, gens).exists(_.limit(1).count() > 0)
    if (!hasRetired && del.isEmpty) return false
    // the live edge set MINUS everything incident to a deleted node
    // (src, dst, or owner — the walk can never probe them again, and
    // a later increment must not resurrect them via buckets/)
    def minusDel(df: DataFrame, cols: Seq[String]): DataFrame =
      del.fold(df) { dl =>
        cols.zipWithIndex.foldLeft(df) { case (acc, (c, i)) =>
          acc.join(dl.select(col("id").as(s"__d$i")),
            col(c) === col(s"__d$i"), "left_anti")
        }
      }
    val stage = new Path(s"$dir/.gixcompact")
    hfs.delete(stage, true)
    minusDel(liveEdges(spark, dir), Seq("src", "dst", "owner"))
      .withColumn("gen", lit(0))
      .select(col("src"), col("dst"), col("dv"), col("dnrm"), col("dcodes"),
        col("kind"), col("owner"), col("gen"), col("pb"))
      .repartition(col("pb"))
      .write.mode("overwrite").partitionBy("pb").parquet(stage.toString)
    require(hfs.createNewFile(new Path(stage, "_GIX_SEALED")),
      s"could not seal compaction stage $stage")
    hfs.delete(new Path(s"$dir/edges"), true)
    hfs.delete(new Path(s"$dir/retired"), true)
    // tolerate a reader's recoverCompaction having healed the swap
    // concurrently: the committed state is what matters, not who
    // performed the rename
    if (!hfs.rename(stage, new Path(s"$dir/edges")))
      require(hfs.exists(new Path(s"$dir/edges")) && !hfs.exists(stage),
        s"could not swap compacted edges into $dir")
    // ── node-delete RECLAIM: entries (walk seeds), buckets (so a
    // later increment can never link to a dead node), nodes (the PQ
    // rerank fetch + the disk the delete promised back). Each swap
    // is staged+sealed and healable; deleted/ drops LAST, so every
    // crash point before it still serves correctly off the mask, and
    // a re-run completes the remainder idempotently. ──
    del.foreach { dl =>
      def reclaim(sub: String, partCol: Option[String]): Unit = {
        val src = new Path(s"$dir/$sub")
        if (!hfs.exists(src)) return
        val st = new Path(s"$dir/.gixdel-$sub")
        hfs.delete(st, true)
        val kept = spark.read.parquet(src.toString)
          .join(dl.select(col("id").as("__del")), col("id") === col("__del"), "left_anti")
          .drop("__del")
        val w = partCol.fold(kept.coalesce(1))(c => kept.repartition(col(c)))
          .write.mode("overwrite")
        partCol.fold(w)(c => w.partitionBy(c)).parquet(st.toString)
        require(hfs.createNewFile(new Path(st, "_GIX_SEALED")),
          s"could not seal reclaim stage $st")
        hfs.delete(src, true)
        if (!hfs.rename(st, src))
          require(hfs.exists(src) && !hfs.exists(st),
            s"could not swap reclaimed $sub into $dir")
      }
      reclaim("entries", None)
      reclaim("buckets", Some("tbl"))
      reclaim("nodes", Some("nb"))
      hfs.delete(new Path(s"$dir/deleted"), true)
    }
    true
  }

  /** Finish a compaction whose process died after the live-dir
    * delete: the sealed stage IS the live edge set. Replays the
    * commit tail in [[compactTombstones]] order — retired/ goes
    * while edges/ is still absent, so a crash DURING recovery lands
    * back in the same healable state. Called from
    * [[compactTombstones]] and [[liveEdges]]. */
  private def recoverCompaction(spark: SparkSession, dir: String): Unit = {
    val hfs = fs(spark, dir)
    val stage = new Path(s"$dir/.gixcompact")
    val edges = new Path(s"$dir/edges")
    if (!hfs.exists(edges) && hfs.exists(new Path(stage, "_GIX_SEALED"))) {
      hfs.delete(new Path(s"$dir/retired"), true)
      if (!hfs.rename(stage, edges))
        require(hfs.exists(edges) && !hfs.exists(stage),
          s"compaction recovery rename failed in $dir")
    }
    // heal a torn delete-reclaim swap the same way: a sealed stage
    // with its live dir absent IS the live dir. deleted/ still
    // exists at every such crash point, so serving stayed correct
    // throughout; the next compactTombstones call finishes the rest.
    Seq("entries", "buckets", "nodes").foreach { sub =>
      val st = new Path(s"$dir/.gixdel-$sub")
      val live = new Path(s"$dir/$sub")
      if (!hfs.exists(live) && hfs.exists(new Path(st, "_GIX_SEALED"))) {
        if (!hfs.rename(st, live))
          require(hfs.exists(live) && !hfs.exists(st),
            s"delete-reclaim recovery rename failed for $sub in $dir")
      }
    }
  }

  /** Ensure `dir` holds the index GROWN from an 80% base build (at
    * the capacity-sized hash for the FULL corpus) plus the 20%
    * increment — the maintenance-lifecycle state the compaction
    * serving entry consumes. Fingerprint-guarded like [[ensureBuilt]]
    * (base corpus fingerprint in meta), and [[appendIncremental]] is
    * idempotent per increment fingerprint, so a warm call does zero
    * corpus work. [[compactTombstones]] preserves BOTH marks
    * (corpus_fp and applied_fps survive compaction), so a compacted
    * dir stays fresh — the lifecycle can cycle grow→compact→grow
    * without ever re-paying the build. */
  def ensureGrown(emb: DataFrame, dir: String, pBuckets: Int = 8,
                  idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val spark = emb.sparkSession
    val n = emb.count()
    val bits = Similarity.autoBits(n)
    val base = emb.where(col(idCol) < n * 4 / 5)
    val inc = emb.where(col(idCol) >= n * 4 / 5)
    val fresh = fs(spark, dir).exists(new Path(s"$dir/meta")) &&
      (try readMeta(spark, dir).corpusFp == ZoneCache.corpusFingerprint(base)
       catch { case scala.util.control.NonFatal(_) => false })
    if (!fresh)
      buildAndSave(base, dir, nbits = bits, pBuckets = pBuckets,
        idCol = idCol, vecCol = vecCol)
    appendIncremental(inc, dir, idCol = idCol, vecCol = vecCol)
  }

  /** Incrementally add `newEmb` WITHOUT a rebuild, preserving
    * EXACT rebuild equivalence: new vectors hash into the FROZEN
    * buckets; every node sharing a bucket with a new vector — and
    * only those — gets its adjacency list recomputed against the
    * grown assignment (bit-equal to what a from-scratch build at the
    * frozen nbits would give it, see [[Similarity.localLists]]);
    * replaced lists are masked by tombstone, new lists and backbone
    * links append. Cost is O(affected·occupancy), never O(index).
    *
    * Crash/retry contract ([[AnnIndex.appendIncremental]] pattern):
    * every file this increment writes carries a name derived from
    * its id; a retry first sweeps leftovers of the crashed attempt,
    * and meta (the idempotence marker) commits LAST. Idempotent per
    * increment id — a replayed append is skipped. Single concurrent
    * maintainer assumed, as for every layout-maintenance op here. */
  def appendIncremental(newEmb: DataFrame, dir: String,
                        idCol: String = "vec_id", vecCol: String = "embedding",
                        incrementId: Option[String] = None): Boolean = {
    val spark = newEmb.sparkSession
    import spark.implicits._
    val meta = readMeta(spark, dir)
    val fp = incrementId.getOrElse(ZoneCache.corpusFingerprint(newEmb))
    if (meta.appliedFps.contains(fp)) return false
    val gen = meta.appliedFps.size + 1
    val fp8 = java.security.MessageDigest.getInstance("MD5")
      .digest(fp.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString
    val hfs = fs(spark, dir)
    // sweep any leftovers of a crashed attempt of THIS increment
    Seq("edges", "buckets", "nodes").foreach { sub =>
      val root = new Path(s"$dir/$sub")
      if (hfs.exists(root))
        hfs.listStatus(root).filter(_.isDirectory).foreach { d =>
          hfs.listStatus(d.getPath)
            .filter(_.getPath.getName.startsWith(s"inc-$fp8-"))
            .foreach(st => hfs.delete(st.getPath, false))
        }
    }
    val entriesRoot = new Path(s"$dir/entries")
    if (hfs.exists(entriesRoot))
      hfs.listStatus(entriesRoot)
        .filter(_.getPath.getName.startsWith(s"inc-$fp8-"))
        .foreach(st => hfs.delete(st.getPath, false))
    hfs.delete(new Path(s"$dir/retired/ret-$fp8"), true)

    val newAssign = probe("inc:newAssign")(Similarity
      .bucketAssign(newEmb, meta.nBits, meta.tables, meta.dim, idCol, vecCol)
      .localCheckpoint(true)) // increment-sized; hashed once
    val oldAssign = loadBuckets(spark, dir)
    val grown = oldAssign.unionByName(newAssign.select(
      col("id"), col("v"), col("nrm"), col("tbl"), col("bucket")))
    val affBuckets = newAssign.select(col("tbl"), col("bucket")).distinct()
    val affNodes = probe("inc:affNodes")(grown
      .join(broadcast(affBuckets), Seq("tbl", "bucket"), "leftsemi")
      .select(col("id")).distinct()
      .localCheckpoint(true)) // O(new·occupancy) ids
    // round 15 (guide §2.2): the increment is O(affected·occupancy)
    // by contract — size every downstream shuffle from the affected
    // set, not the session conf (same rationale as buildAndSave)
    val nAff = affNodes.count()
    graft.operators.LoopShuffle.sized(spark, nAff * math.max(1, meta.m)) { _ =>
    val srcSide = grown.join(broadcast(affNodes), Seq("id"), "leftsemi")
    // materialized once (round 14): consumed by endpointIds AND both
    // listEdges branches — the affected×occupancy re-scoring is the
    // increment's dominant compute and ran three times through the
    // lineage. O(affected·m) id pairs.
    val lists = probe("inc:lists")(Similarity.localLists(srcSide, grown, meta.m).localCheckpoint(true))
    val nodesGrown = grown.where(col("tbl") === 0)
      .select(col("id"), col("v"), col("nrm"))
    val newIds = newAssign.where(col("tbl") === 0).select(col("id"))
    // PQ payloads only for the nodes this increment's edges touch —
    // re-encoding against the FROZEN codebook reproduces build-time
    // codes exactly, so the cost stays O(affected), never O(index)
    val cb = spark.read.parquet(s"$dir/codebook")
      .select(col("code").cast("long"), col("sub").cast("int"), col("cv"))
    // no distinct: the left-semi probe below dedups by construction
    // (round 15 — one exchange fewer)
    val endpointIds = lists.select(col("src").as("id"))
      .unionByName(lists.select(col("dst").as("id")))
      .unionByName(newIds)
      .unionByName(newIds.where(col("id") > 0)
        .select(floor(col("id") / 2).cast("long").as("id")))
    val nodesNeeded = probe("inc:nodesNeeded")(nodesGrown.join(endpointIds, Seq("id"), "leftsemi")
      .localCheckpoint(true))
    val nodesC = nodesNeeded.join(
      pqCodesArr(nodesNeeded, cb, meta.pqM, meta.dim / meta.pqM), Seq("id"))
    // backbone src-existence gate: a new node's tree parent may have
    // been DELETED and reclaimed — treeEdges attaches only the dst
    // payload, so the (parent → new) direction would otherwise ride
    // in with the new node's vector and resurrect the dead src.
    // nodesC holds exactly the LIVE endpoints (grown ∩ endpoints,
    // increment-scale), so the semi-join is the existence oracle.
    val treeE = treeEdges(newIds, nodesC, gen)
      .join(nodesC.select(col("id").as("src")), Seq("src"), "leftsemi")
    val edgesNew = listEdges(lists, nodesC, gen)
      .unionByName(treeE)
      .withColumn("pb", pmod(col("src"), lit(meta.pBuckets.toLong)))

    def stageIn(df: DataFrame, destRoot: String, partCol: Option[String],
                sortCol: Option[org.apache.spark.sql.Column] = None): Unit = {
      val stage = new Path(s"$dir/.gixstage-$fp8-${destRoot.split('/').last}")
      // one file per partition dir (see buildAndSave) — an increment
      // should add O(partitions touched) objects, not tasks×dirs
      val staged0 = partCol.fold(df)(c => df.repartition(col(c)))
      val staged = sortCol.fold(staged0)(c => staged0.sortWithinPartitions(c))
      val w = staged.write.mode("overwrite")
      partCol.fold(w)(c => w.partitionBy(c)).parquet(stage.toString)
      var seq = 0
      def move(from: Path, to: Path): Unit = {
        hfs.mkdirs(to)
        hfs.listStatus(from).filter(_.getPath.getName.endsWith(".parquet"))
          .foreach { st =>
            require(hfs.rename(st.getPath,
              new Path(to, s"inc-$fp8-$seq.parquet")),
              s"move failed for increment file ${st.getPath}")
            seq += 1
          }
      }
      partCol match {
        case Some(_) =>
          hfs.listStatus(stage).filter(_.isDirectory).foreach { pd =>
            move(pd.getPath, new Path(destRoot, pd.getPath.getName))
          }
        case None => move(stage, new Path(destRoot))
      }
      hfs.delete(stage, true)
    }

    // incremental edge files cluster by src too (same read-path
    // row-group pruning as the build's edges write)
    probe("inc:stage-edges")(stageIn(edgesNew, s"$dir/edges", Some("pb"),
      sortCol = Some(col("src"))))
    probe("inc:stage-buckets")(stageIn(newAssign.select(col("id"), col("v"), col("nrm"), col("bucket"), col("tbl")),
      s"$dir/buckets", Some("tbl")))
    probe("inc:stage-nodes")(stageIn(newAssign.where(col("tbl") === 0)
      .select(col("id"), col("v"), col("nrm"))
      .withColumn("nb", pmod(col("id"), lit(meta.pBuckets.toLong))),
      s"$dir/nodes", Some("nb")))
    val newEntries = newAssign.where(col("tbl") === 0 && col("id") < meta.entryCap)
      .select(col("id"), col("v"), col("nrm"))
    probe("inc:entries")(if (newEntries.limit(1).count() > 0)
      stageIn(newEntries.coalesce(1), s"$dir/entries", None))
    // tombstone every recomputed owner (new owners are a no-op mask:
    // they have no earlier generations), then commit via meta
    probe("inc:retired+meta") {
      affNodes.select(col("id").as("owner"), lit(gen).as("before_gen"))
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/retired/ret-$fp8")
      writeMeta(spark, dir, meta.copy(appliedFps = meta.appliedFps :+ fp))
    }
    true
    }
  }
}
