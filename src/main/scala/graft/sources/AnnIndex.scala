package graft.sources

import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted ANN index — the index-build / index-serve split the
  * reference gets from its vector store's on-disk persistence
  * (/root/reference/README.md:25,111: Chroma persists its index and
  * serves queries from it). Graft's equivalent is a parquet layout
  * of the IVF-PQ structures, so index BUILD (one heavy corpus job)
  * and QUERY (many light jobs) run as separate applications:
  *
  *   layout/
  *     centroids/   (cell, cv array<double>, cnrm)   — nCells rows
  *     codebooks/   (code, sub, cv array<double>)    — nCodes·m rows
  *     codes/       cell=N/ (id, sub, code)          — the corpus,
  *                  PARTITIONED BY the IVF cell
  *     meta/        (n_cells, n_codes, m)            — one row
  *
  * Partitioning `codes` by cell is the serving-path design: a query
  * touches nprobe cells, and the broadcast probe join on `cell`
  * dynamic-partition-prunes the scan to those directories — at
  * billion-vector scale the query reads nprobe/nCells of the index,
  * never the corpus. Centroids and codebooks are model-sized
  * (KBs) and broadcast at query time.
  *
  * Loaded structures are cast back to the build-side types
  * (partition-column directory values read back as strings/ints
  * otherwise), so `load(save(build(x)))` is bit-identical to the
  * fused in-memory path — pinned by AnnIndexSpec.
  */
object AnnIndex {

  final case class Loaded(centroids: DataFrame, codebooks: DataFrame,
                          codes: DataFrame, nCells: Int, nCodes: Int, m: Int)

  /** Metadata-only fingerprint of the corpus behind `emb` — see
    * [[ZoneCache.corpusFingerprint]]. */
  private[graft] def corpusFingerprint(emb: DataFrame): String =
    ZoneCache.corpusFingerprint(emb)

  /** Build the IVF-PQ structures over `emb` and persist them. */
  def buildAndSave(emb: DataFrame, dir: String,
                   nCells: Int = 16, m: Int = 8, nCodes: Int = 16,
                   idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val (cents, cb, codes) = Similarity.ivfpqBuild(emb, nCells, m, nCodes, idCol, vecCol)
    cents.write.mode("overwrite").parquet(s"$dir/centroids")
    cb.write.mode("overwrite").parquet(s"$dir/codebooks")
    codes.write.mode("overwrite").partitionBy("cell").parquet(s"$dir/codes")
    val spark = emb.sparkSession
    import spark.implicits._
    Seq((nCells, nCodes, m, corpusFingerprint(emb)))
      .toDF("n_cells", "n_codes", "m", "corpus_fp")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  /** Build only if the persisted layout is absent OR stale — the
    * serving path's guard, so index-build cost never silently rides a
    * query that is supposed to measure serving alone. Staleness is
    * decided by the corpus fingerprint stamped into `meta` at build
    * time: a regenerated corpus at the same path (new files, new
    * mtimes) no longer serves a stale index. */
  def ensureBuilt(emb: DataFrame, dir: String,
                  nCells: Int = 16, m: Int = 8, nCodes: Int = 16,
                  idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val spark = emb.sparkSession
    val p = new org.apache.hadoop.fs.Path(s"$dir/meta")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val fresh = fs.exists(p) && {
      val meta = spark.read.parquet(s"$dir/meta")
      meta.columns.contains("corpus_fp") &&
        meta.head().getAs[String]("corpus_fp") == corpusFingerprint(emb)
    }
    if (!fresh) buildAndSave(emb, dir, nCells, m, nCodes, idCol, vecCol)
  }

  /** Append NEW vectors into the persisted layout WITHOUT a rebuild —
    * index maintenance at serving scale: centroids and codebooks stay
    * FROZEN (retraining is a scheduled rebuild, the standard IVF
    * contract), the new vectors encode against them in one map-side
    * pass (models broadcast), and their code rows append into the
    * cell partitions — cost O(new vectors), never O(index). The
    * serving path sees them immediately (same cell-partitioned scan,
    * DPP intact). Idempotent per increment: the increment's id is
    * recorded in meta's applied chain, and a replayed append
    * (crash-retry, re-run notebook) is SKIPPED. The default id is
    * the increment's FILE fingerprint — right when every increment
    * is a fresh file drop (the crawl pattern); pass `incrementId`
    * explicitly when increments are views carved from shared files
    * (file fingerprints would collide and skip real work). */
  def appendIncremental(newEmb: DataFrame, dir: String,
                        idCol: String = "vec_id", vecCol: String = "embedding",
                        incrementId: Option[String] = None): Boolean = {
    val spark = newEmb.sparkSession
    import spark.implicits._
    val fp = incrementId.getOrElse(corpusFingerprint(newEmb))
    val meta = spark.read.parquet(s"$dir/meta").head()
    val applied: Seq[String] =
      if (meta.schema.fieldNames.contains("applied_fps"))
        Option(meta.getAs[String]("applied_fps")).map(_.split(",").toSeq).getOrElse(Nil)
      else Nil
    if (applied.contains(fp)) false
    else {
      val ix = load(spark, dir)
      // crash safety: a retry after a crash between the data landing
      // and the meta update must not leave DUPLICATE code rows
      // (ADC scoring would double-count them). Every file of this
      // increment carries a name derived from its id; the retry
      // sweeps leftovers of the crashed attempt before moving fresh
      // ones, so the (data, meta) pair is effectively atomic.
      val fp8 = java.security.MessageDigest.getInstance("MD5")
        .digest(fp.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString
      val codesRoot = new org.apache.hadoop.fs.Path(s"$dir/codes")
      val fs = codesRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(codesRoot).filter(_.isDirectory).foreach { cellDir =>
        fs.listStatus(cellDir.getPath)
          .filter(_.getPath.getName.startsWith(s"inc-$fp8-"))
          .foreach(st => fs.delete(st.getPath, false))
      }
      val stage = new org.apache.hadoop.fs.Path(s"$dir/.incstage-$fp8")
      Similarity.ivfpqEncode(newEmb, ix.centroids, ix.codebooks, ix.m, idCol, vecCol)
        .write.mode("overwrite").partitionBy("cell").parquet(stage.toString)
      var seq = 0
      fs.listStatus(stage).filter(_.isDirectory).foreach { cellDir =>
        val dstDir = new org.apache.hadoop.fs.Path(codesRoot, cellDir.getPath.getName)
        fs.mkdirs(dstDir)
        fs.listStatus(cellDir.getPath)
          .filter(_.getPath.getName.endsWith(".parquet")).foreach { st =>
            require(fs.rename(st.getPath,
              new org.apache.hadoop.fs.Path(dstDir, s"inc-$fp8-$seq.parquet")),
              s"move failed for increment file ${st.getPath}")
            seq += 1
          }
      }
      fs.delete(stage, true)
      Seq((ix.nCells, ix.nCodes, ix.m, meta.getAs[String]("corpus_fp"),
        (applied :+ fp).mkString(",")))
        .toDF("n_cells", "n_codes", "m", "corpus_fp", "applied_fps")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
      true
    }
  }

  /** Per-cell summary of a persisted index, read back from the SAVED
    * layout (not the in-memory build): distinct vectors, code rows,
    * and distinct codes per IVF cell. This is the build step's
    * verifiable surface — cell balance is the number an operator
    * actually watches after an index build (one empty or giant cell
    * means the coarse quantizer is mis-fit), and reading it from disk
    * proves the persisted bytes, not the plan that produced them. */
  def stats(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/codes")
      .select(col("id").cast("long"), col("cell").cast("long"), col("code").cast("long"))
      .groupBy(col("cell"))
      .agg(countDistinct(col("id")).as("n_vecs"),
        count(lit(1)).as("n_rows"),
        countDistinct(col("code")).as("n_codes"))
      .orderBy(col("cell"))

  /** Load a persisted index; column types restored to the build
    * shapes (`cell` comes back from directory names). */
  def load(spark: SparkSession, dir: String): Loaded = {
    val meta = spark.read.parquet(s"$dir/meta").head()
    val cents = spark.read.parquet(s"$dir/centroids")
      .select(col("cell").cast("long"), col("cv"), col("cnrm"))
    val cb = spark.read.parquet(s"$dir/codebooks")
      .select(col("code").cast("long"), col("sub").cast("int"), col("cv"))
    val codes = spark.read.parquet(s"$dir/codes")
      .select(col("id").cast("long"), col("cell").cast("long"),
        col("sub").cast("int"), col("code").cast("long"))
    Loaded(cents, cb, codes,
      meta.getAs[Int]("n_cells"), meta.getAs[Int]("n_codes"), meta.getAs[Int]("m"))
  }

  /** Query a persisted index: load + ADC scoring over the probed
    * cells only. Bit-identical to `Similarity.ivfpqTopK` on the
    * same corpus and parameters. */
  def query(spark: SparkSession, dir: String, queries: DataFrame,
            nQueries: Int = 5, k: Int = 10, nprobe: Int = 4,
            idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val ix = load(spark, dir)
    Similarity.ivfpqQuery(queries, ix.centroids, ix.codebooks, ix.codes,
      nQueries, k, nprobe, ix.m, idCol, vecCol)
  }
}
