package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Lakehouse IO layer.
  *
  * The reference lands scraped JSON blobs in an object store and
  * reads them back file-by-file on the driver
  * (airflow/dags/etl.py:52-81 — a driver-side loop over bucket
  * objects). Here the landing zone is read as a distributed JSON
  * scan with an explicit schema (no inference pass), and the
  * lakehouse zones are partitioned parquet — both scale with input
  * splits, no driver loop.
  */
object Sources {

  /** Schema of a scraped page (reference: scraper output JSON). */
  val RawPageSchema: StructType = StructType(Seq(
    StructField("url", StringType, nullable = true),
    StructField("title", StringType, nullable = true),
    StructField("content", StringType, nullable = true),
    StructField("author", StringType, nullable = true),
    StructField("date", StringType, nullable = true)))

  /** Raw-zone ingest: directory of JSON blobs → DataFrame, with the
    * source object name attached (reference stamps `source` from the
    * object key; here from the file path). */
  def rawJsonIngest(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(RawPageSchema).json(path)
      .withColumn("source", input_file_name())

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)

  /** Zone write: parquet partitioned by the given columns (the
    * lakehouse `zone/date=.../` layout). Partition pruning then makes
    * date-ranged reads skip files entirely. */
  def writeZone(df: DataFrame, path: String, partitionCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).parquet(path)
  }

  def readZone(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** ORC zone round-trip — the other columnar format Spark ships
    * natively (vectorized reader, predicate pushdown, same
    * partition-directory layout as the parquet zones). Useful when a
    * consumer stack (Hive, Trino) prefers ORC. */
  def writeOrcZone(df: DataFrame, path: String,
                   partitionCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).orc(path)
  }

  def readOrcZone(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Small-file compaction: rewrite a zone into ~`targetRows`-row
    * files. Streaming ingest produces many tiny files; scans then pay
    * per-file open/footer cost and lose row-group parallelism. The
    * rewrite is one narrow read + round-robin repartition to the
    * target file count. Output goes to a NEW path (atomic swap is the
    * caller's move — rewriting a path while reading it is not). */
  def compactZone(spark: SparkSession, inPath: String, outPath: String,
                  targetRows: Long = 1000000L): Unit = {
    val df = spark.read.parquet(inPath)
    val n = df.count()
    val files = math.max(1L, (n + targetRows - 1) / targetRows).toInt
    df.repartition(files).write.mode("overwrite").parquet(outPath)
  }

  /** Compaction plan + result summary (file counts are what specs and
    * operators audit; sizes are bytes). */
  final case class CompactStats(nKept: Int, nRewritten: Int, nBins: Int)

  /** OPTIMIZE-style bin-packing compaction: files already at or above
    * `keepBytes` are carried over byte-for-byte (no decode/re-encode
    * — rewriting well-sized files is wasted IO and churns their
    * footer stats); the small-file tail is read once and repacked
    * into ⌈Σsize / targetBytes⌉ bins. Planning is a metadata-only
    * file listing on the driver (as in delta/iceberg OPTIMIZE); the
    * rewrite itself is one distributed job, NOT a per-bin loop.
    * Output goes to a NEW path — atomic swap is the caller's move. */
  def compactZoneBinPacked(spark: SparkSession, inPath: String, outPath: String,
                           targetBytes: Long = 128L * 1024 * 1024,
                           keepBytes: Long = 64L * 1024 * 1024): CompactStats = {
    import org.apache.hadoop.fs.{FileUtil, Path}
    val conf = spark.sparkContext.hadoopConfiguration
    val in = new Path(inPath)
    val fs = in.getFileSystem(conf)
    val files = fs.listStatus(in).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    val (keep, small) = files.partition(_.getLen >= keepBytes)
    val out = new Path(outPath)
    fs.mkdirs(out)
    val nBins =
      if (small.isEmpty) 0
      else {
        val totalSmall = small.map(_.getLen).sum
        val bins = math.max(1L, (totalSmall + targetBytes - 1) / targetBytes).toInt
        spark.read.parquet(small.map(_.getPath.toString): _*)
          .repartition(bins)
          .write.mode("append").parquet(outPath)
        bins
      }
    // carry-over AFTER the rewrite job: parquet append never collides
    // with the keep- prefix, and a failed rewrite leaves no stale mix
    keep.foreach { s =>
      FileUtil.copy(fs, s.getPath, fs,
        new Path(out, s"keep-${s.getPath.getName}"), false, conf)
    }
    fs.create(new Path(out, "_SUCCESS")).close()
    CompactStats(keep.size, small.size, nBins)
  }

  /** Range-clustered write: repartitionByRange + in-partition sort on
    * the cluster keys, so every output file covers a disjoint key
    * range. Parquet footers then carry tight min/max stats and a
    * key-ranged scan prunes whole files — the data-skipping layout
    * (Z-order's 1-D special case) delta/iceberg users OPTIMIZE for. */
  def writeClusteredZone(df: DataFrame, path: String, clusterCols: Seq[String],
                         numFiles: Int = 8): Unit =
    df.repartitionByRange(numFiles, clusterCols.map(col): _*)
      .sortWithinPartitions(clusterCols.map(col): _*)
      .write.mode("overwrite").parquet(path)
}
