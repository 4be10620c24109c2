package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, BoundReference, Cast, Expression, Literal, Predicate}
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** A [[FileIndex]] over a Delta snapshot's add-file list — the
  * single-relation read path for (possibly partitioned) Delta tables.
  *
  * Why not one-scan-per-partition-group + union: a real lakehouse
  * table has thousands of partitions, and an O(#partitions)-node plan
  * blows up driver-side planning before an executor does any work.
  * Why not `basePath` directory discovery: Delta add-file paths are
  * not required to be hive-style (the round-4 delta-rs fixture lands
  * files at the table root with partition values only in the log),
  * and discovery re-lists the filesystem the log already describes.
  *
  * This index is the standard native-reader design (Delta Lake's own
  * Spark reader exposes the transaction log through exactly this
  * interface): file paths, sizes and partition values all come from
  * the log, so planning performs ZERO filesystem listing RPCs; files
  * are grouped by partition value into one [[PartitionDirectory]]
  * each, and `listFiles` evaluates the pushed partition predicates
  * against those rows — partition pruning happens at planning time
  * and the whole table is ONE `FileSourceScan` relation regardless of
  * partition count.
  *
  * Partition values arrive as the log's string map and are cast to
  * the declared partition schema types here (same coercion the
  * writer's directory-name round trip would give), `null`/absent maps
  * to SQL NULL.
  */
private[sources] class DeltaFileIndex(
    spark: SparkSession,
    table: Path,
    override val partitionSchema: StructType,
    addFiles: Seq[(Path, Long, Long, Map[String, String])])
  extends FileIndex {

  private def castPartValue(raw: Option[String], dt: org.apache.spark.sql.types.DataType): Any =
    raw match {
      case None | Some(null) => null
      case Some(s) =>
        Cast(Literal(UTF8String.fromString(s), StringType), dt, Option("UTC")).eval(null)
    }

  /** One directory entry per distinct partition-value tuple; file
    * statuses are fabricated from log metadata (no FS calls). */
  private val dirs: Seq[PartitionDirectory] = {
    addFiles
      .groupBy(_._4)
      .iterator
      .map { case (pv, files) =>
        val values = InternalRow.fromSeq(
          partitionSchema.map(f => castPartValue(pv.get(f.name), f.dataType)))
        val statuses = files.map { case (p, size, modTime, _) =>
          new FileStatus(size, false, 1, 128L * 1024 * 1024, modTime, p)
        }
        PartitionDirectory(values, statuses.toArray)
      }
      .toSeq
  }

  override def rootPaths: Seq[Path] = Seq(table)

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    if (partitionFilters.isEmpty || partitionSchema.isEmpty) dirs
    else {
      val resolver = spark.sessionState.conf.resolver
      val bound = partitionFilters.reduce(And).transform {
        case a: AttributeReference =>
          val idx = partitionSchema.fieldNames.indexWhere(n => resolver(n, a.name))
          require(idx >= 0, s"partition filter references non-partition column ${a.name}")
          BoundReference(idx, partitionSchema(idx).dataType, nullable = true)
      }
      val predicate = Predicate.create(bound)
      predicate.initialize(0)
      dirs.filter(d => predicate.eval(d.values))
    }
  }

  override def inputFiles: Array[String] = addFiles.map(_._1.toString).toArray

  override def refresh(): Unit = ()

  override def sizeInBytes: Long = addFiles.map(_._2).sum
}
