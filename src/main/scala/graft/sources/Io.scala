package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Ingest/egress surface: the Spark re-expression of the reference's
  * storage layer (reference: src/storage/paging.rs — paged binary table
  * files + WAL; replaced wholesale by columnar parquet + commit protocol).
  *
  * Scale notes (100 TB):
  *  - writes partition by a low-cardinality column when given one, so
  *    readers get partition pruning for free;
  *  - `insertRows` is the INSERT-VALUES analog (reference:
  *    src/constructs/statements.rs InsertStatement): an append write of a
  *    driver-local batch — small by definition; bulk data arrives via
  *    `readCsv`/`readJson`/parquet, never via INSERT;
  *  - explicit schemas everywhere: schema inference reads the data twice
  *    and guesses — both wrong at scale.
  */
object Io {

  /** CSV read with the quote/escape conventions pinned to what Spark's
    * own CSV writer emits, and multiLine on: a quoted field containing an
    * embedded newline is ONE record (RFC 4180), not two — without this
    * the default line-splitting reader silently breaks write→read
    * round-trip fidelity on any corpus whose text has newlines.
    * multiLine's cost is real (files parse whole, not split-parallel), so
    * at scale CSV is an INGEST format: read once, convert to parquet.
    * quote/escape stay at the univocity defaults — the same defaults the
    * writer uses, which is what makes the round-trip bit-exact. */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true): DataFrame =
    spark.read.schema(schema)
      .option("header", header.toString)
      .option("multiLine", "true")
      .csv(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Parquet write, optionally hive-partitioned by `partitionCols`. */
  def writeParquet(df: DataFrame, path: String,
      partitionCols: Seq[String] = Nil,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w: DataFrameWriter[Row] = df.write.mode(mode)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(path)
  }

  /** INSERT INTO … VALUES analog: append a driver-local row batch to a
    * parquet table with the given schema. */
  def insertRows(spark: SparkSession, path: String, schema: StructType,
      rows: Seq[Row]): Unit = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, schema)
      .write.mode(SaveMode.Append).parquet(path)
  }

  /** Raw text ingestion: one document per line (the wire format raw web
    * and log corpora actually arrive in, before any columnar conversion).
    * Ids are CONTENT hashes, not positions: line numbers are not stable
    * under distributed splits or re-partitioning, while xxhash64(text)
    * is deterministic, engine-portable, and is the key exact dedup (C1)
    * groups on anyway — byte-identical lines collapse to one id, which is
    * the behavior every downstream dedup step assumes. */
  def readTextLines(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, length, xxhash64}
    spark.read.text(path)
      .select(xxhash64(col("value")).as("doc_id"), col("value").as("text"),
        length(col("value")).cast("long").as("n_chars"))
  }

  /** ORC write/read: the second columnar interchange format large
    * deployments actually encounter (Hive-era lakes hand graft ORC tables;
    * both formats keep predicate pushdown, column pruning, and stats-based
    * row-group skipping — the scan-side properties every operator here
    * relies on). Same partitioning discipline as parquet. */
  def writeOrc(df: DataFrame, path: String,
      partitionCols: Seq[String] = Nil,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w: DataFrameWriter[Row] = df.write.mode(mode)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .orc(path)
  }

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Schema-evolution read: unions the column sets of every parquet file
    * under `path` (columns absent in older files surface as NULL). The
    * append-only-table reality at 100 TB: yesterday's files predate today's
    * added column, and rewriting 100 TB to backfill is not an option.
    * mergeSchema costs a footer read per file — use it on evolving tables,
    * not as the default (the default read trusts one footer). */
  def readEvolved(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** Schema-drift report between two table generations (e.g. yesterday's
    * and today's ingest directory): columns added, removed, or
    * type-changed — the contract check run BEFORE a pipeline consumes a
    * new drop, catching upstream producer changes while they are still
    * one directory old. Reads footers only (two schema fetches), no data
    * scan at any table size; the result is a tiny local relation. */
  def schemaDiff(spark: SparkSession, oldPath: String, newPath: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types.{StringType, StructField}
    val o = spark.read.parquet(oldPath).schema.map(f => f.name -> f.dataType.sql).toMap
    val n = spark.read.parquet(newPath).schema.map(f => f.name -> f.dataType.sql).toMap
    val rows =
      (n.keySet -- o.keySet).toSeq.sorted.map(c => Row(c, "added", null, n(c))) ++
      (o.keySet -- n.keySet).toSeq.sorted.map(c => Row(c, "removed", o(c), null)) ++
      (o.keySet & n.keySet).toSeq.sorted.collect {
        case c if o(c) != n(c) => Row(c, "type_changed", o(c), n(c))
      }
    spark.createDataFrame(rows.asJava, StructType(Seq(
      StructField("column_name", StringType, nullable = false),
      StructField("change", StringType, nullable = false),
      StructField("old_type", StringType, nullable = true),
      StructField("new_type", StringType, nullable = true))))
  }

  /** Small-file compaction: rewrite a parquet directory into
    * ceil(bytes / targetBytes) files. Incremental ingest (streaming sinks,
    * frequent INSERT batches) accretes thousands of KB-scale files whose
    * per-file open/footer cost dominates scans and whose row groups are too
    * small to skip on; periodic compaction is how a 100 TB table keeps
    * scan throughput. Sizing reads the FILES' on-disk footprint (no data
    * scan); the rewrite is one pass. Returns the new file count. */
  def compact(spark: SparkSession, path: String,
      targetBytes: Long = 128L * 1024 * 1024): Int = {
    val hadoopPath = new org.apache.hadoop.fs.Path(path)
    val fs = hadoopPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(hadoopPath).getLength
    val nFiles = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    val tmp = new org.apache.hadoop.fs.Path(path + "_compacting")
    spark.read.parquet(path).repartition(nFiles)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    // swap: point the table path at the compacted files. On a real
    // deployment this swap is the table-format commit (Delta/Iceberg); on
    // raw directories it is rename-based and briefly non-atomic.
    fs.delete(hadoopPath, true)
    require(fs.rename(tmp, hadoopPath), s"compaction rename failed for $path")
    nFiles
  }
}
