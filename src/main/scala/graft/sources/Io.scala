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

  def readCsv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true): DataFrame =
    spark.read.schema(schema).option("header", header.toString).csv(path)

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
}
