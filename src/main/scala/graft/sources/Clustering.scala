package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Z-order multi-column clustering for parquet layouts.
  *
  * A single-column sort makes row-group min/max stats selective for ONE
  * column; queries filtering the other column skip nothing. Sorting by the
  * Morton code of two keys clusters the file in both dimensions at once:
  * a 2-D box predicate then skips most row groups via plain parquet stats
  * pushdown — no index structure, no reader changes, works with every
  * engine that reads footers. The write costs one range-shuffle + sort
  * (paid once, amortized over every subsequent box query) — the same trade
  * as Bucketing for joins and MetricIndex for hash thresholds.
  *
  * At 100 TB: combine with partitionBy on a coarse column (date) and keep
  * default row-group sizes; locally the spec shrinks `parquet.block.size`
  * so skipping is observable on test-sized data.
  */
object Clustering {

  /** Morton sort key of two non-negative integer columns. */
  def zorderKey(a: Column, b: Column): Column =
    call_function("zorder2", a.cast("long"), b.cast("long"))

  /** Write `df` range-partitioned and sorted by zorder(a, b). */
  def writeZOrdered(df: DataFrame, path: String, a: Column, b: Column,
      numFiles: Int = 8, blockSize: Int = 128 * 1024 * 1024): Unit =
    df.withColumn("__z", zorderKey(a, b))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(SaveMode.Overwrite)
      .option("parquet.block.size", blockSize.toString)
      .parquet(path)
}
