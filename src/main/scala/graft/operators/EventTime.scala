package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.LongType

/** The one definition of the events-table time encoding. Driver testdata has
  * shipped `events.ts` two ways: parquet TIMESTAMP(NANOS) surfaced as
  * epoch-nanos LongType (spark.sql.legacy.parquet.nanosAsLong, see
  * GraftSession), and parquet timestamp[us] surfaced as TIMESTAMP_NTZ
  * (current drops). Both encode UTC wall-clock; every graft session pins
  * spark.sql.session.timeZone=UTC so the NTZ→timestamp cast below is exact
  * and matches the DuckDB oracle's tz-naive epoch_ms(ts). Every operator
  * touching `events.ts` converts through here so the encoding can never
  * drift between call sites. */
object EventTime {
  /** epoch-millis Column for `df`'s `ts`, resolved from the actual scan type. */
  def tsMs(df: DataFrame): Column = df.schema("ts").dataType match {
    case LongType => expr("ts div 1000000") // epoch-nanos → ms, exact integer division
    case _        => expr("unix_millis(cast(ts as timestamp))")
  }

  /** `df` plus an epoch-millis `ms` column derived from `ts`. */
  def withMs(df: DataFrame): DataFrame = df.withColumn("ms", tsMs(df))
}
