package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/** The one definition of the events-table time encoding: parquet
  * TIMESTAMP(NANOS) read as epoch-nanos LongType (nanosAsLong, see
  * GraftSession) → epoch-millis via exact integer division. Every operator
  * touching `events.ts` converts through here so the encoding can never
  * drift between call sites. */
object EventTime {
  val tsMs: Column = expr("ts div 1000000")
}
