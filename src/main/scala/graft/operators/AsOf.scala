package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** As-of (time-travel) join: for each left row, the most recent right row
  * with the same key at-or-before the left row's time — the temporal
  * operator Spark lacks as a built-in.
  *
  * Spark-first design: instead of a per-row range join (O(n·m) candidate
  * blowup, no pushdown), tag-and-union both sides, shuffle ONCE on the
  * key, and run a `last(_, ignoreNulls)` running window ordered by
  * (time, side) — right rows sort before left rows at equal timestamps, so
  * `t_left >= t_right` ties match. Cost: one shuffle + one sort per key
  * partition, linear output — survives 100 TB where a range join dies.
  * Skewed keys are split by AQE; the window itself is streaming (running
  * frame), so no per-key buffering beyond the sort.
  */
object AsOf {

  /** Generic as-of join: left and right share `key`; `leftTime`/`rightTime`
    * are epoch-comparable; right columns in `carry` are propagated.
    *
    * The carried columns travel as ONE struct through a single
    * `last(ignoreNulls)` — carrying them independently would stitch fields
    * from different right rows together whenever the matched row holds a
    * NULL in one carried column (ignoreNulls would skip just that field
    * and fall back to an older row's value). The struct is non-null for
    * every right row even when its fields are null, so row integrity — and
    * parity with a true ASOF join — is preserved. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, carry: Seq[String]): DataFrame = {
    val l = left.withColumn("__t", col(leftTime)).withColumn("__side", lit(1))
    val r = right.withColumn("__t", col(rightTime)).withColumn("__side", lit(0))
    val lCols = left.columns
    val carryType = org.apache.spark.sql.types.StructType(
      carry.map(c => right.schema(c).copy(name = c)))
    val union = l.select(
      col("__t") :: col("__side") :: col(key).as("__k") ::
        (lCols.filterNot(_ == key).map(c => col(c)).toList :+
          lit(null).cast(carryType).as("__r")): _*)
      .unionByName(r.select(
        col("__t") :: col("__side") :: col(key).as("__k") ::
          (lCols.filterNot(_ == key).map(c => lit(null).cast(left.schema(c).dataType).as(c)).toList :+
            struct(carry.map(col): _*).as("__r")): _*))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    union
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(
        col("__k").as(key) ::
          lCols.filterNot(_ == key).map(c => col(c)).toList ++
          carry.map(c => col(s"__asof.$c").as(s"asof_$c")): _*)
  }

  /** For each click, the user's most recent purchase at-or-before it. */
  private def asofClickPurchase(s: SparkSession, d: String): DataFrame = {
    val ev = EventTime.withMs(Tables.events(s, d))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ms").as("click_ms"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ms").as("purchase_ms"), col("value").as("purchase_value"))
    asofJoin(clicks, purchases, "user_id", "click_ms", "purchase_ms",
      Seq("purchase_ms", "purchase_value"))
  }

  /** As-of join with a match TOLERANCE (the feature-store variant): a
    * match older than `ToleranceMs` counts as no match — a one-hour-stale
    * purchase must not silently become a click's feature. The tolerance
    * is a post-condition nulling out stale matches, so the one-shuffle
    * union-window core (and its 100 TB shape) is unchanged; both carried
    * fields null together, preserving the torn-row guarantee. */
  private val ToleranceMs = 3600000L

  private def asofTolerance(s: SparkSession, d: String): DataFrame = {
    val base = asofClickPurchase(s, d)
    val fresh = col("asof_purchase_ms").isNotNull &&
      col("click_ms") - col("asof_purchase_ms") <= ToleranceMs
    base.select(
      col("user_id"), col("click_id"), col("click_ms"),
      when(fresh, col("asof_purchase_ms")).as("asof_purchase_ms"),
      when(fresh, col("asof_purchase_value")).as("asof_purchase_value"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_asof_join" -> asofClickPurchase _,
    "q_asof_tolerance" -> asofTolerance _
  )

  val oracles: Map[String, String] = Map(
    "q_asof_join" ->
      """WITH e AS (
        | SELECT event_id, user_id, epoch_ms(ts) AS ms, event_type, value FROM events),
        |c AS (SELECT user_id, event_id AS click_id, ms AS click_ms FROM e
        |      WHERE event_type = 'click'),
        |p AS (SELECT user_id, ms AS purchase_ms, value AS purchase_value FROM e
        |      WHERE event_type = 'purchase')
        |SELECT c.user_id, c.click_id, c.click_ms,
        |       p.purchase_ms AS asof_purchase_ms,
        |       p.purchase_value AS asof_purchase_value
        |FROM c ASOF LEFT JOIN p
        |  ON c.user_id = p.user_id AND c.click_ms >= p.purchase_ms""".stripMargin,
    "q_asof_tolerance" ->
      """WITH e AS (
        | SELECT event_id, user_id, epoch_ms(ts) AS ms, event_type, value FROM events),
        |c AS (SELECT user_id, event_id AS click_id, ms AS click_ms FROM e
        |      WHERE event_type = 'click'),
        |p AS (SELECT user_id, ms AS purchase_ms, value AS purchase_value FROM e
        |      WHERE event_type = 'purchase'),
        |j AS (
        | SELECT c.user_id, c.click_id, c.click_ms,
        |        p.purchase_ms, p.purchase_value
        | FROM c ASOF LEFT JOIN p
        |   ON c.user_id = p.user_id AND c.click_ms >= p.purchase_ms)
        |SELECT user_id, click_id, click_ms,
        | CASE WHEN click_ms - purchase_ms <= 3600000 THEN purchase_ms END
        |   AS asof_purchase_ms,
        | CASE WHEN click_ms - purchase_ms <= 3600000 THEN purchase_value END
        |   AS asof_purchase_value
        |FROM j""".stripMargin
  )
}
