package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Mathematical invariants of the round-7 distribution analytics — the
  * properties the value-replay oracle can't state: entropy/JS bounds that
  * hold for ANY input, frame-containment for the rolling window, and the
  * internal consistency of the skew profile's percentiles. */
class TextStatsSpec extends SparkTestBase {

  test("token entropy is bounded by ln(n_distinct) and non-negative") {
    val rows = SparkEntry.queries("q_token_entropy")(spark, sfDir)
      .select(col("entropy"), col("n_distinct"), col("n_tokens")).collect()
    assert(rows.nonEmpty)
    rows.foreach { case Row(h: Double, nd: Long, nt: Long) =>
      // the shipped value is on a 4-dp grid: allow the half-step
      assert(h >= -5.1e-5, s"negative entropy $h")
      assert(h <= math.log(nd.toDouble) + 5.1e-5,
        s"entropy $h exceeds ln($nd) upper bound")
      assert(nd <= nt)
    }
  }

  test("JS divergence is symmetric-bounded in [0, ln 2] for every source pair") {
    val rows = SparkEntry.queries("q_js_div")(spark, sfDir)
      .select(col("js")).collect()
    assert(rows.nonEmpty)
    rows.foreach { case Row(js: Double) =>
      assert(js >= -1e-9 && js <= math.log(2.0) + 1e-9, s"JS $js out of [0, ln2]")
    }
  }

  test("PMI card: count-descending selection, margins consistent") {
    val rows = SparkEntry.queries("q_pmi_bigrams")(spark, sfDir)
      .orderBy(col("cb").desc, col("w1"), col("w2")).collect()
    assert(rows.length == 20)
    val counts = rows.map(_.getAs[Long]("cb"))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      "top-20 not count-ordered")
    // PMI of a bigram can never exceed ln(N / cb) (since c1,c2 >= cb)
    val n = SparkEntry.queries("q_pmi_bigrams")(spark, sfDir).count() // force plan reuse
    assert(n == 20)
  }

  test("key-skew profile: percentiles ordered, total matches the event count") {
    val r = SparkEntry.queries("q_key_skew")(spark, sfDir).head()
    val total = r.getAs[Long]("total")
    val maxN = r.getAs[Long]("max_n")
    val p50 = r.getAs[Double]("p50_n"); val p99 = r.getAs[Double]("p99_n")
    assert(total == graft.sources.Tables.events(spark, sfDir).count())
    assert(p50 <= p99 + 1e-9 && p99 <= maxN + 1e-9)
    val share = r.getAs[Double]("max_share")
    assert(share > 0 && share <= 1.0)
  }

  test("transition matrix rows are probability distributions") {
    val rows = SparkEntry.queries("q_transitions")(spark, sfDir)
      .groupBy(col("from_type"))
      .agg(sum(col("p")).as("row_p"), sum(col("n")).as("row_n")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("row_p") - 1.0) < 1e-9,
        s"row ${r.get(0)} probabilities sum to ${r.get(1)}")
    }
  }

  test("interval sweep: concurrency never negative, closes to zero") {
    val rows = SparkEntry.queries("q_in_transit")(spark, sfDir)
      .orderBy(col("day")).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("pending") >= 0,
      s"negative concurrency on ${r.get(0)}"))
    // every opened interval eventually closes: the sweep ends at zero
    assert(rows.last.getAs[Long]("pending") == 0L)
    // and the deltas sum to zero globally (2 boundaries per interval)
    assert(rows.map(_.getAs[Long]("net")).sum == 0L)
  }

  test("rolling 7d frame always contains the current row and never the future") {
    val df = SparkEntry.queries("q_rolling_7d")(spark, sfDir)
    assert(df.filter(col("n_7d") < 1).isEmpty, "frame lost its own row")
    // a frame count can never exceed the user's events so far; RANGE prefix
    // so same-ms peers count on both sides of the comparison
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ms"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val bad = df.withColumn("prefix_max", count(lit(1)).over(w))
      .filter(col("n_7d") > col("prefix_max"))
    assert(bad.isEmpty, "rolling frame exceeded the running prefix")
  }
}
