package graft

import org.apache.spark.sql.functions._

import graft.sources.{Bucketing, Tables}

/** Scale-mechanics specs: bucketed co-located joins plan without a
  * shuffle; HLL approximate distinct stays within its error bound. */
class ScaleSpec extends SparkTestBase {

  test("bucketed join of same-bucketed tables plans without an exchange") {
    GraftSession.prepare(spark)
    Seq("b_orders", "b_lineitem").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(loc)
      }
    }
    Bucketing.writeBucketed(
      Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey", "o_totalprice"),
      "b_orders", "o_orderkey", 8)
    Bucketing.writeBucketed(
      Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
      "b_lineitem", "o_orderkey", 8)
    // disable auto-broadcast so the planner exercises the bucket path (at
    // scale both sides are far over the broadcast threshold anyway)
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"bucketed join should not shuffle:\n$plan")
      val expected = Tables.orders(spark, sfDir)
        .join(Tables.lineitem(spark, sfDir),
          col("o_orderkey") === col("l_orderkey")).count()
      assert(joined.count() == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("approx_count_distinct within 5% of exact") {
    GraftSession.prepare(spark)
    val approx = SparkEntry.queries("q_approx_distinct")(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("p"), countDistinct(col("l_suppkey")).as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    exact.foreach { case (flag, (p, s)) =>
      val (ap, as_) = approx(flag)
      assert(math.abs(ap - p).toDouble / p < 0.05, s"$flag parts: $ap vs $p")
      assert(math.abs(as_ - s).toDouble / s < 0.05, s"$flag supps: $as_ vs $s")
    }
  }
}
