package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Runtime pruning demonstrations — the mechanisms that keep a selective
  * join from scanning 100 TB:
  *
  *  - Dynamic partition pruning: a partitioned layout + a selective dim
  *    filter → Catalyst injects the dim's key set as a runtime partition
  *    filter on the fact scan, so unmatched partitions are never read.
  *  - Runtime bloom filters: for shuffle joins on non-partition keys,
  *    Catalyst builds a bloom filter from the selective side and pushes a
  *    might_contain pre-filter onto the big side, cutting shuffle volume.
  *
  * Both are free (config-on, plan-injected) BECAUSE graft's operators stay
  * declarative DataFrame plans — nothing here would fire on a hand-rolled
  * RDD pipeline. Thresholds are production-tuned, so the specs lower them
  * to observe the mechanism at test scale.
  */
class RuntimeFilterSpec extends SparkTestBase {

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("dynamic partition pruning fires on a partitioned layout join") {
    GraftSession.prepare(spark)
    val dir = Files.createTempDirectory("graft-dpp").toString + "/orders_by_status"
    Tables.orders(spark, sfDir).write.partitionBy("o_orderstatus").parquet(dir)
    val fact = spark.read.parquet(dir)
    // the dim must be a scan + surviving Filter node (a LocalRelation is
    // constant-folded and DPP sees no selective predicate to reuse)
    val dimDir = Files.createTempDirectory("graft-dpp-dim").toString + "/status_dim"
    spark.createDataFrame(Seq(("O", "open"), ("X", "unused")))
      .toDF("st", "label").write.parquet(dimDir)
    val dim = spark.read.parquet(dimDir).filter(col("label") === "open")
    val joined = fact.join(dim, col("o_orderstatus") === col("st"))
    val n = joined.count()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"), plan)
    // pruning is an optimization, never a semantics change
    assert(n == fact.filter(col("o_orderstatus") === "O").count())
  }

  test("runtime bloom filter pre-filters the big side of a shuffle join") {
    GraftSession.prepare(spark)
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force a shuffle join
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB") {
      val li = Tables.lineitem(spark, sfDir)
      val sel = Tables.orders(spark, sfDir).filter(col("o_totalprice") > 400000)
        .select(col("o_orderkey"))
      val joined = li.join(sel, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_extendedprice"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("bloomfilter") ||
        plan.toLowerCase.contains("might_contain"), plan)
      // parity with the un-filtered plan
      val expected = li.join(Tables.orders(spark, sfDir)
          .filter(col("o_totalprice") > 400000).select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expected)
    }
  }
}
