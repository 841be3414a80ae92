package graft

import org.apache.spark.sql.functions._

/** Specs for the ingest/governance operator batch: bloom-prefiltered
  * incremental dedup, stratified per-language sampling, per-source data
  * cards, and last-write-wins upsert compaction. */
class StorageOpsSpec extends SparkTestBase {

  test("bloom incremental equals plain incremental dedup (bloom only prunes)") {
    GraftSession.prepare(spark)
    val plain = SparkEntry.queries("q_dedup_incremental")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val bloom = SparkEntry.queries("q_bloom_incremental")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(bloom == plain)
    assert(bloom.nonEmpty)
  }

  test("bloom_agg/bloom_might_contain: no false negatives, fpp under control") {
    GraftSession.prepare(spark)
    spark.range(0, 1000).createOrReplaceTempView("bloom_in")
    // every inserted hash must probe true; distinct values mostly false
    val hits = spark.sql(
      """SELECT
        |  sum(CASE WHEN bloom_might_contain(
        |    (SELECT bloom_agg(xxhash64(id), 10000L, 100000L) FROM bloom_in),
        |    xxhash64(id)) THEN 1 ELSE 0 END) AS present,
        |  sum(CASE WHEN bloom_might_contain(
        |    (SELECT bloom_agg(xxhash64(id), 10000L, 100000L) FROM bloom_in),
        |    xxhash64(id + 1000000)) THEN 1 ELSE 0 END) AS phantom
        |FROM bloom_in""".stripMargin).head()
    assert(hits.getLong(0) == 1000L, "bloom produced a false negative")
    assert(hits.getLong(1) < 100L, s"false-positive rate implausibly high: ${hits.getLong(1)}/1000")
  }

  test("stratified sample: exactly min(k, stratum size) docs per language, deterministic") {
    GraftSession.prepare(spark)
    val out = SparkEntry.queries("q_sample_stratified")(spark, sfDir).collect()
    val perLang = out.groupBy(_.getString(0)).view.mapValues(_.length).toMap
    val langSizes = graft.sources.Tables.documents(spark, sfDir)
      .groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perLang.keySet == langSizes.keySet)
    perLang.foreach { case (lang, n) =>
      assert(n == math.min(operators.Sampling.StratumK.toLong, langSizes(lang)),
        s"stratum $lang has $n picks")
    }
    // deterministic: a second run picks the identical ids
    val again = SparkEntry.queries("q_sample_stratified")(spark, sfDir).collect()
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSet ==
      again.map(r => (r.getString(0), r.getLong(1))).toSet)
  }

  test("stratified sample plans as an aggregate, not a sort-the-world window") {
    GraftSession.prepare(spark)
    val plan = SparkEntry.queries("q_sample_stratified")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"stratified sample planned a window:\n$plan")
    assert(plan.contains("ObjectHashAggregate"), "expected the top_k heap aggregate")
  }

  test("data cards: per-source invariants hold against the raw table") {
    GraftSession.prepare(spark)
    val cards = SparkEntry.queries("q_data_cards")(spark, sfDir).collect()
    val docs = graft.sources.Tables.documents(spark, sfDir).collect()
    assert(cards.map(_.getLong(1)).sum == docs.length)
    cards.foreach { r =>
      val (src, nDocs, totTok, avgTok) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(avgTok == totTok.toDouble / nDocs)
      assert(r.getLong(4) <= r.getLong(5), "min_chars > max_chars")
      assert(r.getLong(7) <= nDocs, "more unique texts than docs")
      assert(r.getDouble(8) == 1.0 - r.getLong(7).toDouble / nDocs)
      val mine = docs.filter(_.getString(3) == src)
      assert(mine.length == nDocs)
    }
  }

  test("upsert: updated keys carry version 2 + patched row, others untouched") {
    GraftSession.prepare(spark)
    val out = SparkEntry.queries("q_upsert")(spark, sfDir).collect()
    val base = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "source", "text").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(out.length == base.size, "upsert must preserve the key set")
    out.foreach { r =>
      val (id, v, src, text) = (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3))
      if (id % 3 == 0) {
        assert(v == 2L && src == "patch" && text == base(id)._2.toUpperCase)
      } else {
        assert(v == 1L && src == base(id)._1 && text == base(id)._2)
      }
    }
  }

  test("upsert plans as one keyed aggregation: partial map-side, single shuffle, no window") {
    GraftSession.prepare(spark)
    val plan = SparkEntry.queries("q_upsert")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"upsert planned a window:\n$plan")
    // string-valued max_by buffers force SortAggregate (local sorts only);
    // the scale property is partial aggregation before ONE keyed exchange
    assert(plan.contains("partial_max_by"), s"no map-side partial aggregation:\n$plan")
    assert("Exchange".r.findAllIn(plan).length == 1, s"expected a single shuffle:\n$plan")
  }
}
