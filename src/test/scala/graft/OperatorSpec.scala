package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.{AsOf, IvfIndex}
import graft.sources.Tables

/** Operator-level specs: generic as-of join semantics, MLlib-KMeans IVF
  * index build + search recall, char shingles. */
class OperatorSpec extends SparkTestBase {

  test("asofJoin: latest right row at-or-before each left row, per key") {
    GraftSession.prepare(spark)
    import scala.jdk.CollectionConverters._
    val lSchema = StructType(Seq(StructField("k", LongType), StructField("lt", LongType)))
    val rSchema = StructType(Seq(StructField("k", LongType), StructField("rt", LongType),
      StructField("rv", StringType)))
    val left = spark.createDataFrame(Seq(
      Row(1L, 10L), Row(1L, 20L), Row(1L, 5L), Row(2L, 10L)).asJava, lSchema)
    val right = spark.createDataFrame(Seq(
      Row(1L, 10L, "a"), Row(1L, 15L, "b"), Row(2L, 99L, "z")).asJava, rSchema)
    val out = AsOf.asofJoin(left, right, "k", "lt", "rt", Seq("rv"))
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)).orNull)).toSet
    assert(out == Set(
      (1L, 10L, "a"),   // equal timestamps match
      (1L, 20L, "b"),   // most recent prior
      (1L, 5L, null),   // nothing at-or-before
      (2L, 10L, null))) // right row is in the future
  }

  test("IVF index: KMeans build is deterministic; search recall vs exact") {
    GraftSession.prepare(spark)
    val e = Tables.embeddings(spark, sfDir)
    val assigned = IvfIndex.assign(e, k = 8).cache()
    try {
      assert(assigned.select("cluster_id").distinct().count() <= 8)
      assert(assigned.count() == e.count())
      val approx = IvfIndex.search(assigned, probeVecId = 0, topK = 10)
        .collect().map(_.getLong(0)).toSet
      val exact = SparkEntry.queries("q_knn_cosine")(spark, sfDir)
        .collect().map(_.getLong(0)).toSet
      // scanning ~1/8 of the corpus must still find most true neighbours
      assert(approx.intersect(exact).size >= 5,
        s"IVF recall too low: ${approx.intersect(exact).size}/10")
    } finally assigned.unpersist()
  }

  test("char_shingles: distinct 5-grams, short-input edge") {
    GraftSession.prepare(spark)
    val r = spark.sql("SELECT char_shingles('abcdef', 5) AS s, char_shingles('abc', 5) AS e").head()
    assert(r.getSeq[String](0) == Seq("abcde", "bcdef"))
    assert(r.getSeq[String](1).isEmpty)
  }

  test("no accidental cartesian products in any registered query") {
    GraftSession.prepare(spark)
    val offenders = SparkEntry.queries.keys.toSeq.sorted.filter { name =>
      SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.executedPlan.toString.contains("CartesianProduct")
    }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }
}
