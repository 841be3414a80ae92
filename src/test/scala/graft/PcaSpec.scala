package graft

import org.apache.spark.sql.functions._

import graft.operators.Pca
import graft.sources.Tables

/** PCA compression: projection shape, variance monotonicity, and k-NN
  * recall through the projection. */
class PcaSpec extends SparkTestBase {

  test("projection shape and explained-variance monotonicity") {
    GraftSession.prepare(spark)
    val e = Tables.embeddings(spark, sfDir)
    val proj = Pca.project(e, 16)
    assert(proj.count() == e.count())
    assert(proj.select(size(col("pc")).as("k")).distinct()
      .collect().map(_.getInt(0)).toSeq == Seq(16))
    val v8 = Pca.explainedVariance(e, 8)
    val v16 = Pca.explainedVariance(e, 16)
    val v32 = Pca.explainedVariance(e, 32)
    info(f"explained variance: k=8 $v8%.3f, k=16 $v16%.3f, k=32 $v32%.3f")
    assert(v8 < v16 && v16 < v32 && v32 <= 1.0 + 1e-9)
  }

  test("cosine k-NN through the 32-dim projection recalls the exact top-10") {
    GraftSession.prepare(spark)
    val e = Tables.embeddings(spark, sfDir)
    val proj = Pca.project(e, 32)
    def top(df: org.apache.spark.sql.DataFrame, vcol: String): Set[Long] = {
      val probe = df.filter(col("vec_id") === 0)
        .select(col(vcol).as("p"))
      df.filter(col("vec_id") =!= 0)
        .join(broadcast(probe))
        .select(col("vec_id"),
          call_function("cosine_sim", col(vcol), col("p")).as("s"))
        .orderBy(col("s").desc, col("vec_id")).limit(10)
        .collect().map(_.getLong(0)).toSet
    }
    val exact = top(e, "embedding")
    val approx = top(proj, "pc")
    // measured 6/10 at sf0.001 with k=32 (0.651 explained variance);
    // k=16 measured 1/10 and is rejected in the operator doc — this
    // corpus is near-isotropic, so half the dims is the compression
    // limit. Floor under measurement: a projection regression fails
    // loudly, a seed wobble doesn't.
    val hits = approx.intersect(exact).size
    info(s"PCA-32 kNN recall: $hits/10")
    assert(hits >= 4, s"PCA kNN recall too low: $hits/10")
  }
}
