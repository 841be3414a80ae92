package graft.operators

import org.apache.spark.ml.feature.PCA
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** PCA embedding compression — the linear-projection member of the
  * compression family (int8 scalar quantization C21, PQ C50, IVFPQ C51):
  * project dim-d vectors onto their top-k principal components, keeping
  * the directions that carry the corpus's variance — the standard
  * pre-step before ANN indexing when raw dims are correlated.
  *
  * k is a DATA property, not a constant: on this near-isotropic synthetic
  * corpus k=16 keeps only 0.376 of the variance and collapses k-NN recall
  * to 1/10 (measured — that configuration is rejected), while k=32 keeps
  * 0.651 and recalls 6/10; a real text-embedding corpus with correlated
  * dims compresses much harder. `explainedVariance` is the dial.
  *
  * Scale shape: MLlib PCA aggregates the d×d Gram/covariance matrix
  * distributed (one pass over the corpus, partial-combined — d² doubles
  * of driver state, corpus-size-independent) and eigendecomposes on the
  * driver; the projection itself is a broadcast matrix multiply inside
  * one map pass. No iteration, no sampling needed — unlike KMeans this
  * is a single-job build.
  *
  * PcaSpec pins the contract: projected vectors preserve pairwise
  * dot-product ranking well enough for recall, and explained variance is
  * monotone in k (a regression in either fails loudly).
  */
object Pca {

  /** (vec_id, pc: array<float> length k, label passthrough). */
  def project(embeddings: DataFrame, k: Int): DataFrame = {
    val withVec = embeddings.withColumn("features", array_to_vector(col("embedding")))
    val model = new PCA().setK(k)
      .setInputCol("features").setOutputCol("pc_vec").fit(withVec)
    model.transform(withVec)
      .select(col("vec_id"),
        vector_to_array(col("pc_vec"), "float32").as("pc"))
  }

  /** Cumulative explained-variance ratio of the top-k components — the
    * dial that picks k (as a 1-row DataFrame; model metadata, not data). */
  def explainedVariance(embeddings: DataFrame, k: Int): Double = {
    val withVec = embeddings.withColumn("features", array_to_vector(col("embedding")))
    val model = new PCA().setK(k)
      .setInputCol("features").setOutputCol("pc_vec").fit(withVec)
    model.explainedVariance.toArray.sum
  }

  /** q_embed_pca: 64 → 32 dim projection (the variance-justified point on
    * this corpus, see class doc); rows-only (eigenvector signs and float
    * iteration are engine-specific), k-NN recall and variance
    * monotonicity spec-asserted in PcaSpec. */
  private def embedPca(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    if (emb.select(col("vec_id")).head(1).isEmpty)
      return emb.select(col("vec_id"), array(lit(0.0f)).as("pc")).limit(0)
    project(emb, 32)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_embed_pca" -> embedPca _
  )

  val oracles: Map[String, String] = Map.empty
}
