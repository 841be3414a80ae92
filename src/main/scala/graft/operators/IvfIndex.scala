package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) ANN index built with MLlib KMeans — the batch
  * index-construction path for embedding search at scale.
  *
  * Build: sample → KMeans (seeded, deterministic) → broadcast the k
  * centroids → one codegen pass assigns every vector to its nearest
  * centroid → write partitioned by `cluster_id` so a probe's candidate
  * scan prunes to matching partition directories (the parquet analog of an
  * inverted file).
  *
  * Search: assign the probe to its nearest nprobe centroids, scan only
  * those clusters (≈ nprobe/k of the corpus), brute-force cosine inside.
  * At 100 TB: training samples (KMeans is iterative — never train on the
  * full corpus), assignment is a map-only pass, and search cost drops by
  * k/nprobe vs. the exact scan. Recall-vs-cost is the documented ANN
  * trade-off; the exact brute-force path (q_knn_cosine) stays the ground
  * truth.
  */
object IvfIndex {

  /** Cluster assignment for every vector: (vec_id, embedding, cluster_id).
    * `k` centroids trained on up to `trainFraction` of the data. `maxIter`
    * is a quality/cost dial: search indexes want converged cells (default
    * 20); blocking-only uses (near-dup candidate cells) tolerate far fewer
    * Lloyd rounds because they only need locality, not optimal centers. */
  def assign(embeddings: DataFrame, k: Int, seed: Long = 42L,
      trainFraction: Double = 1.0, maxIter: Int = 20): DataFrame = {
    val withVec = embeddings.withColumn("features", array_to_vector(col("embedding")))
    val train = if (trainFraction < 1.0) withVec.sample(trainFraction, seed) else withVec
    val model = new KMeans().setK(k).setSeed(seed).setMaxIter(maxIter)
      .setFeaturesCol("features").setPredictionCol("cluster_id")
      .fit(train)
    model.transform(withVec).drop("features")
  }

  /** Fitted centroids only, as a broadcastable (cid, cvec) relation — for
    * callers that assign with their own policy (e.g. multi-assignment to
    * the top-p nearest cells, which MLlib's transform doesn't expose). */
  def fitCenters(embeddings: DataFrame, k: Int, seed: Long = 42L,
      trainFraction: Double = 1.0, maxIter: Int = 20): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val withVec = embeddings.withColumn("features", array_to_vector(col("embedding")))
    val train = if (trainFraction < 1.0) withVec.sample(trainFraction, seed) else withVec
    val model = new KMeans().setK(k).setSeed(seed).setMaxIter(maxIter)
      .setFeaturesCol("features").setPredictionCol("cluster_id")
      .fit(train)
    model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray.map(_.toFloat)) }
      .toSeq.toDF("cid", "cvec")
  }

  /** The int8-quantized index rows: (vec_id, cluster_id, code, scale) —
    * what an IVF build WRITES at 100 TB. Composes the two scan economies:
    * a probe reads nprobe/k of the corpus (IVF pruning) at 4× fewer bytes
    * per vector (int8 codes), with the integer q8_dot inner loop. */
  def assignQuantized(embeddings: DataFrame, k: Int, seed: Long = 42L,
      trainFraction: Double = 1.0): DataFrame =
    assign(embeddings, k, seed, trainFraction)
      .select(col("vec_id"), col("cluster_id"),
        call_function("int8_quantize", col("embedding")).as("code"),
        call_function("q8_scale", col("embedding")).as("scale"))

  /** Quantized IVF search: the probe's cluster only, ranked by the
    * reconstructed dot product over int8 codes. */
  def searchQuantized(indexed: DataFrame, probeVecId: Long, topK: Int): DataFrame = {
    val probe = indexed.filter(col("vec_id") === probeVecId)
      .select(col("cluster_id").as("probe_cluster"),
        col("code").as("pcode"), col("scale").as("pscale"))
    indexed
      .join(broadcast(probe), col("cluster_id") === col("probe_cluster"))
      .select(col("vec_id"),
        (call_function("q8_dot", col("code"), col("pcode")) *
          col("scale") * col("pscale")).as("score"))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(topK)
  }

  /** Top-k cosine neighbours of `probeVecId`, scanning only the probe's
    * cluster. */
  def search(assigned: DataFrame, probeVecId: Long, topK: Int): DataFrame = {
    val probe = assigned.filter(col("vec_id") === probeVecId)
      .select(col("cluster_id").as("probe_cluster"), col("embedding").as("probe_v"))
    assigned
      .join(broadcast(probe), col("cluster_id") === col("probe_cluster"))
      .select(col("vec_id"),
        round(call_function("cosine_sim", col("embedding"), col("probe_v")), 6).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(topK)
  }
}
