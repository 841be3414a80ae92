package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Product quantization (PQ) — the ANN compression family beyond scalar
  * int8 (C21): each vector is split into M subvectors, each subvector is
  * replaced by the id of its nearest per-subspace centroid, so a vector
  * stores as M small codes (here 8 × 6 bits) instead of dim × 4 bytes —
  * a ~42× smaller index than float32 at dim=64, vs int8's fixed 4×.
  *
  * Search is asymmetric distance computation (ADC): the probe stays
  * full-precision; its dot product against any database vector is
  * approximated by Σ_m dot(probe_sub_m, centroid[m][code_m]) — a lookup
  * in an M×K table computed ONCE per probe. (Jégou et al., "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011.)
  *
  * Spark-first shapes, all scale-honest:
  *  - TRAIN: M seeded MLlib KMeans fits on sliced subvectors (iterative —
  *    trains on a sample at 100 TB, like IvfIndex); the codebook is
  *    M·K rows — broadcastable by construction.
  *  - ENCODE: explode each vector into its M subvectors, broadcast-join
  *    the codebook, min_by(cid) per (vec, sub) — the shuffle carries one
  *    row per (vec, sub), partial-combined; codes re-assemble with an
  *    order-pinning array_sort (collect_list order is not deterministic).
  *  - SEARCH: the probe's M·K ADC part-scores are a broadcast relation;
  *    encoded vectors posexplode their M codes, join the table on
  *    (sub, code), and re-aggregate Σ parts per vec — shuffle volume is
  *    M rows per candidate, the scan reads codes only (M bytes/vector,
  *    the whole point), and top-k is TakeOrderedAndProject.
  *
  * The exact brute-force scan (q_knn_cosine) remains ground truth; PqSpec
  * asserts a recall floor vs exact dot-product top-k at sf0.001.
  */
object PqIndex {

  /** M subspaces × K centroids, dsub = dim/M floats each. Chosen
    * empirically on this corpus (recall@10-in-ADC-top-50 at sf0.001):
    * 4×16 → 5/10, 8×16 → 4/10, 8×64 → 9/10. The noise-heavy synthetic
    * embeddings need codebook resolution (K), not just more subspaces —
    * 8×64 stores 8 6-bit codes = 6 bytes/vector, ~42× under float32 at
    * dim 64 (the classic IVFPQ configs sit at m×8 bits; 6 bits is the
    * smallest that clears a stable recall floor here). */
  val M = 8
  val K = 64

  /** Per-subspace KMeans codebooks: (sub, cid, centroid: array<float>).
    * M·K rows total — driver-side centers from the fitted models (model
    * coefficients, not data) become a broadcastable DataFrame. */
  def train(embeddings: DataFrame, dim: Int, seed: Long = 42L,
      trainFraction: Double = 1.0): DataFrame = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    require(dim % M == 0,
      s"PQ needs dim divisible by M=$M subspaces, got dim=$dim " +
        "(pad the vectors or change M; silent truncation would drop dims)")
    val spark = embeddings.sparkSession
    import spark.implicits._
    val dsub = dim / M
    // The M per-subspace fits are independent models over tiny inputs, so
    // the cost is MLlib JOB-SCHEDULING, not compute (measured: the
    // sequential loop made q_ann_pq 11.9 s at sf0.1 with ~100 scheduled
    // jobs). Two levers, both quality-checked by PqSpec's recall floors:
    // random init + 10 Lloyd rounds (k-means|| init alone is ~10 jobs per
    // fit; measured recall unchanged at 9/10), and CONCURRENT fits from
    // driver threads — the CrossValidator pattern; Spark's scheduler
    // interleaves the per-iteration jobs, so wall time approaches one
    // fit's. On a shared cluster the same trick rides the FAIR pool.
    val futs = (0 until M).map { m =>
      Future {
        val sub = embeddings.select(
          array_to_vector(slice(col("embedding"), m * dsub + 1, dsub)).as("features"))
        val train = if (trainFraction < 1.0) sub.sample(trainFraction, seed) else sub
        val model = new KMeans().setK(K).setSeed(seed + m).setMaxIter(10)
          .setInitMode("random")
          .setFeaturesCol("features").setPredictionCol("cid").fit(train)
        model.clusterCenters.zipWithIndex.map { case (c, i) =>
          (m, i, c.toArray.map(_.toFloat))
        }.toSeq
      }
    }
    val rows = Await.result(Future.sequence(futs), Duration.Inf).flatten
    rows.toDF("sub", "cid", "centroid")
  }

  /** PQ-encode every vector: (vec_id, codes: array<int> of length M).
    * Per (vec, sub) the nearest centroid minimizes ‖c‖² − 2·x·c (the ‖x‖²
    * term is constant under the argmin); min_by over a (distance, cid)
    * struct makes centroid ties deterministic. */
  def encode(embeddings: DataFrame, codebooks: DataFrame, dim: Int): DataFrame = {
    val dsub = dim / M
    embeddings
      .select(col("vec_id"), col("embedding"),
        explode(sequence(lit(0), lit(M - 1))).as("sub"))
      .select(col("vec_id"), col("sub"),
        slice(col("embedding"), col("sub") * dsub + 1, lit(dsub)).as("x"))
      .join(broadcast(codebooks), "sub")
      .select(col("vec_id"), col("sub"), col("cid"),
        (call_function("dot_product", col("centroid"), col("centroid")) -
          lit(2.0) * call_function("dot_product", col("x"), col("centroid"))).as("d2"))
      .groupBy(col("vec_id"), col("sub"))
      .agg(min_by(col("cid"), struct(col("d2"), col("cid"))).as("code"))
      .groupBy(col("vec_id"))
      .agg(transform(array_sort(collect_list(struct(col("sub"), col("code")))),
        t => t.getField("code")).as("codes"))
  }

  /** ADC top-k: approximate dot(probe, x) = Σ_m table[m][codes[m]] where
    * table[m][c] = dot(probe_sub_m, centroid[m][c]). The table is M·K
    * rows, built by one broadcast join of the probe's subvectors against
    * the codebook; candidates never touch float embeddings. */
  def searchAdc(encoded: DataFrame, codebooks: DataFrame,
      probe: DataFrame, dim: Int, topK: Int): DataFrame = {
    val dsub = dim / M
    val probeSubs = probe
      .select(col("embedding"), explode(sequence(lit(0), lit(M - 1))).as("sub"))
      .select(col("sub"), slice(col("embedding"), col("sub") * dsub + 1, lit(dsub)).as("p"))
    val table = probeSubs.join(codebooks, "sub")
      .select(col("sub").as("t_sub"), col("cid").as("t_cid"),
        call_function("dot_product", col("p"), col("centroid")).as("part"))
    encoded
      .select(col("vec_id"), posexplode(col("codes")).as(Seq("sub", "code")))
      .join(broadcast(table), col("sub") === col("t_sub") && col("code") === col("t_cid"))
      .groupBy(col("vec_id"))
      .agg(sum(col("part")).as("adc_score"))
      .orderBy(col("adc_score").desc, col("vec_id"))
      .limit(topK)
  }

  /** IVFPQ build (the FAISS production-index composition): a coarse
    * KMeans partitions the corpus into kCoarse cells, and PQ codebooks are
    * trained on RESIDUALS (vector − its cell centroid) — residuals have
    * far less variance than raw vectors, so the same code budget encodes
    * them more accurately (Jégou 2011 §IV). Returns
    * (centers: kCoarse rows, codebooks: M·K rows, encoded: one row per
    * vector carrying cell id + M codes). All model relations are
    * broadcast-sized by construction; the corpus-sized work is one
    * assignment pass + one residual-encode pass. */
  def buildIvfPq(emb: DataFrame, dim: Int, kCoarse: Int, seed: Long = 42L)
      : (DataFrame, DataFrame, DataFrame) = {
    val spark = emb.sparkSession
    import spark.implicits._
    val withVec = emb.withColumn("features", array_to_vector(col("embedding")))
    // the coarse quantizer keeps k-means|| init: it is ONE fit (vs M
    // subspace fits), and cell quality decides both pruning recall and
    // residual variance — random init here measurably cost ranking recall
    // (10/10 → 8/10) for a saving that no longer matters after the
    // subspace fits went random-init
    // 20 rounds is load-bearing: maxIter=10 measurably degraded ranking
    // recall (10/10 → 7/10, under the spec floor) — the residual variance
    // the PQ codes must absorb depends directly on coarse-cell quality
    val model = new KMeans().setK(kCoarse).setSeed(seed).setMaxIter(20)
      .setFeaturesCol("features").setPredictionCol("cluster_id").fit(withVec)
    val centers = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray.map(_.toFloat)) }
      .toSeq.toDF("cluster_id", "center")
    val assigned = model.transform(withVec).drop("features")
      .join(broadcast(centers), "cluster_id")
      .select(col("vec_id"), col("cluster_id"),
        zip_with(col("embedding"), col("center"), (a, b) => a - b).as("residual"))
    val books = train(
      assigned.select(col("vec_id"), col("residual").as("embedding")), dim, seed)
    val enc = encode(
      assigned.select(col("vec_id"), col("residual").as("embedding")), books, dim)
      .join(assigned.select(col("vec_id"), col("cluster_id")), "vec_id")
    (centers, books, enc)
  }

  /** IVFPQ search: dot(p, x) ≈ dot(p, cell_center) + Σ_m table[m][code_m]
    * where the ADC table is built from the probe's subvectors against the
    * SHARED residual codebooks (one M·K table per probe, cluster-
    * independent). Only the top-nprobe cells by probe·center are scanned —
    * candidates are ~nprobe/kCoarse of the corpus reading M bytes each. */
  def searchIvfPq(enc: DataFrame, centers: DataFrame, books: DataFrame,
      probe: DataFrame, dim: Int, nprobe: Int, topK: Int): DataFrame = {
    val dsub = dim / M
    val p = probe.select(col("embedding").as("p"))
    val probed = centers.crossJoin(broadcast(p))
      .select(col("cluster_id"),
        call_function("dot_product", col("p"), col("center")).as("cterm"))
      .orderBy(col("cterm").desc, col("cluster_id")).limit(nprobe)
    val table = p
      .select(col("p"), explode(sequence(lit(0), lit(M - 1))).as("sub"))
      .select(col("sub"), slice(col("p"), col("sub") * dsub + 1, lit(dsub)).as("ps"))
      .join(books, "sub")
      .select(col("sub").as("t_sub"), col("cid").as("t_cid"),
        call_function("dot_product", col("ps"), col("centroid")).as("part"))
    enc
      .join(broadcast(probed), "cluster_id")
      .select(col("vec_id"), col("cterm"), posexplode(col("codes")).as(Seq("sub", "code")))
      .join(broadcast(table), col("sub") === col("t_sub") && col("code") === col("t_cid"))
      .groupBy(col("vec_id"))
      .agg((max(col("cterm")) + sum(col("part"))).as("adc_score"))
      .orderBy(col("adc_score").desc, col("vec_id"))
      .limit(topK)
  }

  /** Exact dot-product top-10 for the probe — the ground truth the ADC
    * result is graded against (same metric the index approximates). */
  private def exactTop10(corpus: DataFrame, probe: DataFrame): DataFrame =
    corpus.crossJoin(broadcast(probe.select(col("embedding").as("p"))))
      .select(col("vec_id"),
        call_function("dot_product", col("embedding"), col("p")).as("s"))
      .orderBy(col("s").desc, col("vec_id")).limit(10)
      .select(col("vec_id"))

  /** q_ann_pq: PQ-ADC search for probe vec_id=0, reported as the recall
    * invariant a correct index must satisfy rather than the raw ADC
    * ranking (KMeans centroids are float-iteration artifacts — engine-
    * specific, so raw scores can never hash-match an independent oracle,
    * and a rows-only check can't tell a working index from a broken one).
    * Output, one row:
    *
    *   - k / pool: the grading frame (exact top-10 inside ADC top-50);
    *   - n_scored: how many encoded vectors the ADC scan actually scored —
    *     for flat PQ this must be the whole corpus minus the probe, which
    *     the oracle knows exactly (count(*) − 1);
    *   - recall_ok: ≥ 6 of the exact dot-product top-10 appear in the ADC
    *     top-50 (the PqSpec floor, ~25% under measured 9/10).
    *
    * DuckDB can't fit a codebook, but it CAN state what any correct PQ
    * index must achieve on this corpus — the q_embed_pca invariant-oracle
    * pattern. The exact scan it's graded against runs in the same query
    * (cheap: one broadcast-probe pass, the brute-force baseline the index
    * exists to approximate at 100 TB — at gate/bench scale it costs less
    * than the codebook fit).
    *
    * The index (codebooks + encoded corpus) comes from the session's
    * artifact registry ([[graft.SessionMemo]]): codebook fitting is eager
    * driver-side work, so registering the fitted model means every query
    * after the first plans pure transforms — build-once/search-many, which
    * is what an ANN index IS (per-query refits were a bench artifact, not
    * a production shape). */
  private def annPq(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val dim = 64
    // KMeans on zero rows is undefined — an empty corpus short-circuits to
    // the empty result. The head(1) probe is one cheap action in front of
    // a training step that is already a multi-action iterative job.
    if (emb.select(col("vec_id")).head(1).isEmpty)
      return emb.select(lit(10).as("k"), lit(50).as("pool"),
        lit(0L).as("n_scored"), lit(true).as("recall_ok")).limit(0)
    val (books, enc) = graft.SessionMemo.of(s, d, "pq_index") {
      val b = train(emb, dim)
      (b, encode(emb.filter(col("vec_id") =!= 0), b, dim))
    }
    val probe = emb.filter(col("vec_id") === 0)
    val adc = searchAdc(enc, books, probe, dim, 50).select(col("vec_id"))
    val hits = exactTop10(emb.filter(col("vec_id") =!= 0), probe)
      .join(adc, "vec_id").agg(count(lit(1)).as("hits"))
    enc.agg(count(lit(1)).as("n_scored")).crossJoin(hits)
      .select(lit(10).as("k"), lit(50).as("pool"), col("n_scored"),
        (col("hits") >= 6).as("recall_ok"))
  }

  /** q_ann_ivfpq: residual-PQ search over nprobe=2 of 8 cells. Measured
    * recall@10-in-top-50 at sf0.001: nprobe 2 → 5/10, 4 → 7/10, 8 (no
    * pruning) → 10/10 — the ranking itself is near-exact (residual coding
    * beats raw-vector PQ's 9/10); the pruning loss is the known
    * IP-metric-vs-L2-cells mismatch on these unnormalized noise-heavy
    * vectors. At 100 TB the cell count is 10⁴-10⁵ with nprobe ~64, so the
    * same nprobe/kCoarse dial trades a 0.1% scan for recall; kCoarse=8
    * here just makes each step of the dial coarse.
    *
    * Reported as the recall invariant (annPq's frame): one row asserting
    * ≥ 3 of the exact top-10 inside the pruned ADC top-50 — the floor
    * sits ~40% under the measured 5/10 at nprobe=2 so a codebook,
    * residual-coding, or cell-routing regression fails the GATE, not just
    * a spec. No n_scored column here: how many vectors a pruned search
    * scores depends on cell assignment, which an engine without the
    * coarse quantizer cannot know. */
  private def annIvfPq(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val dim = 64
    if (emb.select(col("vec_id")).head(1).isEmpty)
      return emb.select(lit(10).as("k"), lit(50).as("pool"),
        lit(2).as("nprobe"), lit(true).as("recall_ok")).limit(0)
    val probe = emb.filter(col("vec_id") === 0)
    // build-once/search-many via the session registry, as annPq
    val (centers, books, enc) = graft.SessionMemo.of(s, d, "ivfpq_index") {
      buildIvfPq(emb.filter(col("vec_id") =!= 0), dim, kCoarse = 8)
    }
    val adc = searchIvfPq(enc, centers, books, probe, dim, nprobe = 2, topK = 50)
      .select(col("vec_id"))
    exactTop10(emb.filter(col("vec_id") =!= 0), probe)
      .join(adc, "vec_id").agg(count(lit(1)).as("hits"))
      .select(lit(10).as("k"), lit(50).as("pool"), lit(2).as("nprobe"),
        (col("hits") >= 3).as("recall_ok"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ann_pq" -> annPq _,
    "q_ann_ivfpq" -> annIvfPq _
  )

  val oracles: Map[String, String] = Map(
    // Invariant oracles (the q_embed_pca pattern): DuckDB can't fit a
    // codebook, but it can state what a correct index must achieve — and
    // for flat PQ, exactly how many vectors the codes-only scan scores.
    // HAVING keeps the empty-corpus case at zero rows on both sides.
    "q_ann_pq" ->
      """SELECT CAST(10 AS INTEGER) AS k, CAST(50 AS INTEGER) AS pool,
        | count(*) - 1 AS n_scored, true AS recall_ok
        |FROM embeddings HAVING count(*) > 0""".stripMargin,
    "q_ann_ivfpq" ->
      """SELECT CAST(10 AS INTEGER) AS k, CAST(50 AS INTEGER) AS pool,
        | CAST(2 AS INTEGER) AS nprobe, true AS recall_ok
        |FROM embeddings HAVING count(*) > 0""".stripMargin
  )
}
