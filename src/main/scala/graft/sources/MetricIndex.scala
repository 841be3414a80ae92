package graft.sources

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent metric-index layout for hash fingerprints: the parquet
  * analog of the reference's on-disk metric index over a `METRIC KEY`
  * column (reference: src/storage/index.rs — a persisted structure letting
  * `hash @ probe < d` queries touch a fraction of the data; README
  * `METRIC KEY ... USING emtree`).
  *
  * Spark re-expression: there is no tree — the corpus is WRITTEN
  * hive-partitioned by the top `prefixBits` bits of the 64-bit hash. A
  * threshold query then prunes at the FILE level: any row with
  * hamming(hash, probe) ≤ d must live in a partition whose prefix is
  * within d bits of the probe's prefix (the prefix distance is a lower
  * bound of the full distance), so the scan enumerates exactly those
  * prefix values as an IN-list partition filter — Σ C(prefixBits, k≤d)
  * partitions of 2^prefixBits. With prefixBits=16 and d=4 that is
  * 2 517 / 65 536 ≈ 4 % of the corpus touched; locally the default 8 bits
  * keeps file counts test-sized. The prune is exact (no recall loss): the
  * in-partition codegen `hamming64` filter does the fine verification.
  *
  * Write-once, query-many — the same trade the reference's index makes:
  * one extra shuffle-free pass at ingest buys every subsequent threshold
  * or k-NN-with-radius query a ~25× scan cut at 100 TB.
  */
object MetricIndex {

  /** Layout prefix column, carrying BOTH the indexed hash column's name
    * and the prefix width (`h_prefix__h__6`): the name IS the layout's
    * metadata — it survives the partition-column round-trip (directory
    * names carry no field metadata), and it is what lets the
    * [[graft.plans.MetricPrefixPruning]] optimizer rule recover the
    * (hash column, bits) binding from a bare `spark.read.parquet(layout)`
    * plan and prune transparently — and ONLY for filters on that hash
    * column (a threshold on some other long column must never prune). */
  def prefixColumn(hashCol: String, bits: Int): String =
    s"h_prefix__${hashCol}__$bits"

  /** Top-`bits` prefix of a 64-bit hash (unsigned shift: sign-safe). */
  def prefixOf(hash: Column, bits: Int): Column =
    shiftrightunsigned(hash.cast("long"), 64 - bits)

  /** Write `df` partitioned by the hash prefix. `bits` sizes the layout:
    * 2^bits directories; pick so each partition holds ≥ a few parquet
    * files at the target scale (8 locally, 12-16 at 100 TB). */
  def writeIndexed(df: DataFrame, path: String, hashCol: String,
      bits: Int = 8): Unit =
    df.withColumn(prefixColumn(hashCol, bits), prefixOf(col(hashCol), bits))
      // cluster rows by prefix BEFORE the partitioned write: without
      // this every task writes a file into every partition directory it
      // sees (tasks × 2^bits small files); with it each prefix lands in
      // one task → one file per partition, the layout scans want anyway
      .repartition(col(prefixColumn(hashCol, bits)))
      .write.mode(SaveMode.Overwrite)
      .partitionBy(prefixColumn(hashCol, bits))
      .parquet(path)

  /** All prefix values within Hamming distance `maxDist` of the probe's
    * prefix: the probe set of the multi-probe partition filter. */
  def prefixesWithin(probePrefix: Long, bits: Int, maxDist: Int): Seq[Long] = {
    val out = mutable.ListBuffer(probePrefix)
    for (k <- 1 to math.min(maxDist, bits))
      (0 until bits).combinations(k).foreach { flips =>
        out += flips.foldLeft(probePrefix)((acc, p) => acc ^ (1L << p))
      }
    out.toSeq
  }

  /** `SELECT ... WHERE hash @ probe <= maxDist` over an indexed layout:
    * IN-list partition filter (file pruning, exact) + codegen Hamming
    * verify on the surviving rows. */
  def thresholdQuery(spark: SparkSession, path: String, hashCol: String,
      probe: Long, maxDist: Int, bits: Int = 8): DataFrame = {
    val candidates = prefixesWithin(probe >>> (64 - bits), bits, maxDist)
    spark.read.parquet(path)
      .filter(col(prefixColumn(hashCol, bits)).isin(candidates: _*))
      .filter(call_function("hamming64", col(hashCol).cast("long"), lit(probe)) <= maxDist)
      .drop(prefixColumn(hashCol, bits))
  }

  /** Index-backed k-NN — what the reference's emtree actually exists for:
    * nearest hashes WITHOUT a full corpus scan. Radius doubling: run the
    * pruned [[thresholdQuery]] at growing radii until ≥ k rows survive,
    * then rank those. Each probe costs one pruned scan plus a scalar
    * count (an index interrogation, not a data collect); radii double, so
    * the loop runs O(log maxRadius) times and total scan work is within
    * ~2× the final radius's pruned scan. Correctness: the ball that
    * yielded ≥ k rows contains the true top k (every excluded row is
    * farther than every included one), so ranking inside it equals the
    * full-scan answer — the spec asserts exact parity. Past
    * `maxPruneDist` the prefix IN-list stops paying (the partition count
    * approaches 2^bits), so the fallback is the full-scan TakeOrdered,
    * same as the unindexed path. */
  def knnQuery(spark: SparkSession, path: String, hashCol: String,
      probe: Long, k: Int, bits: Int = 8, maxPruneDist: Int = 8): DataFrame = {
    require(k > 0, s"knnQuery requires k > 0, got $k")
    def ranked(df: DataFrame): DataFrame = df
      .withColumn("dist",
        call_function("hamming64", col(hashCol).cast("long"), lit(probe)))
      .orderBy(col("dist"), col(hashCol))
      .limit(k)
    var radius = 1
    while (radius <= maxPruneDist) {
      val ball = thresholdQuery(spark, path, hashCol, probe, radius, bits)
      if (ball.count() >= k) return ranked(ball)
      radius *= 2
    }
    ranked(spark.read.parquet(path).drop(prefixColumn(hashCol, bits)))
  }
}
