package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Deterministic sampling and data-mixing operators for training-data
  * pipelines: reproducible train/eval splits and per-source mixing rates.
  *
  * Design: NO RNG. Membership is a pure integer hash of the stable row id —
  * the same row lands in the same split in every run, on every engine, at
  * any partitioning (rerunnable backfills, auditable eval sets). Both
  * operators are map-only scans: zero shuffle at 100 TB, and the sampling
  * predicate composes with parquet pushdown of other filters. Spark's
  * `sample()`/`sampleBy()` are partition-order-dependent by comparison.
  */
object Sampling {

  /** Multiplicative hash bucket in overflow-safe BIGINT arithmetic
    * (pre-reduce mod p keeps the product under 2^63 for any id), identical
    * in any engine with 64-bit integer SQL semantics. */
  private val P = 1000000007L
  private val A = 2654435761L // Knuth's multiplicative constant
  def bucketOf(id: Column, buckets: Int): Column =
    ((id % P) * A) % P % buckets

  /** Reproducible 90/10 train/eval split. */
  private def sampleSplit(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      when(bucketOf(col("doc_id"), 100) < 90, "train").otherwise("eval").as("split"))

  /** Per-source mixing: sources matching src1* keep 100%, the rest 30% —
    * the down-weighting shape of corpus mixing (e.g. dilute a crawl against
    * curated sources) with deterministic membership. */
  private def sampleMix(s: SparkSession, d: String): DataFrame = {
    val rate = when(col("source").like("src1%"), 100).otherwise(30)
    Tables.documents(s, d)
      .filter(bucketOf(col("doc_id"), 100) < rate)
      .select(col("doc_id"), col("source"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sample_split" -> sampleSplit _,
    "q_sample_mix" -> sampleMix _
  )

  val oracles: Map[String, String] = Map(
    "q_sample_split" ->
      """SELECT doc_id,
        | CASE WHEN ((doc_id % 1000000007) * 2654435761) % 1000000007 % 100 < 90
        |   THEN 'train' ELSE 'eval' END AS split
        |FROM documents""".stripMargin,
    "q_sample_mix" ->
      """SELECT doc_id, source FROM documents
        |WHERE ((doc_id % 1000000007) * 2654435761) % 1000000007 % 100 <
        |  (CASE WHEN source LIKE 'src1%' THEN 100 ELSE 30 END)""".stripMargin
  )
}
