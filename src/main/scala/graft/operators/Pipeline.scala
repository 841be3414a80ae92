package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** The end-to-end training-data cleaning pipeline: the composition every
  * LLM data pipeline runs — language filter → quality gate → near-dup
  * removal → per-doc stats — expressed as ONE declarative DataFrame plan so
  * Catalyst fuses the per-row stages into a single scan and the only
  * shuffles are the two the near-dup stage fundamentally needs (inverted-
  * index join + pair aggregation).
  *
  * Near-dup policy: from every pair with 3-word-shingle Jaccard ≥ 0.5,
  * the higher doc_id is dropped (keep-first). At 100 TB the pair list is
  * tiny relative to the corpus (near-dup rate × corpus), so the final
  * left_anti join broadcasts.
  */
object Pipeline {

  private val EnStopwords = Seq("the", "a", "of", "and", "to", "in", "is")

  private def pipelineClean(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val toks = split(col("text"), " ")
    val nTokens = size(toks)
    val enRatio = size(filter(toks, t => t.isInCollection(EnStopwords))) * lit(1.0) / nTokens
    val distinctRatio = size(array_distinct(toks)) * lit(1.0) / nTokens
    val meanLen = (length(col("text")) - (nTokens - lit(1))) * lit(1.0) / nTokens
    val quality =
      lit(0.4) * least(lit(1.0), nTokens * lit(1.0) / 100.0) +
        lit(0.4) * distinctRatio +
        lit(0.2) * when(meanLen.between(3.0, 8.0), 1.0).otherwise(0.0)

    // stage 1+2: language + quality gates (fused into the scan)
    val kept = docs
      .withColumn("n_tokens", nTokens)
      .withColumn("quality", quality)
      .filter(enRatio >= 0.05 && col("quality") >= 0.5)

    // stage 3: near-dup pairs (inverted shingle index) → drop higher ids
    val sh = call_function("word_shingles", col("text"), lit(3))
    val shingled = kept.select(col("doc_id"), sh.as("sh"))
    val sizes = shingled.select(col("doc_id"), size(col("sh")).as("n"))
    val inv = shingled.select(col("doc_id"), explode(col("sh")).as("s0"))
      .select(col("doc_id"), xxhash64(col("s0")).as("sg"))
    val dropIds = inv.as("a")
      .join(inv.as("b"),
        col("a.sg") === col("b.sg") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.as("ca"), col("id_a") === col("ca.doc_id"))
      .join(sizes.as("cb"), col("id_b") === col("cb.doc_id"))
      .filter(col("inter") * lit(1.0) / (col("ca.n") + col("cb.n") - col("inter")) >= 0.5)
      .select(col("id_b").as("doc_id"))
      .distinct()

    kept
      .join(broadcast(dropIds), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        round(col("quality"), 4).as("quality"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pipeline_clean" -> pipelineClean _
  )

  val oracles: Map[String, String] = Map(
    "q_pipeline_clean" ->
      """WITH t AS (
        | SELECT doc_id, lang, text,
        |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
        |  len(list_filter(string_split(text, ' '),
        |    x -> x IN ('the','a','of','and','to','in','is'))) * 1.0
        |    / len(string_split(text, ' ')) AS en_ratio,
        |  0.4 * least(1.0, len(string_split(text, ' ')) * 1.0 / 100.0)
        |   + 0.4 * (len(list_distinct(string_split(text, ' '))) * 1.0
        |            / len(string_split(text, ' ')))
        |   + 0.2 * (CASE WHEN (length(text) - (len(string_split(text, ' ')) - 1)) * 1.0
        |       / len(string_split(text, ' ')) BETWEEN 3.0 AND 8.0
        |       THEN 1.0 ELSE 0.0 END) AS quality
        | FROM documents),
        |kept AS (SELECT * FROM t WHERE en_ratio >= 0.05 AND quality >= 0.5),
        |sh AS (
        | SELECT doc_id, list_distinct(list_transform(
        |   range(len(string_split(text, ' ')) - 2),
        |   i -> concat_ws(' ', string_split(text, ' ')[i+1],
        |     string_split(text, ' ')[i+2], string_split(text, ' ')[i+3]))) AS shs
        | FROM kept),
        |e AS (SELECT doc_id, unnest(shs) AS s FROM sh),
        |cnt AS (SELECT doc_id, len(shs) AS n FROM sh),
        |p AS (
        | SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        | FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |drop_ids AS (
        | SELECT DISTINCT id_b AS doc_id FROM p
        | JOIN cnt ca ON id_a = ca.doc_id
        | JOIN cnt cb ON id_b = cb.doc_id
        | WHERE inter * 1.0 / (ca.n + cb.n - inter) >= 0.5)
        |SELECT doc_id, lang, n_tokens, round(quality, 4) AS quality
        |FROM kept WHERE doc_id NOT IN (SELECT doc_id FROM drop_ids)""".stripMargin
  )
}
