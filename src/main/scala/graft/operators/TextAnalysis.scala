package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Text-analysis operators for training-data pipelines: language-ID
  * heuristic, quality scoring, token counting, document fingerprinting.
  *
  * All of these are per-row, shuffle-free, codegen-friendly column
  * expressions (no UDFs): at 100 TB they run at scan speed with full
  * column pruning — only `doc_id` and `text` are read.
  *
  * Cross-engine float discipline: every derived double is produced by the
  * same operation sequence as the DuckDB oracle (int-exact counts, one
  * division, fixed-order weighted sum), then rounded to 4 dp on both sides.
  */
object TextAnalysis {

  private val EnStopwords = Seq("the", "a", "of", "and", "to", "in", "is")

  private def toks: Column = split(col("text"), " ")

  private def langId(s: SparkSession, d: String): DataFrame = {
    val nTokens = size(toks)
    val enMatches = size(filter(toks, t => t.isInCollection(EnStopwords)))
    Tables.documents(s, d).select(
      col("doc_id"),
      when(enMatches * lit(1.0) / nTokens >= 0.05, "en").otherwise("other").as("pred_lang"),
      round(enMatches * lit(1.0) / nTokens, 4).as("en_ratio"))
  }

  private def quality(s: SparkSession, d: String): DataFrame = {
    val nTokens = size(toks)
    val distinctRatio = size(array_distinct(toks)) * lit(1.0) / nTokens
    // chars excluding the single-space separators, per token
    val meanLen = (length(col("text")) - (nTokens - lit(1))) * lit(1.0) / nTokens
    val score =
      lit(0.4) * least(lit(1.0), nTokens * lit(1.0) / 100.0) +
        lit(0.4) * distinctRatio +
        lit(0.2) * when(meanLen.between(3.0, 8.0), 1.0).otherwise(0.0)
    Tables.documents(s, d).select(
      col("doc_id"),
      nTokens.as("n_tokens"),
      round(distinctRatio, 4).as("distinct_ratio"),
      round(meanLen, 4).as("mean_len"),
      round(score, 4).as("score"))
  }

  private def tokenCount(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      size(toks).as("ws_tokens"),
      size(regexp_extract_all(col("text"), lit("[a-z0-9]+"), lit(0))).as("re_tokens"),
      length(col("text")).as("n_chars_m"))

  private def fingerprint(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      call_function("content_fp", col("text")).as("fp"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_langid" -> langId _,
    "q_quality" -> quality _,
    "q_token_count" -> tokenCount _,
    "q_fingerprint" -> fingerprint _
  )

  val oracles: Map[String, String] = Map(
    "q_langid" ->
      """SELECT doc_id,
        | CASE WHEN len(list_filter(string_split(text, ' '),
        |   t -> t IN ('the','a','of','and','to','in','is'))) * 1.0
        |   / len(string_split(text, ' ')) >= 0.05 THEN 'en' ELSE 'other' END AS pred_lang,
        | round(len(list_filter(string_split(text, ' '),
        |   t -> t IN ('the','a','of','and','to','in','is'))) * 1.0
        |   / len(string_split(text, ' ')), 4) AS en_ratio
        |FROM documents""".stripMargin,
    "q_quality" ->
      """WITH t AS (
        | SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_distinct,
        |  CAST(length(text) AS INTEGER) AS n_chars
        | FROM documents)
        |SELECT doc_id, n_tokens,
        | round(n_distinct * 1.0 / n_tokens, 4) AS distinct_ratio,
        | round((n_chars - (n_tokens - 1)) * 1.0 / n_tokens, 4) AS mean_len,
        | round(0.4 * least(1.0, n_tokens * 1.0 / 100.0)
        |   + 0.4 * (n_distinct * 1.0 / n_tokens)
        |   + 0.2 * (CASE WHEN (n_chars - (n_tokens - 1)) * 1.0 / n_tokens
        |       BETWEEN 3.0 AND 8.0 THEN 1.0 ELSE 0.0 END), 4) AS score
        |FROM t""".stripMargin,
    "q_token_count" ->
      """SELECT doc_id,
        | CAST(len(string_split(text, ' ')) AS INTEGER) AS ws_tokens,
        | CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS INTEGER) AS re_tokens,
        | CAST(length(text) AS INTEGER) AS n_chars_m
        |FROM documents""".stripMargin,
    "q_fingerprint" ->
      """SELECT doc_id,
        | list_reduce(
        |   list_prepend(CAST(0 AS BIGINT),
        |     list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
        |   (acc, c) -> (acc * 31 + c) % 1000000007) AS fp
        |FROM documents""".stripMargin
  )
}
