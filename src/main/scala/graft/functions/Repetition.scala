package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Repetition-based document quality signals (the Gopher/C4-style filter
  * family): fraction of the document owned by its most frequent word, and
  * the duplicate-n-gram fraction. Highly repetitive documents (boilerplate,
  * keyword stuffing, generation loops) score high and get filtered before
  * pretraining.
  *
  * Both are per-row scalar kernels inside whole-stage codegen — shuffle-free,
  * scan-speed at 100 TB — and both produce a ratio of two exact integer
  * counts, so the one IEEE division yields bitwise-identical doubles in any
  * engine (the DuckDB oracle recomputes the same counts via unnest/list SQL).
  */
object RepetitionKernels {

  /** count(most frequent word) / count(words) over the single-space
    * tokenization. Empty text scores 1.0: split("", -1) yields one empty
    * token (as does DuckDB's string_split, so the oracle agrees), and a
    * one-token doc is maximally repetitive by this signal's definition.
    * One pass, one HashMap of the doc's vocabulary. */
  def topTokenFrac(text: UTF8String): Double = {
    val toks = text.toString.split(" ", -1)
    val counts = new java.util.HashMap[String, Int]()
    var max = 0
    var i = 0
    while (i < toks.length) {
      val c = counts.merge(toks(i), 1, (a, b) => a + b)
      if (c > max) max = c
      i += 1
    }
    max.toDouble / toks.length
  }

  /** (total n-grams - distinct n-grams) / total n-grams over consecutive
    * word n-grams; 0.0 when the doc has fewer than n words. The repeated-
    * phrase mass signal: near 0 for natural text, near 1 for looped text. */
  def dupNgramFrac(text: UTF8String, n: Int): Double = {
    val toks = text.toString.split(" ", -1)
    val total = toks.length - n + 1
    if (total <= 0) return 0.0
    val seen = new java.util.HashSet[String]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < total) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    (total - seen.size).toDouble / total
  }
}

/** top_token_frac(text): fraction of whitespace tokens taken by the single
  * most frequent token — the "top word concentration" repetition signal. */
case class TopTokenFrac(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input")
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "top_token_frac"

  override def nullSafeEval(a: Any): Any =
    RepetitionKernels.topTokenFrac(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.RepetitionKernels.topTokenFrac($a)")

  override protected def withNewChildInternal(newChild: Expression): TopTokenFrac =
    copy(child = newChild)
}

/** dup_ngram_frac(text, n): fraction of consecutive word n-gram occurrences
  * that are repeats of an earlier n-gram in the same document. */
case class DupNgramFrac(child: Expression, n: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires (string, n>0)")
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dup_ngram_frac"

  override def nullSafeEval(a: Any): Any =
    RepetitionKernels.dupNgramFrac(a.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.RepetitionKernels.dupNgramFrac($a, $n)")

  override protected def withNewChildInternal(newChild: Expression): DupNgramFrac =
    copy(child = newChild)
}
