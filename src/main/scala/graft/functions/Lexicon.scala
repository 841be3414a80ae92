package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static-lexicon token scans: stopword hit counting (the language-ID /
  * Gopher-gate signal) and denylist hit counting + masking.
  *
  * These replace the higher-order-function formulations
  * (`size(filter(split(text), _.isInCollection(...)))` and
  * `array_join(transform(...))`) on the per-document hot path: Spark HOFs
  * run interpreted lambdas per array element (measured 100×+ slower than a
  * codegen kernel in round 1 — see SURVEY §4), while these are single-pass
  * while-loops inside whole-stage codegen. Semantics are bit-identical to
  * the HOF forms (single-space tokenization keeping empty tokens, exact
  * token membership), so the DuckDB oracles are unchanged — a parity spec
  * pins kernel == HOF on the test corpus.
  *
  * The lexicons are the single source of truth here; TextAnalysis re-exports
  * them so operator code and oracles can't drift from the kernels.
  */
object LexiconKernels {

  val EnStopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")
  val Denylist: Seq[String] = Seq("customer", "vector", "spark")

  private val Stop: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](); EnStopwords.foreach(s.add); s
  }
  private val Deny: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](); Denylist.foreach(s.add); s
  }

  /** Number of single-space-delimited tokens that are EnStopwords members.
    * Token boundaries exactly match `split(text, " ", -1)`: every space
    * splits, empty tokens are kept (and never match a lexicon word). */
  def stopwordHits(text: UTF8String): Int = countHits(text, Stop)

  /** Number of tokens that are Denylist members. */
  def denylistHits(text: UTF8String): Int = countHits(text, Deny)

  private def countHits(text: UTF8String, set: java.util.HashSet[String]): Int = {
    val s = text.toString
    val n = s.length
    var hits = 0
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        if (set.contains(s.substring(start, i))) hits += 1
        start = i + 1
      }
      i += 1
    }
    hits
  }

  /** The text with every denylisted token replaced by "[X]" — identical to
    * `array_join(transform(split(text, " "), tok -> masked), " ")`. */
  def denylistMask(text: UTF8String): UTF8String = {
    val s = text.toString
    val n = s.length
    val sb = new java.lang.StringBuilder(s.length)
    var start = 0
    var i = 0
    var first = true
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        val tok = s.substring(start, i)
        if (!first) sb.append(' ')
        sb.append(if (Deny.contains(tok)) "[X]" else tok)
        first = false
        start = i + 1
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** stopword_hits(text): count of whitespace tokens in the English stopword
  * lexicon — the language-ID numerator, at scan speed. */
case class StopwordHits(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input")
  }
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "stopword_hits"

  override def nullSafeEval(a: Any): Any =
    LexiconKernels.stopwordHits(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.LexiconKernels.stopwordHits($a)")

  override protected def withNewChildInternal(newChild: Expression): StopwordHits =
    copy(child = newChild)
}

/** denylist_hits(text): count of whitespace tokens in the policy denylist. */
case class DenylistHits(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input")
  }
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "denylist_hits"

  override def nullSafeEval(a: Any): Any =
    LexiconKernels.denylistHits(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.LexiconKernels.denylistHits($a)")

  override protected def withNewChildInternal(newChild: Expression): DenylistHits =
    copy(child = newChild)
}

/** denylist_mask(text): the text with denylisted tokens replaced by "[X]". */
case class DenylistMask(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input")
  }
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "denylist_mask"

  override def nullSafeEval(a: Any): Any =
    LexiconKernels.denylistMask(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.LexiconKernels.denylistMask($a)")

  override protected def withNewChildInternal(newChild: Expression): DenylistMask =
    copy(child = newChild)
}
