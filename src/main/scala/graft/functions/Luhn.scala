package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Credit-card-shaped PII detection: maximal digit runs of plausible PAN
  * length (13-19, ISO/IEC 7812) gated by the Luhn checksum — the step a
  * real compliance pass adds on top of a bare regex, because 13+-digit
  * runs are overwhelmingly NOT card numbers (ids, hashes, timestamps) and
  * the checksum rejects 90% of random runs.
  *
  * Both counters are one left-to-right pass inside whole-stage codegen
  * (same rationale as LexiconKernels: no per-row regex, no interpreted
  * HOF lambdas on the scan path). "Candidate" is defined as a MAXIMAL run
  * of ASCII digits — exactly `regexp_extract_all(text, '[0-9]+')`
  * filtered to length 13-19 — so the DuckDB oracle reproduces the kernel
  * with a regex + list lambda and the counts hash bitwise.
  */
object LuhnKernels {

  /** Luhn checksum over a digits-only run: from the rightmost digit,
    * double every second one, subtract 9 past 9, sum % 10 == 0. */
  def luhnOk(s: String, start: Int, end: Int): Boolean = {
    var sum = 0
    var double = false
    var i = end - 1
    while (i >= start) {
      var d = s.charAt(i) - '0'
      if (double) { d *= 2; if (d > 9) d -= 9 }
      sum += d
      double = !double
      i -= 1
    }
    sum % 10 == 0
  }

  /** Number of maximal digit runs of length 13-19 in the text. */
  def ccCandidates(text: UTF8String): Int = scan(text, validOnly = false)

  /** Number of those runs that also pass the Luhn checksum. */
  def ccValid(text: UTF8String): Int = scan(text, validOnly = true)

  private def scan(text: UTF8String, validOnly: Boolean): Int = {
    val s = text.toString
    val n = s.length
    var count = 0
    var runStart = -1
    var i = 0
    while (i <= n) {
      val digit = i < n && s.charAt(i) >= '0' && s.charAt(i) <= '9'
      if (digit && runStart < 0) runStart = i
      else if (!digit && runStart >= 0) {
        val len = i - runStart
        if (len >= 13 && len <= 19 && (!validOnly || luhnOk(s, runStart, i)))
          count += 1
        runStart = -1
      }
      i += 1
    }
    count
  }
}

/** cc_candidates(text): count of 13-19-digit maximal runs (PAN-shaped). */
case class CcCandidates(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input")
  }
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cc_candidates"

  override def nullSafeEval(a: Any): Any =
    LuhnKernels.ccCandidates(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.LuhnKernels.ccCandidates($a)")

  override protected def withNewChildInternal(newChild: Expression): CcCandidates =
    copy(child = newChild)
}

/** cc_valid(text): count of PAN-shaped runs passing the Luhn checksum. */
case class CcValid(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input")
  }
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cc_valid"

  override def nullSafeEval(a: Any): Any =
    LuhnKernels.ccValid(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.LuhnKernels.ccValid($a)")

  override protected def withNewChildInternal(newChild: Expression): CcValid =
    copy(child = newChild)
}
