package graft

import org.apache.spark.unsafe.types.UTF8String

import graft.functions.CdcKernels

/** Content-defined chunking: the properties that make CDC worth shipping —
  * exact tiling, determinism, and edit re-synchronization (the one fixed
  * windows fundamentally lack). Kernel-level, no cluster needed. */
class CdcSpec extends SparkTestBase {

  private def chunks(text: String, div: Int = 4): Seq[String] =
    CdcKernels.cdcChunks(UTF8String.fromString(text), div).map(_.toString).toSeq

  private val words =
    "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo " +
      "lima mike november oscar papa quebec romeo sierra tango uniform victor"

  test("chunks tile the text exactly and deterministically") {
    for (t <- Seq(words, "one", "", "a b", words + " " + words)) {
      val cs = chunks(t)
      assert(cs.mkString(" ") == t, s"tiling broke for '$t'")
      assert(cs == chunks(t), "nondeterministic chunking")
    }
    // empty text is one empty chunk (split semantics, oracle-consistent)
    assert(chunks("") == Seq(""))
  }

  test("boundary decision depends only on the token itself") {
    // exercise BOTH directions (a closing and a non-closing token): the
    // old `x == closes || !closes` form was vacuous for closes=false and
    // would have missed context-dependent non-boundary behavior
    val byKind = words.split(" ").groupBy(t => CdcKernels.isBoundary(t, 4))
    assert(byKind.keySet == Set(true, false), "corpus lacks a token kind")
    for (closes <- Seq(true, false); tok = byKind(closes).head) {
      // tok is mid-text (never last), so a chunk ends with it iff it closes;
      // context words share no suffix with the probe tokens
      val inCtx1 = chunks(s"$tok zz yy")
      val inCtx2 = chunks(s"pp qq rr $tok zz yy")
      assert(inCtx1.exists(c => c == tok || c.endsWith(" " + tok)) == closes,
        s"'$tok' closes=$closes diverged in context 1")
      assert(inCtx2.exists(c => c == tok || c.endsWith(" " + tok)) == closes,
        s"'$tok' closes=$closes diverged in context 2")
    }
  }

  test("edit re-synchronization: a prefix insertion preserves later chunks") {
    val base = chunks(words)
    val edited = chunks("INSERTED-PREFIX-TOKEN " + words)
    // fixed windows would shift every chunk; CDC must re-sync at the first
    // boundary token, so all chunks after the first original boundary are
    // bit-identical — at least all but one of the original chunks survive
    val shared = base.toSet.intersect(edited.toSet)
    assert(base.size >= 3, s"test corpus too small, got ${base.size} chunks")
    assert(shared.size >= base.size - 1,
      s"CDC failed to re-sync: ${base.size} base chunks, only ${shared.size} shared")
  }

  test("expected chunk length tracks the divisor") {
    val longText = (1 to 5000).map(i => s"tok$i").mkString(" ")
    val cs = chunks(longText, 8)
    val mean = 5000.0 / cs.size
    // geometric(1/8) mean is 8; allow generous slack for hash variance
    assert(mean > 3 && mean < 20, s"mean chunk len $mean is off for divisor 8")
  }

  test("codegen path through the registry matches the kernel") {
    val s = spark
    GraftSession.prepare(s)
    import s.implicits._
    val got = Seq(words).toDF("text")
      .selectExpr("cdc_chunks(text, 4) AS cs")
      .head().getSeq[String](0)
    assert(got == chunks(words))
  }
}
