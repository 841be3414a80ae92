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
    val tok = "charlie"
    val inCtx1 = chunks(s"$tok x y")
    val inCtx2 = chunks(s"p q r $tok x y")
    val closes = CdcKernels.isBoundary(tok, 4)
    // whether charlie ends a chunk is identical in any context
    assert(inCtx1.exists(_.endsWith(tok)) == closes || !closes)
    assert(inCtx2.exists(_.endsWith(tok)) == closes || !closes)
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
