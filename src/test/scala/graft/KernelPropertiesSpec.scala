package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.TextHashKernels

/** Property-based invariants of the pure hash kernels (no Spark session —
  * these run against the JVM kernels the codegen paths call). */
object KernelPropertiesSpec extends Properties("graft.kernels") {

  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val words = Gen.listOfN(12, word)

  private def arr(ts: Seq[String]): GenericArrayData =
    new GenericArrayData(ts.map(t => UTF8String.fromString(t): Any).toArray)

  property("minhash is a set function (dupes/order irrelevant)") =
    forAll(words, Gen.long) { (ts, seed) =>
      val base = TextHashKernels.minhash(arr(ts), 64).toLongArray().toSeq
      val dup = TextHashKernels.minhash(arr(ts ++ ts), 64).toLongArray().toSeq
      val shuf = TextHashKernels.minhash(
        arr(new scala.util.Random(seed).shuffle(ts)), 64).toLongArray().toSeq
      Prop(base == dup && base == shuf)
    }

  property("minhash of a superset is elementwise <=") =
    forAll(words, word) { (ts, extra) =>
      val base = TextHashKernels.minhash(arr(ts), 64).toLongArray()
      val sup = TextHashKernels.minhash(arr(extra :: ts), 64).toLongArray()
      Prop(base.zip(sup).forall { case (b, s) => s <= b })
    }

  property("simhash is order-insensitive and deterministic") =
    forAll(words) { ts =>
      Prop(TextHashKernels.simhash(arr(ts)) == TextHashKernels.simhash(arr(ts.reverse)))
    }

  property("contentFp in [0, 1e9+7) and deterministic") =
    forAll(Gen.asciiPrintableStr) { s =>
      val fp = TextHashKernels.contentFp(UTF8String.fromString(s))
      Prop(fp >= 0 && fp < 1000000007L &&
        fp == TextHashKernels.contentFp(UTF8String.fromString(s)))
    }

  property("wordShingles count = distinct sliding windows") =
    forAll(words, Gen.choose(1, 4)) { (ts, n) =>
      val text = ts.mkString(" ")
      val sh = TextHashKernels.wordShingles(UTF8String.fromString(text), n)
      val expected =
        if (ts.length < n) 0
        else ts.sliding(n).map(_.mkString(" ")).toSeq.distinct.length
      Prop(sh.numElements() == expected)
    }

  property("charShingles: present iff len >= n, each exactly n chars") =
    forAll(Gen.alphaStr, Gen.choose(1, 6)) { (s, n) =>
      val sh = TextHashKernels.charShingles(UTF8String.fromString(s), n)
      if (s.length < n) Prop(sh.numElements() == 0)
      else Prop(sh.numElements() > 0 &&
        (0 until sh.numElements()).forall(i => sh.getUTF8String(i).toString.length == n))
    }

  // texts that stress tokenization edges: lexicon words, superstrings of
  // them, empties from leading/trailing/double spaces
  private val lexText = Gen.listOf(Gen.oneOf(
    Gen.oneOf(graft.functions.LexiconKernels.EnStopwords),
    Gen.oneOf(graft.functions.LexiconKernels.Denylist),
    word, Gen.const(""), Gen.oneOf("theory", "sparkle", "of", "andys")))
    .map(_.mkString(" "))

  property("stopwordHits/denylistHits equal the split-and-count reference") =
    forAll(lexText) { text =>
      val toks = text.split(" ", -1).toSeq
      val stop = graft.functions.LexiconKernels.stopwordHits(UTF8String.fromString(text))
      val deny = graft.functions.LexiconKernels.denylistHits(UTF8String.fromString(text))
      Prop(stop == toks.count(graft.functions.LexiconKernels.EnStopwords.contains) &&
        deny == toks.count(graft.functions.LexiconKernels.Denylist.contains))
    }

  property("denylistMask equals the map-tokens reference and keeps spacing") =
    forAll(lexText) { text =>
      val expected = text.split(" ", -1)
        .map(t => if (graft.functions.LexiconKernels.Denylist.contains(t)) "[X]" else t)
        .mkString(" ")
      Prop(graft.functions.LexiconKernels
        .denylistMask(UTF8String.fromString(text)).toString == expected)
    }
}
