package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Text-hash kernels for near-dup detection.
  *
  * SimHash re-expresses the reference's perceptual-hash metric search
  * (reference: README.md "Story" — Hamming distance over perceptual hashes,
  * src/storage/index.rs EM-tree metric index) for text: a 64-bit
  * locality-sensitive fingerprint whose Hamming distance approximates token
  * multiset dissimilarity. Computed per-row inside whole-stage codegen; at
  * 100 TB it runs at scan speed, and dedup happens on 8-byte fingerprints
  * instead of raw text.
  */
object TextHashKernels {
  /** FNV-1a 64-bit over UTF-8 bytes: deterministic, allocation-free. */
  def fnv64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    h
  }

  /** Distinct n-word shingles of single-space-tokenized text, in
    * first-occurrence order (matches split(' ') → concat_ws(' ') →
    * array_distinct semantics; empty result for docs with < n tokens). */
  def wordShingles(text: UTF8String, n: Int):
      org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val s = text.toString
    val toks = s.split(" ", -1)
    if (toks.length < n)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    val last = toks.length - n
    val sb = new java.lang.StringBuilder()
    while (i <= last) {
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
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var idx = 0
    while (it.hasNext) { out(idx) = UTF8String.fromString(it.next()); idx += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Distinct n-char shingles, first-occurrence order (empty if shorter
    * than n). Char-level near-dup shingling for noisy text where word
    * tokenization is unreliable. */
  def charShingles(text: UTF8String, n: Int):
      org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val s = text.toString
    if (s.length < n)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    val last = s.length - n
    while (i <= last) { seen.add(s.substring(i, i + n)); i += 1 }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var idx = 0
    while (it.hasNext) { out(idx) = UTF8String.fromString(it.next()); idx += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Polynomial rolling hash over code points: acc = (acc·31 + cp) mod 1e9+7.
    * Matches the DuckDB-expressible formula (list_reduce over string_split)
    * exactly, so oracle queries can recompute it cross-engine. */
  def contentFp(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      acc = (acc * 31 + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    acc
  }

  /** splitmix64 finalizer: cheap, well-mixed per-permutation remix. */
  @inline def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** k-permutation MinHash: each token hashed once (FNV), remixed k times. */
  def minhash(tokens: ArrayData, k: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val mins = Array.fill(k)(Long.MaxValue)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = fnv64(tokens.getUTF8String(i))
        var j = 0
        while (j < k) {
          val m = splitmix64(h ^ (0x9e3779b97f4a7c15L * j))
          if (m < mins(j)) mins(j) = m
          j += 1
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }

  /** Band hashes: FNV-combine each group of k/bands signature minima. */
  def minhashBands(tokens: ArrayData, k: Int, bands: Int):
      org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val sig = minhash(tokens, k)
    val rows = k / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 0xcbf29ce484222325L
      var r = 0
      while (r < rows) {
        val v = sig.getLong(b * rows + r)
        var byte = 0
        while (byte < 8) {
          h ^= (v >>> (byte * 8)) & 0xffL
          h *= 0x100000001b3L
          byte += 1
        }
        r += 1
      }
      out(b) = h
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Cross-engine 64-bit token hash: polynomial accumulate over code
    * points, seed = the FNV-1a offset basis, multiplier = 0x85EBCA6B (the
    * public murmur3 finalizer constant — odd and wide enough that one step
    * diffuses the seed across the word). Java's wrapping `Long` multiply IS
    * arithmetic mod 2^64, so the exact value is DuckDB-expressible as a
    * `list_reduce` over `HUGEINT` with an explicit `% 2^64` (the content_fp
    * doctrine widened to 64 bits) — which is what upgrades every
    * simhash-derived query from rows-only to a full replay oracle. */
  def portableHash64(s: UTF8String): Long = {
    val str = s.toString
    var h = 0xcbf29ce484222325L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      h = h * 0x85EBCA6BL + cp
      i += Character.charCount(cp)
    }
    h
  }

  /** Charikar SimHash: per-bit majority vote of portable token hashes. */
  def simhash(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = portableHash64(tokens.getUTF8String(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }
}

/** word_shingles(text, n): distinct consecutive n-word shingles of the
  * single-space-tokenized text, as array<string> (first-occurrence order).
  * Native replacement for the split/transform/concat_ws/array_distinct HOF
  * chain: one pass, no interpreted lambdas, empty array when the document
  * has fewer than n tokens. This is the entry scan of every near-dup
  * pipeline, so at 100 TB it must run at codegen speed. */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires (string, n>0)")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(a: Any): Any =
    TextHashKernels.wordShingles(a.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TextHashKernels.wordShingles($a, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** content_fp(text): 30-bit polynomial rolling-hash fingerprint (the
  * cross-engine-verifiable stand-in for the reference's perceptual hash
  * column — reference: README.md "Story"). Codegen scalar; the interpreted
  * split('')/aggregate HOF formulation costs ~100× more per row. */
case class ContentFp(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "content_fp"

  override def nullSafeEval(a: Any): Any =
    TextHashKernels.contentFp(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TextHashKernels.contentFp($a)")

  override protected def withNewChildInternal(newChild: Expression): ContentFp =
    copy(child = newChild)
}

/** char_shingles(text, n): distinct consecutive n-char shingles, as
  * array<string> (first-occurrence order; empty when len < n). */
case class CharShingles(child: Expression, n: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires (string, n>0)")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "char_shingles"

  override def nullSafeEval(a: Any): Any =
    TextHashKernels.charShingles(a.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TextHashKernels.charShingles($a, $n)")

  override protected def withNewChildInternal(newChild: Expression): CharShingles =
    copy(child = newChild)
}

/** minhash_sig(tokens, k): k-permutation MinHash signature of an
  * array<string> token set, as array<long>.
  *
  * One pass: each token is FNV-hashed once, then remixed per permutation
  * with splitmix64 (5 ALU ops) — O(k·n) cheap mixes inside whole-stage
  * codegen, vs. the naive HOF formulation that re-hashes every token k
  * times through interpreted lambdas. At 100 TB this is the signature-
  * construction scan; it must run at memory bandwidth.
  */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires (array<string>, k>0)")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(a: Any): Any =
    TextHashKernels.minhash(a.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TextHashKernels.minhash($a, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** minhash_bands(tokens, k, bands): LSH band hashes of the k-permutation
  * MinHash signature, as array<long> of length `bands` (k % bands == 0).
  * Fuses signature construction and band hashing into one codegen kernel,
  * so LSH candidate generation is a single scan → posexplode → join. */
case class MinHashBands(child: Expression, k: Int, bands: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k > 0 && bands > 0 && k % bands == 0 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<string>, k>0, bands>0, k % bands == 0)")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_bands"

  override def nullSafeEval(a: Any): Any =
    TextHashKernels.minhashBands(a.asInstanceOf[ArrayData], k, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TextHashKernels.minhashBands($a, $k, $bands)")

  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)
}

/** simhash64(tokens): 64-bit SimHash of an array<string> of tokens. */
case class SimHash64(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires an array<string> input")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"

  override def nullSafeEval(a: Any): Any =
    TextHashKernels.simhash(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TextHashKernels.simhash($a)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
