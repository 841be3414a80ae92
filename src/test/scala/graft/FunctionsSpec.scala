package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{TextHashKernels, Ulid, VectorKernels}

/** Kernel-level specs for graft's native Catalyst expressions. */
class FunctionsSpec extends SparkTestBase {

  private def sqlOne(q: String): Row = spark.sql(q).head()

  test("word_shingles: distinct consecutive 3-grams, first-occurrence order") {
    val r = sqlOne("SELECT word_shingles('a b c d a b c d', 3) AS sh")
    assert(r.getSeq[String](0) ==
      Seq("a b c", "b c d", "c d a", "d a b", "a b c d".take(0) + "a b c").distinct ||
      r.getSeq[String](0) == Seq("a b c", "b c d", "c d a", "d a b"))
  }

  test("word_shingles: shorter than n gives empty array") {
    assert(sqlOne("SELECT word_shingles('a b', 3) AS sh").getSeq[String](0).isEmpty)
    assert(sqlOne("SELECT word_shingles('a b c', 3) AS sh").getSeq[String](0) == Seq("a b c"))
  }

  test("lexicon kernels equal their HOF formulations on the test corpus") {
    GraftSession.prepare(spark)
    import graft.functions.LexiconKernels.{Denylist, EnStopwords}
    // the kernels replaced interpreted filter/transform lambdas on the
    // per-document hot path; this parity check is what licenses that swap
    // (same single-space tokenization incl. empty tokens, exact membership)
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select(col("text"),
        call_function("stopword_hits", col("text")).as("k_stop"),
        size(filter(split(col("text"), " "),
          x => x.isInCollection(EnStopwords))).as("h_stop"),
        call_function("denylist_hits", col("text")).as("k_deny"),
        size(filter(split(col("text"), " "),
          x => x.isInCollection(Denylist))).as("h_deny"),
        call_function("denylist_mask", col("text")).as("k_mask"),
        array_join(transform(split(col("text"), " "),
          x => when(x.isInCollection(Denylist), lit("[X]")).otherwise(x)),
          " ").as("h_mask"))
    val bad = docs.filter(
      col("k_stop") =!= col("h_stop") || col("k_deny") =!= col("h_deny") ||
        col("k_mask") =!= col("h_mask"))
    assert(bad.isEmpty, bad.take(3).mkString(","))
    // edge shapes the corpus lacks: empty text, repeated spaces, lexicon
    // words as substrings of larger tokens
    import graft.functions.LexiconKernels
    def u(s: String) = UTF8String.fromString(s)
    assert(LexiconKernels.stopwordHits(u("")) == 0)
    assert(LexiconKernels.stopwordHits(u("the  the")) == 2) // empty middle token
    assert(LexiconKernels.stopwordHits(u("theory of others")) == 1) // no substring hits
    assert(LexiconKernels.denylistMask(u("")).toString == "")
    assert(LexiconKernels.denylistMask(u("spark sparkle  spark")).toString ==
      "[X] sparkle  [X]")
  }

  test("luhn kernels: PAN-shaped run detection gated by the checksum") {
    import graft.functions.LuhnKernels
    def u(s: String) = UTF8String.fromString(s)
    // known-valid PANs (test numbers published by the card networks)
    assert(LuhnKernels.ccValid(u("pay 4532015112830366 now")) == 1)
    assert(LuhnKernels.ccValid(u("amex 371449635398431.")) == 1) // 15 digits
    // off-by-one in the check digit fails
    assert(LuhnKernels.ccCandidates(u("4532015112830367")) == 1)
    assert(LuhnKernels.ccValid(u("4532015112830367")) == 0)
    // length bounds: 12 digits is not PAN-shaped, 19 is, 20 is not
    assert(LuhnKernels.ccCandidates(u("123456789012")) == 0)
    assert(LuhnKernels.ccCandidates(u("1234567890123456789")) == 1)
    assert(LuhnKernels.ccCandidates(u("12345678901234567890")) == 0)
    // runs are maximal: a valid PAN embedded in a longer run is NOT a hit
    assert(LuhnKernels.ccCandidates(u("94532015112830366123456")) == 0)
    // multiple runs in one text, digits at string end close the last run
    assert(LuhnKernels.ccCandidates(u("a 4532015112830366 b 4532015112830367")) == 2)
    assert(LuhnKernels.ccValid(u("a 4532015112830366 b 4532015112830367")) == 1)
    assert(LuhnKernels.ccCandidates(u("tail 4532015112830366")) == 1)
    assert(LuhnKernels.ccCandidates(u("")) == 0)
    // all-zero run: Luhn sum 0 — the checksum alone accepts it (by spec)
    assert(LuhnKernels.ccValid(u("0000000000000000")) == 1)
  }

  test("repetition kernels: top-token and duplicate-ngram fractions") {
    val r = sqlOne(
      """SELECT top_token_frac('a b a c a') AS tf,
        |       dup_ngram_frac('a b a b a', 2) AS dup2,
        |       dup_ngram_frac('a b c d e', 2) AS nodup,
        |       dup_ngram_frac('a b', 3) AS short""".stripMargin)
    assert(r.getDouble(0) == 3.0 / 5.0) // 'a' is 3 of 5 tokens
    // bigrams: ab, ba, ab, ba -> 4 total, 2 distinct -> 2/4 repeated
    assert(r.getDouble(1) == 0.5)
    assert(r.getDouble(2) == 0.0)
    assert(r.getDouble(3) == 0.0) // shorter than n: defined as 0.0
  }

  test("hamming128: popcount of byte-wise xor over binary(16)") {
    val r = sqlOne(
      """SELECT hamming128(unhex(md5('same')), unhex(md5('same'))) AS zero,
        |       hamming128(unhex('ffff0000ffff0000ffff0000ffff0000'),
        |                  unhex('00000000000000000000000000000000')) AS half,
        |       hamming128(unhex('00'), unhex('ff')) AS one_byte""".stripMargin)
    assert(r.getInt(0) == 0)
    assert(r.getInt(1) == 64)
    assert(r.getInt(2) == 8)
    // unequal lengths are a hard error, not a silent truncation
    intercept[Exception] {
      spark.sql("SELECT hamming128(unhex('00'), unhex('0000'))").head()
    }
  }

  test("int8 quantization: bounded error, consistent checksum, zero-vector safe") {
    val r = sqlOne(
      """SELECT int8_quantize(v) AS q, q8_scale(v) AS s, q8_sum(v) AS qs,
        |       int8_quantize(z) AS qz, q8_scale(z) AS sz, q8_sum(z) AS qsz
        |FROM (SELECT transform(array(0.5, -1.0, 0.25, 0.0), x -> CAST(x AS FLOAT)) AS v,
        |             transform(array(0.0, 0.0), x -> CAST(x AS FLOAT)) AS z)""".stripMargin)
    val q = r.getSeq[Byte](0)
    val scale = r.getDouble(1)
    assert(scale == 1.0 / 127.0)
    assert(q == Seq[Byte](64, -127, 32, 0)) // floor(x*127 + 0.5)
    assert(r.getLong(2) == q.map(_.toLong).sum)
    // dequantization error bounded by half a step
    val orig = Seq(0.5, -1.0, 0.25, 0.0)
    assert(orig.zip(q).forall { case (x, c) => math.abs(x - c * scale) <= scale / 2 + 1e-12 })
    // zero vector: zero scale, zero codes, no division blowup
    assert(r.getSeq[Byte](3) == Seq[Byte](0, 0) && r.getDouble(4) == 0.0 && r.getLong(5) == 0L)
  }

  test("minhash_sig: deterministic, set-based, similarity-preserving") {
    val a = "SELECT minhash_sig(word_shingles('the quick brown fox jumps over the lazy dog', 3), 64) AS s"
    assert(sqlOne(a).getSeq[Long](0) == sqlOne(a).getSeq[Long](0))
    // identical token sets -> identical signatures regardless of order dupes
    val r = sqlOne(
      "SELECT minhash_sig(array('x y z'), 64) AS a, minhash_sig(array('x y z', 'x y z'), 64) AS b")
    assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    // sig agreement fraction approximates Jaccard: near-identical docs agree
    // on most permutations, disjoint docs on almost none
    val near = spark.sql(
      """SELECT size(zip_with(
        |  minhash_sig(word_shingles('w1 w2 w3 w4 w5 w6 w7 w8 w9 w10', 3), 64),
        |  minhash_sig(word_shingles('w1 w2 w3 w4 w5 w6 w7 w8 w9 xx', 3), 64),
        |  (x, y) -> CASE WHEN x = y THEN 1 ELSE NULL END)) -
        | size(filter(zip_with(
        |  minhash_sig(word_shingles('w1 w2 w3 w4 w5 w6 w7 w8 w9 w10', 3), 64),
        |  minhash_sig(word_shingles('w1 w2 w3 w4 w5 w6 w7 w8 w9 xx', 3), 64),
        |  (x, y) -> x = y), b -> NOT b)) AS agree""".stripMargin).head().getInt(0)
    assert(near > 32, s"near-dup docs should agree on most minhash slots, got $near/64")
  }

  test("minhash_bands: 16 bands, equal sets collide in every band") {
    val r = sqlOne(
      """SELECT minhash_bands(word_shingles('p q r s t u v', 3), 64, 16) AS a,
        |       minhash_bands(word_shingles('p q r s t u v', 3), 64, 16) AS b""".stripMargin)
    assert(r.getSeq[Long](0).size == 16)
    assert(r.getSeq[Long](0) == r.getSeq[Long](1))
  }

  test("simhash64: identical inputs collide; hamming grows with difference") {
    def ham(a: String, b: String): Int = spark.sql(
      s"""SELECT CAST(bit_count(simhash64(split('$a', ' ')) ^
         | simhash64(split('$b', ' '))) AS INT)""".stripMargin).head().getInt(0)
    assert(ham("alpha beta gamma delta", "alpha beta gamma delta") == 0)
    val near = ham("alpha beta gamma delta epsilon zeta", "alpha beta gamma delta epsilon eta")
    val far = ham("alpha beta gamma delta epsilon zeta", "one two three four five six")
    assert(near < far, s"near=$near should be < far=$far")
  }

  test("vector kernels: cosine/dot/norm match naive computation") {
    val r = sqlOne(
      """SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |                  array(CAST(2.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS c,
        |       dot_product(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |                   array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d,
        |       l2_norm(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS n""".stripMargin)
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getDouble(1) == 11.0)
    assert(r.getDouble(2) == 5.0)
  }

  test("cosine_sim handles zero vectors without NaN") {
    val r = sqlOne(
      """SELECT cosine_sim(array(CAST(0.0 AS FLOAT)), array(CAST(0.0 AS FLOAT))) AS c""")
    assert(r.getDouble(0) == 0.0)
  }

  test("sign_bands: bit pattern of dimension signs, per band") {
    val r = sqlOne(
      """SELECT sign_bands(array(CAST(1.0 AS FLOAT), CAST(-1.0 AS FLOAT),
        |                        CAST(2.0 AS FLOAT), CAST(-2.0 AS FLOAT),
        |                        CAST(-3.0 AS FLOAT), CAST(3.0 AS FLOAT),
        |                        CAST(4.0 AS FLOAT), CAST(5.0 AS FLOAT)), 2, 4) AS b""".stripMargin)
    // band 0: signs(+,-,+,-) = 1010b = 10; band 1: signs(-,+,+,+) = 0111b = 7
    assert(r.getSeq[Long](0) == Seq(10L, 7L))
  }

  test("content_fp matches the cross-engine polynomial formula") {
    // acc = (acc*31 + codepoint) % 1e9+7 over "ab" = (97*31 + 98) = 3105
    assert(sqlOne("SELECT content_fp('ab')").getLong(0) == 97L * 31 + 98)
    assert(sqlOne("SELECT content_fp('')").getLong(0) == 0L)
  }

  test("top_k: bounded heap aggregate, partial merge across partitions") {
    // 1000 rows over 10 partitions forces serialize/merge of partial heaps
    val rows = spark.range(0, 1000, 1, 10)
      .selectExpr("id % 4 AS g", "CAST(id AS DOUBLE) AS v", "id AS tie")
    rows.createOrReplaceTempView("topk_in")
    val out = spark.sql(
      """SELECT g, t.v, t.neg FROM (
        |  SELECT g, explode(top_k(struct(v, -tie AS neg), 3)) AS t
        |  FROM topk_in GROUP BY g) x""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getDouble(1), -r.getLong(2)))
    assert(out.length == 12)
    // group 3: ids ≡ 3 mod 4, largest are 999, 995, 991
    val g3 = out.filter(_._1 == 3).map(_._2).toSeq
    assert(g3 == Seq(999.0, 995.0, 991.0), g3.toString)
    assert(out.filter(_._1 == 0).map(_._2).toSeq == Seq(996.0, 992.0, 988.0))
  }

  test("ulid: 26-char Crockford base32, time-ordered across millis") {
    val r = spark.sql("SELECT ulid() AS u FROM range(100)")
      .collect().map(_.getString(0))
    assert(r.length == 100 && r.toSet.size == 100)
    assert(r.forall(u => u.length == 26 && u.forall("0123456789ABCDEFGHJKMNPQRSTVWXYZ".contains(_))))
    val early = graft.functions.Ulid.generate(1000L, new java.util.Random(1))
    val late = graft.functions.Ulid.generate(2000L, new java.util.Random(1))
    assert(early < late)
  }

  test("count-min sketch: no underestimates, exact on skewed heavy hitter") {
    // 4000 tokens over 32 partitions: 'hot' ×1000, 'warm' ×500, the rest
    // unique fillers — partial grids merge across partitions, so this
    // exercises update + merge + pack/unpack end to end
    spark.sql("""
      |SELECT CASE WHEN id < 1000 THEN 'hot'
      |            WHEN id < 1500 THEN 'warm'
      |            ELSE concat('u', id) END AS term
      |FROM range(0, 4000, 1, 32)""".stripMargin)
      .createOrReplaceTempView("cms_in")
    val est = spark.sql("""
      |WITH exact AS (
      |  SELECT term, count(*) AS n FROM cms_in
      |  WHERE term IN ('hot', 'warm') GROUP BY term)
      |SELECT term, n,
      |  cms_estimate((SELECT cms_agg(term, 4, 2048) FROM cms_in), term, 2048) AS est
      |FROM exact""".stripMargin)
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    // CMS hard guarantee: never under; with 2500 distinct keys in 4×2048
    // the additive error on the heavy hitters stays under εN = e/w·N ≈ 6
    assert(est("hot")._1 == 1000L)
    val hotEst = est("hot")._2
    assert(hotEst >= 1000L && hotEst <= 1006L, s"hot est $hotEst")
    val warmEst = est("warm")._2
    assert(warmEst >= 500L && warmEst <= 506L, s"warm est $warmEst")
  }

  test("kernels agree between codegen and interpreted eval paths") {
    val t = UTF8String.fromString _
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val arr = new GenericArrayData(Array[Any](t("a b c"), t("b c d")))
    // direct kernel call == SQL (codegen) result
    val direct = TextHashKernels.simhash(arr)
    val viaSql = sqlOne("SELECT simhash64(array('a b c', 'b c d'))").getLong(0)
    assert(direct == viaSql)
  }
}
