package graft

import org.apache.spark.sql.functions._

/** Specs for the round-4 pipeline-policy operators: denylist scrubbing,
  * Gopher-style quality flags, substring-window dedup, keep-one canonical
  * selection, and mixture reweighting. */
class PipelineOpsSpec extends SparkTestBase {

  test("denylist: scrubbed text is free of denylisted tokens, counts consistent") {
    GraftSession.prepare(spark)
    val out = SparkEntry.queries("q_denylist")(spark, sfDir).collect()
    assert(out.length == 500)
    val deny = graft.operators.TextAnalysis.Denylist.toSet
    var hitsTotal = 0L
    out.foreach { r =>
      val nHits = r.getInt(1)
      val scrubToks = r.getString(3).split(" ", -1)
      assert(!scrubToks.exists(deny.contains), s"denylist token survived in doc ${r.get(0)}")
      assert(scrubToks.count(_ == "[X]") == nHits)
      assert(r.getDouble(2) == nHits.toDouble / scrubToks.length)
      hitsTotal += nHits
    }
    assert(hitsTotal > 0, "denylist is vacuous on the test corpus")
  }

  test("gopher flags: keep is the conjunction, and every rule discriminates") {
    GraftSession.prepare(spark)
    val out = SparkEntry.queries("q_gopher_flags")(spark, sfDir).collect()
    assert(out.length == 500)
    out.foreach { r =>
      val (w, m, rep, st, keep) =
        (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4), r.getBoolean(5))
      assert(keep == (w && m && rep && st))
    }
    // each rule must actually split the corpus (otherwise the threshold is vacuous)
    Seq(1, 4, 5).foreach { i =>
      val vals = out.map(_.getBoolean(i)).toSet
      assert(vals.size == 2, s"column $i does not discriminate on the test corpus")
    }
  }

  test("window dedup: reported pairs genuinely share a 15-token window") {
    GraftSession.prepare(spark)
    val pairs = SparkEntry.queries("q_window_dedup")(spark, sfDir).collect()
    assert(pairs.nonEmpty, "no substring-dup pairs on the test corpus")
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def windows(t: String): Set[String] = {
      val w = t.split(" ")
      if (w.length < graft.operators.Dedup.WindowK) Set.empty
      else w.sliding(graft.operators.Dedup.WindowK).map(_.mkString(" ")).toSet
    }
    pairs.foreach { r =>
      val (a, b, n) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(a < b && n >= 1)
      val shared = windows(docs(a)).intersect(windows(docs(b)))
      assert(shared.size == n, s"pair ($a,$b): reported $n shared windows, recomputed ${shared.size}")
    }
  }

  test("canonical selection: total cover, labels are component minima") {
    GraftSession.prepare(spark)
    val out = SparkEntry.queries("q_dedup_canonical")(spark, sfDir).collect()
    assert(out.length == 500) // one row per document, dups or not
    val canon = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      assert(r.getLong(1) <= r.getLong(0), "canonical must be the component min")
      assert(r.getBoolean(2) == (r.getLong(1) == r.getLong(0)))
      // the canonical representative is itself canonical (labels are roots)
      assert(canon(r.getLong(1)) == r.getLong(1))
    }
    // both members of any near-dup pair collapse to the same canonical
    val somePair = SparkEntry.queries("q_dedup_jaccard")(spark, sfDir).head()
    assert(canon(somePair.getLong(0)) == canon(somePair.getLong(1)))
    assert(out.count(!_.getBoolean(2)) > 0, "no document was deduplicated — vacuous corpus")
  }

  test("mix weights: shares sum to 1, reweighted mass is uniform per language") {
    GraftSession.prepare(spark)
    val out = SparkEntry.queries("q_mix_weights")(spark, sfDir).collect()
    assert(out.map(_.getLong(1)).sum == 500)
    assert(math.abs(out.map(_.getDouble(2)).sum - 1.0) < 1e-12)
    // n_l * weight_l == total / k for every language: uniform target mass
    val masses = out.map(r => r.getLong(1) * r.getDouble(3))
    masses.foreach(m => assert(math.abs(m - 500.0 / out.length) < 1e-9))
  }

  test("denylist and gopher flags are shuffle-free scans") {
    GraftSession.prepare(spark)
    Seq("q_denylist", "q_gopher_flags").foreach { q =>
      val plan = SparkEntry.queries(q)(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"$q plans a shuffle:\n$plan")
    }
  }
}
