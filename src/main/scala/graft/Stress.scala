package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Scale-stress harness: measure headline queries on a ×N replication of
  * sf0.1 — one decade of data beyond the largest driver-provided scale.
  *
  * THIS IS NOT sf1. The driver provides sf0.001/0.01/0.1 only; this
  * corpus is sf0.1 deterministically replicated with shifted keys, and
  * the results are reported as exactly that. What it measures honestly:
  * whether each plan's cost grows linearly (scan/agg/window), stays bounded by
  * structural caps (near-dup candidate generation), or degrades — the
  * question "would this plan survive 10×?" answered with a measurement
  * instead of an argument.
  *
  * Replication design, per copy c of N (copy 0 is the original data):
  *  - keyed tables shift every key by c·10⁹ (joins stay consistent within
  *    a copy and never cross copies — like ingesting 10 disjoint tenants);
  *  - `documents.text` in copies ≥1 is TOKEN-RENAMED (every token t
  *    becomes t_c — a per-copy substitution cipher). Rationale: verbatim
  *    replication would make every copy pair an artificial near-dup and
  *    inflate the pair graph ×N²; renaming preserves each copy's INTERNAL
  *    structure exactly (token identity is a bijection, so shingles,
  *    dup-rates, and the pair graph replicate 1:1 per copy) while
  *    cross-copy shingle overlap is zero — the corpus grows ×N with
  *    CONSTANT near-dup density, which is how a real corpus grows. (A
  *    first design sorted tokens per copy instead; on this ~50-word
  *    vocabulary, sorting canonicalized every document toward the same
  *    sequence and welded whole copies into one near-dup blob —
  *    q_dedup_components hit its convergence guard. Kept as a cautionary
  *    note: the guard did its job on adversarial input.);
  *  - embeddings in copies ≥1 get per-copy deterministic SIGN FLIPS
  *    (component i multiplied by ±1 from xxhash64(i ‖ c)) — an isometry
  *    within each copy, so every within-copy dot product (and therefore
  *    the whole near-dup/ANN geometry) replicates EXACTLY, while
  *    cross-copy similarity collapses to ~0. The first design replicated
  *    vectors verbatim as a deliberate adversarial case; at ×10 the
  *    capped-LSH path absorbed it (3.9× wall for ×10 bucket occupancy),
  *    but at ×100 — every vector carrying 99 exact twins — buckets fill
  *    to the cap corpus-wide and the verify join's spill exceeded local
  *    disk. That is the documented boundary of the cap mechanism: it
  *    bounds PER-BUCKET work, and a corpus that is 99% exact duplicates
  *    must run exact dedup before near-dup (the pipeline's stated order)
  *    rather than lean on LSH caps.
  */
object Stress {

  val CopyOffset = 1000000000L

  private def shift(df: DataFrame, cols: Seq[String], c: Int): DataFrame =
    cols.foldLeft(df)((d, k) => d.withColumn(k, col(k) + lit(c * CopyOffset)))

  /** Deterministic per-copy token renaming (see class doc). */
  private def rename(c: Int) = expr(
    s"array_join(transform(split(text, ' '), t -> concat(t, '_$c')), ' ')")

  /** Deterministic per-copy sign-flip isometry for embeddings (class doc). */
  private def signFlip(c: Int) = expr(
    s"""transform(embedding, (v, i) -> v * CAST(1 - 2 * pmod(
       |  xxhash64(concat(CAST(i AS STRING), '_$c')), 2) AS FLOAT))"""
      .stripMargin.replaceAll("\n", " "))

  private def replicate(spark: SparkSession, src: String, dst: String, n: Int): Unit = {
    val keyCols: Map[String, Seq[String]] = Map(
      "region" -> Seq.empty, "nation" -> Seq.empty,
      "customer" -> Seq("c_custkey"),
      "supplier" -> Seq("s_suppkey"),
      "part" -> Seq("p_partkey"),
      "orders" -> Seq("o_orderkey", "o_custkey"),
      "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
      "events" -> Seq("event_id", "user_id"),
      "documents" -> Seq("doc_id"),
      "embeddings" -> Seq("vec_id"))
    Tables.all.foreach { t =>
      val base = Tables(spark, src, t)
      val keys = keyCols(t)
      val out =
        if (keys.isEmpty) base // shared dimensions (region/nation)
        else (0 until n).map { c =>
          val s = shift(base, keys, c)
          if (t == "documents" && c > 0) s.withColumn("text", rename(c))
          else if (t == "embeddings" && c > 0) s.withColumn("embedding", signFlip(c))
          else s
        }.reduce(_ unionByName _)
      out.write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }
  }

  private val Headline = Seq(
    "q_pricing_summary", "q_local_supplier", "q_shipping_priority",
    "q_sessionize", "q_profile", "q_ntile_threshold",
    "q_dedup_exact", "q_dedup_jaccard", "q_minhash_lsh", "q_window_dedup",
    "q_dedup_components", "q_embed_neardup", "q_knn_batch", "q_vocab",
    // round-6 data-path additions: exact-radius simhash banding (pair
    // volume grows with per-band collisions), the CMS sketch (three
    // tokenize scans, state constant), PQ index build+search (sample-
    // bounded fit + map-only encode/ADC — the cost that must stay flat-
    // per-row as the corpus grows), and hard-negative mining (broadcast
    // scan + bounded heap)
    "q_simhash_radius", "q_cms_vocab", "q_ann_pq", "q_hard_negatives",
    // SemDeDup: sampled fit is constant, assign is map-side-combined,
    // within-cluster pairs bounded by maxPerCell — per-vector cost must
    // stay flat as n and k grow together (fixed target cell size)
    "q_semdedup",
    // round-7 additions: the RANGE-frame rolling window (per-user sort +
    // frame scan — output and cost are per-row, so the ratio must track
    // the row ratio), the vocabulary-sized JS self-join (replication's
    // token bijection grows the vocab ~N×, pairs stay sources²), and the
    // key-skew profile (key-cardinality shuffle + single-row percentile)
    "q_rolling_7d", "q_js_div", "q_key_skew")

  def main(args: Array[String]): Unit = {
    TempHygiene.sweepOrphans()
    // SPARK_GRAFT_STRESS_ALL=1 sweeps the ENTIRE query registry (one run
    // per scale instead of min-of-2 — this mode is a super-linearity
    // red-flag sweep across every key, not a precision benchmark; the
    // headline set keeps the careful timing)
    val all = sys.env.get("SPARK_GRAFT_STRESS_ALL").contains("1")
    val n = sys.env.get("SPARK_GRAFT_STRESS_N").flatMap(_.toIntOption).getOrElse(10)
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val dst = sys.env.getOrElse("SPARK_GRAFT_STRESS_DIR", s"/tmp/graft_stress_x$n")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    // At ×100 a 32-partition shuffle puts ~100× the per-task state of the
    // bench runs in flight at once; more, smaller partitions is exactly
    // what spark.sql.shuffle.partitions exists for (a cluster would run
    // thousands). Overridable so the harness scales with N.
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      // A big heap (needed for the ×100 shuffles) means organic GC almost
      // never runs — and ContextCleaner only deletes finished queries'
      // shuffle files when their RDDs get collected, so a multi-query
      // session can exhaust DISK on stale shuffle files long before it
      // exhausts memory. Aggressive periodic GC keeps the cleaner live;
      // time() also forces one between queries.
      .config("spark.cleaner.periodicGC.interval", "30s")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.prepare(spark)

    replicate(spark, src, dst, n)
    val rows = Tables.all.map(t => t -> Tables(spark, dst, t).count()).toMap

    // Decomposed receipt for keys whose OUTPUT scales with SF (r12
    // verdict item: q_ntile emits one row per order, q_rfm one per
    // customer — at ×100 the wall-clock ratio conflates plan cost with
    // the unavoidable 100× row production). The registered timing path
    // is a count() sink: nothing is collected or written, so x1/xN
    // ALREADY measure plan + row production without materialization.
    // For each decomposed key the sweep additionally times full
    // materialization (parquet write of the N-row result), so the
    // write's share is explicit; the JSON also carries sec-per-million-
    // output-rows at both scales — a FALLING per-row cost reads the
    // ratio as output scaling over amortized fixed cost, not a plan
    // regression.
    val DecomposedKeys = Set("q_ntile", "q_rfm")
    val matDir = s"/tmp/graft_stress_mat_${SessionMemo.pathTag(dst)}"

    def time(dir: String, name: String): (Double, Long) = {
      // price the full BUILD every run: session-registry artifacts
      // (component labels, ANN indexes) amortize steady-state sessions,
      // but a scaling measurement that reused them would hide exactly the
      // build cost this harness exists to expose. ON-DISK artifacts
      // (PairStore's persisted pair graph) deliberately survive eviction:
      // write-once/read-many IS their production plan, so the sweep
      // prices the build once (the first consumer) and the read path
      // everywhere else — set SPARK_GRAFT_PAIR_STORE=off to price every
      // key's raw build instead
      SessionMemo.evictAll()
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(name)(spark, dir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      System.gc() // let ContextCleaner reclaim the finished query's shuffle files
      (dt, rows)
    }
    // warmup on the small side. SPARK_GRAFT_STRESS_KEYS=a,b,… pins an
    // explicit subset (e.g. re-receipting one round's new operators at
    // ×100 without paying for the whole registry)
    val keysEnv = sys.env.get("SPARK_GRAFT_STRESS_KEYS")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val queriesToRun = keysEnv.getOrElse(
      if (all) SparkEntry.queries.keys.toSeq.sorted else Headline)
    val runs = if (all) 1 else 2
    // warm-up failures must not kill the sweep either (same isolation as
    // the timed loop): a broken first-sorted key costs its own slot below,
    // not the whole 260-key receipt
    queriesToRun.take(2).foreach(q =>
      try time(src, q)
      catch { case e: Throwable =>
        System.err.println(s"[stress] warm-up $q failed: ${e.getMessage}") })
    // materialization timing: the same registered plan, fully written
    // out (see DecomposedKeys above) — min-of-`runs` like the count path
    def matTime(dir: String, name: String): Double =
      Seq.fill(runs) {
        SessionMemo.evictAll()
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir)
          .write.mode("overwrite").parquet(s"$matDir/$name")
        val dt = (System.nanoTime() - t0) / 1e9
        System.gc()
        dt
      }.min
    // a single failing key must not kill a 260-key sweep: record the
    // error in its slot (the receipt reader treats a missing ratio as a
    // loud red) and keep sweeping
    val timed: Seq[Either[(String, String),
        (String, Double, Double, Long, Long, Option[(Double, Double)])]] =
      queriesToRun.map { q =>
        try {
          val (base, baseRows) = Seq.fill(runs)(time(src, q)).minBy(_._1)
          val (big, bigRows) = Seq.fill(runs)(time(dst, q)).minBy(_._1)
          val mat =
            if (!DecomposedKeys(q)) None
            else Some((matTime(src, q), matTime(dst, q)))
          Right((q, base, big, baseRows, bigRows, mat))
        } catch {
          case e: Throwable =>
            System.err.println(s"[stress] $q failed: ${e.getMessage}")
            Left((q, Option(e.getMessage).getOrElse(e.getClass.getName)
              .replaceAll("[\"\\\\\n\r\t]", " ").take(160)))
        }
      }
    // result rows ride along: under constant-density replication the ×N
    // row count vs ×1 is a free recall/structure check (a near-dup query
    // that held recall returns ≈N× the pairs; one that silently lost it
    // shows up right here, next to its wall-clock ratio). Output-scaling
    // keys additionally carry sec-per-million-output-rows at both scales
    // (flat-or-falling = linear row work, the scale-healthy shape) and,
    // for DecomposedKeys, the reduced-sink plan-cost pair.
    val qs = timed.map {
      case Right((q, b, g, br, gr, plan)) =>
        val spm =
          if (br > 0 && gr > 0 && gr >= 10 * br)
            f""",\"s_per_mrow_x1\":${b * 1e6 / br}%.4f,\"s_per_mrow_x$n\":${g * 1e6 / gr}%.4f"""
          else ""
        val pl = plan.fold("") { case (p1, pn) =>
          f""",\"mat_x1\":$p1%.3f,\"mat_x$n\":$pn%.3f,\"mat_ratio\":${pn / p1}%.2f"""
        }
        f"""\"$q\":{\"x1\":$b%.3f,\"x$n\":$g%.3f,\"ratio\":${g / b}%.2f,\"rows_x1\":$br,\"rows_x$n\":$gr$spm$pl}"""
      case Left((q, msg)) => s"""\"$q\":{\"error\":\"$msg\"}"""
    }.mkString("{", ",", "}")
    val line =
      s"""{"metric":"stress","n":$n,"src":"$src","rows":{${
        rows.toSeq.sortBy(_._1).map { case (t, c) => s"\"$t\":$c" }.mkString(",")
      }},"queries":$qs}"""
    println(line)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_STRESS_OUT", "STRESS_OUT.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case _: Throwable => () }
    spark.stop()
  }
}
