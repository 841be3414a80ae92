package graft

import org.apache.spark.sql.SparkSession

/** Scale-trend measurement: run a headline query subset at every available
  * scale factor and emit per-SF wall times next to per-table row counts,
  * so time-vs-rows ratios are computable without guessing how each table
  * actually grows (documents/embeddings are flat from sf0.001 to sf0.01 —
  * only the TPC-H facts and events grow 10× there; everything grows ~10×
  * from sf0.01 to sf0.1).
  *
  * This is the measured companion to the plan-shape scale arguments in
  * SURVEY §4: a query whose cost is dominated by per-row work should move
  * with its input's row ratio (above the local-mode fixed floor of
  * ~0.1-0.3 s/query for scheduling + planning); anything growing faster
  * than its input is a scale bug this harness exposes at test size.
  */
object Trend {
  private val Headline = Seq(
    // scan + aggregation (lineitem-bound)
    "q_pricing_summary", "q_case_agg", "q_percentile",
    // joins (orders×customer×lineitem, 5-way star)
    "q_shipping_priority", "q_local_supplier",
    // events (time bucketing, sessionization, funnel)
    "q_tumbling", "q_sessionize", "q_funnel",
    // documents (per-row scan ops)
    "q_token_count", "q_sample_split", "q_quality",
    // near-dup family (candidate-volume-bounded)
    "q_dedup_exact", "q_dedup_jaccard", "q_minhash_lsh", "q_window_dedup",
    "q_neardup_incremental", "q_dup_mass",
    // embeddings
    "q_knn_cosine", "q_embed_neardup", "q_pair_histogram",
    // round-5 relational (banded join, one-scan profile)
    // q_ann_pq is deliberately NOT here: its cost is seeded KMeans
    // training (a fixed model-build job), not data-path work — a single
    // cold run's timing says nothing about scan/shuffle scaling
    "q_range_join", "q_profile", "q_cohort",
    "q_dedup_editdist", "q_chunk_overlap", "q_cooccurrence", "q_vocab_overlap")

  private val Tables =
    Seq("lineitem", "orders", "events", "documents", "embeddings")

  def main(args: Array[String]): Unit = {
    TempHygiene.sweepOrphans()
    val dirs = sys.env.getOrElse("SPARK_GRAFT_TREND_DIRS",
      "/root/testdata/sf0.001,/root/testdata/sf0.01,/root/testdata/sf0.1")
      .split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      SparkEntry.queries("q_pricing_summary")(spark, dirs.head).count()
      SparkEntry.queries("q_knn_cosine")(spark, dirs.head).count()
    } catch { case _: Throwable => () }
    val reps = math.max(1,
      sys.env.get("SPARK_GRAFT_BENCH_REPS").flatMap(_.toIntOption).getOrElse(2))
    val perSf = dirs.map { dir =>
      val rows = Tables.map { t =>
        t -> (try graft.sources.Tables(spark, dir, t).count()
              catch { case _: Throwable => -1L })
      }
      val times = Headline.map { name =>
        val ts = (1 to reps).flatMap { _ =>
          val t0 = System.nanoTime()
          try {
            SparkEntry.queries(name)(spark, dir).count()
            Some((System.nanoTime() - t0) / 1e9)
          } catch { case _: Throwable => None }
        }
        name -> (if (ts.nonEmpty) ts.min else -1.0)
      }
      val rowsJson = rows.map { case (k, v) => s"\"$k\":$v" }.mkString("{", ",", "}")
      val qJson = times.map { case (k, v) => s"\"$k\":$v" }.mkString("{", ",", "}")
      val total = times.map(_._2).filter(_ >= 0).sum
      s"""{"dir":"$dir","rows":$rowsJson,"total":$total,"queries":$qJson}"""
    }
    val line = s"""{"metric":"trend","sfs":[${perSf.mkString(",")}]}"""
    println(line)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_TREND_OUT", "TREND_OUT.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case _: Throwable => () }
    spark.stop()
  }
}
