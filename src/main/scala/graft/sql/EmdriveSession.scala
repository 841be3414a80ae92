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
final class EmdriveSession(spark: SparkSession,
    dataDir: Option[String] = None) {
  import EmdriveSql._

  private val catalog = mutable.Map.empty[String, DataFrame]
  /** Views (r14): stored as their parsed chain and RE-LOWERED at every
    * reference, so a view always reads the CURRENT base tables (a stored
    * DataFrame would snapshot the plan at CREATE time and silently miss
    * later INSERTs). Session-scoped, not durable — the reference's
    * durability unit is the table. */
  private val views = mutable.Map.empty[String, EmdriveSql.UnionStmt]

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
      case "ann_search" =>
        arity(5)
        val (tbl, id, vec) = (args(0), args(1), args(2))
        val nCells = 8
        // probe presence check first: a missing probe (incl. the empty
        // corpus, whose layout would not even be readable) is the empty
        // relation, not an error or a doomed index build
        if (table(tbl).filter(col(id) === args(3).toLong).limit(1)
            .collect().isEmpty)
          return table(tbl).limit(0)
            .select(col(id), lit(0.0).as("sim"))
        val path = ensureIndex("ivf", tbl, vec) { p =>
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
        idx.filter(col("cluster_id") === pc) // partition-directory prune
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

  def sql(text: String): DataFrame = EmdriveSql.parse(text) match {
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
      try {
        ctes.foreach { case (n, chain) =>
          catalog(n) =
            if (recursive && chainReferences(chain, n))
              lowerRecursiveCte(n, chain)
            else lowerChain(chain)
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
    // verdict "what's missing" #5). Output: ('where', rows surviving the
    // WHERE — the MIN over FilterExec numOutputRows, i.e. rows past every
    // conjunct) and ('result', result rows). Both are SEMANTIC counts
    // (engine-independent for a deterministic query), so the DuckDB
    // oracle replays them as plain COUNTs — a runtime metric that
    // diverges from the semantic count is a real filtering bug. The
    // result count runs as an added global aggregate (count()), so
    // nothing row-shaped materializes on the driver; metrics read from
    // the executed plan's accumulators, descending through AQE stages.
    case ExplainStmt(sel, true) =>
      import org.apache.spark.sql.execution.{FilterExec, SparkPlan}
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      val cdf = lowerSelect(sel).groupBy().count()
      val n = cdf.collect()(0).getLong(0)
      def nodes(p: SparkPlan): Seq[SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => p +: nodes(a.executedPlan)
        case q: QueryStageExec => p +: nodes(q.plan)
        case _ => p +: p.children.flatMap(nodes)
      }
      val filterRows = nodes(cdf.queryExecution.executedPlan)
        .collect { case f: FilterExec => f.metrics("numOutputRows").value }
      val rows: Seq[Row] = Row("result", n) +:
        (if (filterRows.nonEmpty) Seq(Row("where", filterRows.min)) else Nil)
      spark.createDataFrame(rows.asJava, StructType(Seq(
        StructField("node", StringType, nullable = false),
        StructField("n_rows", LongType, nullable = false))))
  }

  /** Left-assoc set-op fold (ANSI bag semantics): positional column
    * matching; UNION dedupes the accumulated bag (the same
    * partial-combined aggregate as any DISTINCT), UNION ALL keeps it,
    * EXCEPT/INTERSECT lower to Dataset.except/intersect — Spark plans
    * both as null-safe left-anti/left-semi joins over distinct inputs,
    * exactly the ANSI DISTINCT set semantics, and AQE picks
    * broadcast vs shuffle. A tail-less chain is just its head SELECT. */
  /** Does this select (transitively through joins/derived tables)
    * reference relation `n` in a FROM position? The recursion detector
    * for WITH RECURSIVE — subquery positions are deliberately excluded
    * (ANSI forbids the recursive reference there). */
  private def selectReferences(sel: Select, n: String): Boolean =
    sel.table == n || sel.joins.exists(_.table == n) ||
      sel.derived.exists(u => chainReferences(u, n))

  private def chainReferences(u: UnionStmt, n: String): Boolean =
    selectReferences(u.first, n) ||
      u.rest.exists { case (_, s) => selectReferences(s, n) }

  /** WITH RECURSIVE fixpoint (r9): naive set-semantics iteration. The
    * first UNION arm (plus any other non-self-referencing arms) is the
    * base; every self-referencing arm is a step. Each round re-evaluates
    * the steps against the CURRENT accumulated relation and unions
    * distinct; convergence = no growth (monotone under set union, so the
    * count check is exact). Rounds localCheckpoint, so lineage stays one
    * round deep and each iteration's shuffle work is bounded by the
    * delta-free naive cost — the documented trade at this surface
    * (semi-naive evaluation and the RDD fixpoint live in
    * operators.Dedup.components for the 100 TB graph path; the SQL
    * surface favors ANSI fidelity with a loud iteration cap). */
  private def lowerRecursiveCte(name: String, chain: UnionStmt): DataFrame = {
    require(!selectReferences(chain.first, name),
      s"recursive CTE $name: the first UNION arm must be the non-recursive base")
    val (stepArms, baseArms) = chain.rest.partition {
      case (_, s) => selectReferences(s, name)
    }
    stepArms.foreach { case (op, _) =>
      require(op == "union",
        s"recursive CTE $name: the recursive arm must attach with UNION " +
          "(distinct set semantics — UNION ALL over a cycle never terminates)")
    }
    var acc = lowerChain(UnionStmt(chain.first, baseArms))
      .dropDuplicates().localCheckpoint()
    var n = acc.count()
    var iter = 0
    var grown = true
    val saved = catalog.get(name)
    try {
      while (grown && iter < 100) {
        catalog(name) = acc
        val stepped = stepArms.map { case (_, s) => lowerSelect(s) }
          .map(d => d.toDF(acc.columns.toIndexedSeq: _*))
          .reduce(_ union _)
        val next = acc.union(stepped).dropDuplicates().localCheckpoint()
        val n2 = next.count()
        grown = n2 > n
        acc = next
        n = n2
        iter += 1
      }
    } finally {
      saved match {
        case Some(prev) => catalog(name) = prev
        case None => catalog.remove(name)
      }
    }
    require(!grown,
      s"recursive CTE $name did not converge within 100 iterations " +
        "(unbounded recursion? add a depth guard to the step's WHERE)")
    acc
  }

  private def lowerChain(u: UnionStmt): DataFrame = {
    // ANSI precedence (r10, closes the r9 uniform-precedence
    // simplification): INTERSECT [ALL] binds tighter than UNION/EXCEPT,
    // so the flat parsed chain lowers in two levels — maximal
    // INTERSECT-connected runs fold first (left-assoc), then the runs
    // fold under UNION/EXCEPT (left-assoc). `A UNION B EXCEPT C
    // INTERSECT D` is (A ∪ B) − (C ∩ D), exactly the standard's grouping.
    val segs = mutable.ListBuffer[DataFrame](lowerSelect(u.first))
    val segOps = mutable.ListBuffer.empty[String]
    u.rest.foreach { case (op, sel) =>
      val rhs = lowerSelect(sel)
      op match {
        case "intersect" => segs(segs.length - 1) = segs.last.intersect(rhs)
        case "intersect_all" =>
          segs(segs.length - 1) = segs.last.intersectAll(rhs)
        case other => segOps += other; segs += rhs
      }
    }
    segOps.zip(segs.tail).foldLeft(segs.head) { case (acc, (op, rhs)) =>
      op match {
        case "union_all" => acc.union(rhs)
        case "union" => acc.union(rhs).dropDuplicates()
        case "except" => acc.except(rhs)
        // ALL variants (r9): ANSI bag semantics — multiplicities
        // subtract/min instead of collapsing (Catalyst's dedicated
        // ExceptAll/IntersectAll plans, identical in DuckDB)
        case "except_all" => acc.exceptAll(rhs)
      }
    }
  }

  /** True when `sub` is a correlated scalar subquery against `outer`:
    * single table, no grouping, and at least one WHERE equality conjunct
    * straddling the inner table and the outer relation. Uncorrelated
    * subqueries keep the execute-and-inline literal path. */
  private def isCorrScalar(sub: Select, outer: DataFrame): Boolean =
    sub.derived.isEmpty && sub.joins.isEmpty && sub.groupBy.isEmpty &&
      sub.having.isEmpty && {
      val innerCols = table(sub.table).columns.toSet
      val outerCols = outer.columns.toSet
      sub.where.flatMap(splitConjuncts).exists {
        case PCmp(Cmp(ORef(a), "=", ORef(b))) =>
          (innerCols(a) && !innerCols(b) && outerCols(b)) ||
            (innerCols(b) && !innerCols(a) && outerCols(a))
        case _ => false
      }
    }

  /** Correlated scalar subquery in the SELECT list:
    * `(SELECT agg(x) FROM t WHERE t.k = outer.k [AND local]) AS a` —
    * the Kim/Dayal rewrite: the inner relation keeps its local
    * predicates, aggregates GROUPED BY the correlation keys (one row per
    * key, so the scalar cardinality guarantee holds by construction
    * instead of by runtime check), and left-outer joins back on the
    * outer columns — declarative, so AQE broadcasts small key sides.
    * ANSI empty-set semantics: a scalar subquery over no rows is NULL,
    * except COUNT which is 0 — the grouped rewrite drops empty groups,
    * so COUNT gets an explicit zero-fill and every other aggregate keeps
    * the join's NULL. Helper columns live under reserved `__cs_` names
    * and are dropped before projection. */
  private def attachCorrScalar(df0: DataFrame, sub: Select, alias: String): DataFrame = {
    val (aggF, aggArg) = sub.items match {
      case Seq(AggItem(f, arg, _, None)) => (f, arg)
      case _ => throw new IllegalArgumentException(
        "a correlated scalar subquery must select exactly one aggregate")
    }
    val inner = table(sub.table)
    val innerCols = inner.columns.toSet
    val outerCols = df0.columns.toSet
    val (corr, local) = sub.where.flatMap(splitConjuncts).partitionMap {
      case PCmp(Cmp(ORef(a), "=", ORef(b)))
          if innerCols(a) && !innerCols(b) && outerCols(b) => Left((a, b))
      case PCmp(Cmp(ORef(a), "=", ORef(b)))
          if innerCols(b) && !innerCols(a) && outerCols(a) => Left((b, a))
      case other => Right(other)
    }
    val filtered = local.foldLeft(inner)((d0, pr) => d0.filter(predCol(inner, pr)))
    val pairs = corr.distinct
    val keyCols = pairs.map(_._1).distinct
    val keyName = keyCols.zipWithIndex
      .map { case (k, j) => k -> s"__cs_key_${alias}_$j" }.toMap
    val aggN = s"__cs_agg_$alias"
    val grouped = filtered.groupBy(keyCols.map(col): _*)
      .agg(aggColumn(aggF, aggArg).as(aggN))
      .select(keyCols.map(k => col(k).as(keyName(k))) :+ col(aggN): _*)
    val cond = pairs.map { case (ic, oc) =>
      df0(oc) === grouped(keyName(ic)) }.reduce(_ && _)
    val value =
      if (aggF == "COUNT" || aggF == "COUNT_DISTINCT") coalesce(col(aggN), lit(0L))
      else col(aggN)
    df0.join(grouped, cond, "left_outer")
      .withColumn(alias, value)
      .drop(keyName.values.toSeq :+ aggN: _*)
  }

  /** FROM + JOIN chain → a DataFrame: base relation (table, derived
    * table, or chained statement) aliased, then each JOIN folded on as a
    * declarative equi-join — Catalyst/AQE pick broadcast vs shuffle by
    * size, so the SQL surface inherits the engine's join machinery.
    * Unqualified ON keys resolve by which side owns the name (either
    * order); `t AS a` renames columns to `a.col` so qualified references
    * and self-joins resolve by plain (dotted) name. Shared by the
    * top-level SELECT path and the EXISTS subquery pre-pass (which needs
    * the inner RELATION but ignores the select list). */
  private def lowerFrom(sel: Select): DataFrame = {
    val joined = lowerFromJoins(sel)
    sel.lateral.fold(joined) { case (sub, alias) =>
      lowerLateral(joined, sub, alias)
    }
  }

  private def lowerFromJoins(sel: Select): DataFrame =
    sel.joins.foldLeft(
      aliasCols(sel.valuesRows.map(valuesFrame)
        .orElse(sel.derived.map(lowerChain)).getOrElse(table(sel.table)),
        sel.baseAlias)) { (rel, j) =>
      val right = aliasCols(table(j.table), j.alias)
      if (j.kind == "cross") rel.crossJoin(right)
      else if (j.natural) {
        // NATURAL (r15): equi-join on EVERY shared column name — the
        // multi-key USING lowering (one output column per shared name);
        // zero shared names is refused loudly (ANSI's silent cross
        // product is a footgun, not a feature)
        val shared = rel.columns.filter(right.columns.contains).toSeq
        require(shared.nonEmpty,
          s"NATURAL JOIN with ${j.table}: no shared column names " +
            s"(left: ${rel.columns.mkString(",")}; " +
            s"right: ${right.columns.mkString(",")})")
        rel.join(right, shared, j.kind)
      }
      else if (j.usingCol) {
        // USING (k): Spark's native Seq-key join — one output k column
        require(rel.columns.contains(j.leftKey) &&
          right.columns.contains(j.leftKey),
          s"USING (${j.leftKey}) needs the bare column on BOTH sides " +
            s"(left: ${rel.columns.mkString(",")}; right: ${right.columns.mkString(",")})")
        rel.join(right, Seq(j.leftKey), j.kind)
      }
      else {
        val (lk, rk) =
          if (rel.columns.contains(j.leftKey) && right.columns.contains(j.rightKey))
            (j.leftKey, j.rightKey)
          else if (rel.columns.contains(j.rightKey) && right.columns.contains(j.leftKey))
            (j.rightKey, j.leftKey)
          else throw new IllegalArgumentException(
            s"join keys ${j.leftKey} = ${j.rightKey} do not match " +
              s"left(${rel.columns.mkString(",")}) vs ${j.table}")
        j.asof match {
          case Some((x, op, y)) => lowerAsofJoin(rel, right, lk, rk, x, op, y, j.kind)
          case None => rel.join(right, qcol(rel, lk) === qcol(right, rk), j.kind)
        }
      }
    }

  /** LATERAL lowering (r14): `outer, LATERAL (SELECT items FROM t WHERE
    * inner = outer AND local… [ORDER BY …] [LIMIT n]) l` — the ANSI
    * spelling of per-key top-n and per-row subquery expansion.
    *
    * Decorrelated, never per-row: the inner relation keeps its LOCAL
    * predicates, a LIMIT becomes a rank window PARTITIONED BY the
    * correlation key (`row_number ≤ n` — the classic top-n-per-key
    * rewrite: one shuffle on the key, sort bounded per key), and the
    * result equi-joins back to the outer relation, where AQE picks
    * broadcast vs shuffle. The window computes over every inner key
    * before the join — at 100 TB pre-filter the inner relation or put
    * the selective predicate inside the LATERAL body (Catalyst cannot
    * push outer predicates through the rank window). */
  private def lowerLateral(outer: DataFrame, sub: Select,
      alias: String): DataFrame = {
    require(sub.joins.isEmpty && sub.derived.isEmpty && sub.groupBy.isEmpty,
      "LATERAL supports a single-table projection body")
    val inner = aliasCols(table(sub.table), sub.baseAlias)
    val innerCols = inner.columns.toSet
    val outerCols = outer.columns.toSet
    val (corr, local) = sub.where.flatMap(splitConjuncts).partitionMap {
      case PCmp(Cmp(ORef(a), "=", ORef(b)))
          if innerCols(a) && !innerCols(b) && outerCols(b) => Left((a, b))
      case PCmp(Cmp(ORef(a), "=", ORef(b)))
          if innerCols(b) && !innerCols(a) && outerCols(a) => Left((b, a))
      case other => Right(other)
    }
    require(corr.size == 1,
      s"LATERAL requires exactly one equality correlation, found ${corr.size}")
    val (ik, ok) = corr.head
    val filtered = local.foldLeft(inner)((d, pr) => d.filter(predCol(inner, pr)))
    val ranked = sub.limit.fold(filtered) { n =>
      require(sub.orderBy.nonEmpty,
        "LATERAL LIMIT requires ORDER BY (unordered top-n is nondeterministic)")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(qcol(filtered, ik))
        .orderBy(sub.orderBy.map(k =>
          if (k.desc) qref(k.name).desc else qref(k.name).asc): _*)
      filtered.withColumn("__lrn", row_number().over(w))
        .filter(col("__lrn") <= n)
    }
    val itemCols: Seq[(Column, String)] = sub.items.map {
      case ColItem(c, a) => (qref(c), s"$alias.${a.getOrElse(c)}")
      case ExprItem(o, a) => (operandCol(ranked, o), s"$alias.$a")
      case other => throw new IllegalArgumentException(
        s"LATERAL body supports plain/computed columns, got $other")
    }
    val proj = ranked.select(
      (qref(ik).as("__lk") +:
        itemCols.map { case (c, n) => c.as(n) }): _*)
    outer.join(proj, qcol(outer, ok) === col("__lk"), "inner").drop("__lk")
  }

  /** ASOF JOIN lowering (r14): for each left row, the single right row
    * sharing the equi key whose time is nearest at-or-before (backward,
    * `l.t >= r.t`) or at-or-after (forward, `l.t <= r.t`) the left time.
    *
    * Spark-first shape — the B21 operator's union-window trick
    * (operators/AsOf.scala), not a per-row range join: tag both sides,
    * shuffle ONCE on the key, and take `last(right-struct, ignoreNulls)`
    * over a running window ordered by time (descending for forward asof)
    * with right rows sorting before left rows at equal times, so inclusive
    * ties match. One shuffle + one sort, linear output — survives 100 TB
    * where the O(n·m) range-join candidate blowup dies; skewed keys split
    * by AQE. All right columns travel as ONE struct so a matched row can
    * never be stitched from two right rows (the torn-row guarantee). */
  private def lowerAsofJoin(rel: DataFrame, right: DataFrame,
      lk: String, rk: String, x: String, op: String, y: String,
      kind: String): DataFrame = {
    require(kind == "inner" || kind == "left_outer",
      s"ASOF JOIN supports inner and LEFT forms, not $kind")
    // resolve the time conjunct by column ownership, like the equi keys;
    // normalize to (leftTime, rightTime, forward?)
    val (lt, rt, forward) =
      if (rel.columns.contains(x) && right.columns.contains(y))
        (x, y, op == "<=") // l.t <= r.t → nearest at-or-after
      else if (rel.columns.contains(y) && right.columns.contains(x))
        (y, x, op == ">=") // r.t >= l.t ≡ l.t <= r.t
      else throw new IllegalArgumentException(
        s"ASOF time columns $x $op $y do not match " +
          s"left(${rel.columns.mkString(",")}) vs right(${right.columns.mkString(",")})")
    val rCols = right.columns.toSeq
    val lCols = rel.columns.toSeq
    val carryType = StructType(rCols.map(c => right.schema(c).copy(name = c)))
    val lSide = rel.select(
      qcol(rel, lt).as("__t") +: lit(1).as("__side") +:
        qcol(rel, lk).as("__k") +:
        (lCols.filterNot(_ == lk).map(c => qcol(rel, c).as(c)) :+
          lit(null).cast(carryType).as("__r")): _*)
    val rSide = right.select(
      qcol(right, rt).as("__t") +: lit(0).as("__side") +:
        qcol(right, rk).as("__k") +:
        (lCols.filterNot(_ == lk).map(c =>
          lit(null).cast(rel.schema(c).dataType).as(c)) :+
          struct(rCols.map(c => qcol(right, c).as(c)): _*).as("__r")): _*)
    // NULL-time semantics (r14 ADVICE): an ASOF comparison against a NULL
    // time is unknown → no match, DuckDB-identical. Right rows with a
    // NULL time leave the union entirely (under the ascending window
    // order they sort first and last(ignoreNulls) would carry one as a
    // spurious "match" for every left row preceding all real right
    // times); left rows with a NULL time force __asof to NULL, so inner
    // drops them and LEFT emits NULL right fields.
    // Determinism (r14 ADVICE): when several right rows share a
    // (key, time) the window tiebreaks on the whole carried right struct
    // — a total order over orderable types, so last() picks the SAME
    // duplicate on any partitioning (the repo's determinism contract).
    // A right side with a non-orderable column (map) falls back to
    // (time, side) ordering — engine-dependent among exact duplicates
    // of (key, time) only.
    def orderable(dt: DataType): Boolean = dt match {
      case _: MapType => false
      case ArrayType(et, _) => orderable(et)
      case st: StructType => st.fields.forall(f => orderable(f.dataType))
      case _ => true
    }
    val tKey = if (forward) col("__t").desc else col("__t").asc
    val ordKeys =
      if (orderable(carryType)) Seq(tKey, col("__side"), col("__r").asc)
      else Seq(tKey, col("__side"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("__k"))
      .orderBy(ordKeys: _*)
      .rowsBetween(Long.MinValue, 0)
    val joined = lSide.unionByName(rSide.filter(col("__t").isNotNull))
      .withColumn("__asof",
        when(col("__t").isNull, lit(null).cast(carryType))
          .otherwise(last(col("__r"), ignoreNulls = true).over(w)))
      .filter(col("__side") === 1)
    val matched = if (kind == "inner") joined.filter(col("__asof").isNotNull)
      else joined
    matched.select(
      col("__k").as(lk) +:
        (lCols.filterNot(_ == lk).map(c => qref(c)) ++
          rCols.map(c => col("__asof").getField(c).as(c))): _*)
  }

  /** `(VALUES …) alias(cols)` relation: one literal-projection plan per
    * row, unioned — the INSERT VALUES machinery's FROM-side sibling.
    * Bounded dialect input (literal rows); types come from the literals
    * themselves (ints → BIGINT, decimals → DOUBLE, strings, booleans;
    * NULL needs at least one typed row for the column, ANSI-inferred by
    * the union). */
  private def valuesFrame(v: (Seq[String], Seq[Seq[Value]])): DataFrame = {
    val (cols, rows) = v
    val frames = rows.map { r =>
      spark.range(1).select(r.zip(cols).map { case (value, c) =>
        (value match {
          // integer literals type as INT when they fit (DuckDB's VALUES
          // inference), BIGINT beyond -- keeps inline-table schemas
          // engine-identical
          case VNum(n) =>
            if (n.contains('.')) lit(n.toDouble)
            else n.toLong match {
              case v if v >= Int.MinValue && v <= Int.MaxValue => lit(v.toInt)
              case v => lit(v)
            }
          case VStr(x) => lit(x)
          case VBool(b) => lit(b)
          case VNull => lit(null)
          case other => throw new IllegalArgumentException(
            s"VALUES expects literals, got $other")
        }).as(c)
      }.toIndexedSeq: _*)
    }
    frames.reduce(_ unionByName _)
  }

  private def lowerSelect(sel: Select): DataFrame = {
    val Select(items, name, where, rawGroupBy, having, rawOrderBy, limitN,
      joins, distinct, offsetN, derived, baseAlias, groupMode, groupExprs,
      qualify, groupSets, _, distinctOn, _) = sel
    // "#n" ordinal markers (GROUP BY 1 / ORDER BY 2) resolve to the n-th
    // select item's OUTPUT name — ANSI ordinal semantics; grouping by an
    // aggregate/window position is refused like any non-key grouping
    def itemName(it: SelectItem): String = it match {
      case ColItem(n, a) => a.getOrElse(n)
      case ExprItem(_, a) => a
      case AggExprItem(_, a) => a
      case w: WinItem => w.alias
      case DistItem(_, _, a) => a
      case c: CaseItem => c.alias
      case AggItem(f, arg, a, _) => aggAlias(f, arg, a)
      case Star | _: StarExclude | _: StarPattern =>
        throw new IllegalArgumentException("an ordinal cannot reference *")
    }
    def resolveOrd(k: String, grouping: Boolean): String =
      if (k.startsWith("#")) {
        val i = k.drop(1).toInt
        require(i >= 1 && i <= items.length,
          s"ordinal $i is out of range for ${items.length} select items")
        val it = items(i - 1)
        require(!grouping || !(it.isInstanceOf[AggItem]
          || it.isInstanceOf[AggExprItem] || it.isInstanceOf[WinItem]),
          s"GROUP BY ordinal $i references an aggregate/window item")
        itemName(it)
      } else k
    val groupBy = rawGroupBy.map(resolveOrd(_, grouping = true))
    val orderBy = rawOrderBy.map(k => k.copy(name = resolveOrd(k.name, grouping = false)))
    locally {
      // JOIN lowering (graft extension): unqualified ON keys resolved by
      // which side owns the name (either order). The equi-join lowers to a
      // declarative DataFrame join, so Catalyst/AQE pick broadcast vs
      // shuffle by size — the SQL surface inherits the engine's join
      // machinery rather than reimplementing any of it.
      // `t AS a` renames the relation's columns to `a.col` — qualified
      // references and self-joins then resolve by plain (dotted) name,
      // with backtick quoting at the Column boundary (aliasCols/qref)
      val base = lowerFrom(sel)
      // 1. attach aliased distance/computed columns, so WHERE can reference
      //    them (README story: WHERE distance < 4 filters the SELECT
      //    alias); window items attach AFTER the pre-window WHERE below
      var df = base
      items.foreach {
        case DistItem(c, probe, alias) => df = df.withColumn(alias, distCol(base, c, probe))
        case ColItem(c, Some(alias)) => df = df.withColumn(alias, qref(c))
        case it: CaseItem => df = df.withColumn(it.alias, caseCol(base, it))
        // correlated scalar subquery in the SELECT list — decorrelated
        // into a grouped-aggregate left join (attachCorrScalar); must
        // intercept BEFORE the generic operand path, which would execute
        // the subquery standalone and fail on the outer reference
        case ExprItem(OSub(sub), alias) if isCorrScalar(sub, df) =>
          df = attachCorrScalar(df, sub, alias)
        case ExprItem(o, alias) => df = df.withColumn(alias, operandCol(base, o))
        case _ => ()
      }
      // 2a. IN (SELECT …) pre-pass: each subquery becomes a left-outer
      //     join of the probe value against the DISTINCT single-column
      //     subquery result plus a broadcast 1-row (count, null-count)
      //     frame — declarative joins, so AQE picks broadcast vs shuffle
      //     on the distinct side. The predicate then reads the match
      //     marker with ANSI three-valued semantics, which makes it
      //     composable anywhere in the WHERE tree (AND/OR/NOT).
      var subPreds = Map.empty[Pred, Column]
      where.flatMap(collectInSubs).distinct.zipWithIndex.foreach {
        case (node, i) =>
          val sub = lowerSelect(node.sub)
          require(sub.columns.length == 1,
            s"IN subquery must project exactly one column, got " +
              s"(${sub.columns.mkString(", ")})")
          val (keyN, markN, cntN, nullN, probeN) =
            (s"__in_key_$i", s"__in_match_$i", s"__in_n_$i",
              s"__in_nulls_$i", s"__in_probe_$i")
          val keys = sub.toDF(keyN).distinct().withColumn(markN, lit(true))
          val stats = broadcast(sub.toDF("v").agg(
            count(lit(1)).as(cntN), count(when(col("v").isNull, 1)).as(nullN)))
          df = df.withColumn(probeN, operandCol(base, node.lhs))
            .join(keys, col(probeN) === col(keyN), "left_outer")
            .crossJoin(stats)
          val c = when(col(cntN) === 0, false)
            .when(col(markN).isNotNull, true)
            .when(col(probeN).isNull || col(nullN) > 0, lit(null).cast(BooleanType))
            .otherwise(false)
          subPreds += node -> (if (node.neg) !c else c)
      }
      // 2a'. quantified comparisons (r14): `x op ANY|ALL (SELECT …)`.
      //      The subquery reduces to ONE broadcast stats row — min/max
      //      over non-null values, row count, null count — because every
      //      ordering quantifier is decidable from the extremes: a
      //      falsifier for ALL (or a satisfier for ANY) exists iff the
      //      comparison fails (holds) against the relevant extreme.
      //      Three-valued: empty set → ALL TRUE / ANY FALSE; a NULL probe
      //      or NULLs in the set yield NULL unless an extreme already
      //      decides the answer (ANSI). `= ANY` / `!= ALL` never reach
      //      here (parse-time desugar to the null-aware IN machinery).
      where.flatMap(collectQuants).distinct.zipWithIndex.foreach {
        case (node, i) =>
          val sub = lowerSelect(node.sub)
          require(sub.columns.length == 1,
            s"ANY/ALL subquery must project exactly one column, got " +
              s"(${sub.columns.mkString(", ")})")
          val (minN, maxN, cntN, nullN, probeN) =
            (s"__q_min_$i", s"__q_max_$i", s"__q_n_$i",
              s"__q_nulls_$i", s"__q_probe_$i")
          val stats = broadcast(sub.toDF("v").agg(
            min(col("v")).as(minN), max(col("v")).as(maxN),
            count(lit(1)).as(cntN),
            count(when(col("v").isNull, 1)).as(nullN)))
          df = df.withColumn(probeN, operandCol(base, node.lhs))
            .crossJoin(stats)
          val p = col(probeN)
          // the extreme that decides: ALL looks for a falsifier, ANY for
          // a satisfier (NULL-probe comparisons are NULL → fall through)
          val decided = node.op match {
            case ">" => if (node.all) p <= col(maxN) else p > col(minN)
            case ">=" => if (node.all) p < col(maxN) else p >= col(minN)
            case "<" => if (node.all) p >= col(minN) else p < col(maxN)
            case "<=" => if (node.all) p > col(minN) else p <= col(maxN)
            case "=" | "!=" => (p =!= col(minN)) || (p =!= col(maxN))
            case other => throw new IllegalArgumentException(
              s"quantified comparison with $other")
          }
          val c =
            when(col(cntN) === 0, node.all)
              .when(decided, !node.all)
              .when(p.isNull || col(nullN) > 0, lit(null).cast(BooleanType))
              .otherwise(node.all)
          subPreds += (node: Pred) -> c
      }
      // 2b. [NOT]-composable EXISTS pre-pass: equality conjuncts that
      //     straddle the subquery and the outer relation DECORRELATE into
      //     a marker join — the inner relation keeps its local
      //     predicates, projects the DISTINCT correlation keys, and
      //     left-outer joins on the outer columns (AQE broadcasts the
      //     key side when small); EXISTS then reads the match marker.
      //     Two-valued, so it composes under AND/OR/NOT anywhere in the
      //     tree. An uncorrelated EXISTS folds to a broadcast
      //     existence bit off a LIMIT-1 probe.
      where.flatMap(collectExists).distinct.zipWithIndex.foreach { case (node, i) =>
        val sub = node.sub
        // the inner chain lowers through the same relation machinery as a
        // top-level SELECT (r9: the single-filtered-table restriction is
        // lifted — joined subqueries fold through lowerFrom, grouped ones
        // through the grouped-existence rewrite below); only the select
        // list is ignored, since EXISTS is about row existence (ANSI)
        val inner = lowerFrom(sub)
        val innerCols = inner.columns.toSet
        val outerCols = df.columns.toSet
        val (corr, local) = sub.where.flatMap(splitConjuncts).partitionMap {
          case PCmp(Cmp(ORef(a), "=", ORef(b)))
              if innerCols(a) && !innerCols(b) && outerCols(b) => Left((a, b))
          case PCmp(Cmp(ORef(a), "=", ORef(b)))
              if innerCols(b) && !innerCols(a) && outerCols(a) => Left((b, a))
          case other => Right(other)
        }
        val filtered = local.foldLeft(inner)((d0, pr) => d0.filter(predCol(inner, pr)))
        // grouped EXISTS (`… GROUP BY g HAVING h`): groups form per
        // (correlation key × GROUP BY key) — exactly the groups the
        // correlated subquery would form per outer row — HAVING filters
        // them, and existence means ANY surviving group. Without HAVING
        // a grouped EXISTS degenerates to plain row existence, and the
        // rewrite below reduces to it.
        val existsRel: DataFrame =
          if (sub.groupBy.isEmpty && sub.having.isEmpty) filtered
          else {
            require(sub.groupBy.forall(innerCols),
              s"EXISTS GROUP BY keys must be inner columns, " +
                s"got ${sub.groupBy.mkString(", ")}")
            val groupCols = (corr.map(_._1) ++ sub.groupBy).distinct
            val aggCols = sub.items.collect {
              case it: AggItem => aggItemCol(filtered, it)
            }
            val aggAll =
              if (aggCols.nonEmpty) aggCols
              else Seq(count(lit(1)).as(s"__ex_cnt_$i"))
            val g = filtered.groupBy(groupCols.map(qref): _*)
              .agg(aggAll.head, aggAll.tail: _*)
            sub.having.foldLeft(g)((d0, pr) =>
              d0.filter(predCol(d0, resolveHavingAggs(pr, sub.items))))
          }
        val c =
          if (corr.isEmpty) {
            val cntN = s"__ex_n_$i"
            df = df.crossJoin(broadcast(
              existsRel.limit(1).agg(count(lit(1)).as(cntN))))
            col(cntN) > 0
          } else {
            val markN = s"__ex_match_$i"
            val pairs = corr.distinct
            val keyCols = pairs.map(_._1).distinct
            val keyName = keyCols.zipWithIndex
              .map { case (k, j) => k -> s"__ex_key_${i}_$j" }.toMap
            val keys = existsRel
              .select(keyCols.map(qref): _*).distinct()
              .toDF(keyCols.map(keyName): _*)
              .withColumn(markN, lit(true))
            val cond = pairs.map { case (ic, oc) =>
              qcol(df, oc) === keys(keyName(ic)) }.reduce(_ && _)
            df = df.join(keys, cond, "left_outer")
            col(markN).isNotNull
          }
        subPreds += (node: Pred) -> c
      }
      // 2c. correlated scalar subqueries in WHERE comparisons
      //     (`WHERE x > (SELECT AVG(y) FROM t WHERE t.k = outer.k)`): the
      //     subquery attaches through the same Kim/Dayal grouped-aggregate
      //     decorrelation as the SELECT-list path (attachCorrScalar),
      //     under a reserved __cw_ name; the WHOLE comparison rewrites to
      //     a Column reading the attached value — ANSI NULL semantics fall
      //     out (empty non-COUNT group → NULL → comparison NULL → row
      //     dropped), and the node composes under AND/OR/NOT.
      //     Every distinct correlated atom in the node's operand trees is
      //     attached once (identical subqueries share one join), and the
      //     comparison lowers through operandCol with the atom→column map
      //     — so the subquery composes inside arithmetic, CAST, and
      //     scalar functions exactly like any other operand.
      locally {
        val nodes = where.flatMap(p => collectCorrCmps(p, df)).distinct
        val atoms = nodes.flatMap { case PCmp(Cmp(l, _, r)) =>
          corrSubsInOperand(l, df) ++ corrSubsInOperand(r, df)
        }.distinct
        val corr: Map[Select, Column] = atoms.zipWithIndex.map {
          case (subSel, i) =>
            val alias = s"__cw_$i"
            df = attachCorrScalar(df, subSel, alias)
            subSel -> col(alias)
        }.toMap
        nodes.foreach { case node @ PCmp(Cmp(l, op, r)) =>
          subPreds += (node: Pred) -> applyCmpOp(
            operandCol(base, l, corr), op, operandCol(base, r, corr))
        }
      }
      // 2. WHERE — ANSI split: conjuncts that do not read a window alias
      //    filter the window INPUT (plain column equality still lands in
      //    the scan's PushedFilters); conjuncts that do read one are the
      //    QUALIFY idiom and apply after window attachment (round-7
      //    ADVICE: the old all-post-window order silently diverged from
      //    ANSI when a plain filter met a window whose partition did not
      //    include the filtered column).
      val winAliases = items.collect { case w: WinItem => w.alias }.toSet
      val (postWin, preWin) = where.flatMap(splitConjuncts)
        .partition(c => refNames(c).exists(winAliases))
      preWin.foreach(c => df = df.filter(predCol(base, c, subPreds)))
      items.foreach {
        case WinItem(f, arg, parts, keys, alias, frame) =>
          import org.apache.spark.sql.expressions.Window
          // a global window (no PARTITION BY) single-tasks the whole
          // relation — fine over a dimension/grid, a scale-killer over a
          // fact. The dialect can't see cardinality, so it WARNS (the
          // engine's own WindowExec warning fires too); unordered ranks
          // stay refused outright, as nondeterminism is a correctness
          // matter, not a performance one.
          if (parts.isEmpty)
            org.slf4j.LoggerFactory.getLogger(getClass).warn(
              s"window $f over $alias has no PARTITION BY: the whole " +
                "relation sorts in one task — acceptable for " +
                "dimension-sized inputs only")
          // frame-free aggregate window (r15): no ORDER BY → no sort at
          // all, and Spark's default frame is the WHOLE partition — the
          // share-of-total idiom (n / SUM(n) OVER ()). Deterministic by
          // construction; the parser restricts it to SUM/COUNT/AVG/MIN/
          // MAX. With an order the ANSI default RANGE frame applies.
          val partitioned = Window.partitionBy(parts.map(qref): _*)
          val ordered =
            if (keys.isEmpty) partitioned
            else partitioned.orderBy(keys.map(k =>
              if (k.desc) qref(k.name).desc else qref(k.name).asc): _*)
          // EXCLUDE CURRENT ROW (r14) rides the frame kind as a suffix:
          // strip it here, build the FULL-frame spec, and rewrite the
          // aggregate arithmetically below (full frame minus the row's
          // own contribution) — Spark has no native frame exclusion.
          val (frameBase, xcur) = frame match {
            case Some((k, lo, hi)) if k.endsWith("_xcur") =>
              (Some((k.dropRight(5), lo, hi)), true)
            case other => (other, false)
          }
          val spec = frameBase match {
            case None => ordered // ANSI default RANGE frame
            case Some(("range", lo, hi)) => ordered.rangeBetween(
              lo.fold(Window.unboundedPreceding)(n => -n),
              hi.fold(Window.unboundedFollowing)(n => n))
            // INTERVAL n DAY bounds (r14): re-key the RANGE frame onto
            // exact day numbers — datediff from the epoch is order- and
            // tie-equivalent to the DATE key itself, so `INTERVAL 7 DAY
            // PRECEDING` is precisely a 7-day value frame (DuckDB
            // semantics at day granularity). DATE keys only; a timestamp
            // would silently bucket to days, so it is refused.
            case Some(("range_days", lo, hi)) =>
              require(keys.length == 1 && !keys.head.desc,
                "an INTERVAL frame takes exactly one ascending ORDER BY key")
              val k = keys.head.name
              val kc = qref(k)
              val dayNum = datediff(to_date(kc), to_date(lit("1970-01-01")))
              val keyExpr = df.schema.find(_.name == k).map(_.dataType) match {
                case Some(DateType) => dayNum
                // timestamp keys are accepted ONLY when every value is
                // midnight-aligned (a date stored as a timestamp, the
                // common parquet shape) — checked per row at scan speed;
                // an intra-day time would make day-keyed RANGE silently
                // diverge from exact interval arithmetic, so it raises
                case Some(TimestampType) | Some(TimestampNTZType) =>
                  when(kc =!= to_date(kc).cast(
                      df.schema.find(_.name == k).get.dataType),
                    raise_error(concat(lit(s"INTERVAL frame key $k has a "),
                      lit("non-midnight timestamp; day-granularity RANGE "),
                      lit("requires date-valued keys"))))
                    .otherwise(dayNum)
                case other => throw new IllegalArgumentException(
                  s"INTERVAL frame ORDER BY key $k must be DATE-valued, got $other")
              }
              Window.partitionBy(parts.map(qref): _*)
                .orderBy(keyExpr)
                .rangeBetween(
                  lo.fold(Window.unboundedPreceding)(n => -n),
                  hi.fold(Window.unboundedFollowing)(n => n))
            case Some((_, lo, hi)) => ordered.rowsBetween(
              lo.fold(Window.unboundedPreceding)(n => -n),
              hi.fold(Window.unboundedFollowing)(n => n))
          }
          val fn = f match {
            case "ROW_NUMBER" => row_number()
            case "RANK" => rank()
            case "DENSE_RANK" => dense_rank()
            // (rank−1)/(rows−1): a ratio of exact integers, identically
            // defined in DuckDB — bitwise cross-engine
            case "PERCENT_RANK" => percent_rank()
            // rows-with-peers-or-before / rows: same exact-int ratio
            // class (ANSI CUME_DIST, identical in DuckDB)
            case "CUME_DIST" => cume_dist()
            case "NTILE" => ntile(arg.get.toInt)
            // out-of-partition rows yield NULL, identically in DuckDB
            case "NTH_VALUE" =>
              val Array(c, n) = arg.get.split(":")
              nth_value(qref(c), n.toInt)
            case "LAG" | "LEAD" =>
              val Array(c, off) = arg.get.split(":")
              if (f == "LAG") lag(col(c), off.toInt) else lead(col(c), off.toInt)
            case "FIRST_VALUE" | "LAST_VALUE" =>
              // "!ignore" suffix = ANSI IGNORE NULLS (Spark's ignoreNulls
              // flag; DuckDB-identical: the nearest non-null in frame)
              val (c, ign) = arg.get.split("!") match {
                case Array(c0, "ignore") => (c0, true)
                case _ => (arg.get, false)
              }
              if (f == "FIRST_VALUE") first(qref(c), ignoreNulls = ign)
              else last(qref(c), ignoreNulls = ign)
            // ordered aggregate: ANSI default frame (RANGE unbounded
            // preceding → current row), same default in DuckDB
            case agg => aggColumn(agg, arg)
          }
          val result =
            if (!xcur) fn.over(spec)
            else f match {
              // leave-one-out rewrites. NULL edges follow the engines'
              // shared semantics: SUM/AVG over a reduced frame with no
              // non-null values is NULL (not 0); COUNT is 0.
              case "SUM" =>
                val x = qref(arg.get)
                val nX = count(x).over(spec) -
                  when(x.isNotNull, lit(1L)).otherwise(lit(0L))
                when(nX === 0, lit(null))
                  .otherwise(sum(x).over(spec) - coalesce(x, lit(0)))
              case "COUNT" if arg.isEmpty =>
                count(lit(1)).over(spec) - lit(1L)
              case "COUNT" =>
                val x = qref(arg.get)
                count(x).over(spec) -
                  when(x.isNotNull, lit(1L)).otherwise(lit(0L))
              case "AVG" =>
                val x = qref(arg.get)
                val nX = count(x).over(spec) -
                  when(x.isNotNull, lit(1L)).otherwise(lit(0L))
                val sX = sum(x).over(spec) - coalesce(x, lit(0))
                // exact-integer dividend/divisor → ONE IEEE division,
                // bitwise cross-engine for integral columns
                when(nX === 0, lit(null))
                  .otherwise(sX.cast("double") / nX)
              case other => throw new IllegalArgumentException(
                s"EXCLUDE CURRENT ROW supports SUM/COUNT/AVG, not $other")
            }
          df = df.withColumn(alias, result)
        case _ => ()
      }
      postWin.foreach(c => df = df.filter(predCol(base, c, subPreds)))
      // QUALIFY (r9): explicit window filter — same lowering as the
      // post-window WHERE conjuncts, just spelled the ANSI-extension way
      qualify.foreach(c => df = df.filter(predCol(base, c, subPreds)))
      val hasAgg = items.exists(i =>
        i.isInstanceOf[AggItem] || i.isInstanceOf[AggExprItem])
      // ORDER BY expression keys (r9): hidden __ob_i columns. On the
      // plain-projection path they attach BEFORE the projection, so the
      // expression may read underlying columns not in the select list
      // (ANSI); on the aggregated path they attach to the aggregated
      // output below (output names only — ANSI's restriction anyway).
      val obExprs = orderBy.zipWithIndex.collect {
        case (k, i) if k.expr.isDefined => (s"__ob_$i", k.expr.get)
      }
      if (obExprs.nonEmpty) {
        require(!distinct, "ORDER BY expressions cannot combine with " +
          "SELECT DISTINCT — order by a select-list alias instead")
        if (!hasAgg && groupBy.isEmpty)
          obExprs.foreach { case (hn, o) =>
            df = df.withColumn(hn, operandCol(base, o))
          }
      }
      // hidden GROUP BY expression columns (r9) attach pre-aggregation;
      // their names ride groupBy like any key and the item projection
      // below drops them
      groupExprs.foreach { case (hn, o) =>
        df = df.withColumn(hn, operandCol(base, o))
      }
      // 3. aggregation (graft extension) or plain SELECT-list projection
      var out: DataFrame =
        if (hasAgg || groupBy.nonEmpty) {
          items.foreach {
            // either spelling may be the group key: the raw (possibly
            // qualified) column or its output alias (ordinals resolve to
            // the alias, which step 1 attached as a real column)
            case ColItem(c, a) =>
              require(groupBy.contains(c) || a.exists(groupBy.contains),
                s"column $c must appear in GROUP BY")
            // a CASE or computed alias may be a group key (the bucketing
            // idiom: GROUP BY the computed bucket) — it was attached pre-agg
            case it: CaseItem => require(groupBy.contains(it.alias),
              s"CASE alias ${it.alias} must appear in GROUP BY")
            case it: ExprItem => require(groupBy.contains(it.alias),
              s"expression alias ${it.alias} must appear in GROUP BY")
            case Star | _: StarExclude | _: StarPattern =>
              throw new IllegalArgumentException(
                "SELECT * cannot be combined with aggregates/GROUP BY")
            case d: DistItem => throw new IllegalArgumentException(
              s"distance item ${d.alias} cannot be combined with aggregates/GROUP BY")
            case _: AggItem => ()
            case _: AggExprItem => ()
            case w: WinItem => throw new IllegalArgumentException(
              s"window item ${w.alias} cannot be combined with aggregates/GROUP BY")
          }
          val plain = items.collect { case it: AggItem =>
            aggItemCol(df, it) }
          // each distinct aggregate atom inside expressions computes ONCE
          // under a RESERVED internal name (never a user-visible alias:
          // deduplicating against plain items let `SELECT SUM(x) AS
          // sum_v, SUM(v) / 2 ...` silently read the SUM(x) column —
          // round-7 ADVICE). Catalyst collapses identical aggregate
          // expressions, so the occasional double registration is free.
          val exprAggs = items
            .collect { case AggExprItem(o, _) => aggAtoms(o) }.flatten.distinct
            .map {
              case OAgg(f, arg) =>
                aggColumn(f, arg).as("__agg_" + aggAlias(f, arg, None))
              // expression aggregates (r15): the argument lowers over the
              // PRE-aggregation rows (CASE/arithmetic per row, then the
              // partial-combined aggregate — one scan, map-side combine);
              // the internal name is the atom's structural hash, so the
              // same spelled atom computes once and reads consistently
              case a @ OAggX(f, o) =>
                aggColumnX(f, operandCol(df, o)).as(aggxName(a))
              case other => throw new IllegalArgumentException(
                s"unexpected aggregate atom: $other")
            }
          val aggs = plain ++ exprAggs
          require(aggs.nonEmpty, "GROUP BY requires at least one aggregate")
          // ROLLUP/CUBE lower to Dataset.rollup/cube — ONE Expand pass
          // produces every grouping set (no re-aggregation per level)
          val agged =
            (groupMode match {
              case "rollup" => df.rollup(groupBy.map(qref): _*)
              case "cube" => df.cube(groupBy.map(qref): _*)
              // explicit GROUPING SETS: the same single-Expand plan as
              // rollup/cube, with exactly the listed sets
              case "sets" =>
                df.groupingSets(groupSets.map(_.map(qref)), groupBy.map(qref): _*)
              case _ => df.groupBy(groupBy.map(qref): _*)
            }).agg(aggs.head, aggs.tail: _*)
          // post-aggregation expression evaluation: aggregate atoms read
          // their computed columns, ORefs read group keys, literals stay
          def aggExprCol(o: Operand): Column = o match {
            case OAgg(f, arg) => col("__agg_" + aggAlias(f, arg, None))
            case a: OAggX => col(aggxName(a))
            case ORef(n) => qref(n)
            case OVal(VNum(s)) => numLit(s)
            case s: OSub => operandCol(base, s) // scalar subquery: already a literal
            case OArith(l, op, r) =>
              val (lc, rc) = (aggExprCol(l), aggExprCol(r))
              op match {
                case "+" => lc + rc
                case "-" => lc - rc
                case "*" => lc * rc
                case "/" => lc / rc
                case "%" => lc % rc
              }
            case OFunc(f, fargs) => funcApply(f, fargs.map(aggExprCol), fargs)
            case OCast(x, t, tm) =>
              val c = aggExprCol(x)
              if (tm) call_function("graft_try_cast", c, lit(sqlTypeName(t)))
              else c.cast(sqlTypeName(t))
            case other => throw new IllegalArgumentException(
              s"unsupported term in aggregate expression: $other")
          }
          agged.select(items.map {
            case ColItem(c, alias) =>
              // the aggregated frame carries whichever spelling was the
              // group key — the raw column or the attached alias
              val n = if (groupBy.contains(c)) c else alias.getOrElse(c)
              qref(n).as(alias.getOrElse(c))
            case it: CaseItem => col(it.alias)
            case it: ExprItem => col(it.alias)
            case AggItem(f, arg, alias, _) => col(aggAlias(f, arg, alias))
            case AggExprItem(o, alias) => aggExprCol(o).as(alias)
            case other => throw new IllegalStateException(other.toString)
          }: _*)
        } else {
          df.select(items.flatMap {
            case Star => base.columns.toSeq.map(col)
            case StarPattern(re) =>
              val pat = java.util.regex.Pattern.compile(re)
              val hit = base.columns.toSeq.filter(c => pat.matcher(c).find())
              require(hit.nonEmpty, s"COLUMNS('$re') matches no column of " +
                s"(${base.columns.mkString(", ")})")
              hit.map(qref)
            case StarExclude(ex, repl) =>
              val have = base.columns.toSet
              ex.foreach(c => require(have.contains(c),
                s"EXCLUDE names unknown column: $c"))
              repl.foreach { case (c, _) => require(have.contains(c),
                s"REPLACE names unknown column: $c") }
              val rm = repl.toMap
              base.columns.toSeq.filterNot(ex.toSet).map { c =>
                rm.get(c).fold(col(c))(o => operandCol(base, o).as(c)) }
            case ColItem(c, alias) => Seq(col(alias.getOrElse(c)))
            case DistItem(_, _, alias) => Seq(col(alias))
            case CaseItem(_, _, alias) => Seq(col(alias))
            case ExprItem(_, alias) => Seq(col(alias))
            case WinItem(_, _, _, _, alias, _) => Seq(col(alias))
            case other => throw new IllegalStateException(other.toString)
          } ++ obExprs.map { case (hn, _) => col(hn) }: _*)
        }
      // 4. HAVING filters the aggregated output — by output names, and
      //    (r9) by aggregate EXPRESSIONS: `HAVING COUNT(*) >= 20` resolves
      //    each aggregate atom to its select-item twin's output column
      //    (ANSI spelling without requiring the alias). Catalyst evaluates
      //    post-aggregation, exactly ANSI HAVING semantics.
      if (having.nonEmpty) {
        require(hasAgg || groupBy.nonEmpty, "HAVING requires GROUP BY/aggregates")
        having.foreach(pred =>
          out = out.filter(predCol(out, resolveHavingAggs(pred, items))))
      }
      // 4b. SELECT DISTINCT dedupes the projected output (ANSI position:
      //     after HAVING, before ORDER BY/LIMIT) — lowered to the same
      //     partial-combined aggregate as any distinct, no driver state
      if (distinctOn.nonEmpty) {
        // DISTINCT ON (cols): first row per ON-group under the ORDER BY
        // tail. Determinism contract: ORDER BY must lead with the ON
        // columns and carry at least one further tiebreak key; the pick
        // runs as a partitioned row_number (no global sort), the final
        // ORDER BY below still applies to the kept rows.
        require(rawOrderBy.size > distinctOn.size &&
          distinctOn.zip(rawOrderBy).forall { case (c, k) =>
            k.name == c && k.expr.isEmpty },
          "DISTINCT ON requires ORDER BY to lead with the ON columns " +
            "followed by at least one tiebreak key")
        val ties = orderBy.drop(distinctOn.size).map { k =>
          require(k.expr.isEmpty, "DISTINCT ON tiebreak keys must be column names")
          if (k.desc) qref(k.name).desc else qref(k.name).asc
        }
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(distinctOn.map(qref): _*).orderBy(ties: _*)
        out = out.withColumn("__don", row_number().over(w))
          .filter(col("__don") === 1).drop("__don")
      } else if (distinct) out = out.dropDuplicates()
      // 5. ORDER BY / LIMIT over output names. Catalyst turns
      //    orderBy+limit into TakeOrderedAndProject (top-k, no global sort)
      if (orderBy.nonEmpty) {
        // expression keys read their hidden __ob_i columns (attached
        // pre-projection on the plain path; computed from output names
        // here on the aggregated path), sort, then drop — the projection
        // folds into TakeOrderedAndProject under a LIMIT, so the hidden
        // column never materializes globally
        val sortCols = orderBy.zipWithIndex.map { case (k, i) =>
          val c = k.expr match {
            case Some(o) =>
              val hn = s"__ob_$i"
              if (!out.columns.contains(hn))
                out = out.withColumn(hn, operandCol(out, o))
              col(hn)
            case None => col(k.name)
          }
          (k.desc, k.nullsFirst) match {
            case (false, None) => c.asc
            case (true, None) => c.desc
            case (false, Some(true)) => c.asc_nulls_first
            case (false, Some(false)) => c.asc_nulls_last
            case (true, Some(true)) => c.desc_nulls_first
            case (true, Some(false)) => c.desc_nulls_last
          }
        }
        out = out.orderBy(sortCols: _*)
        if (obExprs.nonEmpty) out = out.drop(obExprs.map(_._1): _*)
      }
      // ANSI pagination: OFFSET skips before LIMIT counts (Dataset.offset
      // composes with the sort into a single GlobalLimit — no full
      // materialization of the skipped prefix)
      offsetN.foreach(m => out = out.offset(m.toInt))
      limitN.foreach(nRows => out = out.limit(nRows.toInt))
      out
    }
  }

  /** Column ref with backtick quoting for the dotted names that aliased
    * relations carry (`a.col` is ONE column, not a struct access). */
  private def qref(n: String): Column =
    if (n.contains('.')) col(s"`$n`") else col(n)

  private def qcol(df: DataFrame, n: String): Column =
    if (n.contains('.')) df.col(s"`$n`") else df.col(n)

  /** Rename every column of `df` to `alias.col` (the aliased-relation
    * naming contract; a lazy projection, free under codegen). */
  private def aliasCols(df: DataFrame, alias: Option[String]): DataFrame =
    alias.fold(df)(a => df.toDF(df.columns.map(c => s"$a.$c").toIndexedSeq: _*))

  /** STRING_AGG per-group size cap (values per group). Env-tunable via
    * SPARK_GRAFT_STRING_AGG_MAX for corpora with legitimately huge
    * groups; the default is generous for any analytic concat. */
  private val StringAggMaxGroup: Long =
    sys.env.get("SPARK_GRAFT_STRING_AGG_MAX").flatMap(_.toLongOption)
      .getOrElse(1000000L)

  /** The C-style (DuckDB-spelled) strftime/strptime format string
    * translated to Spark's java.time pattern at parse time; only the
    * portable directives are accepted — anything else fails loudly
    * rather than silently formatting/parsing differently (r14 STRFTIME
    * doctrine, shared with r15 STRPTIME). */
  private def cFormatToJava(fmt: String, fn: String): String = {
    val out = new StringBuilder
    var i = 0
    while (i < fmt.length) {
      if (fmt.charAt(i) == '%') {
        require(i + 1 < fmt.length, s"dangling % in $fn format")
        out.append(fmt.charAt(i + 1) match {
          case 'Y' => "yyyy"
          case 'm' => "MM"
          case 'd' => "dd"
          case 'H' => "HH"
          case 'M' => "mm"
          case 'S' => "ss"
          case 'j' => "DDD"
          case '%' => "%"
          case c => throw new IllegalArgumentException(
            s"unsupported $fn directive %$c")
        })
        i += 2
      } else {
        val c = fmt.charAt(i)
        require(!c.isLetter,
          s"literal letter '$c' in $fn format needs a %-directive")
        out.append(c)
        i += 1
      }
    }
    out.toString
  }

  /** Expression-aggregate lowering (r15, [[EmdriveSql.OAggX]]): the
    * argument Column was already lowered over PRE-aggregation rows. */
  private def aggColumnX(func: String, x: Column): Column = func match {
    case "COUNT" => count(x)
    case "SUM" => sum(x)
    case "AVG" => avg(x)
    case "MIN" => min(x)
    case "MAX" => max(x)
    case other => throw new IllegalArgumentException(
      s"$other does not take an expression argument")
  }

  /** Internal column name for an expression-aggregate atom: the case
    * class's structural hash (murmur3 over the operand tree — stable
    * within and across JVMs), so one spelled atom computes once and every
    * reader resolves the same column; never a user-visible alias (the
    * round-7 shadowing lesson). */
  private def aggxName(a: EmdriveSql.OAggX): String =
    "__aggx_" + java.lang.Integer.toHexString(a.hashCode)

  private def aggColumn(func: String, arg: Option[String]): Column =
    (func, arg) match {
      case ("COUNT", None) => count(lit(1))
      case ("COUNT", Some(c)) => count(qref(c))
      // exact distinct (the partial-combined two-phase Expand plan); the
      // 100 TB approximate alternative is approx_count_distinct
      case ("COUNT_DISTINCT", Some(c)) => countDistinct(qref(c))
      case ("SUM", Some(c)) => sum(qref(c))
      case ("AVG", Some(c)) => avg(qref(c))
      case ("MIN", Some(c)) => min(qref(c))
      case ("MAX", Some(c)) => max(qref(c))
      // exact interpolated median — the same cross-engine-stable
      // percentile the q_percentile operator uses (DuckDB: median =
      // quantile_cont(.5), identical interpolation)
      case ("MEDIAN", Some(c)) => percentile(qref(c), lit(0.5))
      // GROUPING(col) — 1 on the subtotal rows where col is rolled up,
      // 0 on detail rows (ANSI; disambiguates a real NULL key from a
      // rollup NULL). Widened from Spark's tinyint to bigint so the
      // dialect's type is engine-independent.
      case ("GROUPING", Some(c)) => grouping(qref(c)).cast("bigint")
      // boolean quantifiers (ANSI EVERY/ANY; the DuckDB spelling) — both
      // engines skip NULLs and return NULL on all-NULL groups
      case ("BOOL_AND", Some(c)) => bool_and(qref(c))
      case ("BOOL_OR", Some(c)) => bool_or(qref(c))
      // sample standard deviation (n−1 denominator in both engines).
      // Float-accumulated — keys must round(…, 6) per the §5 discipline.
      case ("STDDEV", Some(c)) => stddev_samp(qref(c))
      // ordered concatenation: collect → sort → join, so the result is
      // deterministic on any partitioning (the DuckDB twin spells the
      // same order as string_agg(c, sep ORDER BY c))
      case ("ARG_MAX", Some(enc)) =>
        val Array(a, b) = enc.split("", 2)
        max_by(qref(a), qref(b))
      case ("ARG_MIN", Some(enc)) =>
        val Array(a, b) = enc.split("", 2)
        min_by(qref(a), qref(b))
      // deterministic ONLY over per-group-constant input (the gate key's
      // use); Spark and DuckDB agree trivially there
      case ("ANY_VALUE", Some(c)) => any_value(qref(c))
      case ("STRING_AGG", Some(enc)) =>
        // limit-2 split: an empty separator (or one containing the
        // U+0001 delimiter itself) round-trips -- Java's limitless char
        // split drops trailing empty tokens and would MatchError here
        // for STRING_AGG(col, '') (r13 ADVICE)
        val Array(c, sep) = enc.split("", 2)
        // per-group memory is the group's full value list (STRING_AGG's
        // inherent semantics) -- at 100 TB one degenerate hot key would
        // concentrate its whole list on a single task, so a loud error
        // above the cap beats a silent executor OOM (r13 verdict note).
        val lst = sort_array(collect_list(qref(c)))
        when(size(lst) > StringAggMaxGroup,
            raise_error(concat(lit("STRING_AGG group for '"), lit(c),
              lit(s"' exceeds $StringAggMaxGroup values; aggregate or "),
              lit("bucket the group key first"))))
          .otherwise(array_join(lst, sep))
      case ("ARRAY_AGG", Some(enc)) =>
        // col + direction ride the arg slot U+0001-joined (parse
        // guarantees ORDER BY the aggregated column itself, so
        // sort_array IS the ordered aggregation — deterministic on any
        // partitioning). Same per-group memory model as STRING_AGG:
        // the group's full value list, capped loudly.
        val Array(c, dir) = enc.split("", 2)
        // DuckDB parity (r14 ADVICE): ARRAY_AGG KEEPS NULL elements --
        // Spark's collect_list silently drops them -- and orders NULLS
        // LAST in both directions (DuckDB default_null_order, probed).
        // Elements ride a (null-rank, value) struct so collect_list
        // cannot drop them (a struct value is never NULL) and
        // sort_array's field-wise struct ordering lands NULLs last:
        // ascending sorts (isNull, v) -- false before true; descending
        // sorts (isNotNull, v) -- true first. The same projection
        // unwraps (codegen'd transform), so the product is a plain list.
        val asc = dir == "a"
        val x = qref(c)
        val lst = transform(
          sort_array(collect_list(struct(
            (if (asc) x.isNull else x.isNotNull).as("n"), x.as("v"))),
            asc = asc),
          e => e.getField("v"))
        when(size(lst) > StringAggMaxGroup,
            raise_error(concat(lit("ARRAY_AGG group for '"), lit(c),
              lit(s"' exceeds $StringAggMaxGroup values; aggregate or "),
              lit("bucket the group key first"))))
          .otherwise(lst)
      case other => throw new IllegalArgumentException(s"bad aggregate: $other")
    }

  /** FILTER (WHERE …) lowering: the aggregate's input becomes
    * `when(cond, x)` — every aggregate here skips NULLs, so folding the
    * NULLed-out rows is exactly the ANSI FILTER semantics (COUNT(*)
    * counts a non-null literal under the condition). GROUPING cannot
    * take a FILTER (it reads the grouping-set mask, not rows). */
  private def aggColumnFiltered(func: String, arg: Option[String],
      cond: Column): Column = {
    def g(c: String): Column = when(cond, qref(c))
    (func, arg) match {
      case ("COUNT", None) => count(when(cond, lit(1)))
      case ("COUNT", Some(c)) => count(g(c))
      case ("COUNT_DISTINCT", Some(c)) => countDistinct(g(c))
      case ("SUM", Some(c)) => sum(g(c))
      case ("AVG", Some(c)) => avg(g(c))
      case ("MIN", Some(c)) => min(g(c))
      case ("MAX", Some(c)) => max(g(c))
      case ("MEDIAN", Some(c)) => percentile(g(c), lit(0.5))
      case ("BOOL_AND", Some(c)) => bool_and(g(c))
      case ("BOOL_OR", Some(c)) => bool_or(g(c))
      case ("STDDEV", Some(c)) => stddev_samp(g(c))
      case other => throw new IllegalArgumentException(
        s"FILTER is not supported for aggregate: $other")
    }
  }

  private def aggItemCol(base: DataFrame, it: AggItem): Column =
    (it.filter match {
      case None => aggColumn(it.func, it.arg)
      case Some(p) => aggColumnFiltered(it.func, it.arg, predCol(base, p))
    }).as(aggAlias(it.func, it.arg, it.alias))

  private def aggAlias(func: String, arg: Option[String], alias: Option[String]): String =
    alias.getOrElse(arg match {
      case None => "count"
      // STRING_AGG's arg slot carries "colsep" — default name
      // from the column alone
      case Some(c) if c.contains('') =>
        s"${func.toLowerCase}_${c.split("", 2).head}"
      case Some(c) => s"${func.toLowerCase}_$c"
    })

  /** `@` adapts to the metric-key carrier type: binary(16) UINT128 → the
    * hamming128 byte kernel; integer/UINT64(decimal) hashes → 64-bit
    * xor+bit_count. Both are codegen expressions. */
  private def distCol(base: DataFrame, column: String, probe: Value): Column = {
    val dt = base.schema(column).dataType
    dt match {
      case BinaryType =>
        val bytes = probe match {
          case VBits(v) => bits128(v)
          case VStr(s) => s.getBytes("UTF-8")
          case other => throw new IllegalArgumentException(s"cannot probe binary with $other")
        }
        call_function("hamming128", col(column), lit(bytes))
      case _: NumericType =>
        val v = probe match {
          case VBits(b) => b.longValue
          case VNum(s) => s.toLong
          case other => throw new IllegalArgumentException(s"cannot probe numeric with $other")
        }
        call_function("hamming64", col(column).cast(LongType), lit(v))
      case other =>
        throw new IllegalArgumentException(s"@ requires a metric-key column, got $other")
    }
  }

  /** Pred nodes in a WHERE tree (the only place IN (SELECT …) is legal). */
  private def collectInSubs(p: Pred): Seq[PInSub] = p match {
    case s: PInSub => Seq(s)
    case PAnd(a, b) => collectInSubs(a) ++ collectInSubs(b)
    case POr(a, b) => collectInSubs(a) ++ collectInSubs(b)
    case PNot(x) => collectInSubs(x)
    case _ => Seq.empty
  }

  private def collectExists(p: Pred): Seq[PExists] = p match {
    case s: PExists => Seq(s)
    case PAnd(a, b) => collectExists(a) ++ collectExists(b)
    case POr(a, b) => collectExists(a) ++ collectExists(b)
    case PNot(x) => collectExists(x)
    case _ => Seq.empty
  }

  private def collectQuants(p: Pred): Seq[PQuant] = p match {
    case s: PQuant => Seq(s)
    case PAnd(a, b) => collectQuants(a) ++ collectQuants(b)
    case POr(a, b) => collectQuants(a) ++ collectQuants(b)
    case PNot(x) => collectQuants(x)
    case _ => Seq.empty
  }

  /** HAVING aggregate atoms → their select-item twin's output column
    * (r9): `HAVING COUNT(*) >= 20` works without an alias reference when
    * some item computes the same aggregate; an aggregate with no twin is
    * refused (this dialect aggregates only what the select list names —
    * the documented extension shape). Structural rewrite over the whole
    * predicate tree, so aggregates compose inside arithmetic/CAST. */
  private def resolveHavingAggs(p: Pred, items: Seq[SelectItem]): Pred = {
    def op(o: Operand): Operand = o match {
      case OAgg(f, arg) =>
        items.collectFirst {
          case AggItem(f2, arg2, alias, None) if f2 == f && arg2 == arg =>
            ORef(aggAlias(f2, arg2, alias))
        }.getOrElse(throw new IllegalArgumentException(
          s"HAVING aggregate $f(${arg.getOrElse("*")}) must also appear " +
            "in the select list"))
      // expression aggregates (r15): HAVING SUM(CASE … END) … resolves to
      // the structurally-identical select-item atom's output alias
      case a: OAggX =>
        items.collectFirst {
          case AggExprItem(o2, alias) if o2 == (a: Operand) => ORef(alias)
        }.getOrElse(throw new IllegalArgumentException(
          s"HAVING aggregate ${a.func}(<expr>) must also appear " +
            "in the select list (same spelling)"))
      case OArith(l, oper, r) => OArith(op(l), oper, op(r))
      case OFunc(f, as) => OFunc(f, as.map(op))
      case OCast(x, t, tm) => OCast(op(x), t, tm)
      case other => other
    }
    def walk(pr: Pred): Pred = pr match {
      case PCmp(Cmp(l, c, r)) => PCmp(Cmp(op(l), c, op(r)))
      case PAnd(a, b) => PAnd(walk(a), walk(b))
      case POr(a, b) => POr(walk(a), walk(b))
      case PNot(x) => PNot(walk(x))
      case PIn(l, vs, n) => PIn(op(l), vs, n)
      case PInTuple(ls, rows, n) => PInTuple(ls.map(op), rows, n)
      case PLike(l, pat, n, e, ci) => PLike(op(l), pat, n, e, ci)
      case PIsNull(l, n) => PIsNull(op(l), n)
      case other => other
    }
    walk(p)
  }

  /** Top-level AND conjuncts (the unit of the pre/post-window WHERE split
    * and of EXISTS decorrelation). */
  private def splitConjuncts(p: Pred): Seq[Pred] = p match {
    case PAnd(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  /** Column names a predicate reads (scalar subqueries inline to literals
    * and EXISTS reads its marker, so neither contributes). */
  private def refNamesO(o: Operand): Set[String] = o match {
    case ORef(n) => Set(n)
    case ODist(c, _) => Set(c)
    case OArith(l, _, r) => refNamesO(l) ++ refNamesO(r)
    case OFunc(_, args) => args.flatMap(refNamesO).toSet
    case OCast(o, _, _) => refNamesO(o)
    case _ => Set.empty
  }

  private def refNames(p: Pred): Set[String] = p match {
    case PCmp(Cmp(l, _, r)) => refNamesO(l) ++ refNamesO(r)
    case PAnd(a, b) => refNames(a) ++ refNames(b)
    case POr(a, b) => refNames(a) ++ refNames(b)
    case PNot(x) => refNames(x)
    case PIn(l, _, _) => refNamesO(l)
    case PInTuple(ls, _, _) => ls.flatMap(refNamesO).toSet
    case PInSub(l, _, _) => refNamesO(l)
    case PLike(l, _, _, _, _) => refNamesO(l)
    case PIsNull(l, _) => refNamesO(l)
    case PQuant(l, _, _, _) => refNamesO(l)
    case _: PExists => Set.empty
  }

  /** Correlated scalar subquery atoms ANYWHERE in an operand tree — not
    * just as a direct comparison side: `(SELECT MIN(x) …) * 10 > col`
    * nests its subquery inside arithmetic, and r8 ADVICE flagged that the
    * direct-side-only match let such atoms fall through to the
    * uncorrelated inline-literal path, which dies unresolved. */
  private def corrSubsInOperand(o: Operand, outer: DataFrame): Seq[Select] =
    o match {
      case OSub(sub) if isCorrScalar(sub, outer) => Seq(sub)
      case OArith(l, _, r) =>
        corrSubsInOperand(l, outer) ++ corrSubsInOperand(r, outer)
      case OFunc(_, args) => args.flatMap(corrSubsInOperand(_, outer))
      case OCast(x, _, _) => corrSubsInOperand(x, outer)
      case _ => Seq.empty
    }

  /** PCmp nodes with a correlated scalar subquery anywhere in either
    * operand tree — these decorrelate in lowerSelect's 2c pre-pass and
    * the whole comparison rewrites to a Column (composable under
    * AND/OR/NOT like IN/EXISTS). */
  private def collectCorrCmps(p: Pred, outer: DataFrame): Seq[PCmp] = p match {
    case s @ PCmp(Cmp(l, _, r))
      if (corrSubsInOperand(l, outer) ++ corrSubsInOperand(r, outer)).nonEmpty =>
      Seq(s)
    case PAnd(a, b) => collectCorrCmps(a, outer) ++ collectCorrCmps(b, outer)
    case POr(a, b) => collectCorrCmps(a, outer) ++ collectCorrCmps(b, outer)
    case PNot(x) => collectCorrCmps(x, outer)
    case _ => Seq.empty
  }

  private def applyCmpOp(l: Column, op: String, r: Column): Column = op match {
    case "=" => l === r
    case "!=" => l =!= r
    case "<" => l < r
    case "<=" => l <= r
    case ">" => l > r
    case ">=" => l >= r
  }

  private def predCol(base: DataFrame, p: Pred,
      subs: Map[Pred, Column] = Map.empty): Column = p match {
    case s: PCmp if subs.contains(s) => subs(s)
    case PCmp(c) => cmpCol(base, c)
    case PAnd(a, b) => predCol(base, a, subs) && predCol(base, b, subs)
    case POr(a, b) => predCol(base, a, subs) || predCol(base, b, subs)
    case PNot(x) => !predCol(base, x, subs)
    case s: PInSub => subs.getOrElse(s, throw new IllegalArgumentException(
      "IN (SELECT …) is only supported in WHERE"))
    case s: PExists => subs.getOrElse(s, throw new IllegalArgumentException(
      "EXISTS (SELECT …) is only supported in WHERE"))
    case s: PQuant => subs.getOrElse(s, throw new IllegalArgumentException(
      "ANY/ALL (SELECT …) is only supported in WHERE"))
    case PIn(lhs, vals, neg) =>
      // raw literal values (not Columns) build a true Catalyst In — the
      // shape the parquet datasource translates to a pushed IN filter
      val lits: Seq[Any] = vals.map {
        case VNum(s) => if (s.contains('.')) s.toDouble else s.toLong
        case VStr(s) => s
        case VBool(b) => b
        case VBits(v) => v.longValue
        case other =>
          throw new IllegalArgumentException(s"IN list expects literals, got $other")
      }
      val c = operandCol(base, lhs).isin(lits: _*)
      if (neg) !c else c
    case PLike(lhs, pat, neg, esc, ci) =>
      // 3-arg `like` is the registry spelling of LIKE … ESCAPE (same
      // Catalyst Like expression, custom escape char); ILIKE is the
      // case-insensitive Catalyst ILike — both codegen
      val l = operandCol(base, lhs)
      val c =
        if (ci) l.ilike(pat)
        else esc.fold(l.like(pat))(e =>
          call_function("like", l, lit(pat), lit(e)))
      if (neg) !c else c
    case PInTuple(lhs, rows, neg) =>
      val cols = lhs.map(operandCol(base, _))
      val c = rows.map(r =>
        cols.zip(r).map { case (cl, v) => cl === operandCol(base, OVal(v)) }
          .reduce(_ && _)).reduce(_ || _)
      if (neg) !c else c
    case PIsNull(lhs, neg) =>
      if (neg) operandCol(base, lhs).isNotNull
      else operandCol(base, lhs).isNull
  }

  /** Searched CASE → when().when()….otherwise() Column chain; branches
    * evaluate in order, exactly ANSI semantics (Catalyst CaseWhen). */
  private def caseCol(base: DataFrame, it: EmdriveSql.CaseItem): Column = {
    val first = when(predCol(base, it.branches.head._1),
      operandCol(base, it.branches.head._2))
    val chained = it.branches.tail.foldLeft(first) { case (acc, (pr, v)) =>
      acc.when(predCol(base, pr), operandCol(base, v))
    }
    it.elseV.fold(chained)(v => chained.otherwise(operandCol(base, v)))
  }

  /** Numeric literal → Column. Integer literals beyond int64 (the dialect's
    * UINT64 tier, reference components.rs u64/u128 values) lower to exact
    * DECIMAL literals instead of overflowing Long.parseLong. */
  private def numLit(s: String): Column =
    if (s.contains('.')) lit(s.toDouble)
    else try lit(s.toLong) catch {
      case _: NumberFormatException => lit(new java.math.BigDecimal(s))
    }

  private def operandCol(base: DataFrame, o: Operand,
      corr: Map[Select, Column] = Map.empty): Column = o match {
    case ORef(n) => qref(n)
    case ODist(c, probe) => distCol(base, c, probe)
    // correlated scalar subquery already decorrelated by the 2c pre-pass:
    // read the attached column instead of executing standalone
    case OSub(sub) if corr.contains(sub) => corr(sub)
    case OSub(sub) =>
      // uncorrelated scalar subquery: executed first, value inlined as a
      // literal (Spark's own ScalarSubquery shape — keeps the outer
      // predicate pushable). The 2-row collect is a documented bounded
      // driver pre-pass enforcing the at-most-one-row rule. A correlated
      // subquery that the decorrelator does not recognize (e.g. joined or
      // grouped inner relation with an outer reference) would otherwise
      // die here with an opaque unresolved-column error — turn it into
      // the dialect's targeted message (r8 ADVICE).
      val df =
        try lowerSelect(sub)
        catch {
          case e: org.apache.spark.sql.AnalysisException
              if e.getMessage.contains("UNRESOLVED_COLUMN") ||
                e.getMessage.contains("cannot be resolved") =>
            throw new IllegalArgumentException(
              "scalar subquery references an outer column but is not a " +
                "supported correlated shape (single inner table, equality " +
                "correlation); decorrelate it manually or simplify the " +
                "inner relation", e)
        }
      require(df.columns.length == 1,
        s"scalar subquery must project exactly one column, got " +
          s"(${df.columns.mkString(", ")})")
      df.limit(2).collect() match {
        case Array() => lit(null).cast(df.schema.head.dataType)
        case Array(row) =>
          if (row.isNullAt(0)) lit(null).cast(df.schema.head.dataType)
          else lit(row.get(0))
        case _ => throw new IllegalArgumentException(
          s"scalar subquery returned more than one row")
      }
    case OVal(VNum(s)) => numLit(s)
    case OVal(VStr(s)) => lit(s)
    case OVal(VBits(v)) => lit(v.longValue)
    case OVal(VBool(b)) => lit(b)
    // ANSI comparison-with-NULL: yields NULL, so WHERE drops the row
    case OVal(VNull) => lit(null)
    case OVal(f: VFunc) => funcCol(f)
    case OArith(lhs, op, rhs) =>
      val (l, r) = (operandCol(base, lhs, corr), operandCol(base, rhs, corr))
      op match {
        case "+" => l + r
        case "-" => l - r
        case "*" => l * r
        case "/" => l / r
        case "%" => l % r
      }
    case OFunc(f, args) =>
      funcApply(f, args.map(operandCol(base, _, corr)), args)
    case OCast(o, t, tm) =>
      val c = operandCol(base, o, corr)
      if (tm) call_function("graft_try_cast", c, lit(sqlTypeName(t)))
      else c.cast(sqlTypeName(t))
    // operand-level CASE (r15): the when-chain, exactly the CaseItem
    // lowering — a NULL-subject/no-match row yields the ELSE (or NULL)
    case OCase(branches, elseV) =>
      // branch conditions are plain predicates (subquery forms stay a
      // WHERE-only shape, refused by predCol's default substitution map)
      val chain = branches.foldLeft(Option.empty[Column]) { case (acc, (pr, v)) =>
        val (c, x) = (predCol(base, pr), operandCol(base, v, corr))
        Some(acc.fold(when(c, x))(_.when(c, x)))
      }.get
      elseV.fold(chain)(e => chain.otherwise(operandCol(base, e, corr)))
    case a: OAgg => throw new IllegalArgumentException(
      s"aggregate ${a.func} is only valid in an aggregating SELECT's items")
    case a: OAggX => throw new IllegalArgumentException(
      s"aggregate ${a.func} is only valid in an aggregating SELECT's items")
  }

  /** Scalar-function dispatch over already-lowered argument Columns
    * (shared by the row path and the post-aggregation expression path —
    * `ROUND(SUM(x) / 7, 1)` lowers its atoms differently but applies the
    * same functions). `args` rides along for literal-only parameters. */
  private def funcApply(f: String, a: Seq[Column], args: Seq[Operand]): Column =
      (f, a) match {
        case ("UPPER", Seq(x)) => upper(x)
        case ("LOWER", Seq(x)) => lower(x)
        case ("LENGTH", Seq(x)) => length(x)
        case ("TRIM", Seq(x)) => trim(x)
        // 1-based, length-bounded — identical semantics in DuckDB substr
        case ("SUBSTR", Seq(x, fr, ln)) => x.substr(fr, ln)
        case ("REPLACE", Seq(x, s1, s2)) => replace(x, s1, s2)
        // null-handling / numeric scalar tier. COALESCE is the LEFT JOIN
        // companion (fill unmatched-right NULLs); all lower 1:1 onto
        // codegen'd Catalyst expressions with DuckDB-identical semantics.
        case ("COALESCE", xs) if xs.size >= 2 => coalesce(xs: _*)
        case ("NULLIF", Seq(x, y)) => nullif(x, y)
        case ("ABS", Seq(x)) => abs(x)
        // calendar extraction (UTC-pinned sessions, so NTZ and LTZ
        // timestamps read identically — the EventTime doctrine); ints
        // in both engines modulo width, CAST composes for exact schema
        case ("YEAR", Seq(x)) => year(x)
        case ("MONTH", Seq(x)) => month(x)
        case ("DAY", Seq(x)) => dayofmonth(x)
        case ("ROUND", Seq(x)) => round(x, 0)
        case ("ROUND", Seq(x, _)) => args(1) match {
          case OVal(VNum(n)) if !n.contains('.') => round(x, n.toInt)
          case _ => throw new IllegalArgumentException(
            "ROUND's second argument must be an integer literal")
        }
        // r9 widening — each lowers 1:1 onto a codegen Catalyst
        // expression with DuckDB-identical semantics (names follow the
        // DuckDB spelling where the engines differ: STRPOS ≡ Spark
        // instr, both 1-based/0-when-absent; DOW ≡ Spark dayofweek − 1,
        // both Sunday-based 0-6)
        case ("CONCAT", xs) if xs.size >= 2 => concat(xs: _*)
        case ("LPAD", Seq(x, _, _)) =>
          lpad(x, argInt(args(1), "LPAD length"), argStr(args(2), "LPAD pad"))
        case ("RPAD", Seq(x, _, _)) =>
          rpad(x, argInt(args(1), "RPAD length"), argStr(args(2), "RPAD pad"))
        case ("LEFT", Seq(x, y)) => call_function("left", x, y)
        case ("RIGHT", Seq(x, y)) => call_function("right", x, y)
        case ("STRPOS", Seq(x, y)) => call_function("instr", x, y)
        case ("SPLIT_PART", Seq(x, y, z)) => call_function("split_part", x, y, z)
        case ("CONTAINS", Seq(x, y)) => call_function("contains", x, y)
        case ("DATE_TRUNC", Seq(_, x)) =>
          date_trunc(argStr(args(0), "DATE_TRUNC unit"), x)
        case ("DOW", Seq(x)) => (dayofweek(x) - lit(1)).cast("int")
        case ("FLOOR", Seq(x)) => floor(x)
        case ("CEIL", Seq(x)) => ceil(x)
        // r12: n-ary comparison scalars — both engines return the extreme
        // of the NON-NULL arguments (Postgres GREATEST/LEAST semantics)
        case ("GREATEST", xs) if xs.size >= 2 => greatest(xs: _*)
        case ("LEAST", xs) if xs.size >= 2 => least(xs: _*)
        // DATEDIFF('day', a, b) = whole-day boundary count b − a — the
        // DuckDB date_diff spelling; both sides cast through DATE so the
        // count is calendar days, widened to BIGINT (DuckDB's type)
        case ("DATEDIFF", Seq(_, x, y)) =>
          argStr(args(0), "DATEDIFF unit").toLowerCase(java.util.Locale.ROOT) match {
            case "day" => datediff(y.cast("date"), x.cast("date")).cast("bigint")
            case u => throw new IllegalArgumentException(
              s"DATEDIFF supports unit 'day', got '$u'")
          }
        // r13: math tier — each lowers 1:1 onto a codegen Catalyst
        // expression; libm last-ulp differences sit ~10 digits below the
        // %.6g compare. SIGN returns DOUBLE (DuckDB TINYINT) — keys CAST.
        case ("POWER", Seq(x, y)) => pow(x, y)
        case ("SQRT", Seq(x)) => sqrt(x)
        case ("LN", Seq(x)) => log(x)
        case ("EXP", Seq(x)) => exp(x)
        case ("SIGN", Seq(x)) => signum(x)
        // r13: string/regex tier 3 (DuckDB spellings; REGEXP_REPLACE is
        // replace-ALL — the DuckDB twin needs the 'g' flag; CHR ≡ Spark
        // chr; REGEXP_MATCHES ≡ RLIKE, boolean-valued)
        case ("REVERSE", Seq(x)) => reverse(x)
        case ("REPEAT", Seq(x, _)) =>
          repeat(x, argInt(args(1), "REPEAT count"))
        case ("MD5", Seq(x)) => md5(x)
        case ("ASCII", Seq(x)) => ascii(x)
        case ("CHR", Seq(x)) => call_function("chr", x)
        case ("REGEXP_REPLACE", Seq(x, _, _)) =>
          regexp_replace(x, argStr(args(1), "REGEXP_REPLACE pattern"),
            argStr(args(2), "REGEXP_REPLACE replacement"))
        case ("REGEXP_MATCHES", Seq(x, _)) =>
          x.rlike(argStr(args(1), "REGEXP_MATCHES pattern"))
        // r14: JSON tier (DuckDB spellings). Both lower onto Spark's
        // codegen get_json_object, which returns the extracted value as
        // TEXT: identical to DuckDB json_extract_string for strings and
        // scalars; the dialect's JSON_EXTRACT is therefore text-valued
        // too (compose with CAST for numerics) -- DuckDB's JSON-typed
        // json_extract differs only in keeping quotes on string values,
        // so cross-engine keys use JSON_EXTRACT_STRING for strings and
        // CAST(JSON_EXTRACT(...) AS <numeric>) for numbers, where the
        // two engines agree byte-for-byte. The path must be a literal
        // ('$.key' JSONPath), which both engines constant-fold.
        case ("JSON_EXTRACT_STRING", Seq(x, _)) =>
          get_json_object(x, argStr(args(1), "JSON_EXTRACT_STRING path"))
        case ("JSON_EXTRACT", Seq(x, _)) =>
          get_json_object(x, argStr(args(1), "JSON_EXTRACT path"))
        // r14 tier 4: fuzzy matching + regex group extraction + JSON
        // arrays. LEVENSHTEIN/JSON_ARRAY_LENGTH widen to BIGINT (the
        // DuckDB result width) so schemas are engine-identical;
        // REGEXP_EXTRACT's no-match is '' in both engines.
        case ("LEVENSHTEIN", Seq(x, y)) => levenshtein(x, y).cast("bigint")
        case ("REGEXP_EXTRACT", Seq(x, _, _)) =>
          regexp_extract(x, argStr(args(1), "REGEXP_EXTRACT pattern"),
            argInt(args(2), "REGEXP_EXTRACT group"))
        case ("JSON_ARRAY_LENGTH", Seq(x)) =>
          json_array_length(x).cast("bigint")
        case ("TRANSLATE", Seq(x, _, _)) =>
          translate(x, argStr(args(1), "TRANSLATE from"),
            argStr(args(2), "TRANSLATE to"))
        case ("LTRIM", Seq(x)) => ltrim(x)
        case ("RTRIM", Seq(x)) => rtrim(x)
        // r14: array tier. STRING_SPLIT takes a LITERAL separator
        // (DuckDB semantics: plain text, not a regex -- quoted before it
        // reaches Spark's regex-based split); LEN is the ARRAY length
        // (strings keep LENGTH), BIGINT to match DuckDB; UNNEST lowers
        // to explode -- one generator per SELECT, zero rows for empty
        // or NULL arrays in both engines.
        case ("STRING_SPLIT", Seq(x, _)) =>
          split(x, java.util.regex.Pattern.quote(
            argStr(args(1), "STRING_SPLIT separator")))
        case ("LEN", Seq(x)) => size(x).cast("bigint")
        case ("UNNEST", Seq(x)) => explode(x)
        // r14 array tier 2 (DuckDB spellings): membership, join-to-text,
        // 1-based extraction. LIST_EXTRACT uses try_element_at so an
        // out-of-range index is NULL in both engines (plain element_at
        // would raise under the session's ANSI mode); ARRAY_JOIN is the
        // Spark-spelling alias of ARRAY_TO_STRING.
        case ("LIST_CONTAINS", Seq(x, y)) => array_contains(x, y)
        case ("ARRAY_TO_STRING" | "ARRAY_JOIN", Seq(x, _)) =>
          array_join(x, argStr(args(1), "ARRAY_TO_STRING separator"))
        case ("LIST_EXTRACT", Seq(x, y)) => try_element_at(x, y.cast("int"))
        // r14: STRFTIME(ts, fmt) — the C-style format string (the DuckDB
        // spelling) translated to Spark's java.time pattern at parse
        // time; only the portable directives are accepted, anything else
        // fails loudly rather than silently formatting differently.
        case ("STRFTIME", Seq(x, _)) =>
          date_format(x, cFormatToJava(
            argStr(args(1), "STRFTIME format"), "STRFTIME"))
        // r15: STRPTIME(text, fmt) — the inverse (parse): same C-style
        // directive translation; a non-conforming string errors loudly
        // in BOTH engines (ANSI to_timestamp here, DuckDB strptime there)
        case ("STRPTIME", Seq(x, _)) =>
          to_timestamp(x, cFormatToJava(
            argStr(args(1), "STRPTIME format"), "STRPTIME"))
        // r15 calendar tier 3 — 1:1 codegen Catalyst expressions with
        // DuckDB-identical semantics
        case ("MAKE_DATE", Seq(y, m, d)) => make_date(y, m, d)
        case ("LAST_DAY", Seq(x)) => last_day(x)
        // r13: EXTRACT(part FROM x) — the part travels in the name (see
        // parseAtom). BIGINT to match DuckDB's EXTRACT return type, so
        // the key SQL needs no cast on either side; DOW is Sunday-based
        // 0-6 in both engines (dayofweek is 1-based).
        case (ef, Seq(x)) if ef.startsWith("EXTRACT_") =>
          (ef.stripPrefix("EXTRACT_") match {
            case "YEAR" => year(x)
            case "MONTH" => month(x)
            case "DAY" => dayofmonth(x)
            case "HOUR" => hour(x)
            case "MINUTE" => minute(x)
            case "SECOND" => second(x)
            case "DOW" => dayofweek(x) - lit(1)
            case "DOY" => dayofyear(x)
            // DuckDB EXTRACT(epoch) is DOUBLE seconds — both sides CAST
            case "EPOCH" => unix_seconds(x.cast("timestamp"))
            case "QUARTER" => quarter(x)
            case "WEEK" => weekofyear(x)
            case part => throw new IllegalArgumentException(
              s"unsupported EXTRACT part: $part")
          }).cast("bigint")
        // r13: INTERVAL n unit literal — lowers to a Catalyst interval
        // literal, so `date + INTERVAL 5 DAY` rides the generic OArith
        // Column arithmetic (DATE stays DATE for day/month/year units in
        // Spark; the keys CAST where DuckDB widens to TIMESTAMP).
        // Year-month units clamp month-ends identically in both engines
        // (2020-01-31 + 1 MONTH = 2020-02-29).
        case ("INTERVAL", _) =>
          val nv = argInt(args(0), "INTERVAL count")
          val unit = argStr(args(1), "INTERVAL unit") match {
            case u if u.endsWith("S") => u.dropRight(1)
            case u => u
          }
          require(Set("DAY", "MONTH", "YEAR", "HOUR", "MINUTE", "SECOND")(
            unit), s"unsupported INTERVAL unit: $unit")
          expr(s"INTERVAL '$nv' $unit")
        case other => throw new IllegalArgumentException(
          s"wrong argument count for $f: got ${a.length}")
      }

  /** Literal-only function parameters (pad strings, trunc units, pad
    * widths) — extracted from the raw operand so misuse fails loudly. */
  private def argStr(o: Operand, what: String): String = o match {
    case OVal(VStr(v)) => v
    case _ => throw new IllegalArgumentException(s"$what must be a string literal")
  }

  private def argInt(o: Operand, what: String): Int = o match {
    case OVal(VNum(n)) if !n.contains('.') => n.toInt
    case _ => throw new IllegalArgumentException(s"$what must be an integer literal")
  }

  /** Dialect type vocabulary → Spark SQL type string (Catalyst Cast). */
  private def sqlTypeName(t: String): String = t match {
    case "INT" | "INTEGER" => "int"
    case "SMALLINT" => "smallint"
    case "BIGINT" => "bigint"
    case "DOUBLE" => "double"
    case "REAL" | "FLOAT" => "float"
    case "VARCHAR" | "TEXT" | "STRING" => "string"
    case "BOOLEAN" | "BOOL" => "boolean"
    // r13: calendar casts (the INTERVAL-arithmetic companions)
    case "DATE" => "date"
    case "TIMESTAMP" => "timestamp"
    case d if d.startsWith("DECIMAL(") => d.toLowerCase
    case other =>
      throw new IllegalArgumentException(s"unsupported CAST type: $other")
  }

  private def cmpCol(base: DataFrame, cmp: Cmp): Column =
    applyCmpOp(operandCol(base, cmp.lhs), cmp.op, operandCol(base, cmp.rhs))

  private def funcCol(f: EmdriveSql.VFunc): Column = f.name match {
    case "ULID" => call_function("ulid")
    case "NOW" => now()
  }

  /** Declared emdrive type of a column ("" for frames that never went
    * through the DDL path — parquet registrations carry no domain). */
  private def rawTypeOf(f: StructField): String =
    if (f.metadata.contains(graft.sources.SchemaMapper.RawTypeMetadata))
      f.metadata.getString(graft.sources.SchemaMapper.RawTypeMetadata)
    else ""

  /** INSERT-time value-domain validation, literal leg (reference:
    * src/constructs/components.rs — 300 cannot parse into
    * DataInstanceRaw::UInt8, a 60-char string cannot be a STRING(32), and
    * a non-UUID string cannot be a Uuid). Spark's widened physical types
    * (UINT8→short holds 300 happily) would otherwise silently accept what
    * the declaration rejects — the divergence a dialect user hits on
    * their first bad row. Literals fail HERE, at statement time, like the
    * reference; expression-valued writes get the runtime guard below. */
  private def checkLiteralDomain(v: Value, f: StructField): Unit = {
    import graft.sources.SchemaMapper.{stringCap, uintMax}
    val raw = rawTypeOf(f)
    v match {
      case VNum(s) =>
        uintMax(raw).foreach { max =>
          val d = BigDecimal(new java.math.BigDecimal(s))
          if (d < 0 || d > max || d.remainder(1) != 0)
            throw new IllegalArgumentException(
              s"value $s out of domain for column ${f.name} ($raw)")
        }
      case VStr(s) =>
        stringCap(raw).foreach { n =>
          if (s.length > n) throw new IllegalArgumentException(
            s"string of length ${s.length} exceeds ${f.name} ($raw)")
        }
        if (raw == "UUID")
          try { java.util.UUID.fromString(s); () }
          catch { case _: IllegalArgumentException =>
            throw new IllegalArgumentException(
              s"'$s' is not a UUID (column ${f.name})") }
        // a string literal aimed at a numeric-declared column must pass the
        // SAME range + integrality check as a numeric literal — otherwise
        // INSERT … VALUES ('300') into a UINT8 column slips through the
        // lit-then-cast path and stores a wrapped/overflowed value
        uintMax(raw).foreach { max =>
          val d =
            try BigDecimal(new java.math.BigDecimal(s))
            catch { case _: NumberFormatException =>
              throw new IllegalArgumentException(
                s"'$s' is not numeric (column ${f.name}, $raw)") }
          if (d < 0 || d > max || d.remainder(1) != 0)
            throw new IllegalArgumentException(
              s"value $s out of domain for column ${f.name} ($raw)")
        }
      case VBits(b) =>
        uintMax(raw).foreach { max =>
          if (BigDecimal(b) > max || b < 0)
            throw new IllegalArgumentException(
              s"value $b out of domain for column ${f.name} ($raw)")
        }
      case _ => ()
    }
  }

  /** Domain-guarded cast for expression-valued writes (INSERT…SELECT,
    * UPDATE SET, MERGE): bounds-check BEFORE the cast — short/int casts
    * wrap out-of-range values, so a post-cast check would bless exactly
    * the corruption it exists to reject. The guard is a codegen
    * `raise_error` branch evaluated per row on executors: the validating
    * twin of the reference's per-value INSERT parse, at distributed-scan
    * cost, no driver round-trip. NULLs pass (nullability is enforced
    * separately by the NOT-NULL rule). */
  /** The domain-violation predicate behind guardedCast, exposed separately
    * so DML statements can run it EAGERLY (a bounded pre-check before the
    * catalog swap — see requireDomain) as well as lazily (the raise_error
    * branch inside the stored plan). UINT domains reject negatives, values
    * above the type max, AND non-integral values — a fractional 1.5 into
    * UINT8 must fail like the literal path's remainder check, not silently
    * truncate through the cast. */
  private def domainViolation(c: Column, f: StructField): Option[Column] = {
    import graft.sources.SchemaMapper.{stringCap, uintMax}
    val raw = rawTypeOf(f)
    uintMax(raw) match {
      case Some(max) =>
        val d = c.cast("decimal(38,6)")
        Some(d.isNotNull && (d < 0 || d > lit(max.bigDecimal) ||
          d =!= floor(d).cast("decimal(38,6)")))
      case None => stringCap(raw).map { n =>
        val s = c.cast("string")
        s.isNotNull && length(s) > n
      }
    }
  }

  /** Eager statement-time domain validation: one bounded job (filter +
    * limit(1)) over the rows a DML statement is about to write, BEFORE the
    * catalog swap — so an out-of-domain UPDATE/MERGE/INSERT…SELECT fails
    * atomically at the statement, with the table (and any durable files)
    * left exactly as they were. Without this the guardedCast raise_error
    * fires lazily on a LATER read, permanently poisoning the stored plan
    * and attributing the failure to an unrelated SELECT (the reference
    * rejects at statement time — src/sql/expects/statements/insert.rs).
    * No-op (zero jobs) when no written column has a bounded domain. */
  private def requireDomain(df: DataFrame, checks: Seq[(String, Column)],
      stmt: String): Unit =
    if (checks.nonEmpty) {
      val bad = df.filter(checks.map(_._2).reduce(_ || _))
        .select(checks.map { case (n, p) => p.as(n) }.toIndexedSeq: _*)
        .limit(1).collect()
      if (bad.nonEmpty) {
        val row = bad.head
        val cols = checks.indices.collect {
          case i if !row.isNullAt(i) && row.getBoolean(i) => checks(i)._1
        }
        throw new IllegalArgumentException(
          s"$stmt: value out of domain for column(s) ${cols.mkString(", ")}")
      }
    }

  private def guardedCast(c: Column, f: StructField): Column =
    domainViolation(c, f) match {
      case Some(viol) =>
        when(viol,
          raise_error(concat(
            lit(s"value out of domain for column ${f.name} (${rawTypeOf(f)}): "),
            c.cast("string"))).cast(f.dataType))
          .otherwise(c.cast(f.dataType))
      case None => c.cast(f.dataType)
    }

  private def valueCol(v: Value, field: StructField): Column = {
    val dt = field.dataType
    checkLiteralDomain(v, field)
    v match {
      case f: VFunc => guardedCast(funcCol(f), field)
      case VNum(s) => lit(new java.math.BigDecimal(s)).cast(dt)
      case VStr(s) => lit(s).cast(dt)
      case VBool(b) => lit(b).cast(dt)
      case VNull =>
        // explicit NULL honors the reference's NOT-NULL-by-default rule:
        // only NULLABLE(T) columns accept it
        if (!field.nullable) throw new IllegalArgumentException(
          s"cannot insert NULL into NOT NULL column ${field.name}")
        lit(null).cast(dt)
      case VBits(b) => dt match {
        case BinaryType => lit(bits128(b))
        case _ => lit(b.longValue).cast(dt)
      }
    }
  }

  /** Column DEFAULT (reference: ColumnDefinition.default) — parsed from the
    * schema metadata at INSERT time; absent default → NULL for nullable
    * columns, error otherwise (the reference's NOT-NULL-by-default rule). */
  private def defaultCol(f: StructField): Column =
    if (f.metadata.contains(SchemaMapper.DefaultMetadata)) {
      val raw = f.metadata.getString(SchemaMapper.DefaultMetadata)
      val v = EmdriveSql.parse(s"INSERT INTO d (c) VALUES ($raw)") match {
        case EmdriveSql.Insert(_, _, Seq(Seq(value))) => value
        case other => throw new IllegalArgumentException(s"bad DEFAULT $raw: $other")
      }
      valueCol(v, f)
    } else if (f.nullable) lit(null).cast(f.dataType)
    else throw new IllegalArgumentException(
      s"column ${f.name} is NOT NULL with no DEFAULT and no value given")

  /** 128-bit literal → 16-byte big-endian binary (UINT128 carrier form). */
  private def bits128(v: BigInt): Array[Byte] = {
    val raw = v.toByteArray.dropWhile(_ == 0) // strip sign byte
    require(raw.length <= 16, s"literal wider than 128 bits: $v")
    val out = new Array[Byte](16)
    raw.copyToArray(out, 16 - raw.length)
    out
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

