package graft

import org.apache.spark.sql.SparkSession

/** Session-scoped artifact registry: expensive derived artifacts — the
  * converged near-dup component labels, fitted ANN index models — built
  * once per (session, corpus dir) and shared by every query that consumes
  * them.
  *
  * This is the Spark-session analog of the reference's persistent index
  * (reference: src/storage/index.rs — the EM-tree is built once and lives
  * with the table, queries only read it): an INDEX is by definition an
  * amortized artifact, so per-query rebuilds are the wrong physical plan
  * even when each rebuild's own shape is right. What "build once" means
  * here per artifact kind:
  *
  *  - driver-side models (KMeans codebooks, PQ centroids): fitting is
  *    eager at build time, so the registry holds the fitted coefficients —
  *    later queries plan pure transforms over them;
  *  - RDD-backed label sets (connected components): the registry holds the
  *    final RDD reference, so later jobs reuse its computed shuffle files
  *    as skipped stages — nothing is persist()ed, and dropping the entry
  *    is what lets the ContextCleaner reclaim the files.
  *
  * Keying by (session identity, dir, artifact name) keeps test sessions
  * and corpora isolated; a production deployment would key by table
  * version the same way any index keys by its base table's snapshot. */
object SessionMemo {

  private val memo =
    new java.util.concurrent.ConcurrentHashMap[(Int, String, String), AnyRef]()

  /** Check-then-put rather than computeIfAbsent: a build may itself
    * consult the registry (components build on the shared postings), and
    * nested computeIfAbsent on one map is not allowed. A racing duplicate
    * build is benign — artifacts are deterministic, last put loses. */
  def of[T <: AnyRef](s: SparkSession, dir: String, key: String)(build: => T): T = {
    val k = (System.identityHashCode(s), dir, key)
    val cur = memo.get(k)
    if (cur != null) cur.asInstanceOf[T]
    else {
      val v = build
      val prev = memo.putIfAbsent(k, v)
      (if (prev != null) prev else v).asInstanceOf[T]
    }
  }

  /** Per-(process, corpus-dir) tag for throwaway layout paths (/tmp and
    * warehouse artifacts the storage/index keys write). The full dir
    * string is digest-hashed — not its 32-bit hashCode, which can collide
    * across dirs — and a per-process component is folded in so two
    * concurrent JVMs over the same corpus never race overwrite-vs-read on
    * a shared path (r11 ADVICE). Stable within a process, so write-once
    * reuse through this registry still holds. */
  def pathTag(dir: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString
    s"${md}_p${ProcessHandle.current().pid()}"
  }

  /** Persisted relations owned by the registry: `.persist()`ed DataFrames
    * pin executor memory/disk until explicitly unpersisted, so every
    * persist the engine takes must have a release path — [[evictAll]] is
    * it (r12 ADVICE: `materializeOnce` entries previously accumulated for
    * the life of the session with no lifecycle at all). */
  private val persisted = new java.util.concurrent.ConcurrentLinkedQueue[
    org.apache.spark.sql.DataFrame]()

  /** Memoized persist: build-and-`persist()` the relation once per
    * (session, dir, key) and hand every later caller the SAME cached
    * instance — a second invocation of the owning query re-reads the
    * cache instead of stacking a duplicate `InMemoryRelation` (the
    * CacheManager "already cached" warning), and the entry is registered
    * for release by [[evictAll]]. */
  def ofPersisted(s: SparkSession, dir: String, key: String)(
      build: => org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    of(s, dir, key) {
      val df = build.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      persisted.add(df)
      df
    }

  /** Drop every registered artifact. The scale-stress harness calls this
    * before each timed run so its measurements price the full BUILD — the
    * registry amortizes steady-state sessions, and letting it amortize a
    * scaling measurement would hide exactly the cost the harness exists to
    * expose. Dropping the RDD references also frees their shuffle files to
    * the ContextCleaner, and registered persists are unpersisted so the
    * executor-side cache is actually released (r12 ADVICE). */
  def evictAll(): Unit = {
    memo.clear()
    var df = persisted.poll()
    while (df != null) {
      try df.unpersist(blocking = false) catch { case _: Throwable => () }
      df = persisted.poll()
    }
  }
}
