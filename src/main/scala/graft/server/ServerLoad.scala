package graft.server

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.util.concurrent.atomic.AtomicInteger
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.SparkSession

import graft.GraftSession
import graft.sql.EmdriveSession

/** Serving-layer load harness: measured throughput and backpressure for
  * [[GraftServer]] under concurrent clients — the operational twin of
  * ServerSpec's correctness coverage (r7 verdict #6).
  *
  * Shape: one live server over the sf corpus, `conc` client threads each
  * firing `perClient` POSTs of a maxRows-capped scan plus aggregate
  * queries (the serving mix: point-ish reads and group-bys). Concurrency
  * is set ABOVE the server's worker pool (8) so the bounded queue +
  * caller-runs overflow path — the reference's MAX_IN_FLIGHT_REQUESTS
  * analog — is actually exercised, not just configured. The harness
  * asserts every response is 200 with non-empty JSON (backpressure must
  * delay, never drop) and reports latency percentiles + steady-state QPS
  * as one JSON line (driver convention; dev/server_load.json).
  *
  * Run: `sbt "runMain graft.server.ServerLoad"` (env: SPARK_GRAFT_SF_DIR,
  * SPARK_GRAFT_LOAD_CONC, SPARK_GRAFT_LOAD_N).
  */
object ServerLoad {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val conc = sys.env.get("SPARK_GRAFT_LOAD_CONC").flatMap(_.toIntOption).getOrElse(32)
    val perClient = sys.env.get("SPARK_GRAFT_LOAD_N").flatMap(_.toIntOption).getOrElse(25)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.prepare(spark)

    val es = new EmdriveSession(spark)
    es.register("documents", graft.sources.Tables.documents(spark, sf))
    val server = new GraftServer(es, maxRows = 1000)
    server.start()
    val url = URI.create(s"http://127.0.0.1:${server.boundPort}/")

    // the serving mix: a maxRows-capped full scan (the LIMIT-cap contract
    // under load), a grouped aggregate, and a filtered projection
    val queries = Seq(
      "SELECT doc_id, source, n_chars FROM documents ORDER BY doc_id LIMIT 500;",
      "SELECT source, COUNT(*) AS n, SUM(n_chars) AS total FROM documents GROUP BY source ORDER BY source;",
      "SELECT doc_id, n_chars FROM documents WHERE lang = 'en' ORDER BY doc_id LIMIT 200;")

    val client = HttpClient.newHttpClient()
    def fire(q: String): (Int, Int, Long) = {
      val t0 = System.nanoTime()
      val resp = client.send(
        HttpRequest.newBuilder(url)
          .POST(HttpRequest.BodyPublishers.ofString(q)).build(),
        HttpResponse.BodyHandlers.ofString())
      (resp.statusCode(), resp.body().length, System.nanoTime() - t0)
    }

    fire(queries.head) // warm the plan cache / JIT before timing

    val latencies = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val bad = new AtomicInteger(0)
    val empty = new AtomicInteger(0)
    val pool = Executors.newFixedThreadPool(conc)
    val done = new CountDownLatch(conc)
    val t0 = System.nanoTime()
    (0 until conc).foreach { c =>
      pool.execute { () =>
        try {
          (0 until perClient).foreach { i =>
            val (status, len, dt) = fire(queries((c + i) % queries.length))
            if (status != 200) bad.incrementAndGet(): Unit
            if (len <= 2) empty.incrementAndGet(): Unit // "[]" = dropped rows
            latencies.add(dt): Unit
          }
        } finally done.countDown()
      }
    }
    done.await(10, TimeUnit.MINUTES)
    val wall = (System.nanoTime() - t0) / 1e9
    pool.shutdownNow()
    server.stop()

    val ls = latencies.toArray(Array.empty[java.lang.Long]).map(_.toLong).sorted
    def pct(p: Double): Double =
      if (ls.isEmpty) 0.0 else ls(((ls.length - 1) * p).toInt) / 1e6
    val total = conc * perClient
    val line =
      f"""{"metric":"server_load","sf":"$sf","concurrency":$conc,""" +
        f""""requests":$total,"non200":${bad.get()},"empty":${empty.get()},""" +
        f""""wall_sec":$wall%.2f,"qps":${total / wall}%.1f,""" +
        f""""p50_ms":${pct(0.50)}%.1f,"p95_ms":${pct(0.95)}%.1f,"p99_ms":${pct(0.99)}%.1f}"""
    println(line)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_LOAD_OUT", "dev/server_load.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case _: Throwable => () }
    spark.stop()
    // a dropped or errored response under saturation is a FAILURE of the
    // backpressure contract, not a statistic
    require(bad.get() == 0 && empty.get() == 0,
      s"load run violated the serving contract: non200=${bad.get()} empty=${empty.get()}")
  }
}
