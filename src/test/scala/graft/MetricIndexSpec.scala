package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.sources.{MetricIndex, Tables}

/** The parquet metric-index layout: threshold queries must PRUNE FILES
  * (the persisted-index property of the reference's emtree), not just
  * filter rows, and must lose no results vs. the brute-force scan. */
class MetricIndexSpec extends SparkTestBase {

  test("threshold query prunes partitions and matches the full scan exactly") {
    GraftSession.prepare(spark)
    val dir = Files.createTempDirectory("graft-mindex").toString + "/docs"

    val hashed = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        call_function("simhash64", split(col("text"), " ")).as("h"))
    MetricIndex.writeIndexed(hashed, dir, "h", bits = 8)

    val probe = hashed.filter(col("doc_id") === 0).head().getLong(1)
    val q = MetricIndex.thresholdQuery(spark, dir, "h", probe, maxDist = 3, bits = 8)

    // exactness: identical doc_id set as the unindexed brute-force scan
    val expected = hashed
      .filter(call_function("hamming64", col("h"), lit(probe)) <= 3)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val got = q.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(got == expected)
    assert(got.contains(0L)) // the probe doc itself qualifies at distance 0

    // pruning: the scan selects only the enumerated prefix partitions
    // (Σ C(8, k≤3) = 93 of up to 256), never the whole layout
    val scan = q.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }.head
    val totalParts = spark.read.parquet(dir)
      .select(MetricIndex.prefixColumn("h", 8)).distinct().count()
    val selected = scan.selectedPartitions.partitionCount
    assert(selected <= 93, s"selected $selected")
    assert(selected < totalParts,
      s"no pruning: $selected of $totalParts partitions scanned")
    // and the pruning is visible in the plan as a partition filter
    assert(scan.toString.contains("PartitionFilters"), scan.toString)
  }

  test("TRANSPARENT pruning: a bare hamming64 filter over the layout " +
      "prunes directories via the optimizer rule (r9)") {
    GraftSession.prepare(spark)
    val dir = Files.createTempDirectory("graft-mindex-t").toString + "/docs"
    val hashed = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        call_function("simhash64", split(col("text"), " ")).as("h"))
    MetricIndex.writeIndexed(hashed, dir, "h", bits = 8)
    val probe = hashed.filter(col("doc_id") === 0).head().getLong(1)
    // no MetricIndex API: just read the layout and filter — the
    // MetricPrefixPruning rule must inject the prefix IN-list
    val q = spark.read.parquet(dir)
      .filter(call_function("hamming64", col("h"), lit(probe)) <= 2)
      .select(col("doc_id"))
    val scan = q.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }.head
    val totalParts = spark.read.parquet(dir)
      .select(MetricIndex.prefixColumn("h", 8)).distinct().count()
    assert(scan.selectedPartitions.partitionCount < totalParts,
      s"rule did not prune: ${scan.selectedPartitions.partitionCount} " +
        s"of $totalParts partitions scanned\n$scan")
    // and it loses nothing vs the brute-force scan
    val expected = hashed
      .filter(call_function("hamming64", col("h"), lit(probe)) <= 2)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(q.collect().map(_.getLong(0)).toSet == expected)
    // k >= bits → no rewrite (pruning would not pay), still correct
    val wide = spark.read.parquet(dir)
      .filter(call_function("hamming64", col("h"), lit(probe)) <= 40)
    assert(wide.count() >= expected.size)
    // a Hamming filter on a DIFFERENT long column must NOT prune: the
    // prefix name binds the rule to its hash column
    val other = spark.read.parquet(dir)
      .filter(call_function("hamming64", col("doc_id"), lit(3L)) <= 2)
    val otherScan = other.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }.head
    assert(otherScan.selectedPartitions.partitionCount == totalParts,
      s"mis-pruned on an unindexed column: " +
        s"${otherScan.selectedPartitions.partitionCount} of $totalParts")
    // a column REDEFINED under the hash's name above the scan must not
    // prune either — the rule traces the matched attribute by exprId to
    // the leaf relation, and a withColumn redefinition is a fresh Alias
    // that fails the trace; pruning by the untouched partition column
    // would silently drop matching rows
    val redefined = spark.read.parquet(dir)
      .withColumn("h", col("doc_id"))
      .filter(call_function("hamming64", col("h"), lit(3L)) <= 2)
    val redefScan = redefined.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }.head
    assert(redefScan.selectedPartitions.partitionCount == totalParts,
      s"mis-pruned a redefined column: " +
        s"${redefScan.selectedPartitions.partitionCount} of $totalParts")
    val redefExpected = spark.read.parquet(dir).select(col("doc_id"))
      .collect().map(_.getLong(0))
      .filter(id => java.lang.Long.bitCount(id ^ 3L) <= 2).toSet
    assert(redefined.select(col("doc_id")).collect()
      .map(_.getLong(0)).toSet == redefExpected)
  }

  test("index-backed kNN equals full-scan kNN and reads a pruned ball") {
    GraftSession.prepare(spark)
    // The prefix index pays for kNN when hashes CLUSTER — real perceptual
    // hashes of near-identical media do; uniform random hashes don't (the
    // 5th-nearest of 500 random 64-bit hashes sits at distance ~20, where
    // every prefix qualifies — knnQuery then correctly falls back to the
    // full-scan TakeOrdered). So the corpus is background hashes plus a
    // planted near-dup cluster around the probe, the shape the operator
    // exists for, and the loop must resolve at a small, prunable radius.
    val dir = Files.createTempDirectory("graft-mindex").toString + "/docs"
    val s2 = spark
    import s2.implicits._
    val base = 0x5a5a3c3c0f0f55aaL
    val planted = Seq(base, base ^ 1L, base ^ 2L, base ^ (1L << 40),
      base ^ 3L, base ^ (1L << 63) ^ 1L, base ^ ((1L << 22) | (1L << 50)))
    val background = (0 until 500).map(i =>
      scala.util.hashing.MurmurHash3.stringHash(s"bg$i").toLong * 2654435761L)
    val hashed = (planted ++ background).zipWithIndex
      .map { case (h, i) => (i.toLong, h) }.toDF("doc_id", "h")
    MetricIndex.writeIndexed(hashed, dir, "h", bits = 8)

    val got = MetricIndex.knnQuery(spark, dir, "h", base, k = 5)
      .select(col("h"), col("dist")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq
    val expected = hashed
      .withColumn("dist", call_function("hamming64", col("h"), lit(base)))
      .orderBy(col("dist"), col("h")).limit(5)
      .select(col("h"), col("dist")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(got == expected, s"got=$got expected=$expected")
    assert(got.map(_._2).max <= 2) // resolved inside the planted cluster

    // the ball that resolved the query (radius 2: the planted cluster has
    // >= 5 members within distance 2) reads a pruned file selection —
    // C(8, <=2) = 37 candidate prefixes of the layout's partitions
    val ball = MetricIndex.thresholdQuery(spark, dir, "h", base, 2, bits = 8)
    val scan = ball.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }.head
    val totalParts = spark.read.parquet(dir)
      .select(MetricIndex.prefixColumn("h", 8)).distinct().count()
    assert(scan.selectedPartitions.partitionCount < totalParts,
      s"${scan.selectedPartitions.partitionCount} of $totalParts partitions read")
  }

  test("prefixesWithin enumerates exactly the prefixes a match can live in") {
    val probe = 0xA5L
    val within2 = MetricIndex.prefixesWithin(probe, 8, 2)
    assert(within2.size == 1 + 8 + 28) // C(8,0)+C(8,1)+C(8,2)
    assert(within2.distinct.size == within2.size)
    assert(within2.forall(p => java.lang.Long.bitCount(p ^ probe) <= 2))
  }
}
