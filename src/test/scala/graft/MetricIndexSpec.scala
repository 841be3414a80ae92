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
      .select(MetricIndex.PrefixColumn).distinct().count()
    val selected = scan.selectedPartitions.partitionCount
    assert(selected <= 93, s"selected $selected")
    assert(selected < totalParts,
      s"no pruning: $selected of $totalParts partitions scanned")
    // and the pruning is visible in the plan as a partition filter
    assert(scan.toString.contains("PartitionFilters"), scan.toString)
  }

  test("prefixesWithin enumerates exactly the prefixes a match can live in") {
    val probe = 0xA5L
    val within2 = MetricIndex.prefixesWithin(probe, 8, 2)
    assert(within2.size == 1 + 8 + 28) // C(8,0)+C(8,1)+C(8,2)
    assert(within2.distinct.size == within2.size)
    assert(within2.forall(p => java.lang.Long.bitCount(p ^ probe) <= 2))
  }
}
