package graft

import org.apache.spark.sql.SparkSession

/** Dump one registered query's result to parquet:
  * `runMain graft.Dump <sfDir> <queryName> <outPath>` — the single-query
  * twin of Verify, for ad-hoc inspection of results on any corpus dir
  * (e.g. auditing a stress replication's output offline). */
object Dump {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: Dump <sfDir> <queryName> <outPath>")
    val Array(dir, name, out) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.prepare(spark)
    SparkEntry.queries(name)(spark, dir).write.mode("overwrite").parquet(out)
    spark.stop()
  }
}
