package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit utility: print the formatted physical plan of one or more
  * registered queries (all of them with no args). Usage:
  *
  *   sbt "runMain graft.Explain q_dedup_jaccard q_profile"
  *
  * SPARK_GRAFT_SF_DIR picks the data dir (default sf0.001 — plans don't
  * change shape with SF, only AQE runtime decisions do).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      println(s"===== $name =====")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
