package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.sources.Io

class IoSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("grp", StringType, nullable = true),
    StructField("v", DoubleType, nullable = true)))

  test("csv roundtrip with explicit schema") {
    val dir = Files.createTempDirectory("graft-io").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/data.csv"),
      "id,grp,v\n1,a,1.5\n2,b,2.5\n3,a,3.5\n")
    val df = Io.readCsv(spark, s"$dir/data.csv", schema)
    assert(df.schema.fieldNames.toSeq == Seq("id", "grp", "v"))
    assert(df.count() == 3)
    assert(df.filter("grp = 'a'").agg(Map("v" -> "sum")).head().getDouble(0) == 5.0)
  }

  test("json read with explicit schema") {
    val dir = Files.createTempDirectory("graft-io").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/data.json"),
      """{"id":1,"grp":"x","v":9.0}
        |{"id":2,"grp":"y","v":1.0}""".stripMargin)
    val df = Io.readJson(spark, s"$dir/data.json", schema)
    assert(df.count() == 2 && df.filter("grp = 'x'").head().getDouble(2) == 9.0)
  }

  test("partitioned parquet write prunes partitions on read") {
    val dir = Files.createTempDirectory("graft-io").toString + "/t"
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "a", 3.0)).toDF("id", "grp", "v")
    Io.writeParquet(df, dir, partitionCols = Seq("grp"))
    assert(new java.io.File(s"$dir/grp=a").isDirectory)
    val back = spark.read.parquet(dir).filter($"grp" === "a")
    assert(back.count() == 2)
    // partition pruning visible in the plan: only grp=a files scanned
    val plan = back.queryExecution.executedPlan.toString
    assert(!plan.contains("grp=b"))
  }

  test("insertRows appends to an existing table") {
    val dir = Files.createTempDirectory("graft-io").toString + "/t"
    Io.insertRows(spark, dir, schema, Seq(Row(1L, "a", 1.0)))
    Io.insertRows(spark, dir, schema, Seq(Row(2L, "b", 2.0), Row(3L, "a", null)))
    val back = spark.read.parquet(dir)
    assert(back.count() == 3)
    assert(back.filter("v IS NULL").count() == 1)
  }
}
