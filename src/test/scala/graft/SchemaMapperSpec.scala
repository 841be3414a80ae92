package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.SchemaMapper

class SchemaMapperSpec extends AnyFunSuite {

  test("unsigned ints widen to holding signed types") {
    assert(SchemaMapper.mapType("UINT8") == (ShortType, false))
    assert(SchemaMapper.mapType("UINT16") == (IntegerType, false))
    assert(SchemaMapper.mapType("UINT32") == (LongType, false))
    assert(SchemaMapper.mapType("UINT64") == (DecimalType(20, 0), false))
    assert(SchemaMapper.mapType("UINT128") == (BinaryType, false))
  }

  test("NULLABLE wrapper flips the non-null default") {
    assert(SchemaMapper.mapType("NULLABLE(UINT32)") == (LongType, true))
    assert(SchemaMapper.mapType("nullable(string(64))") == (StringType, true))
  }

  test("scalar types") {
    assert(SchemaMapper.mapType("BOOL") == (BooleanType, false))
    assert(SchemaMapper.mapType("TIMESTAMP") == (TimestampType, false))
    assert(SchemaMapper.mapType("UUID") == (StringType, false))
    assert(SchemaMapper.mapType("STRING(32)") == (StringType, false))
  }

  test("CREATE TABLE parses to StructType with pk metadata") {
    val (name, struct) = SchemaMapper.parseCreateTable(
      """CREATE TABLE IF NOT EXISTS photos (
        |  id UINT64 PRIMARY KEY,
        |  added TIMESTAMP,
        |  caption NULLABLE(STRING(80)),
        |  phash UINT128 METRIC KEY
        |)""".stripMargin)
    assert(name == "photos")
    assert(struct.fieldNames.toSeq == Seq("id", "added", "caption", "phash"))
    assert(!struct("id").nullable && struct("caption").nullable)
    assert(struct("id").metadata.getBoolean(SchemaMapper.PrimaryKeyMetadata))
    assert(struct("phash").metadata.getBoolean("graft.metricKey"))
    assert(struct("phash").dataType == BinaryType)
  }

  test("exactly one PRIMARY KEY enforced") {
    intercept[IllegalArgumentException] {
      SchemaMapper.toStruct(Seq("a UINT32", "b STRING(4)"))
    }
    intercept[IllegalArgumentException] {
      SchemaMapper.toStruct(Seq("a UINT32 PRIMARY KEY", "b UINT32 PRIMARY KEY"))
    }
  }

  test("unknown type rejected") {
    intercept[IllegalArgumentException] { SchemaMapper.mapType("FLOAT64") }
  }
}
