package graft.sources

import org.apache.spark.sql.types._

/** emdrive DDL → Spark schema mapping.
  *
  * The reference's type system (reference: src/constructs/components.rs —
  * `UINT8/16/32/64/128`, `BOOL`, `TIMESTAMP` µs, `UUID`, `STRING(n)`,
  * `NULLABLE(T)`, exactly one `PRIMARY KEY`) re-expressed as Spark
  * `StructType`:
  *
  *  - unsigned ints widen to the next signed Spark type that holds the full
  *    range (`UINT8→short`, `UINT16→int`, `UINT32→long`,
  *    `UINT64→decimal(20,0)`); `UINT128` (the reference's perceptual-hash
  *    carrier) maps to 16-byte `binary` — fixed-width, order-preserving in
  *    its big-endian byte form, and cheap to hash/compare at scale;
  *  - columns are non-nullable unless wrapped in `NULLABLE(...)` (the
  *    reference default is NOT NULL — the inverse of SQL);
  *  - the `PRIMARY KEY` column is recorded in the struct metadata: Spark
  *    has no key constraint, but writers use it as the bucketing/sort
  *    column so point lookups prune files (the btree-index analog).
  */
object SchemaMapper {

  val PrimaryKeyMetadata = "graft.primaryKey"
  val DefaultMetadata = "graft.default"

  /** Declared emdrive type, uppercased, NULLABLE wrapper stripped (e.g.
    * "UINT8", "STRING(32)"). Spark's widened physical types (UINT8→short)
    * would otherwise silently ACCEPT values the declaration rejects —
    * INSERT/UPDATE validation reads this to enforce the declared domain
    * (reference: src/constructs/components.rs — a 300 simply cannot parse
    * into DataInstanceRaw::UInt8). */
  val RawTypeMetadata = "graft.rawType"

  /** Inclusive value bound of an unsigned declared type, None otherwise. */
  def uintMax(rawType: String): Option[BigDecimal] = rawType match {
    case "UINT8" => Some(BigDecimal(255))
    case "UINT16" => Some(BigDecimal(65535))
    case "UINT32" => Some(BigDecimal(4294967295L))
    case "UINT64" => Some(BigDecimal(BigInt("18446744073709551615")))
    case _ => None
  }

  /** Declared length cap of a STRING(n) type, None otherwise. */
  def stringCap(rawType: String): Option[Int] = {
    val re = "^STRING\\((\\d+)\\)$".r
    rawType match { case re(n) => Some(n.toInt); case _ => None }
  }

  /** One parsed column definition:
    * `name TYPE [PRIMARY KEY | METRIC KEY [USING index(metric)]] [DEFAULT expr]`
    * (reference: src/constructs/components.rs ColumnDefinition — `default`
    * is a literal or a NOW()/ULID() call; the USING clause names the metric
    * index, which Spark replaces with layout, so it's accepted and
    * recorded but not interpreted). */
  final case class ColumnDef(name: String, dataType: DataType,
      nullable: Boolean, primaryKey: Boolean, metricKey: Boolean,
      default: Option[String] = None, rawType: String = "STRING")

  def mapType(ddlType: String): (DataType, Boolean) = {
    val t = ddlType.trim.toUpperCase
    val nullableRe = "^NULLABLE\\((.+)\\)$".r
    val stringRe = "^STRING\\((\\d+)\\)$".r
    t match {
      case nullableRe(inner) =>
        val (dt, _) = mapType(inner)
        (dt, true)
      case "UINT8" => (ShortType, false)
      case "UINT16" => (IntegerType, false)
      case "UINT32" => (LongType, false)
      case "UINT64" => (DecimalType(20, 0), false)
      case "UINT128" => (BinaryType, false)
      case "BOOL" => (BooleanType, false)
      case "TIMESTAMP" => (TimestampType, false)
      case "UUID" => (StringType, false)
      case stringRe(_) => (StringType, false)
      case "STRING" => (StringType, false)
      case other => throw new IllegalArgumentException(s"unsupported emdrive type: $other")
    }
  }

  private val colRe =
    ("(?i)^\\s*(\\w+)\\s+(NULLABLE\\(.+?\\)|\\w+(?:\\(\\d+\\))?)" +
      "\\s*(PRIMARY\\s+KEY|METRIC\\s+KEY(?:\\s+USING\\s+\\w+\\(\\w+\\))?)?" +
      "\\s*(?:DEFAULT\\s+(.+?))?\\s*$").r

  def parseColumn(s: String): ColumnDef = s.trim match {
    case colRe(name, tpe, key, default) =>
      val (dt, nullable) = mapType(tpe)
      val keyNorm = Option(key).map(_.toUpperCase.replaceAll("\\s+", " "))
      val raw = {
        val t = tpe.trim.toUpperCase.replaceAll("\\s+", "")
        val nullableRe = "^NULLABLE\\((.+)\\)$".r
        t match { case nullableRe(inner) => inner; case other => other }
      }
      ColumnDef(name, dt, nullable,
        primaryKey = keyNorm.exists(_.startsWith("PRIMARY KEY")),
        metricKey = keyNorm.exists(_.startsWith("METRIC KEY")),
        default = Option(default).map(_.trim), rawType = raw)
    case other => throw new IllegalArgumentException(s"cannot parse column def: $other")
  }

  /** Parse the column list of a `CREATE TABLE t (col TYPE [KEY], ...)`
    * statement into a StructType. Enforces the reference's exactly-one-
    * PRIMARY-KEY rule (reference: src/constructs/components.rs TableSchema).
    */
  def toStruct(columnDefs: Seq[String]): StructType = {
    val cols = columnDefs.map(parseColumn)
    val pks = cols.filter(_.primaryKey)
    require(pks.size == 1,
      s"emdrive tables require exactly one PRIMARY KEY, got ${pks.size}")
    StructType(cols.map { c =>
      val mb = new MetadataBuilder()
      if (c.primaryKey) mb.putBoolean(PrimaryKeyMetadata, true)
      if (c.metricKey) mb.putBoolean("graft.metricKey", true)
      c.default.foreach(mb.putString(DefaultMetadata, _))
      mb.putString(RawTypeMetadata, c.rawType)
      StructField(c.name, c.dataType, c.nullable, mb.build())
    })
  }

  /** One column def → one StructField (r15, ALTER TABLE ADD COLUMN) —
    * the CREATE grammar minus the table-level exactly-one-PRIMARY-KEY
    * rule (an added column must NOT be a key: the table already has its
    * one PRIMARY KEY, and a metric index cannot appear under a column
    * with no values). */
  def toField(columnDef: String): StructField = {
    val c = parseColumn(columnDef)
    require(!c.primaryKey && !c.metricKey,
      s"ALTER TABLE ADD COLUMN ${c.name} cannot declare a key role")
    val mb = new MetadataBuilder()
    c.default.foreach(mb.putString(DefaultMetadata, _))
    mb.putString(RawTypeMetadata, c.rawType)
    StructField(c.name, c.dataType, c.nullable, mb.build())
  }

  /** Parse a full `CREATE TABLE [IF NOT EXISTS] name (cols...)` statement
    * (reference: src/sql/expects/statements/create_table.rs shape). */
  def parseCreateTable(sql: String): (String, StructType) = {
    val re = "(?is)^\\s*CREATE\\s+TABLE\\s+(?:IF\\s+NOT\\s+EXISTS\\s+)?(\\w+)\\s*\\((.*)\\)\\s*;?\\s*$".r
    sql match {
      case re(name, body) =>
        // split on commas not inside parens (STRING(32), NULLABLE(...))
        val parts = scala.collection.mutable.ArrayBuffer.empty[String]
        var depth = 0
        val cur = new StringBuilder
        body.foreach {
          case '(' => depth += 1; cur.append('(')
          case ')' => depth -= 1; cur.append(')')
          case ',' if depth == 0 => parts += cur.toString; cur.clear()
          case c => cur.append(c)
        }
        if (cur.nonEmpty) parts += cur.toString
        (name, toStruct(parts.toSeq))
      case _ => throw new IllegalArgumentException(s"cannot parse CREATE TABLE: $sql")
    }
  }
}
