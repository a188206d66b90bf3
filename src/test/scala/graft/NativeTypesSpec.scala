package graft

import java.sql.DriverManager

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.NativeTypes
import graft.write.DialectSql

/** Per-dialect native-type DDL (templates/<dialect>.yaml general_type_map;
  * datatype.go:1493-1692 placeholder filling). Golden strings per dialect +
  * a Derby-executed CREATE/INSERT/SELECT round-trip.
  */
class NativeTypesSpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("qty", IntegerType),
    StructField("price", DecimalType(12, 2)),
    StructField("ratio", DoubleType),
    StructField("name", StringType),
    StructField("note", StringType,
      metadata = new MetadataBuilder().putLong("maxLength", 4000).build()),
    StructField("huge", StringType,
      metadata = new MetadataBuilder().putLong("maxLength", 100000).build()),
    StructField("flag", BooleanType),
    StructField("born", DateType),
    StructField("seen", TimestampType),
    StructField("blob", BinaryType)))

  private def render(d: String) =
    schema.fields.map(f => f.name -> NativeTypes.render(d, f)).toMap

  test("postgres: varchar() filled, over-max falls to max_string_type") {
    val m = render("postgres")
    assert(m("id") == "bigint")
    assert(m("price") == "numeric")
    assert(m("ratio") == "double precision")
    assert(m("name") == "varchar(255)")
    assert(m("note") == "varchar(4000)")
    assert(m("huge") == "varchar(65500)") // >= 65500 → max_string_type
    assert(m("blob") == "bytea")
    assert(m("seen") == "timestamptz")
  }

  test("mysql: decimal(,) filled, strings over 16383 become mediumtext") {
    val m = render("mysql")
    assert(m("price") == "decimal(12,2)")
    assert(m("flag") == "tinyint(1)")
    assert(m("huge") == "mediumtext")
    assert(m("seen") == "datetime(6)")
    assert(m("blob") == "longblob")
  }

  test("snowflake: variant-free scalar map, timestamp_tz for zoned") {
    val m = render("snowflake")
    assert(m("price") == "decimal(12,2)")
    assert(m("name") == "varchar(255)")
    assert(m("seen") == "timestamp_tz")
    assert(m("ratio") == "float")
  }

  test("bigquery: int64 family, unparameterized string, bignumeric rule") {
    val m = render("bigquery")
    assert(m("id") == "int64")
    assert(m("qty") == "int64")
    assert(m("name") == "string")
    assert(m("price") == "numeric")
    assert(NativeTypes.render("bigquery",
      StructField("d", DecimalType(38, 12))) == "bignumeric")
  }

  test("duckdb: decimal(,) filled, uuid native") {
    val m = render("duckdb")
    assert(m("price") == "decimal(12,2)")
    assert(m("ratio") == "double")
    assert(m("name") == "varchar(255)")
  }

  test("sqlserver: nvarchar() filled, over-4000 to nvarchar(max), bit bool") {
    val m = render("sqlserver")
    assert(m("id") == "bigint")
    assert(m("price") == "decimal(12,2)")
    assert(m("name") == "nvarchar(255)")
    assert(m("note") == "nvarchar(max)")   // 4000 >= max_string_length 4000
    assert(m("huge") == "nvarchar(max)")
    assert(m("flag") == "bit")
    assert(m("seen") == "datetimeoffset")
    assert(m("blob") == "varbinary(max)")  // unknown length → max_binary_type
  }

  test("oracle: number family, varchar2 ceiling at 4000, blob binary") {
    val m = render("oracle")
    assert(m("id") == "number(19)")
    assert(m("qty") == "number(10)")
    assert(m("price") == "number(12,2)")
    assert(m("ratio") == "number")
    assert(m("name") == "varchar(255)")
    assert(m("note") == "varchar(4000)")   // 4000 hits the ceiling
    assert(m("huge") == "varchar(4000)")
    assert(m("flag") == "varchar(5)")      // oracle has no boolean column type
    assert(m("seen") == "timestamp(9) with time zone")
    assert(m("blob") == "blob")
  }

  test("clickhouse: everything Nullable, Decimal(,) filled inside wrapper") {
    val m = render("clickhouse")
    assert(m("id") == "Nullable(Int64)")
    assert(m("qty") == "Nullable(Int64)")
    assert(m("price") == "Nullable(Decimal(12,2))")
    assert(m("name") == "Nullable(String)")
    assert(m("huge") == "Nullable(String)")
    assert(m("seen") == "Nullable(DateTime64(6))")
    assert(m("flag") == "Nullable(Bool)")
  }

  test("redshift: varchar(65535) ceiling for text/binary/json") {
    val m = render("redshift")
    assert(m("price") == "decimal(12,2)")
    assert(m("ratio") == "double precision")
    assert(m("name") == "varchar(255)")
    assert(m("note") == "varchar(4000)")
    assert(m("huge") == "varchar(65535)")
    assert(m("blob") == "varchar(65535)")
    assert(m("seen") == "timestamptz")
  }

  test("trino: unbounded varchar, timestamp with time zone, varbinary") {
    val m = render("trino")
    assert(m("id") == "bigint")
    assert(m("qty") == "integer")
    assert(m("price") == "decimal(12,2)")
    assert(m("ratio") == "double")
    assert(m("name") == "varchar")       // no () template → no length fill
    assert(m("huge") == "varchar")
    assert(m("seen") == "timestamp with time zone")
    assert(m("blob") == "varbinary")
  }

  test("inference's sling_type=text metadata routes to the text mapping") {
    // the long-string flag infer() writes must not fall to varchar(255)
    val f = StructField("body", StringType, metadata =
      new MetadataBuilder().putString("sling_type", "text").build())
    assert(NativeTypes.render("postgres", f) == "text")
    assert(NativeTypes.render("sqlserver", f) == "nvarchar(max)")
    assert(NativeTypes.render("mysql", f) == "mediumtext")
  }

  test("T-SQL family binary renders varbinary(max), never bare varbinary") {
    // bare varbinary is varbinary(1) in T-SQL — 1-byte truncation
    val f = StructField("payload", BinaryType)
    for (d <- Seq("azuresql", "azuredwh", "fabric"))
      assert(NativeTypes.render(d, f) == "varbinary(max)", d)
    assert(NativeTypes.render("vertica", f) == "long varbinary")
  }

  test("vertica: varbinary blobs, long varchar text, float doubles") {
    val m = render("vertica")
    assert(m("id") == "bigint")
    assert(m("qty") == "int")
    assert(m("price") == "numeric(12,2)")
    assert(m("ratio") == "float")        // Vertica FLOAT is 8-byte
    assert(m("name") == "varchar(255)")
    assert(m("seen") == "timestamptz")
    assert(m("blob") == "long varbinary") // bare VARBINARY caps at 80 bytes
  }

  test("hive: varchar lengths kept, everything zoneless lands in timestamp") {
    val m = render("hive")
    assert(m("id") == "bigint")
    assert(m("qty") == "int")
    assert(m("ratio") == "double")
    assert(m("name") == "varchar(255)")
    assert(m("seen") == "timestamp")     // no tz type pre-Hive-3
    assert(m("blob") == "binary")
  }

  test("spark/iceberg: engine-native names; iceberg longs and timestamptz") {
    val sp = render("spark")
    assert(sp("id") == "bigint" && sp("name") == "string" && sp("seen") == "timestamp")
    assert(NativeTypes.render("spark",
      StructField("d", TimestampNTZType)) == "timestamp_ntz")
    val ib = render("iceberg")
    assert(ib("id") == "long")
    assert(ib("qty") == "int")
    assert(ib("name") == "string")
    assert(ib("seen") == "timestamptz")
    assert(ib("price") == "decimal(12,2)")
  }

  test("databricks: near-identity Spark map, timestamp_ntz for datetime") {
    val m = render("databricks")
    assert(m("id") == "bigint")
    assert(m("qty") == "int")
    assert(m("price") == "decimal(12,2)")
    assert(m("name") == "string")
    assert(m("seen") == "timestamp")     // zoned → timestamp
    assert(m("blob") == "binary")
    // datetime (Spark NTZ) renders timestamp; the template's own
    // timestamp → timestamp_ntz row is carried for map fidelity
    assert(NativeTypes.render("databricks",
      StructField("d", TimestampNTZType)) == "timestamp")
    assert(NativeTypes.generalTypeMap("databricks")("timestamp") == "timestamp_ntz")
  }

  test("db2: varchar ceiling at 32672, fixed varbinary, char(36) uuid") {
    val m = render("db2")
    assert(m("id") == "bigint")
    assert(m("price") == "decimal(12,2)")
    assert(m("name") == "varchar(255)")
    assert(m("note") == "varchar(4000)")
    assert(m("huge") == "varchar(32672)") // 100000 >= 32672 → max_string_type
    assert(m("blob") == "varbinary(32672)")
    assert(m("seen") == "timestamp")
  }

  test("starrocks: integer widens to bigint, varchar(65533) ceiling") {
    val m = render("starrocks")
    assert(m("id") == "bigint")
    assert(m("qty") == "bigint")          // integer → bigint per template
    assert(m("price") == "decimal(12,2)")
    assert(m("name") == "varchar(255)")
    assert(m("huge") == "varchar(65533)")
    assert(m("seen") == "datetime")
    assert(m("blob") == "varbinary")
  }

  test("sqlite: affinity types — temporal as text, decimal degrades to real") {
    val m = render("sqlite")
    assert(m("id") == "bigint")
    assert(m("qty") == "integer")
    assert(m("price") == "real")
    assert(m("name") == "text")
    assert(m("born") == "text")
    assert(m("seen") == "text")
    assert(m("blob") == "blob")
  }

  test("mariadb: mysql-shaped map, mediumtext over 16M ceiling") {
    val m = render("mariadb")
    assert(m("price") == "decimal(12,2)")
    assert(m("flag") == "tinyint(1)")
    assert(m("name") == "varchar(255)")
    assert(m("seen") == "datetime(6)")
    assert(m("blob") == "longblob")
    assert(NativeTypes.render("mariadb",
      StructField("x", StringType, metadata = new MetadataBuilder()
        .putLong("maxLength", 20000000).build())) == "mediumtext")
  }

  test("athena: glue types — int, unparameterized string, binary") {
    val m = render("athena")
    assert(m("id") == "bigint")
    assert(m("qty") == "int")
    assert(m("price") == "decimal(12,2)")
    assert(m("name") == "string")
    assert(m("seen") == "timestamp")
    assert(m("blob") == "binary")
  }

  test("azuresql/azuredwh: T-SQL cloud maps, nvarchar ceiling at 4000") {
    for (d <- Seq("azuresql", "azuredwh")) {
      val m = render(d)
      assert(m("name") == "nvarchar(255)", d)
      assert(m("note") == "nvarchar(max)", d)   // 4000 hits the ceiling
      assert(m("flag") == "bit", d)
      assert(m("seen") == "datetimeoffset", d)
      assert(m("blob") == "varbinary(max)", d)  // bare = varbinary(1) in T-SQL
    }
  }

  test("fabric: varchar not nvarchar, datetime2(6), zoned collapses") {
    val m = render("fabric")
    assert(m("name") == "varchar(255)")
    assert(m("note") == "varchar(max)")
    assert(m("seen") == "datetime2(6)")
    assert(m("flag") == "bit")
  }

  test("exasol: varchar(2000000) for all stringy types, local time zone") {
    val m = render("exasol")
    assert(m("name") == "varchar(2000000)")
    assert(m("blob") == "varchar(2000000)")
    assert(m("ratio") == "double precision")
    assert(m("seen") == "timestamp with local time zone")
  }

  test("firebird: varchar ceiling 8000, blob binary") {
    val m = render("firebird")
    assert(m("name") == "varchar(255)")
    assert(m("note") == "varchar(4000)")
    assert(m("huge") == "varchar(8000)")
    assert(m("blob") == "blob")
    assert(m("seen") == "timestamp with local time zone")
  }

  test("d1 matches the sqlite affinity family") {
    assert(render("d1") == render("sqlite").updated("id", "bigint"))
  }

  test("motherduck/ducklake: duckdb family, ducklake json degrades to text") {
    val f = StructField("j", StructType(Seq(StructField("a", LongType))))
    assert(NativeTypes.render("motherduck", f) == "json")
    assert(NativeTypes.render("ducklake", f) == "text")
    assert(render("motherduck")("name") == "varchar(255)")
    assert(render("ducklake")("seen") == "timestamptz")
  }

  test("proton: lowercase nullable wrappers, string bools") {
    val m = render("proton")
    assert(m("id") == "nullable(int64)")
    assert(m("price") == "nullable(decimal(12,2))")
    assert(m("flag") == "nullable(string)")
    assert(m("seen") == "nullable(datetime64(6))")
  }

  test("nested types map to the dialect json type") {
    val f = StructField("j", StructType(Seq(StructField("a", LongType))))
    assert(NativeTypes.render("postgres", f) == "jsonb")
    assert(NativeTypes.render("snowflake", f) == "variant")
    assert(NativeTypes.render("bigquery", f) == "json")
  }

  test("derby-rendered DDL executes: create, insert, read back") {
    val small = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("price", DecimalType(10, 2)),
      StructField("name", StringType),
      StructField("seen", TimestampType)))
    val ddl = DialectSql.stageTableDdl("derby", "NT_STAGE", small)
    assert(ddl ==
      "create table NT_STAGE (id bigint not null, price decimal(10,2), " +
        "name varchar(255), seen timestamp)")
    val conn = DriverManager
      .getConnection("jdbc:derby:memory:nativetypes;create=true")
    try {
      val st = conn.createStatement()
      st.executeUpdate(ddl)
      st.executeUpdate("INSERT INTO NT_STAGE VALUES " +
        "(1, 12.34, 'a', TIMESTAMP('2026-01-01 00:00:00'))")
      val rs = st.executeQuery("SELECT id, price, name FROM NT_STAGE")
      assert(rs.next())
      assert(rs.getLong(1) == 1L)
      assert(rs.getBigDecimal(2) == new java.math.BigDecimal("12.34"))
    } finally conn.close()
  }
}
