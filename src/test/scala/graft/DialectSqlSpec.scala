package graft

import java.sql.DriverManager

import org.scalatest.funsuite.AnyFunSuite

import graft.write.DialectSql
import graft.write.DialectSql.MergeSpec

/** Merge-strategy SQL rendering (templates/base.yaml:52-80 + dialect
  * overrides); the delete_insert pair also executes against embedded Derby
  * to prove the statements are runnable SQL, not just strings.
  */
class DialectSqlSpec extends AnyFunSuite {

  private val spec = MergeSpec("tgt_t", "src_t",
    pk = Seq("id"), columns = Seq("id", "v", "n"))

  test("merge_insert is a left-anti insert") {
    val sql = DialectSql.mergeInsert(spec)
    assert(sql.contains("WHERE NOT EXISTS"))
    assert(sql.contains("src.id = tgt.id"))
    assert(sql.contains("INSERT INTO tgt_t (id, v, n)"))
  }

  test("merge_update_insert is ANSI MERGE with non-pk SET list") {
    val sql = DialectSql.mergeUpdateInsert(spec)
    assert(sql.contains("MERGE INTO tgt_t tgt"))
    assert(sql.contains("WHEN MATCHED THEN UPDATE SET v = src.v, n = src.n"))
    assert(!sql.contains("id = src.id,")) // pk never updated
    assert(sql.contains("WHEN NOT MATCHED THEN INSERT (id, v, n)"))
  }

  test("change_capture: latest-per-pk window, D deletes, merge excludes D") {
    val stmts = DialectSql.mergeChangeCapture(spec)
    assert(stmts.length == 2)
    assert(stmts(0).contains("ROW_NUMBER() OVER"))
    assert(stmts(0).contains("_sling_synced_op = 'D'"))
    assert(stmts(1).contains("_sling_synced_op <> 'D'"))
  }

  test("dialect upserts: postgres ON CONFLICT, mysql ON DUPLICATE KEY") {
    assert(DialectSql.upsertFor("postgres", spec).head
      .contains("ON CONFLICT (id) DO UPDATE"))
    assert(DialectSql.upsertFor("postgres", spec).head
      .contains("v = EXCLUDED.v"))
    assert(DialectSql.upsertFor("mysql", spec).head
      .contains("ON DUPLICATE KEY UPDATE v = VALUES(v)"))
    assert(DialectSql.upsertFor("snowflake", spec).head
      .contains("MERGE INTO"))
  }

  test("sqlserver upsert: MERGE with HOLDLOCK hint and `;` terminator") {
    val sql = DialectSql.upsertFor("sqlserver", spec).head
    assert(sql ==
      """MERGE INTO tgt_t WITH (HOLDLOCK) tgt
        |USING (SELECT id, v, n FROM src_t) src
        |ON (src.id = tgt.id)
        |WHEN MATCHED THEN UPDATE SET v = src.v, n = src.n
        |WHEN NOT MATCHED THEN INSERT (id, v, n) VALUES (src.id, src.v, src.n);""".stripMargin)
  }

  test("sqlserver delete_insert uses T-SQL DELETE-alias form") {
    val stmts = DialectSql.sqlserverDeleteInsert(spec)
    assert(stmts.head.startsWith("DELETE tgt FROM tgt_t tgt"))
    assert(stmts(1).contains("INSERT INTO tgt_t (id, v, n)"))
  }

  test("oracle upsert: ANSI MERGE without terminator") {
    val sql = DialectSql.upsertFor("oracle", spec).head
    assert(sql.startsWith("MERGE INTO tgt_t tgt"))
    assert(!sql.endsWith(";")) // ORA-00911 if terminated in plain SQL
  }

  test("oracle replace: literal source selects FROM dual") {
    val sql = DialectSql.oracleReplace("tgt_t", Seq("id"),
      Seq("id" -> "1", "v" -> "'x'"))
    assert(sql ==
      """MERGE INTO tgt_t tgt
        |USING (SELECT 1 AS id, 'x' AS v FROM dual) src
        |ON (src.id = tgt.id)
        |WHEN MATCHED THEN UPDATE SET tgt.v = src.v
        |WHEN NOT MATCHED THEN INSERT (id, v)
        |VALUES (src.id, src.v)""".stripMargin)
  }

  test("clickhouse: no MERGE — mutation delete with mutations_sync, insert") {
    val stmts = DialectSql.upsertFor("clickhouse", spec)
    assert(stmts.length == 2)
    assert(stmts.head ==
      """ALTER TABLE tgt_t DELETE
        |WHERE (id) IN (
        |  SELECT id FROM src_t
        |) SETTINGS mutations_sync = 1""".stripMargin)
    assert(stmts(1).startsWith("INSERT INTO tgt_t (id, v, n)"))
    assert(DialectSql.defaultMergeStrategy("clickhouse") == "delete_insert")
  }

  test("clickhouse insert-missing uses tuple NOT IN, not NOT EXISTS") {
    val sql = DialectSql.clickhouseInsertMissing(spec)
    assert(sql.contains("WHERE (id) NOT IN ("))
    assert(!sql.contains("EXISTS"))
  }

  test("redshift: delete_insert without target alias in DELETE") {
    val stmts = DialectSql.upsertFor("redshift", spec)
    assert(stmts.head ==
      """DELETE FROM tgt_t
        |USING src_t src
        |WHERE src.id = tgt_t.id""".stripMargin)
    assert(stmts(1).startsWith("INSERT INTO tgt_t (id, v, n)"))
    assert(DialectSql.defaultMergeStrategy("redshift") == "delete_insert")
    assert(DialectSql.defaultMergeStrategy("postgres") == "update_insert")
  }

  test("db2 upsert: MERGE sources the staged base table, not a subquery") {
    val sql = DialectSql.upsertFor("db2", spec).head
    assert(sql.contains("USING src_t src"))
    assert(!sql.contains("USING (SELECT"))
    assert(sql.contains("WHEN MATCHED THEN UPDATE SET v = src.v, n = src.n"))
  }

  test("trino and databricks take the ANSI MERGE default") {
    assert(DialectSql.upsertFor("trino", spec).head.startsWith("MERGE INTO"))
    assert(DialectSql.upsertFor("databricks", spec).head.startsWith("MERGE INTO"))
    assert(DialectSql.defaultMergeStrategy("trino") == "update_insert")
    assert(DialectSql.defaultMergeStrategy("databricks") == "update_insert")
  }

  test("sqlite upsert: ON CONFLICT with the load-bearing WHERE true") {
    val sql = DialectSql.upsertFor("sqlite", spec).head
    assert(sql ==
      """INSERT INTO tgt_t (id, v, n)
        |SELECT src.id, src.v, src.n FROM src_t src WHERE true
        |ON CONFLICT (id)
        |DO UPDATE SET v = excluded.v, n = excluded.n""".stripMargin)
  }

  test("starrocks: plain INSERT is the upsert on PK tables; no guard") {
    val sql = DialectSql.upsertFor("starrocks", spec).head
    assert(sql ==
      """INSERT INTO tgt_t (id, v, n)
        |SELECT src.id, src.v, src.n FROM src_t src""".stripMargin)
    assert(!sql.contains("NOT EXISTS") && !sql.contains("NOT IN"))
    assert(DialectSql.defaultMergeStrategy("starrocks") == "insert")
  }

  test("starrocks delete_insert: tuple IN delete, then insert") {
    val stmts = DialectSql.starrocksDeleteInsert(spec)
    assert(stmts.head ==
      """DELETE FROM tgt_t
        |WHERE (id) IN (
        |  SELECT id FROM src_t
        |)""".stripMargin)
    assert(stmts(1).startsWith("INSERT INTO tgt_t (id, v, n)"))
  }

  test("starrocks staged DDL: primary-key table with hash distribution") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))
    assert(DialectSql.starrocksCreateTable("st_t", schema, Seq("id")) ==
      "create table if not exists st_t (id bigint, v varchar(255)) " +
        "primary key (id) distributed by hash(id)")
  }

  test("mariadb: delete_insert default, DELETE names target directly") {
    val stmts = DialectSql.upsertFor("mariadb", spec)
    assert(stmts.head ==
      """DELETE FROM tgt_t
        |WHERE EXISTS (
        |  SELECT 1 FROM src_t src
        |  WHERE src.id = tgt_t.id
        |)""".stripMargin)
    assert(stmts(1).startsWith("INSERT INTO tgt_t (id, v, n)"))
    assert(DialectSql.defaultMergeStrategy("mariadb") == "delete_insert")
  }

  test("athena: insert-missing is the only strategy on standard tables") {
    val stmts = DialectSql.upsertFor("athena", spec)
    assert(stmts.length == 1)
    assert(stmts.head.contains("WHERE NOT EXISTS"))
    assert(DialectSql.defaultMergeStrategy("athena") == "insert")
  }

  test("azuresql/fabric: T-SQL MERGE with terminator, without HOLDLOCK") {
    for (d <- Seq("azuresql", "fabric")) {
      val sql = DialectSql.upsertFor(d, spec).head
      assert(sql.startsWith("MERGE INTO tgt_t tgt"), d)
      assert(sql.endsWith(";"), d)
      assert(!sql.contains("HOLDLOCK"), d)
    }
  }

  test("firebird inherits the base ANSI MERGE; azuredwh takes T-SQL's ';'") {
    val fb = DialectSql.upsertFor("firebird", spec).head
    assert(fb.startsWith("MERGE INTO tgt_t tgt"))
    assert(!fb.endsWith(";"))
    // Synapse speaks T-SQL over the sqlserver wire: MERGE must terminate
    val dwh = DialectSql.upsertFor("azuredwh", spec).head
    assert(dwh.startsWith("MERGE INTO tgt_t tgt"))
    assert(dwh.endsWith(";"))
    assert(DialectSql.defaultMergeStrategy("azuredwh") == "update_insert")
  }

  test("exasol MERGE sources the staged base table like db2") {
    val sql = DialectSql.upsertFor("exasol", spec).head
    assert(sql.contains("USING src_t src"))
    assert(!sql.contains("USING (SELECT"))
  }

  test("d1 takes the sqlite ON CONFLICT shape") {
    assert(DialectSql.upsertFor("d1", spec) ==
      DialectSql.upsertFor("sqlite", spec))
  }

  test("duckdb family: update_insert is null, default is delete_insert") {
    for (d <- Seq("duckdb", "motherduck", "ducklake")) {
      val stmts = DialectSql.upsertFor(d, spec)
      assert(stmts.length == 2, d)
      assert(stmts.head.startsWith("DELETE FROM tgt_t tgt"), d)
      assert(stmts(1).startsWith("INSERT INTO tgt_t (id, v, n)"), d)
      assert(DialectSql.defaultMergeStrategy(d) == "delete_insert", d)
    }
  }

  test("proton: append-only — plain insert is the only strategy") {
    val stmts = DialectSql.upsertFor("proton", spec)
    assert(stmts == Seq(
      """INSERT INTO tgt_t (id, v, n)
        |SELECT src.id, src.v, src.n FROM src_t src""".stripMargin))
    assert(DialectSql.defaultMergeStrategy("proton") == "insert")
  }

  test("identifier quoting: backtick engines vs ANSI double quote") {
    assert(DialectSql.quoteIdent("mysql", "order key") == "`order key`")
    assert(DialectSql.quoteIdent("bigquery", "sel") == "`sel`")
    assert(DialectSql.quoteIdent("postgres", "order key") == "\"order key\"")
    assert(DialectSql.quoteIdent("sqlserver", "x") == "\"x\"")
    // re-quoting swaps the quote style instead of nesting
    assert(DialectSql.quoteIdent("mysql", "\"q\"") == "`q`")
    assert(DialectSql.quoteIdent("postgres", "`q`") == "\"q\"")
    // hive/spark backtick (engine-correct despite the base-yaml fallback);
    // vertica/iceberg keep the ANSI double quote
    assert(DialectSql.quoteIdent("hive", "x") == "`x`")
    assert(DialectSql.quoteIdent("spark", "x") == "`x`")
    assert(DialectSql.quoteIdent("vertica", "x") == "\"x\"")
    assert(DialectSql.quoteIdent("iceberg", "x") == "\"x\"")
  }

  test("upper-case-catalog dialects per DBNameUpperCase + column_upper") {
    assert(Seq("oracle", "snowflake", "exasol", "db2")
      .forall(DialectSql.nameUpperCase))
    assert(Seq("postgres", "mysql", "databricks", "duckdb")
      .forall(d => !DialectSql.nameUpperCase(d)))
  }

  test("schema evolution: add_column with per-dialect COLUMN keyword") {
    import org.apache.spark.sql.types._
    val f = StructField("extra", DecimalType(10, 2))
    assert(DialectSql.addColumnSql("postgres", "t", f) ==
      "alter table t add column extra numeric")
    assert(DialectSql.addColumnSql("mysql", "t", f) ==
      "alter table t add column extra decimal(10,2)")
    // oracle + T-SQL family: no COLUMN keyword
    assert(DialectSql.addColumnSql("oracle", "t", f) ==
      "alter table t add extra number(10,2)")
    assert(DialectSql.addColumnSql("sqlserver", "t", f) ==
      "alter table t add extra decimal(10,2)")
    assert(DialectSql.addColumnSql("fabric", "t", f) ==
      "alter table t add extra decimal(10,2)")
  }

  test("schema evolution: alter_columns composition per dialect") {
    import org.apache.spark.sql.types._
    val f = StructField("v", StringType,
      metadata = new MetadataBuilder().putLong("maxLength", 500).build())
    assert(DialectSql.alterColumnSql("postgres", "t", f) ==
      "alter table t alter column v type varchar(500)")
    assert(DialectSql.alterColumnSql("mysql", "t", f) ==
      "alter table t modify v varchar(500)")
    assert(DialectSql.alterColumnSql("oracle", "t", f) ==
      "alter table t modify (v varchar(500))")
    assert(DialectSql.alterColumnSql("sqlserver", "t", f) ==
      "alter table t alter column v nvarchar(500)")
    assert(DialectSql.alterColumnSql("snowflake", "t", f) ==
      "alter table t alter v set data type varchar(500)")
    assert(DialectSql.alterColumnSql("clickhouse", "t", f) ==
      "alter table t modify column v Nullable(String)")
    assert(DialectSql.alterColumnSql("duckdb", "t", f) ==
      "alter table t alter v type varchar(500)")
    assert(DialectSql.alterColumnSql("db2", "t", f) ==
      "alter table t alter column v set data type varchar(500)")
    // spark grammar has no SET DATA TYPE; hive has only CHANGE COLUMN
    assert(DialectSql.alterColumnSql("spark", "t", f) ==
      "alter table t alter column v type string")
    assert(DialectSql.alterColumnSql("hive", "t", f) ==
      "alter table t change column v v varchar(500)")
    // table-recreate engines must fail fast, not render broken DDL
    intercept[IllegalArgumentException](DialectSql.alterColumnSql("bigquery", "t", f))
    intercept[IllegalArgumentException](DialectSql.alterColumnSql("sqlite", "t", f))
  }

  test("quoteIdent doubles embedded quote chars") {
    assert(DialectSql.quoteIdent("postgres", "a\"b") == "\"a\"\"b\"")
    assert(DialectSql.quoteIdent("mysql", "a`b") == "`a``b`")
    assert(DialectSql.quoteIdent("postgres", "plain") == "\"plain\"")
  }

  test("add_column executes on embedded Derby") {
    import org.apache.spark.sql.types._
    val url = "jdbc:derby:memory:dialectaddcol;create=true"
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate("CREATE TABLE AC_T (id INT)")
      st.executeUpdate(DialectSql.addColumnSql("derby", "AC_T",
        StructField("extra", DecimalType(10, 2))))
      st.executeUpdate("INSERT INTO AC_T VALUES (1, 9.99)")
      val rs = st.executeQuery("SELECT extra FROM AC_T")
      assert(rs.next())
      assert(rs.getBigDecimal(1) == new java.math.BigDecimal("9.99"))
    } finally conn.close()
  }

  test("delete_insert executes on embedded Derby") {
    val url = "jdbc:derby:memory:dialecttest;create=true"
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate("CREATE TABLE tgt_t (id INT, v VARCHAR(10), n INT)")
      st.executeUpdate("CREATE TABLE src_t (id INT, v VARCHAR(10), n INT)")
      st.executeUpdate("INSERT INTO tgt_t VALUES (1,'old',1),(2,'keep',2)")
      st.executeUpdate("INSERT INTO src_t VALUES (1,'new',10),(3,'ins',30)")
      DialectSql.mergeDeleteInsert(spec).foreach(st.executeUpdate)
      val rs = st.executeQuery("SELECT id, v FROM tgt_t ORDER BY id")
      val out = Iterator.continually(rs)
        .takeWhile(_.next()).map(r => (r.getInt(1), r.getString(2))).toList
      assert(out == List((1, "new"), (2, "keep"), (3, "ins")))
    } finally conn.close()
  }

  test("merge_insert (insert-missing) executes on embedded Derby") {
    val url = "jdbc:derby:memory:dialectins;create=true"
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate("CREATE TABLE tgt_t (id INT, v VARCHAR(10), n INT)")
      st.executeUpdate("CREATE TABLE src_t (id INT, v VARCHAR(10), n INT)")
      st.executeUpdate("INSERT INTO tgt_t VALUES (1,'old',1)")
      st.executeUpdate("INSERT INTO src_t VALUES (1,'dup',10),(2,'ins',20)")
      st.executeUpdate(DialectSql.mergeInsert(spec))
      val rs = st.executeQuery("SELECT id, v FROM tgt_t ORDER BY id")
      val out = Iterator.continually(rs)
        .takeWhile(_.next()).map(r => (r.getInt(1), r.getString(2))).toList
      // matched pk untouched, missing pk inserted
      assert(out == List((1, "old"), (2, "ins")))
    } finally conn.close()
  }

  test("ANSI MERGE update_insert executes on embedded Derby") {
    // Derby >= 10.11 implements ANSI MERGE — this proves the default
    // update_insert template runs on a second engine besides rendering
    val url = "jdbc:derby:memory:dialectmerge;create=true"
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate("CREATE TABLE tgt_t (id INT, v VARCHAR(10), n INT)")
      st.executeUpdate("CREATE TABLE src_t (id INT, v VARCHAR(10), n INT)")
      st.executeUpdate("INSERT INTO tgt_t VALUES (1,'old',1),(2,'keep',2)")
      st.executeUpdate("INSERT INTO src_t VALUES (1,'new',10),(3,'ins',30)")
      // Derby's MERGE source must be a base table (not a subquery) — the
      // dialect dispatch renders the table form, as the staged-load
      // production path (Jdbc.merge) always does.
      DialectSql.upsertFor("derby", spec).foreach(st.executeUpdate)
      val rs = st.executeQuery("SELECT id, v, n FROM tgt_t ORDER BY id")
      val out = Iterator.continually(rs)
        .takeWhile(_.next())
        .map(r => (r.getInt(1), r.getString(2), r.getInt(3))).toList
      assert(out == List((1, "new", 10), (2, "keep", 2), (3, "ins", 30)))
    } finally conn.close()
  }
}
