package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.{FileSources, Tables}
import graft.transform.{Casing, Constraints, Flatten, Meta, Select, Transforms}

/** The row-pipeline surface: select expressions, named transforms, expression
  * transforms, flatten, casing, constraints, metadata columns, and the
  * sampling type-inference engine via CSV/JSONL round-trips.
  */
object Pipeline {
  import scala.jdk.CollectionConverters._

  private def scratch(name: String, sfDir: String): String =
    Scratch.dir(name, sfDir)

  def queries: Seq[Q] = Seq(

    Q("op_select_exprs",
      (s, dir) => Select(Tables(s, dir, "lineitem"),
          Seq("l_orderkey", "l_quantity as qty", "l_ship*"))
        .orderBy("l_orderkey", "qty", "l_shipdate"),
      Some("""SELECT l_orderkey, l_quantity AS qty, l_shipdate FROM lineitem
        ORDER BY l_orderkey, qty, l_shipdate""")),

    Q("op_select_exclude",
      (s, dir) => Select(Tables(s, dir, "customer"), Seq("-c_acctbal", "-c_nation*"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
        ORDER BY c_custkey""")),

    Q("op_transforms_named",
      (s, dir) => {
        val c = Tables(s, dir, "customer")
        c.select(
          col("c_custkey"),
          Transforms("upper", col("c_name")).as("name_upper"),
          Transforms("lower", col("c_mktsegment")).as("seg_lower"),
          Transforms("hash_md5", col("c_name")).as("name_md5"),
          Transforms("hash_sha256", col("c_name")).as("name_sha256"),
          Transforms("replace_accents", col("c_name")).as("name_ascii"),
          Transforms("length", col("c_name")).as("name_len"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, upper(c_name) AS name_upper,
        lower(c_mktsegment) AS seg_lower, md5(c_name) AS name_md5,
        sha256(c_name) AS name_sha256, strip_accents(c_name) AS name_ascii,
        CAST(length(c_name) AS INT) AS name_len
        FROM customer ORDER BY c_custkey""")),

    // expression transforms: the reference's goval interpreter is
    // closed-source (transforms.go:122-128); Spark SQL `expr` is our engine
    Q("op_expr_transform",
      (s, dir) => Tables(s, dir, "events")
        .withColumn("value_bucket", expr("cast(floor(value / 100) as bigint)"))
        .withColumn("etype_user", expr("concat(event_type, '_', cast(user_id % 10 as string))"))
        .select("event_id", "value_bucket", "etype_user")
        .orderBy("event_id"),
      Some("""SELECT event_id, CAST(floor(value / 100) AS BIGINT) AS value_bucket,
        concat(event_type, '_', CAST(user_id % 10 AS VARCHAR)) AS etype_user
        FROM events ORDER BY event_id""")),

    Q("op_flatten_json",
      (s, dir) => {
        val e = Tables(s, dir, "events")
          .select(col("event_id"),
            from_json(col("props"), StructType(Seq(StructField("k", IntegerType)))).as("props"))
        Flatten(e).orderBy("event_id")
      },
      Some("""SELECT event_id,
        CAST(json_extract_string(props, '$.k') AS INT) AS props__k
        FROM events ORDER BY event_id""")),

    Q("op_casing_upper",
      (s, dir) => Casing(Tables(s, dir, "customer"), "upper").orderBy("C_CUSTKEY"),
      Some("""SELECT c_custkey AS C_CUSTKEY, c_name AS C_NAME,
        c_nationkey AS C_NATIONKEY, c_acctbal AS C_ACCTBAL,
        c_mktsegment AS C_MKTSEGMENT FROM customer ORDER BY C_CUSTKEY""")),

    Q("op_constraints",
      (s, dir) => Constraints.failCounts(Tables(s, dir, "lineitem"), Seq(
        Constraints.Check("l_quantity", "l_quantity > 0"),
        Constraints.Check("l_discount", "l_discount <= 0.05"),
        Constraints.Check("l_extendedprice", "l_extendedprice > 0"),
        Constraints.Check("l_tax", "l_tax >= 0 and l_tax <= 0.08")))
        .orderBy("expression"),
      Some("""SELECT * FROM (
        SELECT 'l_quantity' AS "column", 'l_quantity > 0' AS expression,
          CAST(SUM(CASE WHEN NOT (l_quantity > 0) THEN 1 ELSE 0 END) AS BIGINT) AS fail_count FROM lineitem
        UNION ALL
        SELECT 'l_discount', 'l_discount <= 0.05',
          CAST(SUM(CASE WHEN NOT (l_discount <= 0.05) THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
        UNION ALL
        SELECT 'l_extendedprice', 'l_extendedprice > 0',
          CAST(SUM(CASE WHEN NOT (l_extendedprice > 0) THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
        UNION ALL
        SELECT 'l_tax', 'l_tax >= 0 and l_tax <= 0.08',
          CAST(SUM(CASE WHEN NOT (l_tax >= 0 AND l_tax <= 0.08) THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem)
        ORDER BY expression""")),

    // exact sling checksums: per-type uint64 value checksums wrap-summed by
    // a native Aggregator (ANSI-safe); no wrap occurs at these sums so the
    // oracle reproduces them with plain arithmetic. Both sides render the
    // uint64 as VARCHAR: DECIMAL(20,0) goes through pandas as float64 on the
    // oracle side ("1124250.0" vs "1124250" — the round-1 HUGEINT trap).
    // String checksums are UTF-8 BYTE lengths (stream_processor.go:771) —
    // DuckDB strlen(), not length().
    Q("op_exact_checksum",
      (s, dir) => {
        import graft.functions.expressions.ExactChecksum._
        val c = Tables(s, dir, "customer")
        c.agg(
          asUnsigned(checksum(col("c_custkey"), org.apache.spark.sql.types.LongType)).cast("string").as("ck_custkey"),
          asUnsigned(checksum(col("c_name"), org.apache.spark.sql.types.StringType)).cast("string").as("ck_name"),
          asUnsigned(checksum(col("c_nationkey"), org.apache.spark.sql.types.IntegerType)).cast("string").as("ck_nationkey"),
          asUnsigned(checksum(col("c_acctbal"), org.apache.spark.sql.types.DoubleType)).cast("string").as("ck_acctbal"),
          asUnsigned(checksum(col("c_mktsegment"), org.apache.spark.sql.types.StringType)).cast("string").as("ck_mktsegment"))
      },
      Some("""SELECT
        CAST(CAST(SUM(abs(c_custkey)) AS DECIMAL(20,0)) AS VARCHAR) AS ck_custkey,
        CAST(CAST(SUM(strlen(c_name)) AS DECIMAL(20,0)) AS VARCHAR) AS ck_name,
        CAST(CAST(SUM(abs(c_nationkey)) AS DECIMAL(20,0)) AS VARCHAR) AS ck_nationkey,
        CAST(CAST(SUM(CAST(trunc(abs(c_acctbal)) AS BIGINT)) AS DECIMAL(20,0)) AS VARCHAR) AS ck_acctbal,
        CAST(CAST(SUM(strlen(c_mktsegment)) AS DECIMAL(20,0)) AS VARCHAR) AS ck_mktsegment
        FROM customer""")),

    // binary/protocol transforms on md5-derived bytes: RFC vs MS-GUID byte
    // order, bit parse — oracle reorders hex slices the same way
    Q("op_transforms_binary",
      (s, dir) => {
        val c = Tables(s, dir, "customer")
        val bytes = unhex(md5(col("c_name")))
        c.select(col("c_custkey"),
          graft.transform.BinaryTransforms.parse_uuid_bin(bytes).as("uuid"),
          graft.transform.BinaryTransforms.parse_ms_uuid(bytes).as("ms_uuid"),
          graft.transform.BinaryTransforms.parse_bit(
            unhex(lpad((col("c_custkey") % 2).cast("string"), 2, "0"))).as("bit"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey,
        substr(md5(c_name),1,8)||'-'||substr(md5(c_name),9,4)||'-'||
          substr(md5(c_name),13,4)||'-'||substr(md5(c_name),17,4)||'-'||
          substr(md5(c_name),21,12) AS uuid,
        substr(md5(c_name),7,2)||substr(md5(c_name),5,2)||
          substr(md5(c_name),3,2)||substr(md5(c_name),1,2)||'-'||
          substr(md5(c_name),11,2)||substr(md5(c_name),9,2)||'-'||
          substr(md5(c_name),15,2)||substr(md5(c_name),13,2)||'-'||
          substr(md5(c_name),17,4)||'-'||substr(md5(c_name),21,12) AS ms_uuid,
        CAST(c_custkey % 2 AS VARCHAR) AS bit
        FROM customer ORDER BY c_custkey""")),


    // EXECUTED dialect merges: the rendered upsert/delete_insert
    // statements for twelve render-only dialects run against the
    // MiniSql store (the same evaluator behind the pg/mysql/tds
    // loopbacks), seeded from nation — target keys 0..14 keep their
    // names, staged source keys 10..24 carry upper-cased names, so the
    // merged result is byte-comparable to the oracle's CASE expression.
    // A render whose shape the evaluator can't parse, or whose
    // semantics diverge from the upsert contract, hash-mismatches here.
    Q("op_dialect_exec",
      (s, dir) => {
        import s.implicits._
        import graft.write.DialectSql
        val spec = DialectSql.MergeSpec("dst", "stg",
          Seq("n_nationkey"), Seq("n_nationkey", "n_name"))
        // every dialect whose DEFAULT merge strategy implements the
        // upsert contract executes its own rendered statements
        // (upsertFor dispatch); starrocks pins its delete_insert
        // strategy (its default is the engine's PK-table native upsert,
        // which plain SQL can't express — DialectExecSpec asserts that
        // semantic separately, alongside athena's insert-missing and
        // proton's append-only strategies)
        val dialects = Seq("oracle", "exasol", "db2", "sqlserver",
          "azuresql", "azuredwh", "fabric", "postgres", "sqlite", "d1",
          "mysql", "redshift", "mariadb", "clickhouse", "snowflake",
          "bigquery", "trino", "databricks", "firebird", "derby",
          "motherduck", "ducklake", "vertica", "hive", "spark",
          "iceberg")
        val strategies: Seq[(String, Seq[String])] =
          dialects.map(d => d -> DialectSql.upsertFor(d, spec)) :+
            ("starrocks" -> DialectSql.starrocksDeleteInsert(spec))
        // 25-row dimension table — a bounded driver-side fixture seed
        val nations = Tables(s, dir, "nation")
          .select("n_nationkey", "n_name").collect()
          .map(r => (r.getAs[Number](0).longValue(), r.getString(1)))
          .sortBy(_._1)
        val merged = strategies.flatMap { case (dialect, stmts) =>
          val st = new graft.sources.MiniSql.Store(
            numeric = Set(20), typeOf = _ => (25, -1), textCode = 25,
            countCode = 20)
          Seq("dst", "stg").foreach(t => st.define(t,
            Seq(graft.sources.MiniSql.Col("n_nationkey", 20),
              graft.sources.MiniSql.Col("n_name", 25))))
          st.definePk("dst", Seq("n_nationkey"))
          val d = st.resolve("dst"); val g = st.resolve("stg")
          nations.filter(_._1 <= 14).foreach { case (k, n) =>
            st.appendText(d, Seq(Some(k.toString), Some(n)), Seq(0, 1)) }
          nations.filter(_._1 >= 10).foreach { case (k, n) =>
            st.appendText(g,
              Seq(Some(k.toString), Some(n.toUpperCase)), Seq(0, 1)) }
          stmts.foreach(st.run)
          st.textRows("dst").map(r =>
            (dialect, r(0).get.toLong, r(1).get))
        }
        merged.toDF("dialect", "n_nationkey", "n_name")
          .orderBy("dialect", "n_nationkey")
      },
      Some("""WITH dialects(dialect) AS (VALUES ('oracle'), ('exasol'),
        |  ('db2'), ('sqlserver'), ('azuresql'), ('azuredwh'), ('fabric'),
        |  ('postgres'), ('sqlite'), ('d1'), ('mysql'), ('redshift'),
        |  ('mariadb'), ('clickhouse'), ('snowflake'), ('bigquery'),
        |  ('trino'), ('databricks'), ('firebird'), ('derby'),
        |  ('motherduck'), ('ducklake'), ('vertica'), ('hive'), ('spark'),
        |  ('iceberg'), ('starrocks')),
        |merged AS (
        |  SELECT n_nationkey,
        |    CASE WHEN n_nationkey >= 10 THEN upper(n_name) ELSE n_name END
        |      AS n_name
        |  FROM nation)
        |SELECT dialect, n_nationkey, n_name
        |FROM dialects CROSS JOIN merged
        |ORDER BY dialect, n_nationkey""".stripMargin)),

    // The FULL strategy×dialect matrix EXECUTED: every (dialect,
    // strategy) pair the reference's templates define — update_insert /
    // delete_insert / merge_update / merge_insert / append across 30
    // dialects (DialectSql.strategyFor; pairs the templates null are
    // excluded in both the Scala dispatch and the oracle's anti-join
    // predicates, so the PAIR LIST itself is hash-gated). Same fixture
    // shape as op_dialect_exec: dst keys 0..14 original, staged keys
    // 10..24 upper-cased; each strategy has its own arithmetic oracle.
    Q("op_dialect_strategies",
      (s, dir) => {
        import s.implicits._
        import graft.write.DialectSql
        val spec = DialectSql.MergeSpec("dst", "stg",
          Seq("n_nationkey"), Seq("n_nationkey", "n_name"))
        val dialects = Seq("oracle", "exasol", "db2", "sqlserver",
          "azuresql", "azuredwh", "fabric", "postgres", "sqlite", "d1",
          "mysql", "redshift", "mariadb", "clickhouse", "snowflake",
          "bigquery", "trino", "databricks", "firebird", "derby",
          "motherduck", "ducklake", "vertica", "hive", "spark",
          "iceberg", "starrocks", "athena", "proton", "duckdb")
        val strategies = Seq("update_insert", "delete_insert",
          "merge_update", "merge_insert", "append")
        val nations = Tables(s, dir, "nation")
          .select("n_nationkey", "n_name").collect()
          .map(r => (r.getAs[Number](0).longValue(), r.getString(1)))
          .sortBy(_._1)
        val out = for {
          dialect <- dialects
          strategy <- strategies
          stmts <- DialectSql.strategyFor(dialect, strategy, spec).toSeq
          row <- {
            val st = new graft.sources.MiniSql.Store(
              numeric = Set(20), typeOf = _ => (25, -1), textCode = 25,
              countCode = 20)
            Seq("dst", "stg").foreach(t => st.define(t,
              Seq(graft.sources.MiniSql.Col("n_nationkey", 20),
                graft.sources.MiniSql.Col("n_name", 25))))
            st.definePk("dst", Seq("n_nationkey"))
            val d = st.resolve("dst"); val g = st.resolve("stg")
            nations.filter(_._1 <= 14).foreach { case (k, n) =>
              st.appendText(d, Seq(Some(k.toString), Some(n)), Seq(0, 1)) }
            nations.filter(_._1 >= 10).foreach { case (k, n) =>
              st.appendText(g,
                Seq(Some(k.toString), Some(n.toUpperCase)), Seq(0, 1)) }
            stmts.foreach(st.run)
            st.textRows("dst").map(r =>
              (dialect, strategy, r(0).get.toLong, r(1).get))
          }
        } yield row
        out.toDF("dialect", "strategy", "n_nationkey", "n_name")
          .orderBy("dialect", "strategy", "n_nationkey", "n_name")
      },
      Some("""WITH dialects(dialect) AS (VALUES ('oracle'), ('exasol'),
        |  ('db2'), ('sqlserver'), ('azuresql'), ('azuredwh'), ('fabric'),
        |  ('postgres'), ('sqlite'), ('d1'), ('mysql'), ('redshift'),
        |  ('mariadb'), ('clickhouse'), ('snowflake'), ('bigquery'),
        |  ('trino'), ('databricks'), ('firebird'), ('derby'),
        |  ('motherduck'), ('ducklake'), ('vertica'), ('hive'), ('spark'),
        |  ('iceberg'), ('starrocks'), ('athena'), ('proton'), ('duckdb')),
        |strategies(strategy) AS (VALUES ('update_insert'),
        |  ('delete_insert'), ('merge_update'), ('merge_insert'),
        |  ('append')),
        |pairs AS (
        |  SELECT dialect, strategy FROM dialects CROSS JOIN strategies
        |  WHERE NOT (strategy = 'update_insert' AND dialect IN
        |    ('clickhouse','redshift','mariadb','duckdb','motherduck',
        |     'ducklake','starrocks','athena','proton'))
        |  AND NOT (strategy = 'delete_insert' AND dialect IN
        |    ('athena','proton'))
        |  AND NOT (strategy = 'merge_update' AND dialect IN
        |    ('clickhouse','starrocks','athena','proton'))
        |  AND NOT (strategy = 'merge_insert' AND dialect = 'proton')),
        |results AS (
        |  SELECT 'update_insert' AS strategy, n_nationkey,
        |    CASE WHEN n_nationkey >= 10 THEN upper(n_name) ELSE n_name END
        |      AS n_name
        |  FROM nation
        |  UNION ALL
        |  SELECT 'delete_insert', n_nationkey,
        |    CASE WHEN n_nationkey >= 10 THEN upper(n_name) ELSE n_name END
        |  FROM nation
        |  UNION ALL
        |  SELECT 'merge_update', n_nationkey,
        |    CASE WHEN n_nationkey >= 10 THEN upper(n_name) ELSE n_name END
        |  FROM nation WHERE n_nationkey <= 14
        |  UNION ALL
        |  SELECT 'merge_insert', n_nationkey,
        |    CASE WHEN n_nationkey >= 15 THEN upper(n_name) ELSE n_name END
        |  FROM nation
        |  UNION ALL
        |  SELECT 'append', n_nationkey, n_name
        |  FROM nation WHERE n_nationkey <= 14
        |  UNION ALL
        |  SELECT 'append', n_nationkey, upper(n_name)
        |  FROM nation WHERE n_nationkey >= 10)
        |SELECT p.dialect, p.strategy, r.n_nationkey, r.n_name
        |FROM pairs p JOIN results r ON r.strategy = p.strategy
        |ORDER BY p.dialect, p.strategy, n_nationkey, n_name""".stripMargin)),

    // The duckdb dialect EXECUTED against a real embedded DuckDB
    // (duckdb_jdbc): Spark JDBC staging write + the in-DB delete_insert
    // merge (duckdb's default strategy, duckdb.yaml) + distributed JDBC
    // read-back — the same staged-load flow the Derby rows gate,
    // proving the duckdb family's statements run on their own engine.
    Q("op_duckdb_exec",
      (s, dir) => {
        import graft.sources.Jdbc
        val workDir = new java.io.File(scratch("duckdb_exec", dir))
        workDir.mkdirs()
        val db = new java.io.File(workDir, "t.duckdb")
        db.delete(); new java.io.File(workDir, "t.duckdb.wal").delete()
        val url = s"jdbc:duckdb:$db"
        val nation = Tables(s, dir, "nation").select("n_nationkey", "n_name")
        val tgt = nation.filter(col("n_nationkey") <= 14)
        val stg = nation.filter(col("n_nationkey") >= 10)
          .select(col("n_nationkey"), upper(col("n_name")).as("n_name"))
        // default strategy (delete_insert, duckdb.yaml) AND the
        // non-default insert-missing strategy, both on the real engine.
        // The MERGE-based strategies (update_insert/update) need
        // DuckDB >= 1.4 (MERGE INTO landed there); the offline cache
        // carries duckdb_jdbc 1.0.0, where the MiniSql matrix row
        // (op_dialect_strategies) carries those semantics instead.
        Seq("delete_insert" -> "facts", "insert" -> "facts_ins")
          .foreach { case (strategy, table) =>
            Jdbc.write(tgt, url, table)
            Jdbc.mergeStrategy(stg, url, table, Seq("n_nationkey"), strategy)
          }
        val byStrategy = Seq("delete_insert" -> "facts",
          "insert" -> "facts_ins").map { case (strategy, table) =>
          Jdbc.read(s, url, table)
            .select(lit(strategy).as("strategy"),
              col("n_nationkey").cast("long"), col("n_name"))
        }
        byStrategy.reduce(_ unionByName _)
          .orderBy("strategy", "n_nationkey")
      },
      Some("""SELECT 'delete_insert' AS strategy, n_nationkey,
        |  CASE WHEN n_nationkey >= 10 THEN upper(n_name) ELSE n_name END
        |    AS n_name
        |FROM nation
        |UNION ALL
        |SELECT 'insert', n_nationkey,
        |  CASE WHEN n_nationkey >= 15 THEN upper(n_name) ELSE n_name END
        |FROM nation
        |ORDER BY strategy, n_nationkey""".stripMargin)),

    // Per-dialect native-type DDL for the orders schema across every
    // reference dialect with a real general_type_map (25 dialects x 6
    // columns). The oracle VALUES literal was generated directly from the
    // reference template YAMLs (core/dbio/templates/*.yaml), independent
    // of the Scala maps in NativeTypes -- a transcription error in either
    // direction hash-mismatches here.
    Q("op_dialect_ddl",
      (s, dir) => {
        import s.implicits._
        val dialects = Seq("athena", "azuredwh", "azuresql", "bigquery", "clickhouse", "d1", "databricks", "db2", "duckdb", "ducklake", "exasol", "fabric", "firebird", "hive", "iceberg", "mariadb", "motherduck", "mysql", "oracle", "postgres", "proton", "redshift", "snowflake", "spark", "sqlite", "sqlserver", "starrocks", "trino", "vertica")
        val schema = Tables(s, dir, "orders").schema
        dialects.flatMap { d =>
          schema.fields.toSeq.map(f =>
            (d, f.name, graft.model.NativeTypes.render(d, f)))
        }.toDF("dialect", "column", "native_type")
          .orderBy("dialect", "column")
      },
      Some("""SELECT * FROM (VALUES
        |('athena', 'o_custkey', 'bigint'),
        |('athena', 'o_orderdate', 'timestamp'),
        |('athena', 'o_orderkey', 'bigint'),
        |('athena', 'o_orderpriority', 'string'),
        |('athena', 'o_orderstatus', 'string'),
        |('athena', 'o_totalprice', 'double'),
        |('azuredwh', 'o_custkey', 'bigint'),
        |('azuredwh', 'o_orderdate', 'datetime2'),
        |('azuredwh', 'o_orderkey', 'bigint'),
        |('azuredwh', 'o_orderpriority', 'nvarchar(255)'),
        |('azuredwh', 'o_orderstatus', 'nvarchar(255)'),
        |('azuredwh', 'o_totalprice', 'float'),
        |('azuresql', 'o_custkey', 'bigint'),
        |('azuresql', 'o_orderdate', 'datetime2'),
        |('azuresql', 'o_orderkey', 'bigint'),
        |('azuresql', 'o_orderpriority', 'nvarchar(255)'),
        |('azuresql', 'o_orderstatus', 'nvarchar(255)'),
        |('azuresql', 'o_totalprice', 'float'),
        |('bigquery', 'o_custkey', 'int64'),
        |('bigquery', 'o_orderdate', 'timestamp'),
        |('bigquery', 'o_orderkey', 'int64'),
        |('bigquery', 'o_orderpriority', 'string'),
        |('bigquery', 'o_orderstatus', 'string'),
        |('bigquery', 'o_totalprice', 'float64'),
        |('clickhouse', 'o_custkey', 'Nullable(Int64)'),
        |('clickhouse', 'o_orderdate', 'Nullable(DateTime64(6))'),
        |('clickhouse', 'o_orderkey', 'Nullable(Int64)'),
        |('clickhouse', 'o_orderpriority', 'Nullable(String)'),
        |('clickhouse', 'o_orderstatus', 'Nullable(String)'),
        |('clickhouse', 'o_totalprice', 'Nullable(Float64)'),
        |('d1', 'o_custkey', 'bigint'),
        |('d1', 'o_orderdate', 'text'),
        |('d1', 'o_orderkey', 'bigint'),
        |('d1', 'o_orderpriority', 'text'),
        |('d1', 'o_orderstatus', 'text'),
        |('d1', 'o_totalprice', 'real'),
        |('databricks', 'o_custkey', 'bigint'),
        |('databricks', 'o_orderdate', 'timestamp'),
        |('databricks', 'o_orderkey', 'bigint'),
        |('databricks', 'o_orderpriority', 'string'),
        |('databricks', 'o_orderstatus', 'string'),
        |('databricks', 'o_totalprice', 'double'),
        |('db2', 'o_custkey', 'bigint'),
        |('db2', 'o_orderdate', 'timestamp'),
        |('db2', 'o_orderkey', 'bigint'),
        |('db2', 'o_orderpriority', 'varchar(255)'),
        |('db2', 'o_orderstatus', 'varchar(255)'),
        |('db2', 'o_totalprice', 'double'),
        |('duckdb', 'o_custkey', 'bigint'),
        |('duckdb', 'o_orderdate', 'datetime'),
        |('duckdb', 'o_orderkey', 'bigint'),
        |('duckdb', 'o_orderpriority', 'varchar(255)'),
        |('duckdb', 'o_orderstatus', 'varchar(255)'),
        |('duckdb', 'o_totalprice', 'double'),
        |('ducklake', 'o_custkey', 'bigint'),
        |('ducklake', 'o_orderdate', 'datetime'),
        |('ducklake', 'o_orderkey', 'bigint'),
        |('ducklake', 'o_orderpriority', 'varchar(255)'),
        |('ducklake', 'o_orderstatus', 'varchar(255)'),
        |('ducklake', 'o_totalprice', 'double'),
        |('exasol', 'o_custkey', 'bigint'),
        |('exasol', 'o_orderdate', 'timestamp'),
        |('exasol', 'o_orderkey', 'bigint'),
        |('exasol', 'o_orderpriority', 'varchar(2000000)'),
        |('exasol', 'o_orderstatus', 'varchar(2000000)'),
        |('exasol', 'o_totalprice', 'double precision'),
        |('fabric', 'o_custkey', 'bigint'),
        |('fabric', 'o_orderdate', 'datetime2(6)'),
        |('fabric', 'o_orderkey', 'bigint'),
        |('fabric', 'o_orderpriority', 'varchar(255)'),
        |('fabric', 'o_orderstatus', 'varchar(255)'),
        |('fabric', 'o_totalprice', 'float'),
        |('firebird', 'o_custkey', 'bigint'),
        |('firebird', 'o_orderdate', 'timestamp'),
        |('firebird', 'o_orderkey', 'bigint'),
        |('firebird', 'o_orderpriority', 'varchar(255)'),
        |('firebird', 'o_orderstatus', 'varchar(255)'),
        |('firebird', 'o_totalprice', 'double precision'),
        |('mariadb', 'o_custkey', 'bigint'),
        |('mariadb', 'o_orderdate', 'datetime(6)'),
        |('mariadb', 'o_orderkey', 'bigint'),
        |('mariadb', 'o_orderpriority', 'varchar(255)'),
        |('mariadb', 'o_orderstatus', 'varchar(255)'),
        |('mariadb', 'o_totalprice', 'double'),
        |('motherduck', 'o_custkey', 'bigint'),
        |('motherduck', 'o_orderdate', 'datetime'),
        |('motherduck', 'o_orderkey', 'bigint'),
        |('motherduck', 'o_orderpriority', 'varchar(255)'),
        |('motherduck', 'o_orderstatus', 'varchar(255)'),
        |('motherduck', 'o_totalprice', 'double'),
        |('mysql', 'o_custkey', 'bigint'),
        |('mysql', 'o_orderdate', 'datetime(6)'),
        |('mysql', 'o_orderkey', 'bigint'),
        |('mysql', 'o_orderpriority', 'varchar(255)'),
        |('mysql', 'o_orderstatus', 'varchar(255)'),
        |('mysql', 'o_totalprice', 'double'),
        |('oracle', 'o_custkey', 'number(19)'),
        |('oracle', 'o_orderdate', 'timestamp(9)'),
        |('oracle', 'o_orderkey', 'number(19)'),
        |('oracle', 'o_orderpriority', 'varchar(255)'),
        |('oracle', 'o_orderstatus', 'varchar(255)'),
        |('oracle', 'o_totalprice', 'number'),
        |('postgres', 'o_custkey', 'bigint'),
        |('postgres', 'o_orderdate', 'timestamp'),
        |('postgres', 'o_orderkey', 'bigint'),
        |('postgres', 'o_orderpriority', 'varchar(255)'),
        |('postgres', 'o_orderstatus', 'varchar(255)'),
        |('postgres', 'o_totalprice', 'double precision'),
        |('proton', 'o_custkey', 'nullable(int64)'),
        |('proton', 'o_orderdate', 'nullable(datetime64(6))'),
        |('proton', 'o_orderkey', 'nullable(int64)'),
        |('proton', 'o_orderpriority', 'nullable(string)'),
        |('proton', 'o_orderstatus', 'nullable(string)'),
        |('proton', 'o_totalprice', 'nullable(float64)'),
        |('redshift', 'o_custkey', 'bigint'),
        |('redshift', 'o_orderdate', 'timestamp'),
        |('redshift', 'o_orderkey', 'bigint'),
        |('redshift', 'o_orderpriority', 'varchar(255)'),
        |('redshift', 'o_orderstatus', 'varchar(255)'),
        |('redshift', 'o_totalprice', 'double precision'),
        |('snowflake', 'o_custkey', 'bigint'),
        |('snowflake', 'o_orderdate', 'timestamp'),
        |('snowflake', 'o_orderkey', 'bigint'),
        |('snowflake', 'o_orderpriority', 'varchar(255)'),
        |('snowflake', 'o_orderstatus', 'varchar(255)'),
        |('snowflake', 'o_totalprice', 'float'),
        |('sqlite', 'o_custkey', 'bigint'),
        |('sqlite', 'o_orderdate', 'text'),
        |('sqlite', 'o_orderkey', 'bigint'),
        |('sqlite', 'o_orderpriority', 'text'),
        |('sqlite', 'o_orderstatus', 'text'),
        |('sqlite', 'o_totalprice', 'real'),
        |('sqlserver', 'o_custkey', 'bigint'),
        |('sqlserver', 'o_orderdate', 'datetime2'),
        |('sqlserver', 'o_orderkey', 'bigint'),
        |('sqlserver', 'o_orderpriority', 'nvarchar(255)'),
        |('sqlserver', 'o_orderstatus', 'nvarchar(255)'),
        |('sqlserver', 'o_totalprice', 'float'),
        |('starrocks', 'o_custkey', 'bigint'),
        |('starrocks', 'o_orderdate', 'datetime'),
        |('starrocks', 'o_orderkey', 'bigint'),
        |('starrocks', 'o_orderpriority', 'varchar(255)'),
        |('starrocks', 'o_orderstatus', 'varchar(255)'),
        |('starrocks', 'o_totalprice', 'double'),
        |('trino', 'o_custkey', 'bigint'),
        |('trino', 'o_orderdate', 'timestamp'),
        |('trino', 'o_orderkey', 'bigint'),
        |('trino', 'o_orderpriority', 'varchar'),
        |('trino', 'o_orderstatus', 'varchar'),
        |('trino', 'o_totalprice', 'double'),
        |('hive', 'o_custkey', 'bigint'),
        |('hive', 'o_orderdate', 'timestamp'),
        |('hive', 'o_orderkey', 'bigint'),
        |('hive', 'o_orderpriority', 'varchar(255)'),
        |('hive', 'o_orderstatus', 'varchar(255)'),
        |('hive', 'o_totalprice', 'double'),
        |('iceberg', 'o_custkey', 'long'),
        |('iceberg', 'o_orderdate', 'timestamp'),
        |('iceberg', 'o_orderkey', 'long'),
        |('iceberg', 'o_orderpriority', 'string'),
        |('iceberg', 'o_orderstatus', 'string'),
        |('iceberg', 'o_totalprice', 'double'),
        |('spark', 'o_custkey', 'bigint'),
        |('spark', 'o_orderdate', 'timestamp_ntz'),
        |('spark', 'o_orderkey', 'bigint'),
        |('spark', 'o_orderpriority', 'string'),
        |('spark', 'o_orderstatus', 'string'),
        |('spark', 'o_totalprice', 'double'),
        |('vertica', 'o_custkey', 'bigint'),
        |('vertica', 'o_orderdate', 'timestamp'),
        |('vertica', 'o_orderkey', 'bigint'),
        |('vertica', 'o_orderpriority', 'varchar(255)'),
        |('vertica', 'o_orderstatus', 'varchar(255)'),
        |('vertica', 'o_totalprice', 'float'))
        |t(dialect, "column", native_type)
        |ORDER BY dialect, "column"""".stripMargin)),

    // columns: modifier DSL → typed schema + DDL metadata
    Q("op_ddl_modifiers",
      (s, dir) => {
        val schema = graft.model.ColumnModifiers.parseAll(Seq(
          "c_custkey" -> "bigint not_null primary_key",
          "c_name" -> "string description('customer name')",
          "c_acctbal" -> "decimal(12,2) not_null",
          "c_mktsegment" -> "string unique_index(uix_seg)"))
        import s.implicits._
        schema.fields.toSeq.map { f =>
          (f.name, f.dataType.sql, f.nullable,
            f.metadata.contains("primary_key") &&
              f.metadata.getBoolean("primary_key"),
            if (f.metadata.contains("description"))
              f.metadata.getString("description") else "")
        }.toDF("column", "type_sql", "nullable", "is_pk", "description")
          .orderBy("column")
      },
      Some("""SELECT * FROM (VALUES
        ('c_custkey', 'BIGINT', false, true, ''),
        ('c_name', 'STRING', true, false, 'customer name'),
        ('c_acctbal', 'DECIMAL(12,2)', false, false, ''),
        ('c_mktsegment', 'STRING', true, false, ''))
        t("column", type_sql, nullable, is_pk, description)
        ORDER BY "column"""")),

    // full KeyType enum (datatype.go:87-99) → dialect-specific physical
    // layout clauses (partition/cluster/dist/sort/hash/aggregate/
    // duplicate), golden-pinned per dialect
    Q("op_keyed_ddl",
      (s, dir) => {
        import s.implicits._
        val schema = graft.model.ColumnModifiers.parseAll(Seq(
          "event_date" -> "date partition_key",
          "acct_id" -> "bigint not_null primary_key hash_key distribution_key cluster_key",
          "metric" -> "double aggregate_key",
          "ts" -> "timestampz sort_key update_key",
          "payload" -> "string duplicate_key"))
        Seq("bigquery", "clickhouse", "databricks", "duckdb", "postgres",
          "redshift", "snowflake", "starrocks")
          .map(d => (d, graft.model.NativeTypes.createTableKeyed(d, "t_keys", schema)))
          .toDF("dialect", "ddl").orderBy("dialect")
      },
      Some("""SELECT * FROM (VALUES
        ('bigquery', 'create table t_keys (event_date date, acct_id int64 not null, metric float64, ts timestamp, payload string) partition by event_date cluster by acct_id'),
        ('clickhouse', 'create table t_keys (event_date Nullable(Date), acct_id Nullable(Int64) not null, metric Nullable(Float64), ts Nullable(DateTime64(6)), payload Nullable(String)) engine=MergeTree primary key (acct_id) partition by event_date order by (acct_id, ts)'),
        ('databricks', 'create table t_keys (event_date date, acct_id bigint not null, metric double, ts timestamp, payload string) cluster by (acct_id) partitioned by (event_date)'),
        ('duckdb', 'create table t_keys (event_date date, acct_id bigint not null, metric double, ts timestamptz, payload varchar(255))'),
        ('postgres', 'create table t_keys (event_date date, acct_id bigint not null, metric double precision, ts timestamptz, payload varchar(255)) partition by event_date'),
        ('redshift', 'create table t_keys (event_date date, acct_id bigint not null, metric double precision, ts timestamptz, payload varchar(255)) distkey(acct_id) compound sortkey(ts)'),
        ('snowflake', 'create table t_keys (event_date date, acct_id bigint not null, metric float, ts timestamp_tz, payload varchar(255)) cluster by (acct_id)'),
        ('starrocks', 'create table t_keys (event_date date, acct_id bigint not null, metric double, ts datetime, payload varchar(255)) aggregate key(metric) distributed by hash(acct_id)'))
        t(dialect, ddl) ORDER BY dialect""")),

    Q("op_metadata_cols",
      (s, dir) => {
        val li = Tables(s, dir, "lineitem")
        val base = Meta.loadedAt(
          Meta.rowId(Meta.streamUrl(li), Seq("l_orderkey", "l_linenumber")),
          java.sql.Timestamp.valueOf("2026-01-01 00:00:00"))
        Meta.rowNum(base.select("l_orderkey", "l_linenumber", "_sling_stream_url",
            "_sling_row_id", "_sling_loaded_at"),
            Seq(col("l_orderkey"), col("l_linenumber")))
          .orderBy("_sling_row_num")
      },
      Some("""SELECT l_orderkey, l_linenumber, 'lineitem.parquet' AS _sling_stream_url,
        md5(concat_ws(chr(1),
          COALESCE(CAST(l_orderkey AS VARCHAR), ''),
          COALESCE(CAST(l_linenumber AS VARCHAR), ''))) AS _sling_row_id,
        TIMESTAMP '2026-01-01 00:00:00' AS _sling_loaded_at,
        CAST(ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber) AS INT) AS _sling_row_num
        FROM lineitem ORDER BY _sling_row_num""")),

    // column typing rules applied pre-write (string caps, bool→int)
    Q("op_typing_rules",
      (s, dir) => {
        val c = Tables(s, dir, "customer")
          .withColumn("is_even", col("c_custkey") % 2 === 0)
        graft.transform.Typing(c,
          graft.transform.Typing.Rules(stringMaxLength = Some(10), booleanAsInt = true))
          .select("c_custkey", "c_name", "c_mktsegment", "is_even")
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, substring(c_name, 1, 10) AS c_name,
        substring(c_mktsegment, 1, 10) AS c_mktsegment,
        CAST(c_custkey % 2 = 0 AS INT) AS is_even
        FROM customer ORDER BY c_custkey""")),

    // Spark 4 VariantType path for semi-structured payloads
    Q("op_variant_json",
      (s, dir) => Tables(s, dir, "events")
        .select(col("event_id"),
          variant_get(parse_json(col("props")), "$.k", "int").as("k"))
        .orderBy("event_id"),
      Some("""SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
        FROM events ORDER BY event_id""")),

    // CSV round-trip through the sampling inference engine; declared columns
    // override inferred types (Columns.Coerce semantics)
    Q("op_csv_infer_roundtrip",
      (s, dir) => {
        val path = scratch("csv_rt", dir)
        Tables(s, dir, "customer").write.mode("overwrite")
          .option("header", "true").csv(path)
        FileSources.csv(s, path, overrides = Map(
          "c_custkey" -> LongType, "c_acctbal" -> DoubleType))
          .orderBy("c_custkey")
      },
      Some("SELECT * FROM customer ORDER BY c_custkey")),

    Q("op_jsonl_infer_roundtrip",
      (s, dir) => {
        val path = scratch("jsonl_rt", dir)
        Tables(s, dir, "orders").write.mode("overwrite").json(path)
        FileSources.jsonl(s, path, overrides = Map(
          "o_orderkey" -> LongType, "o_custkey" -> LongType,
          "o_totalprice" -> DoubleType, "o_orderdate" -> TimestampType))
          .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate", "o_orderpriority")
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        o_orderdate, o_orderpriority FROM orders ORDER BY o_orderkey""")),

    // the inference decision table itself, on a crafted fixture: expected
    // results are constants, expressed as a VALUES oracle
    Q("op_inference_decisions",
      (s, dir) => {
        import s.implicits._
        val path = scratch("infer_fixture", dir)
        val rows = Seq(
          ("1", "9999999999", "1.50", "true", "2024-01-02", "2024-01-02 10:20:30", "plain", """{"a":1}"""),
          ("2", "8888888888", "2.25", "false", "2024-02-03", "2024-02-03 11:21:31", "text", """{"b":2}"""),
          ("", "", "", "", "", "", "", ""))
        rows.toDF("int_col", "bigint_col", "dec_col", "bool_col", "date_col",
            "ts_col", "str_col", "json_col")
          .coalesce(1).write.mode("overwrite").option("header", "true").csv(path)
        val inferred = FileSources.csv(s, path)
        val schema = inferred.schema
        s.createDataFrame(
          schema.fields.map(f => org.apache.spark.sql.Row(f.name, f.dataType.simpleString)).toSeq.asJava,
          StructType(Seq(StructField("column_name", StringType), StructField("inferred", StringType))))
          .orderBy("column_name")
      },
      Some("""SELECT * FROM (VALUES
        ('int_col', 'int'), ('bigint_col', 'bigint'), ('dec_col', 'decimal(7,2)'),
        ('bool_col', 'boolean'), ('date_col', 'date'), ('ts_col', 'timestamp'),
        ('str_col', 'string'), ('json_col', 'string'))
        t(column_name, inferred) ORDER BY column_name"""))
  )
}
