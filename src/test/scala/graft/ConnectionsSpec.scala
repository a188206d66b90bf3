package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.repl.Connections

/** Connection registry parsing + URL templates (connection.go:484-489
  * env indirection, :686+ per-type URL templates, :603-616 env.yaml map).
  */
class ConnectionsSpec extends AnyFunSuite {

  test("parse: names upper-cased, $VAR resolves from env map") {
    val reg = Connections.parse(
      """connections:
        |  my_pg:
        |    type: postgres
        |    host: db1
        |    database: prod
        |    username: app
        |    password: $PG_PW
        |""".stripMargin,
      env = Map("PG_PW" -> "s3cret"))
    val pg = Connections.resolve(reg, "MY_PG")
    assert(pg.kind == "postgres")
    assert(pg.get("password").contains("s3cret"))
    // case-insensitive resolve
    assert(Connections.resolve(reg, "my_pg") == pg)
  }

  test("parse: unresolvable $VAR left verbatim; unknown name throws") {
    val reg = Connections.parse(
      """connections:
        |  A:
        |    type: postgres
        |    password: $MISSING
        |""".stripMargin, env = Map.empty)
    assert(Connections.resolve(reg, "A").get("password").contains("$MISSING"))
    intercept[IllegalArgumentException] { Connections.resolve(reg, "B") }
  }

  test("dbt profiles: PROFILE_TARGET names, env_var jinja, config skipped") {
    val reg = Connections.parseDbtProfiles(
      """config:
        |  send_anonymous_usage_stats: false
        |analytics:
        |  target: dev
        |  outputs:
        |    dev:
        |      type: postgresql
        |      host: db.dev
        |      user: app
        |      password: "{{ env_var('DBT_PW') }}"
        |      dbname: warehouse
        |      port: 5439
        |    prod:
        |      type: snowflake
        |      account: "{{ env_var('MISSING_VAR') }}"
        |""".stripMargin,
      env = Map("DBT_PW" -> "s3cret"))
    // config: has no outputs -> skipped; two targets -> two connections
    assert(reg.keySet == Set("ANALYTICS_DEV", "ANALYTICS_PROD"))
    val dev = Connections.resolve(reg, "analytics_dev")
    assert(dev.kind == "postgres") // postgresql normalizes
    assert(dev.get("password").contains("s3cret")) // jinja expanded
    assert(dev.get("dbt").contains("true")) // reference's dbt marker
    assert(dev.get("port").contains("5439"))
    // missing env_var left verbatim (reference warns and keeps going)
    assert(Connections.resolve(reg, "ANALYTICS_PROD").get("account")
      .contains("{{ env_var('MISSING_VAR') }}"))
    // dbt's user/dbname keys feed the same JDBC template aliases
    assert(dev.jdbcUrl.startsWith("jdbc:postgresql://db.dev:5439/warehouse?user=app"))
  }

  test("dbt profiles merge UNDER env.yaml entries (env.yaml wins on collision)") {
    val dbt = Connections.parseDbtProfiles(
      """wh:
        |  outputs:
        |    main:
        |      type: postgres
        |      host: from-dbt
        |""".stripMargin, env = Map.empty)
    val envYaml = Connections.parse(
      """connections:
        |  WH_MAIN:
        |    type: postgres
        |    host: from-env-yaml
        |""".stripMargin, env = Map.empty)
    // the reference loads dbt first and overwrites with sling env yaml
    // (connection_local.go:117-148) — same merge order as TaskConfig
    val merged = dbt ++ envYaml
    assert(Connections.resolve(merged, "WH_MAIN").get("host")
      .contains("from-env-yaml"))
    // absent profiles file -> empty registry, no error
    assert(Connections.loadDbtProfiles(
      Map("DBT_PROFILES_DIR" -> "/nonexistent/dir")).isEmpty)
  }

  test("dbt profiles: env_var defaults, empty yaml, malformed discovery") {
    // two-arg env_var: variable wins when set, default applies when not
    val reg = Connections.parseDbtProfiles(
      """p:
        |  outputs:
        |    t:
        |      type: postgres
        |      password: "{{ env_var('SET_VAR', 'fallback') }}"
        |      host: "{{ env_var('UNSET_VAR', 'default-host') }}"
        |      schema: "{{ env_var('UNSET_NO_DEFAULT') }}"
        |""".stripMargin,
      env = Map("SET_VAR" -> "from-env"))
    val t = Connections.resolve(reg, "P_T")
    assert(t.get("password").contains("from-env"))
    assert(t.get("host").contains("default-host"))
    assert(t.get("schema").contains("{{ env_var('UNSET_NO_DEFAULT') }}"))
    // empty / comments-only yaml -> empty registry, never an NPE
    assert(Connections.parseDbtProfiles("", Map.empty).isEmpty)
    assert(Connections.parseDbtProfiles("# just a comment\n", Map.empty).isEmpty)
    // DISCOVERY of a malformed file logs and continues (task runs that
    // never name a dbt connection must not break); explicit parse throws
    val dir = java.nio.file.Files.createTempDirectory("dbtbad")
    java.nio.file.Files.writeString(dir.resolve("profiles.yml"),
      "p:\n  outputs:\n - broken [yaml\n")
    assert(Connections.loadDbtProfiles(
      Map("DBT_PROFILES_DIR" -> dir.toString)).isEmpty)
    intercept[Exception] {
      Connections.parseDbtProfiles("p:\n  outputs:\n - broken [yaml\n", Map.empty)
    }
  }

  test("url shorthand infers type from scheme") {
    val reg = Connections.parse(
      """connections:
        |  WH:
        |    url: "duckdb:/data/wh.db"
        |""".stripMargin)
    assert(Connections.resolve(reg, "WH").kind == "duckdb")
  }

  test("jdbc url templates: postgres defaults sslmode=disable, mysql, derby") {
    def spec(kind: String, props: (String, String)*) =
      Connections.ConnSpec("X", kind, props.toMap)
    assert(spec("postgres", "host" -> "h", "database" -> "d",
      "username" -> "u", "password" -> "p").jdbcUrl
      == "jdbc:postgresql://h:5432/d?user=u&password=p&sslmode=disable")
    assert(spec("mysql", "host" -> "h", "database" -> "d",
      "username" -> "u").jdbcUrl == "jdbc:mysql://h:3306/d?user=u")
    assert(spec("derby", "instance" -> "memory:t").jdbcUrl
      == "jdbc:derby:memory:t;create=true")
    intercept[IllegalArgumentException] { spec("voltdb").jdbcUrl }
  }

  test("jdbc url templates: full dialect family with reference ports") {
    def spec(kind: String, props: (String, String)*) =
      Connections.ConnSpec("X", kind, props.toMap)
    assert(spec("sqlserver", "host" -> "h", "database" -> "d",
      "username" -> "u", "password" -> "p").jdbcUrl
      == "jdbc:sqlserver://h:1433;databaseName=d;user=u;password=p")
    assert(spec("azuredwh", "host" -> "h", "database" -> "d").jdbcUrl
      == "jdbc:sqlserver://h:1433;databaseName=d") // embeds sqlserver conn
    assert(spec("oracle", "host" -> "h", "sid" -> "ORCL").jdbcUrl
      == "jdbc:oracle:thin:@//h:1521/ORCL")
    assert(spec("clickhouse", "host" -> "h", "database" -> "d").jdbcUrl
      == "jdbc:clickhouse://h:8123/d")
    assert(spec("redshift", "host" -> "h", "database" -> "d",
      "username" -> "u").jdbcUrl == "jdbc:redshift://h:5439/d?user=u")
    assert(spec("mariadb", "host" -> "h", "database" -> "d",
      "username" -> "u").jdbcUrl == "jdbc:mariadb://h:3306/d?user=u")
    assert(spec("starrocks", "host" -> "h", "database" -> "d").jdbcUrl
      == "jdbc:mysql://h:9030/d") // mysql wire, FE query port
    assert(spec("trino", "host" -> "h", "catalog" -> "hive").jdbcUrl
      == "jdbc:trino://h:8080/hive")
    assert(spec("db2", "host" -> "h", "database" -> "d").jdbcUrl
      == "jdbc:db2://h:50000/d")
    assert(spec("vertica", "host" -> "h", "database" -> "d").jdbcUrl
      == "jdbc:vertica://h:5433/d")
    assert(spec("hive", "host" -> "h", "database" -> "d").jdbcUrl
      == "jdbc:hive2://h:10000/d") // HiveServer2
    assert(spec("vertica").isDatabase && spec("hive").isDatabase)
    assert(spec("firebird", "host" -> "h", "database" -> "/data/db.fdb").jdbcUrl
      == "jdbc:firebirdsql://h:3050//data/db.fdb")
    assert(spec("proton", "host" -> "h", "database" -> "d").jdbcUrl
      == "jdbc:proton://h:8463/d")
    assert(spec("athena", "region" -> "eu-west-1",
      "s3_staging_dir" -> "s3://b/out").jdbcUrl
      == "jdbc:awsathena://AwsRegion=eu-west-1;S3OutputLocation=s3://b/out")
    assert(spec("bigquery", "project" -> "p1").jdbcUrl
      == "jdbc:bigquery://https://www.googleapis.com/bigquery/v2:443;ProjectId=p1")
    // kinds managed outside JDBC degrade gracefully instead of throwing
    assert(spec("d1", "database" -> "x").jdbcTemplate.isEmpty)
    val (ok, msg) = graft.repl.Connections.test(spec("d1", "database" -> "x"))
    assert(ok && msg.contains("no jdbc template"))
    // a url: jdbc:... shorthand must classify by the REAL dialect scheme
    val reg = graft.repl.Connections.parse(
      "connections:\n  PG1:\n    url: jdbc:postgresql://h:5432/db\n", Map.empty)
    assert(reg("PG1").kind == "postgres")
    assert(reg("PG1").isDatabase)
    assert(spec("exasol", "host" -> "h").jdbcUrl == "jdbc:exa:h:8563")
    assert(spec("snowflake", "host" -> "acct", "database" -> "d",
      "schema" -> "s", "warehouse" -> "w").jdbcUrl
      == "jdbc:snowflake://acct.snowflakecomputing.com:443/?db=d&schema=s&warehouse=w")
    assert(spec("databricks", "host" -> "h",
      "http_path" -> "/sql/1.0/wh/x").jdbcUrl
      == "jdbc:databricks://h:443;httpPath=/sql/1.0/wh/x")
    assert(spec("motherduck", "database" -> "md_db").jdbcUrl
      == "jdbc:duckdb:md:md_db")
    assert(spec("exasol").isDatabase && spec("athena").isDatabase)
  }

  test("test + discover against embedded Derby metadata") {
    val spec = Connections.ConnSpec("D", "derby",
      Map("instance" -> "memory:connspec"))
    val (ok, _) = Connections.test(spec)
    assert(ok)
    val c = java.sql.DriverManager.getConnection(spec.jdbcUrl)
    try c.createStatement().executeUpdate("CREATE TABLE T_ONE (id INT)")
    catch { case _: java.sql.SQLException => () } finally c.close()
    assert(Connections.discover(spec, "T_*").contains("T_ONE"))
    assert(Connections.discover(spec, "ZZZ*").isEmpty)
  }

  test("filesystem conn maps to FileBackends props (upper-cased keys)") {
    val s3 = Connections.ConnSpec("S", "s3", Map(
      "access_key_id" -> "AK", "secret_access_key" -> "SK"))
    assert(s3.isFileSystem && !s3.isDatabase)
    val m = graft.sources.FileBackends.renderS3a(s3.fileConn)
    assert(m("fs.s3a.access.key") == "AK")
  }
}
