package graft.repl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Native-protocol dispatch for engines the reference drives over their
  * own wire surface rather than (or alongside) JDBC — ClickHouse's HTTP
  * interface (`core/dbio/database/database_clickhouse.go`), the Databricks
  * SQL Statement API (`database_databricks.go`), Snowflake's SQL API v2
  * (`database_snowflake.go`), the Trino client protocol
  * (`database_trino.go`), Cloudflare D1's HTTP API (`database_d1.go`),
  * BigQuery's REST jobs surface (`database_bigquery.go`), Athena's
  * JSON-RPC lifecycle (`database_athena.go`), Elasticsearch's scroll API
  * (`database_elasticsearch.go`), and Prometheus `query_range`
  * (`database_prometheus.go`).
  *
  * A task-YAML connection of one of these kinds routes here when it
  * carries an explicit `http_url:` endpoint (in production the engine's
  * REST endpoint; in tests a loopback server). D1 routes unconditionally —
  * it has no JDBC surface at all. Without `http_url`, the SQL-over-JDBC
  * kinds fall back to the JDBC template path unchanged.
  */
object ProtocolRoute {

  /** Kinds with a native client in `graft.sources`. */
  val kinds: Set[String] = Set("clickhouse", "proton", "databricks",
    "snowflake", "trino", "d1", "bigquery", "athena", "elasticsearch",
    "prometheus", "bigtable", "mongodb", "mongo", "scylla", "scylladb",
    "cassandra", "postgres", "postgresql", "mysql", "mariadb", "sqlserver",
    "azuresql", "azuredwh", "fabric")

  /** Kinds with no JDBC surface at all — they route here unconditionally. */
  private val wireOnly =
    Set("d1", "mongodb", "mongo", "scylla", "scylladb", "cassandra")

  /** Postgres, MySQL, and SQL Server have BOTH a JDBC template path and
    * a native wire client ([[graft.sources.Pg]]: SCRAM auth + executed
    * COPY FROM STDIN; [[graft.sources.Mysql]]: native/caching_sha2 auth
    * + executed LOAD DATA LOCAL INFILE; [[graft.sources.Tds]]: LOGIN7 +
    * executed INSERT BULK/BulkLoadBCP). They keep the JDBC path by
    * default; an explicit `wire_protocol: true` on the connection opts
    * into the native client — the fast paths the reference always takes
    * on these engines (`database_postgres.go:380-480` BulkImportStream
    * via COPY, `database_mysql.go:543-613` LoadDataLocal,
    * `database_sqlserver.go:655-780` bcp). */
  private val sqlWireKinds =
    Set("postgres", "postgresql", "mysql", "mariadb", "sqlserver",
      "azuresql", "azuredwh", "fabric")

  def applies(spec: Connections.ConnSpec): Boolean =
    if (sqlWireKinds.contains(spec.kind))
      spec.get("wire_protocol").exists(_.equalsIgnoreCase("true"))
    else kinds.contains(spec.kind) &&
      (spec.get("http_url").isDefined || wireOnly.contains(spec.kind))

  /** True when the conn routes to one of the SQL wire clients (pg /
    * mysql / tds) — the kinds whose reads accept a server-side SQL
    * `where` for watermark pushdown. */
  def isSqlWire(spec: Connections.ConnSpec): Boolean =
    sqlWireKinds.contains(spec.kind) && applies(spec)

  /** The real COPY transport for a wire_protocol postgres conn — feeds
    * [[graft.sources.Jdbc.bulkWrite]]'s copy_stdin fast path so staged
    * loads behind merge modes stream COPY per partition instead of
    * batched INSERTs. None for every other conn (bulkWrite falls back). */
  def pgCopyTransport(spec: Connections.ConnSpec)
      : Option[graft.write.PgCopy.CopyTransport] =
    if (Set("postgres", "postgresql").contains(spec.kind) && applies(spec))
      Some(graft.sources.Pg.copyTransport(pgConn(spec)))
    else None

  /** `ssl_root_cert:` points at a CA PEM file (libpq's sslrootcert /
    * mysql's ssl-ca / the TDS trustServerCertificate=false path). */
  private def caPem(spec: Connections.ConnSpec): Option[String] =
    spec.get("ssl_root_cert").map(p =>
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(p)), "UTF-8"))

  private def tdsConn(spec: Connections.ConnSpec): graft.sources.Tds.Conn =
    graft.sources.Tds.Conn(
      host = spec.get("host").getOrElse("127.0.0.1"),
      port = spec.get("port").map(_.toInt).getOrElse(1433),
      database = spec.get("database").getOrElse("master"),
      user = spec.get("username").orElse(spec.get("user")).getOrElse("sa"),
      password = spec.get("password").getOrElse(""),
      encrypt = spec.get("encrypt").exists(_.equalsIgnoreCase("true")),
      caPem = caPem(spec))

  private def mysqlConn(spec: Connections.ConnSpec): graft.sources.Mysql.Conn =
    graft.sources.Mysql.Conn(
      host = spec.get("host").getOrElse("127.0.0.1"),
      port = spec.get("port").map(_.toInt).getOrElse(3306),
      database = spec.get("database").getOrElse("mysql"),
      user = spec.get("username").orElse(spec.get("user")).getOrElse("root"),
      password = spec.get("password").getOrElse(""),
      ssl = spec.get("tls").orElse(spec.get("ssl"))
        .exists(_.equalsIgnoreCase("true")),
      caPem = caPem(spec))

  private def cqlConn(spec: Connections.ConnSpec): graft.sources.Cql.Conn =
    graft.sources.Cql.Conn(
      host = spec.get("host").getOrElse("127.0.0.1"),
      port = spec.get("port").map(_.toInt).getOrElse(9042),
      keyspace = spec.get("keyspace")
        .orElse(spec.get("database")).getOrElse(""),
      user = spec.get("username").orElse(spec.get("user")).getOrElse(""),
      password = spec.get("password").getOrElse(""))

  private def pgConn(spec: Connections.ConnSpec): graft.sources.Pg.Conn =
    graft.sources.Pg.Conn(
      host = spec.get("host").getOrElse("127.0.0.1"),
      port = spec.get("port").map(_.toInt).getOrElse(5432),
      database = spec.get("database").getOrElse("postgres"),
      user = spec.get("username").orElse(spec.get("user")).getOrElse("postgres"),
      password = spec.get("password").getOrElse(""),
      sslMode = spec.get("sslmode").getOrElse("disable"),
      caPem = caPem(spec))

  /** The ONE SQL-text detector — shared by [[sqlFor]] and the
    * chunk-routing guard so the two can never disagree on whether a
    * stream is a table (probe-able) or custom SQL. */
  private def isSqlText(stream: String): Boolean =
    stream.matches("(?is)\\s*(select|with)\\b[\\s\\S]*")

  /** Table-name streams wrap as SELECT *; SQL text passes through (the
    * reference's same dispatch — `task_run_read.go` treats a stream
    * containing whitespace/`select` as custom SQL). */
  private def sqlFor(stream: String): String =
    if (isSqlText(stream)) stream
    else s"SELECT * FROM $stream"

  /** `where` carries a stream-level mongo JSON filter when the kind is
    * mongodb (the reference's `where: '{...}'` grammar,
    * r.54.mongo_filter.yaml); SQL kinds ignore it (their `where` stays a
    * SQL predicate applied by the task pipeline). */
  def read(spark: SparkSession, spec: Connections.ConnSpec,
      stream: String, where: Option[String] = None): DataFrame = {
    import graft.sources._
    def url = spec.get("http_url").getOrElse(throw new IllegalArgumentException(
      s"connection ${spec.name} (${spec.kind}) needs http_url for protocol access"))
    def token = spec.get("token").orElse(spec.get("api_token")).getOrElse("")
    def user = spec.get("username").orElse(spec.get("user"))
    def pollMs = spec.get("poll_ms").map(_.toLong).getOrElse(200L)
    spec.kind match {
      case "clickhouse" | "proton" =>
        val c = ClickHouseHttp.Conn(url,
          user = user.getOrElse("default"),
          password = spec.get("password").getOrElse(""),
          database = spec.get("database").getOrElse(""))
        // a table stream with a declared chunk column routes to the
        // executor-parallel cursors (min/max probe + one WHERE-bounded
        // statement per chunk — 3.3× the driver-paged read's measured
        // throughput); SQL-text streams and undeclared tables keep the
        // single staged cursor
        spec.get("partition_column").orElse(spec.get("chunk_column")) match {
          case Some(col) if !isSqlText(stream) =>
            ClickHouseHttp.readChunked(spark, c, stream, col,
              chunks = spec.get("splits").map(_.toInt).getOrElse(4))
          case _ => ClickHouseHttp.read(spark, c, sqlFor(stream))
        }
      case "databricks" =>
        DatabricksSql.read(spark, DatabricksSql.Conn(url, token,
          warehouseId = spec.get("warehouse_id").getOrElse("")),
          sqlFor(stream), pollMs = pollMs)
      case "snowflake" =>
        SnowflakeApi.read(spark, SnowflakeApi.Conn(url, token),
          sqlFor(stream), pollMs = pollMs)
      case "trino" =>
        Trino.read(spark, Trino.Conn(url,
          user = user.getOrElse("graft"),
          catalog = spec.get("catalog").getOrElse(""),
          schema = spec.get("schema").getOrElse(""),
          token = token), sqlFor(stream))
      case "d1" =>
        val base = spec.get("http_url").getOrElse(
          "https://api.cloudflare.com/client/v4/accounts")
        D1.read(spark, D1.Conn(
          accountId = spec.get("account_id").getOrElse(""),
          databaseId = spec.get("database_id")
            .orElse(spec.get("database")).getOrElse(""),
          token = token, baseUrl = base), sqlFor(stream))
      case "bigquery" =>
        val tok = token
        BigQueryApi.read(spark, BigQueryApi.Conn(
          projectId = spec.get("project").orElse(spec.get("project_id"))
            .getOrElse(""),
          token = () => tok, baseUrl = url), sqlFor(stream))
      case "athena" =>
        Athena.read(spark, Athena.Conn(
          region = spec.get("region").getOrElse("us-east-1"),
          accessKeyId = spec.get("access_key_id").getOrElse(""),
          secretAccessKey = spec.get("secret_access_key").getOrElse(""),
          outputLocation = spec.get("s3_staging_dir")
            .orElse(spec.get("staging"))
            .getOrElse("s3://graft-athena-results/"),
          baseUrl = url, pollMs = pollMs), sqlFor(stream))
      case "mongodb" | "mongo" =>
        // stream is the collection name (optionally db.collection); the
        // wire client partitions the read by _id ranges
        // (database_mongo.go:316-483 StreamRowsContext semantics)
        Mongo.read(spark, mongoConn(spec),
          stream,
          filter = Mongo.filterFor(
            filterJson = where.orElse(spec.get("filter"))),
          fields = spec.get("fields").toSeq
            .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty),
          splits = spec.get("splits").map(_.toInt).getOrElse(4))
      case "scylla" | "scylladb" | "cassandra" =>
        // stream is a table name (token-range partitioned read when the
        // connection declares partition_key) or CQL text (one paged
        // cursor) — database_scylladb.go:274-340 StreamRowsContext
        graft.sources.Cql.read(spark, cqlConn(spec),
          stream,
          partitionKey = spec.get("partition_key").toSeq
            .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty),
          splits = spec.get("splits").map(_.toInt).getOrElse(4))
      case "postgres" | "postgresql" =>
        // table streams range-partition on `partition_column` (min/max
        // probe + one bounded slice per Spark partition); SQL text runs
        // as one cursor. A SQL `where` executes server-side (watermark
        // pushdown); the task pipeline re-applies it idempotently.
        graft.sources.Pg.read(spark, pgConn(spec), stream,
          partitionColumn = spec.get("partition_column"),
          splits = spec.get("splits").map(_.toInt).getOrElse(4),
          where = where.filterNot(_.trim.startsWith("{")))
      case "mysql" | "mariadb" =>
        graft.sources.Mysql.read(spark, mysqlConn(spec), stream,
          partitionColumn = spec.get("partition_column"),
          splits = spec.get("splits").map(_.toInt).getOrElse(4),
          where = where.filterNot(_.trim.startsWith("{")))
      case "sqlserver" | "azuresql" | "azuredwh" | "fabric" =>
        graft.sources.Tds.read(spark, tdsConn(spec), stream,
          partitionColumn = spec.get("partition_column"),
          splits = spec.get("splits").map(_.toInt).getOrElse(4),
          where = where.filterNot(_.trim.startsWith("{")))
      case "elasticsearch" =>
        // stream is the index name (database_elasticsearch.go reads a
        // whole index via sliced scroll)
        Elastic.read(spark, Elastic.Conn(url, token), stream,
          slices = spec.get("slices").map(_.toInt).getOrElse(4))
      case "prometheus" =>
        // stream is the PromQL query (+ optional embedded range args the
        // source's parseQuery understands)
        Prometheus.read(spark, Prometheus.Conn(url, token), stream,
          chunks = spec.get("chunks").map(_.toInt).getOrElse(4))
      case "bigtable" =>
        // stream is the table id; project/instance come from the conn
        // (database_bigtable.go Init). start_time (unix seconds or ISO
        // instant) reproduces the reference's TimestampRangeFilter;
        // row_key_prefix / row_key_start / row_key_end reproduce its key
        // window scans (:420-470) — pushed into every readRows request
        // and pruning non-overlapping partitions outright.
        Bigtable.read(spark, Bigtable.Conn(url, token),
          bigtablePath(spec, stream),
          maxRanges = spec.get("splits").map(_.toInt).getOrElse(32),
          startTimeMicros = spec.get("start_time").map { s =>
            s.toLongOption.map(_ * 1000000L).getOrElse(
              java.time.Instant.parse(s).toEpochMilli * 1000L)
          },
          keyStart = spec.get("row_key_start").map(_.getBytes("UTF-8")),
          keyEnd = spec.get("row_key_end").map(_.getBytes("UTF-8")),
          keyPrefix = spec.get("row_key_prefix").map(_.getBytes("UTF-8")))
      case other =>
        throw new IllegalArgumentException(s"no protocol client for '$other'")
    }
  }

  /** Connection → wire client config: an explicit `url:` (including
    * the multi-host seed-list form, suite.cli id 305) wins over the
    * host/port/database props; database prop overrides the URL path. */
  private def mongoConn(spec: Connections.ConnSpec): graft.sources.Mongo.Conn = {
    import graft.sources.Mongo
    val base = spec.get("url").filter(_.startsWith("mongodb"))
      .map(Mongo.connFromUrl)
      .getOrElse(Mongo.Conn(
        host = spec.get("host").getOrElse("127.0.0.1"),
        port = spec.get("port").map(_.toInt).getOrElse(27017),
        database = "test"))
    spec.get("database").map(d => base.copy(database = d)).getOrElse(base)
  }

  /** `projects/{p}/instances/{i}` from the conn's project/instance
    * props (the reference's required Bigtable conn properties,
    * database_bigtable.go Init). */
  private def bigtableInstance(spec: Connections.ConnSpec): String =
    s"projects/${spec.get("project").orElse(spec.get("project_id"))
      .getOrElse("p")}/instances/${spec.get("instance").getOrElse("i")}"

  private def bigtablePath(spec: Connections.ConnSpec,
      table: String): String = s"${bigtableInstance(spec)}/tables/$table"

  /** Kinds with a native direct-insert write path — the reference's
    * writeDirectly set minus the live-only stores
    * (`task_run_write.go:209-226`: iceberg/mongo/ES/azuretable/scylla
    * skip the SQL temp-table merge and write straight to the target). */
  val writeKinds: Set[String] = Set("clickhouse", "proton",
    "elasticsearch", "bigtable", "mongodb", "mongo", "scylla", "scylladb",
    "cassandra", "postgres", "postgresql", "mysql", "mariadb", "sqlserver",
    "azuresql", "azuredwh", "fabric")

  def writes(spec: Connections.ConnSpec): Boolean =
    applies(spec) && writeKinds.contains(spec.kind)

  /** The NoSQL stores take every mode directly (their insert IS an
    * upsert-by-PK). The SQL wire kinds (pg/mysql) only take the modes a
    * bulk stream can express — full reload or plain append; merge-type
    * modes (incremental+pk, snapshot, backfill, cdc) need the staged
    * temp-table + in-DB merge, so the task falls back to the JDBC
    * template path (the reference's BulkImportFlow feeds that same
    * staged path, task_run_write.go:163-498). */
  def supportsMode(spec: Connections.ConnSpec, mode: String,
      primaryKey: Seq[String]): Boolean =
    if (sqlWireKinds.contains(spec.kind))
      mode == "full-refresh" || mode == "truncate" ||
        (mode == "incremental" && primaryKey.isEmpty)
    else true

  /** Run one statement on the wire target — the `pre_sql`/`post_sql`
    * hook surface for direct wire writes (parity with the JDBC path's
    * `Jdbc.executeAll`; task_run_write.go runs the same hooks around
    * writeDirectly targets that speak SQL). The document stores
    * (mongo / elasticsearch) have no SQL surface: a configured hook
    * there is a config error, not a silent skip. */
  def execute(spec: Connections.ConnSpec, sql: String): Unit = {
    def url = spec.get("http_url").getOrElse(throw new IllegalArgumentException(
      s"connection ${spec.name} (${spec.kind}) needs http_url for protocol access"))
    spec.kind match {
      case "clickhouse" | "proton" =>
        graft.sources.ClickHouseHttp.execute(
          graft.sources.ClickHouseHttp.Conn(url,
            user = spec.get("username").orElse(spec.get("user"))
              .getOrElse("default"),
            password = spec.get("password").getOrElse(""),
            database = spec.get("database").getOrElse("")), sql)
      case "postgres" | "postgresql" => graft.sources.Pg.execute(pgConn(spec), sql)
      case "mysql" | "mariadb" => graft.sources.Mysql.execute(mysqlConn(spec), sql)
      case "sqlserver" | "azuresql" | "azuredwh" | "fabric" =>
        graft.sources.Tds.execute(tdsConn(spec), sql)
      case "scylla" | "scylladb" | "cassandra" =>
        graft.sources.Cql.execute(cqlConn(spec), sql)
      case other => throw new IllegalArgumentException(
        s"pre_sql/post_sql unsupported on non-SQL store '$other'")
    }
  }

  /** Multi-statement hook text, split like [[graft.sources.Jdbc.executeAll]]. */
  def executeAll(spec: Connections.ConnSpec, sql: String): Unit =
    graft.sources.Jdbc.splitStatements(sql).foreach(execute(spec, _))

  /** Direct insert into the target store. `full-refresh` clears the
    * object first (TRUNCATE / index delete / collection drop); every
    * other mode appends — with a primary key, the mongo `_id` / ES `_id`
    * routing makes the insert upsert-by-key, the reference's
    * upsertByInsert semantics for these stores. Returns rows written. */
  def write(df: DataFrame, spec: Connections.ConnSpec, obj: String,
      mode: String, primaryKey: Seq[String] = Nil): Long = {
    def url = spec.get("http_url").getOrElse(throw new IllegalArgumentException(
      s"connection ${spec.name} (${spec.kind}) needs http_url for protocol access"))
    def token = spec.get("token").orElse(spec.get("api_token")).getOrElse("")
    spec.kind match {
      case "clickhouse" | "proton" =>
        val c = graft.sources.ClickHouseHttp.Conn(url,
          user = spec.get("username").orElse(spec.get("user"))
            .getOrElse("default"),
          password = spec.get("password").getOrElse(""),
          database = spec.get("database").getOrElse(""))
        if (mode == "full-refresh")
          try graft.sources.ClickHouseHttp.execute(c, s"TRUNCATE TABLE $obj")
          catch { case _: java.sql.SQLException => () } // absent table
        graft.sources.ClickHouseHttp.insert(df, c, obj)
      case "elasticsearch" =>
        val c = graft.sources.Elastic.Conn(url, token)
        if (mode == "full-refresh") graft.sources.Elastic.deleteIndex(c, obj)
        graft.sources.Elastic.bulkWrite(df, c, obj, primaryKey.headOption)
      case "mongodb" | "mongo" =>
        val c = mongoConn(spec)
        if (mode == "full-refresh") graft.sources.Mongo.drop(c, obj)
        graft.sources.Mongo.insert(df, c, obj,
          idCol = primaryKey.headOption)
      case "bigtable" =>
        // per-partition mutateRows SetCell batches (the reference's
        // ApplyBulk path, database_bigtable.go:601-660); full-refresh
        // drops and recreates the table through the admin verbs
        val c = graft.sources.Bigtable.Conn(url, token)
        val inst = bigtableInstance(spec)
        if (mode == "full-refresh") {
          try graft.sources.Bigtable.exec(c, inst,
            s"""{"action":"delete_table","table":"$obj"}""")
          catch { case _: java.io.IOException => () } // absent table
          graft.sources.Bigtable.exec(c, inst,
            s"""{"action":"create_table","table":"$obj"}""")
        }
        graft.sources.Bigtable.insert(df, c, bigtablePath(spec, obj),
          batchSize = spec.get("batch_values").map(_.toInt).getOrElse(500))
      case "postgres" | "postgresql" =>
        // executed COPY FROM STDIN — one authenticated connection and
        // one COPY stream per Spark partition (the reference's PG bulk
        // fast path, database_postgres.go:380-480)
        val c = pgConn(spec)
        if (mode == "full-refresh" || mode == "truncate")
          try graft.sources.Pg.execute(c, s"TRUNCATE TABLE $obj")
          catch { case _: java.io.IOException => () } // absent table
        graft.sources.Pg.insert(df, c, obj)
      case "sqlserver" | "azuresql" | "azuredwh" | "fabric" =>
        // executed INSERT BULK + BulkLoadBCP, one stream per Spark
        // partition — the wire flow behind the bcp binary the reference
        // shells out to (database_sqlserver.go:655-780)
        val c = tdsConn(spec)
        if (mode == "full-refresh" || mode == "truncate")
          try graft.sources.Tds.execute(c, s"TRUNCATE TABLE $obj")
          catch { case _: java.io.IOException => () } // absent table
        graft.sources.Tds.insert(df, c, obj)
      case "mysql" | "mariadb" =>
        // executed LOAD DATA LOCAL INFILE, one stream per Spark
        // partition (database_mysql.go:543-613 LoadDataLocal)
        val c = mysqlConn(spec)
        if (mode == "full-refresh" || mode == "truncate")
          try graft.sources.Mysql.execute(c, s"TRUNCATE TABLE $obj")
          catch { case _: java.io.IOException => () } // absent table
        graft.sources.Mysql.insert(df, c, obj)
      case "scylla" | "scylladb" | "cassandra" =>
        // CQL INSERT is natively an upsert by primary key
        // (task_run_write.go:212 upsertByInsert)
        val c = cqlConn(spec)
        if (mode == "full-refresh")
          try graft.sources.Cql.execute(c, s"TRUNCATE $obj")
          catch { case _: java.io.IOException => () } // absent table
        graft.sources.Cql.insert(df, c, obj)
      case other =>
        throw new IllegalArgumentException(s"no protocol write for '$other'")
    }
  }
}
