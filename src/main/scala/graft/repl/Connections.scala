package graft.repl

import scala.jdk.CollectionConverters._

import org.yaml.snakeyaml.Yaml

/** Connection registry — the reference's `env.yaml` connection map
  * (`core/dbio/connection/connection.go`; env file shape
  * `core/env/env.go`):
  *
  * {{{
  * connections:
  *   MY_PG:
  *     type: postgres
  *     host: db.internal
  *     port: 5432
  *     database: prod
  *     username: app
  *     password: $PG_PASSWORD        # env-var indirection
  *   MY_S3:
  *     type: s3
  *     bucket: data-lake
  *     access_key_id: AKIA…
  *   WAREHOUSE:
  *     url: duckdb:///path/wh.db     # url shorthand — type from scheme
  * }}}
  *
  * Names resolve case-insensitively (the reference upper-cases env keys).
  * `$VAR` values resolve from the process environment at parse time
  * (`connection.go:484-489`); a JDBC URL is rendered from the same
  * per-type templates the reference carries (`connection.go:686+`,
  * postgres `sslmode=disable` default included).
  */
object Connections {

  final case class ConnSpec(
      name: String,
      kind: String,
      props: Map[String, String]) {

    def get(k: String): Option[String] = props.get(k).filter(_.nonEmpty)

    /** JDBC URL for database kinds (template per type, connection.go:686+).
      * An explicit `url:` prop wins; otherwise host/port/database compose.
      */
    def jdbcUrl: String = get("url").map(stripJdbcPrefix).getOrElse {
      val host = get("host").getOrElse("localhost")
      val db = get("database").orElse(get("dbname")).getOrElse("")
      def port(d: Int) = get("port").getOrElse(d.toString)
      kind match {
        case "postgres" =>
          val user = get("username").orElse(get("user")).getOrElse("")
          val ssl = get("sslmode").getOrElse("disable")
          s"jdbc:postgresql://$host:${port(5432)}/$db?user=$user" +
            get("password").map(p => s"&password=$p").getOrElse("") +
            s"&sslmode=$ssl"
        case "mysql" =>
          val user = get("username").orElse(get("user")).getOrElse("")
          s"jdbc:mysql://$host:${port(3306)}/$db?user=$user" +
            get("password").map(p => s"&password=$p").getOrElse("")
        case "duckdb" | "sqlite" =>
          s"jdbc:$kind:${get("instance").orElse(get("path")).getOrElse(db)}"
        case "motherduck" =>
          // motherduck://{token}@{database} (_properties.yaml) rides the
          // duckdb driver's md: scheme; token passes via env/prop
          s"jdbc:duckdb:md:$db"
        case "derby" =>
          s"jdbc:derby:${get("instance").getOrElse(db)};create=true"
        case "sqlserver" | "azuresql" | "azuredwh" | "fabric" =>
          // sqlserver://{user}:{pass}@{host}:{port}/{database}, port 1433
          val user = get("username").orElse(get("user")).getOrElse("")
          s"jdbc:sqlserver://$host:${port(1433)};databaseName=$db" +
            (if (user.nonEmpty) s";user=$user" else "") +
            get("password").map(p => s";password=$p").getOrElse("")
        case "oracle" =>
          // oracle://{user}:{pass}@{host}:{port}/{sid}, port 1521
          val sid = get("sid").orElse(get("instance")).getOrElse(db)
          s"jdbc:oracle:thin:@//$host:${port(1521)}/$sid"
        case "clickhouse" =>
          s"jdbc:clickhouse://$host:${port(8123)}/$db"
        case "redshift" =>
          // redshift://{user}:{pass}@{host}:{port}/{db}?sslmode, port 5439
          val user = get("username").orElse(get("user")).getOrElse("")
          s"jdbc:redshift://$host:${port(5439)}/$db?user=$user" +
            get("password").map(p => s"&password=$p").getOrElse("")
        case "mariadb" =>
          val user = get("username").orElse(get("user")).getOrElse("")
          s"jdbc:mariadb://$host:${port(3306)}/$db?user=$user" +
            get("password").map(p => s"&password=$p").getOrElse("")
        case "starrocks" =>
          // mysql wire protocol; FE query port 9030
          s"jdbc:mysql://$host:${port(9030)}/$db"
        case "trino" =>
          val catalog = get("catalog").getOrElse(db)
          s"jdbc:trino://$host:${port(8080)}/$catalog"
        case "db2" =>
          s"jdbc:db2://$host:${port(50000)}/$db"
        case "vertica" =>
          s"jdbc:vertica://$host:${port(5433)}/$db"
        case "firebird" =>
          s"jdbc:firebirdsql://$host:${port(3050)}/${get("path").getOrElse(db)}"
        case "proton" =>
          // Timeplus proton speaks the clickhouse-compatible wire on 8463
          s"jdbc:proton://$host:${port(8463)}/$db"
        case "athena" =>
          val region = get("region").getOrElse("us-east-1")
          val staging = get("s3_staging_dir").orElse(get("staging")).getOrElse("")
          s"jdbc:awsathena://AwsRegion=$region;S3OutputLocation=$staging"
        case "bigquery" =>
          val project = get("project").orElse(get("project_id")).getOrElse(db)
          s"jdbc:bigquery://https://www.googleapis.com/bigquery/v2:443;ProjectId=$project"
        case "hive" =>
          // HiveServer2 / beeline URL shape (hive.yaml beeline_cmd {url})
          s"jdbc:hive2://$host:${port(10000)}/$db"
        case "exasol" =>
          s"jdbc:exa:$host:${port(8563)}"
        case "snowflake" =>
          // snowflake://{user}:{pass}@{host}.snowflakecomputing.com:443/...
          val wh = get("warehouse").map(w => s"&warehouse=$w").getOrElse("")
          val sc = get("schema").map(sc => s"&schema=$sc").getOrElse("")
          s"jdbc:snowflake://$host.snowflakecomputing.com:443/?db=$db$sc$wh"
        case "databricks" =>
          val httpPath = get("http_path").getOrElse("")
          s"jdbc:databricks://$host:${port(443)};httpPath=$httpPath"
        case other =>
          throw new IllegalArgumentException(s"no JDBC template for '$other'")
      }
    }

    /** jdbcUrl when a template (or explicit url:) exists; None for kinds
      * managed outside JDBC (d1's HTTP API, ducklake's ATTACH). */
    def jdbcTemplate: Option[String] =
      try Some(jdbcUrl) catch { case _: IllegalArgumentException => None }

    private def stripJdbcPrefix(u: String): String =
      if (u.startsWith("jdbc:")) u
      else "jdbc:" + (if (u.startsWith("postgresql")) u
        else u.replaceFirst("^postgres", "postgresql"))

    /** FileBackends connection for object-store kinds. */
    def fileConn: graft.sources.FileBackends.Conn =
      graft.sources.FileBackends.Conn(props.map { case (k, v) =>
        k.toUpperCase -> v
      })

    def isDatabase: Boolean =
      Set("postgres", "mysql", "mariadb", "duckdb", "motherduck", "ducklake",
        "sqlite", "d1", "derby", "snowflake", "bigquery", "oracle",
        "clickhouse", "proton", "sqlserver", "azuresql", "azuredwh",
        "fabric", "redshift", "starrocks", "trino", "databricks", "db2",
        "exasol", "firebird", "athena", "vertica", "hive").contains(kind)
    def isFileSystem: Boolean =
      Set("s3", "gs", "azure", "abfs", "sftp", "ftp", "http", "local",
        "file").contains(kind)
  }

  /** Parse the `connections:` section of an env.yaml. `env` is injectable
    * for tests; defaults to the process environment.
    */
  def parse(envYaml: String,
      env: Map[String, String] = sys.env): Map[String, ConnSpec] = {
    val root = new Yaml().load[java.util.Map[String, Object]](envYaml)
      .asScala.toMap
    val conns = Option(root.getOrElse("connections", null))
      .map(_.asInstanceOf[java.util.Map[String, Object]].asScala.toMap)
      .getOrElse(Map.empty)
    conns.map { case (name, raw) =>
      val m = raw.asInstanceOf[java.util.Map[String, Object]].asScala.map {
        case (k, v) =>
          val s = String.valueOf(v)
          // $VAR indirection, connection.go:484-489
          val resolved =
            if (s.startsWith("$")) env.getOrElse(s.stripPrefix("$"), s) else s
          k.toString.toLowerCase -> resolved
      }.toMap
      // strip the jdbc: wrapper BEFORE taking the scheme — the other order
      // classifies every "url: jdbc:..." shorthand as kind "jdbc"
      val kind = m.getOrElse("type",
        m.get("url").map(u => u.stripPrefix("jdbc:").takeWhile(_ != ':'))
          .getOrElse(throw new IllegalArgumentException(
            s"connection $name needs 'type' or 'url'")))
      val norm = if (kind == "postgresql") "postgres" else kind
      name.toUpperCase -> ConnSpec(name.toUpperCase, norm, m - "type")
    }
  }

  /** dbt `profiles.yml` → registry entries (connection.go:1154-1191):
    * every profile's every output target becomes a connection named
    * `PROFILE_TARGET` (upper; the reference joins with "/" then maps it
    * to "_"), typed by the output's `type`, with `{{ env_var('NAME') }}`
    * jinja expanded from the environment (left verbatim when the
    * variable is absent — the reference warns and keeps going). Entries
    * carry a `dbt -> true` marker prop like the reference's
    * `data["dbt"] = true`. Profiles without an `outputs` map (dbt's
    * top-level `config:` section) are skipped.
    */
  def parseDbtProfiles(yamlText: String,
      env: Map[String, String] = sys.env): Map[String, ConnSpec] = {
    def asMap(o: Object): Map[String, Object] = o match {
      case m: java.util.Map[_, _] =>
        m.asInstanceOf[java.util.Map[String, Object]].asScala.toMap
      case _ => Map.empty
    }
    // dbt's documented forms: env_var('NAME') and env_var('NAME',
    // 'default') — absent variable takes the default when given, else
    // the jinja stays verbatim (the reference warns and keeps going)
    val EnvVar =
      """\{\{ *env_var\(['"]+([0-9a-zA-Z_-]+)['"]+(?: *, *['"]([^'"]*)['"])? *\) *\}\}""".r
    // an empty or comments-only yaml loads as null — an empty registry,
    // not an NPE
    val root = Option(new Yaml().load[java.util.Map[String, Object]](yamlText))
      .map(_.asScala.toMap).getOrElse(Map.empty)
    root.flatMap { case (profile, raw) =>
      val outputs = asMap(raw).get("outputs").map(asMap).getOrElse(Map.empty)
      outputs.flatMap { case (target, data) =>
        val dm = asMap(data)
        dm.get("type").map { t =>
          val props = dm.map { case (k, v) =>
            val s = EnvVar.replaceAllIn(String.valueOf(v), m =>
              java.util.regex.Matcher.quoteReplacement(
                env.get(m.group(1)).orElse(Option(m.group(2)))
                  .getOrElse(m.matched)))
            k.toString.toLowerCase -> s
          } + ("dbt" -> "true")
          val kind0 = String.valueOf(t)
          val kind = if (kind0 == "postgresql") "postgres" else kind0
          val name = s"${profile}_${target}".toUpperCase
          name -> ConnSpec(name, kind, props - "type")
        }
      }
    }
  }

  /** Locate and parse the user's dbt profiles: `$DBT_PROFILES_DIR/
    * profiles.yml`, defaulting to `~/.dbt/profiles.yml`; empty when the
    * file is absent (most environments). DISCOVERY is best-effort like
    * the reference's GetLocalConns (log + continue): a malformed
    * profiles file on the box must not break task runs that never
    * reference a dbt connection. An EXPLICIT `dbt_profiles_file:` goes
    * through [[parseDbtProfiles]] directly and still fails loudly. */
  def loadDbtProfiles(env: Map[String, String] = sys.env): Map[String, ConnSpec] = {
    val dir = env.get("DBT_PROFILES_DIR").map(_.stripSuffix("/"))
      .getOrElse(env.getOrElse("HOME",
        System.getProperty("user.home", ".")) + "/.dbt")
    val p = java.nio.file.Paths.get(dir, "profiles.yml")
    if (!java.nio.file.Files.isRegularFile(p)) Map.empty
    else try parseDbtProfiles(java.nio.file.Files.readString(p), env)
    catch {
      case e: Exception =>
        System.err.println(s"[graft] ignoring unparseable dbt profiles $p: " +
          e.getMessage)
        Map.empty
    }
  }

  def resolve(registry: Map[String, ConnSpec], name: String): ConnSpec =
    registry.getOrElse(name.toUpperCase,
      throw new IllegalArgumentException(
        s"unknown connection '$name' (have: ${registry.keys.toSeq.sorted.mkString(", ")})"))

  /** `conns test` — can the connection be opened? Database kinds open a
    * JDBC connection; filesystem kinds check the path/bucket is reachable
    * (local only in this sandbox); anything else is config-validated only.
    */
  def test(spec: ConnSpec): (Boolean, String) =
    try {
      if (spec.isDatabase) {
        spec.jdbcTemplate match {
          case Some(url) =>
            val c = java.sql.DriverManager.getConnection(url)
            c.close()
            (true, "jdbc connection opened")
          case None =>
            // d1/ducklake: HTTP-API / ATTACH-managed — no JDBC URL shape
            (true, "config validated (no jdbc template for this kind)")
        }
      } else if (spec.kind == "local" || spec.kind == "file") {
        val p = spec.get("path").getOrElse("/")
        if (new java.io.File(p).exists()) (true, s"path $p exists")
        else (false, s"path $p missing")
      } else (true, "config validated (no egress in sandbox)")
    } catch { case e: Exception => (false, e.getMessage) }

  /** `conns discover` — list streams behind a connection. Database kinds
    * read JDBC metadata; local kinds glob the catalog dir.
    *
    * `level` follows the reference's discover levels (discover.go):
    * `schema` lists schemas, `table` lists tables AND views (a pattern of
    * the form `SCHEMA.tbl*` scopes the schema), `column` lists the columns
    * of the `SCHEMA.TABLE` (or bare `TABLE`) the pattern names.
    */
  def discover(spec: ConnSpec, pattern: String = "*",
      level: String = "table"): Seq[String] = {
    // only '*' is a wildcard; every other char is literal — quote the
    // literal segments or metachars like '+'/'(' crash or mismatch
    def regex(p: String) = ("(?i)^" + p.split("\\*", -1)
      .map(seg => if (seg.isEmpty) "" else java.util.regex.Pattern.quote(seg))
      .mkString(".*") + "$").r
    val re = regex(pattern)
    if (spec.isDatabase) {
      val url = spec.jdbcTemplate.getOrElse(throw new UnsupportedOperationException(
        s"discover for '${spec.kind}' needs an explicit url: property (no JDBC template)"))
      // a dotted pattern scopes the schema: "APP.SUITE_*" → (APP, SUITE_*)
      val (schemaPat, namePat) = pattern.indexOf('.') match {
        case -1 => (null: String, pattern)
        case i => (pattern.substring(0, i), pattern.substring(i + 1))
      }
      val nameRe = regex(namePat)
      val c = java.sql.DriverManager.getConnection(url)
      try {
        val md = c.getMetaData
        // translate the user glob into a JDBC metadata search pattern:
        // '*' → '%', and literal '_'/'%'/escape-char escaped with the
        // driver's search-string escape (else '_' is a single-char
        // wildcard and APP.SUITE_SRC would also match SUITEXSRC); unquoted
        // identifiers fold to the dialect's stored case
        def jdbcPat(p0: String): String = {
          if (p0 == null) return null
          val esc = Option(md.getSearchStringEscape).getOrElse("\\")
          val p = if (md.storesUpperCaseIdentifiers) p0.toUpperCase
            else if (md.storesLowerCaseIdentifiers) p0.toLowerCase
            else p0
          p.split("\\*", -1)
            .map(_.replace(esc, esc + esc).replace("_", esc + "_")
              .replace("%", esc + "%"))
            .mkString("%")
        }
        level match {
          case "schema" =>
            val rs = md.getSchemas()
            try Iterator.continually(rs).takeWhile(_.next())
              .map(_.getString("TABLE_SCHEM")).toList
              .filter(s => pattern == "*" || pattern.isEmpty || re.matches(s))
              .sorted
            finally rs.close()
          case "column" =>
            val rs = md.getColumns(null, jdbcPat(schemaPat), jdbcPat(namePat), "%")
            try Iterator.continually(rs).takeWhile(_.next())
              .map(_.getString("COLUMN_NAME")).toList.sorted
            finally rs.close()
          case _ =>
            // views are streams too (the reference discovers them alongside
            // tables; the suite's [table]_vw assertions depend on it)
            val rs = md.getTables(null, jdbcPat(schemaPat), "%", Array("TABLE", "VIEW"))
            try Iterator.continually(rs).takeWhile(_.next())
              .map(r => r.getString("TABLE_NAME")).toList
              .filter(t => nameRe.matches(t)).sorted
            finally rs.close()
        }
      } finally c.close()
    } else {
      val p = spec.get("path").getOrElse(".")
      Option(new java.io.File(p).listFiles()).getOrElse(Array.empty)
        .map(_.getName.replaceAll("\\.parquet$|\\.csv$|\\.jsonl?$", ""))
        .filter(n => re.matches(n)).toSeq.distinct.sorted
    }
  }
}
