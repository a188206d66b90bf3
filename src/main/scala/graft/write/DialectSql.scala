package graft.write

/** Dialect merge-SQL template renderer — the port of the reference's
  * `templates/base.yaml:52-80` merge strategies (merge_insert, merge_update,
  * merge_update_insert, merge_delete_insert, merge_change_capture) and the
  * per-dialect overrides (postgres ON CONFLICT / CTE variant
  * `postgres.yaml:55-96`, mysql ON DUPLICATE KEY). On a Spark deployment the
  * merges against *file* targets run as Delta-style rewrites (write/Modes);
  * these rendered statements are what a JDBC target executes in-database —
  * the reference's boundary #4 (SURVEY §3.1) — so the row movement never
  * leaves the target DB.
  *
  * `Jdbc.merge` executes the ANSI variant against embedded Derby in the
  * oracle suite; the rendering itself is dialect-complete and unit-tested.
  */
object DialectSql {

  final case class MergeSpec(
      tgtTable: String,
      srcTable: String,
      pk: Seq[String],
      columns: Seq[String])

  private def pkEqual(s: MergeSpec, src: String = "src", tgt: String = "tgt") =
    s.pk.map(k => s"$src.$k = $tgt.$k").mkString(" AND ")

  private def setFields(s: MergeSpec, src: String = "src") =
    s.columns.filterNot(s.pk.contains)
      .map(c => s"$c = $src.$c").mkString(", ")

  private def fields(s: MergeSpec) = s.columns.mkString(", ")
  private def srcFields(s: MergeSpec, a: String = "src") =
    s.columns.map(c => s"$a.$c").mkString(", ")

  /** INSERT … WHERE NOT EXISTS (left-anti insert, base.yaml merge_insert). */
  def mergeInsert(s: MergeSpec): String =
    s"""INSERT INTO ${s.tgtTable} (${fields(s)})
       |SELECT ${srcFields(s)} FROM ${s.srcTable} src
       |WHERE NOT EXISTS (
       |  SELECT 1 FROM ${s.tgtTable} tgt WHERE ${pkEqual(s)}
       |)""".stripMargin

  /** UPDATE … FROM (equi-join update, base.yaml merge_update). */
  def mergeUpdate(s: MergeSpec): String =
    s"""UPDATE ${s.tgtTable} tgt
       |SET ${setFields(s)}
       |FROM ${s.srcTable} src
       |WHERE ${pkEqual(s)}""".stripMargin

  /** ANSI MERGE (base.yaml merge_update_insert — the default strategy).
    *
    * `srcAsTable` is the per-dialect override the reference allows
    * (`templates/base.yaml:51` "database-specific implementations may
    * override"): engines like Derby require the MERGE source to be a base
    * table or table function, not a subquery — and the staged-load path
    * always merges from a staged base table anyway (`Jdbc.merge`,
    * `sources/Jdbc.scala:59`), so the table form is both the portable and
    * the production shape.
    */
  def mergeUpdateInsert(s: MergeSpec, srcAsTable: Boolean = false): String = {
    val using =
      if (srcAsTable) s"USING ${s.srcTable} src"
      else s"USING (SELECT ${fields(s)} FROM ${s.srcTable}) src"
    s"""MERGE INTO ${s.tgtTable} tgt
       |$using
       |ON (${pkEqual(s)})
       |WHEN MATCHED THEN UPDATE SET ${setFields(s)}
       |WHEN NOT MATCHED THEN INSERT (${fields(s)}) VALUES (${srcFields(s)})""".stripMargin
  }

  /** DELETE matching PKs then INSERT all (base.yaml merge_delete_insert). */
  def mergeDeleteInsert(s: MergeSpec): Seq[String] = Seq(
    s"""DELETE FROM ${s.tgtTable} tgt
       |WHERE EXISTS (
       |  SELECT 1 FROM ${s.srcTable} src
       |  WHERE ${pkEqual(s)}
       |)""".stripMargin,
    s"""INSERT INTO ${s.tgtTable} (${fields(s)})
       |SELECT ${srcFields(s)} FROM ${s.srcTable} src""".stripMargin)

  /** CDC apply: latest-per-PK via ROW_NUMBER, D deletes, U/I upserts
    * (postgres.yaml:104-130 merge_change_capture shape).
    */
  def mergeChangeCapture(s: MergeSpec): Seq[String] = {
    val pkList = s.pk.mkString(", ")
    val latest =
      s"""SELECT *, ROW_NUMBER() OVER (
         |  PARTITION BY $pkList ORDER BY _sling_cdc_seq DESC) AS _rn
         |FROM ${s.srcTable}""".stripMargin
    Seq(
      s"""DELETE FROM ${s.tgtTable} tgt
         |WHERE EXISTS (
         |  SELECT 1 FROM ($latest) src
         |  WHERE src._rn = 1 AND src._sling_synced_op = 'D'
         |  AND ${pkEqual(s)}
         |)""".stripMargin,
      s"""MERGE INTO ${s.tgtTable} tgt
         |USING (SELECT ${fields(s)} FROM ($latest) f
         |       WHERE f._rn = 1 AND f._sling_synced_op <> 'D') src
         |ON (${pkEqual(s)})
         |WHEN MATCHED THEN UPDATE SET ${setFields(s)}
         |WHEN NOT MATCHED THEN INSERT (${fields(s)}) VALUES (${srcFields(s)})""".stripMargin)
  }

  /** postgres upsert: INSERT … ON CONFLICT (pk) DO UPDATE. */
  def postgresUpsert(s: MergeSpec): String =
    s"""INSERT INTO ${s.tgtTable} (${fields(s)})
       |SELECT ${fields(s)} FROM ${s.srcTable}
       |ON CONFLICT (${s.pk.mkString(", ")}) DO UPDATE
       |SET ${s.columns.filterNot(s.pk.contains)
             .map(c => s"$c = EXCLUDED.$c").mkString(", ")}""".stripMargin

  /** mysql upsert: INSERT … ON DUPLICATE KEY UPDATE. */
  def mysqlUpsert(s: MergeSpec): String =
    s"""INSERT INTO ${s.tgtTable} (${fields(s)})
       |SELECT ${fields(s)} FROM ${s.srcTable}
       |ON DUPLICATE KEY UPDATE ${s.columns.filterNot(s.pk.contains)
             .map(c => s"$c = VALUES($c)").mkString(", ")}""".stripMargin

  /** SQL Server MERGE (sqlserver.yaml:65-70): T-SQL requires MERGE to be
    * the statement terminated with `;`, and concurrent upserts need the
    * HOLDLOCK hint to serialize the match/insert window (documented SQL
    * Server behavior — without it two sessions can both miss the match and
    * double-insert the same key).
    */
  def sqlserverUpsert(s: MergeSpec): String =
    s"""MERGE INTO ${s.tgtTable} WITH (HOLDLOCK) tgt
       |USING (SELECT ${fields(s)} FROM ${s.srcTable}) src
       |ON (${pkEqual(s)})
       |WHEN MATCHED THEN UPDATE SET ${setFields(s)}
       |WHEN NOT MATCHED THEN INSERT (${fields(s)}) VALUES (${srcFields(s)});""".stripMargin

  /** SQL Server delete+insert (sqlserver.yaml:72-79) — T-SQL's
    * `DELETE <alias> FROM … <alias>` form.
    */
  def sqlserverDeleteInsert(s: MergeSpec): Seq[String] = Seq(
    s"""DELETE tgt FROM ${s.tgtTable} tgt
       |WHERE EXISTS (
       |  SELECT 1 FROM ${s.srcTable} src
       |  WHERE ${pkEqual(s)}
       |)""".stripMargin,
    s"""INSERT INTO ${s.tgtTable} (${fields(s)})
       |SELECT ${srcFields(s)} FROM ${s.srcTable} src""".stripMargin)

  /** Oracle MERGE (oracle.yaml:102-107) — ANSI shape, no terminator (the
    * driver executes one statement per call; a trailing `;` is a
    * PL/SQL-only convention and ORA-00911 in plain SQL).
    */
  def oracleUpsert(s: MergeSpec): String = mergeUpdateInsert(s)

  /** Oracle single-row replace: MERGE … USING (SELECT literals FROM dual)
    * (oracle.yaml:56-63) — Oracle requires a FROM clause on every SELECT,
    * so literal sources select from the one-row dual table.
    */
  def oracleReplace(table: String, pk: Seq[String],
      nameValues: Seq[(String, String)]): String = {
    val sel = nameValues.map { case (n, v) => s"$v AS $n" }.mkString(", ")
    val names = nameValues.map(_._1)
    val on = pk.map(k => s"src.$k = tgt.$k").mkString(" AND ")
    val sets = names.filterNot(pk.contains).map(c => s"tgt.$c = src.$c")
    s"""MERGE INTO $table tgt
       |USING (SELECT $sel FROM dual) src
       |ON ($on)
       |WHEN MATCHED THEN UPDATE SET ${sets.mkString(", ")}
       |WHEN NOT MATCHED THEN INSERT (${names.mkString(", ")})
       |VALUES (${names.map(n => s"src.$n").mkString(", ")})""".stripMargin
  }

  /** ClickHouse left-anti insert (clickhouse.yaml:29-34) — tuple NOT IN
    * instead of NOT EXISTS (correlated subqueries are not supported).
    */
  def clickhouseInsertMissing(s: MergeSpec): String = {
    val pkList = s.pk.mkString(", ")
    s"""INSERT INTO ${s.tgtTable} (${fields(s)})
       |SELECT ${srcFields(s)} FROM ${s.srcTable} src
       |WHERE ($pkList) NOT IN (
       |  SELECT $pkList FROM ${s.tgtTable}
       |)""".stripMargin
  }

  /** ClickHouse delete+insert (clickhouse.yaml:36-43): no MERGE / UPDATE
    * on MergeTree — a mutation (`ALTER TABLE … DELETE`) with
    * `mutations_sync = 1` so the insert doesn't race the async mutation,
    * then a plain INSERT SELECT.
    */
  def clickhouseDeleteInsert(s: MergeSpec): Seq[String] = {
    val pkList = s.pk.mkString(", ")
    Seq(
      s"""ALTER TABLE ${s.tgtTable} DELETE
         |WHERE ($pkList) IN (
         |  SELECT $pkList FROM ${s.srcTable}
         |) SETTINGS mutations_sync = 1""".stripMargin,
      s"""INSERT INTO ${s.tgtTable} (${fields(s)})
         |SELECT ${srcFields(s)} FROM ${s.srcTable} src""".stripMargin)
  }

  /** Redshift delete+insert (redshift.yaml:57-62): DELETE does not accept
    * a target alias — the join condition names the target table directly
    * (`{src_tgt_pk_equal_tbl}`).
    */
  def redshiftDeleteInsert(s: MergeSpec): Seq[String] = Seq(
    s"""DELETE FROM ${s.tgtTable}
       |USING ${s.srcTable} src
       |WHERE ${s.pk.map(k => s"src.$k = ${s.tgtTable}.$k").mkString(" AND ")}""".stripMargin,
    s"""INSERT INTO ${s.tgtTable} (${fields(s)})
       |SELECT ${srcFields(s)} FROM ${s.srcTable} src""".stripMargin)

  /** DB2 MERGE (db2.yaml:37-44) — ANSI shape but the source must be the
    * staged base table directly (`USING {src_table} src`, no subquery
    * wrapper), same constraint Derby has.
    */
  def db2Upsert(s: MergeSpec): String = mergeUpdateInsert(s, srcAsTable = true)

  /** SQLite upsert (sqlite.yaml:27-31): INSERT … ON CONFLICT DO UPDATE.
    * The `WHERE true` is load-bearing — without it SQLite's parser sees
    * `ON` as a join keyword of the SELECT, not the conflict clause.
    * Requires a unique index on the PK (the reference creates one first).
    */
  def sqliteUpsert(s: MergeSpec): String =
    s"""INSERT INTO ${s.tgtTable} (${fields(s)})
       |SELECT ${srcFields(s)} FROM ${s.srcTable} src WHERE true
       |ON CONFLICT (${s.pk.mkString(", ")})
       |DO UPDATE SET ${s.columns.filterNot(s.pk.contains)
             .map(c => s"$c = excluded.$c").mkString(", ")}""".stripMargin

  /** StarRocks upsert (starrocks.yaml:10-14,26-29): primary-key tables
    * replace rows on plain INSERT — the insert IS the upsert. A
    * skip-existing guard would defeat the update half, so none is added.
    */
  def starrocksUpsert(s: MergeSpec): String =
    s"""INSERT INTO ${s.tgtTable} (${fields(s)})
       |SELECT ${srcFields(s)} FROM ${s.srcTable} src""".stripMargin

  /** StarRocks delete+insert (starrocks.yaml:40-54): no MERGE and no
    * correlated EXISTS in DELETE — tuple IN, then plain INSERT.
    */
  def starrocksDeleteInsert(s: MergeSpec): Seq[String] = {
    val pkList = s.pk.mkString(", ")
    Seq(
      s"""DELETE FROM ${s.tgtTable}
         |WHERE ($pkList) IN (
         |  SELECT $pkList FROM ${s.srcTable}
         |)""".stripMargin,
      starrocksUpsert(s))
  }

  /** StarRocks staged-table DDL (starrocks.yaml create_table): PRIMARY KEY
    * table — the thing that makes INSERT an upsert — plus hash distribution
    * on the PK so merge traffic is co-located per tablet at scale.
    */
  def starrocksCreateTable(table: String,
      schema: org.apache.spark.sql.types.StructType, pk: Seq[String]): String = {
    val cols = schema.fields.map(f =>
      s"${f.name} ${graft.model.NativeTypes.render("starrocks", f)}")
    val pkList = pk.mkString(", ")
    s"create table if not exists $table (${cols.mkString(", ")}) " +
      s"primary key ($pkList) distributed by hash($pkList)"
  }

  /** MariaDB delete+insert (mariadb.yaml:22-31): error 1093 forbids
    * referencing the insert target inside INSERT … SELECT subqueries, so
    * no NOT-EXISTS guard exists and delete_insert is the default strategy;
    * the DELETE names the target table directly (no alias).
    */
  def mariadbDeleteInsert(s: MergeSpec): Seq[String] = Seq(
    s"""DELETE FROM ${s.tgtTable}
       |WHERE EXISTS (
       |  SELECT 1 FROM ${s.srcTable} src
       |  WHERE ${s.pk.map(k => s"src.$k = ${s.tgtTable}.$k").mkString(" AND ")}
       |)""".stripMargin,
    s"""INSERT INTO ${s.tgtTable} (${fields(s)})
       |SELECT ${srcFields(s)} FROM ${s.srcTable} src""".stripMargin)

  /** Athena left-anti insert (athena.yaml:65-71): DELETE/UPDATE/MERGE only
    * work on Iceberg tables, so standard tables get insert-missing only
    * (every other strategy is nulled, athena.yaml:74-78).
    */
  def athenaInsertMissing(s: MergeSpec): String = mergeInsert(s)

  /** Azure SQL / Fabric MERGE (azuresql.yaml:65-70, fabric.yaml:82-87):
    * T-SQL shape with the `;` terminator but WITHOUT the HOLDLOCK hint the
    * on-prem sqlserver template carries — the cloud templates omit it.
    */
  def tsqlCloudUpsert(s: MergeSpec): String =
    s"""MERGE INTO ${s.tgtTable} tgt
       |USING (SELECT ${fields(s)} FROM ${s.srcTable}) src
       |ON (${pkEqual(s)})
       |WHEN MATCHED THEN UPDATE SET ${setFields(s)}
       |WHEN NOT MATCHED THEN INSERT (${fields(s)}) VALUES (${srcFields(s)});""".stripMargin

  /** Exasol MERGE (exasol.yaml:68-73) — table-form USING like DB2. */
  def exasolUpsert(s: MergeSpec): String = mergeUpdateInsert(s, srcAsTable = true)

  /** Proton insert (proton.yaml:24, default_merge_strategy: insert,
    * :269) — streaming engine, append-only: every other strategy is null.
    */
  def protonInsert(s: MergeSpec): String =
    s"""INSERT INTO ${s.tgtTable} (${fields(s)})
       |SELECT ${srcFields(s)} FROM ${s.srcTable} src""".stripMargin

  /** Per-dialect identifier quote character (`variable.quote_char` in the
    * templates; base.yaml:458 default `"`). Backtick engines:
    * mysql.yaml:539, mariadb, bigquery.yaml:559, clickhouse, proton,
    * starrocks, databricks, athena. hive/spark define no quote_char in
    * their templates (base fallback `"`), but a double-quoted identifier
    * is a string literal to those engines outside ANSI mode — render the
    * engine-correct backtick instead, like the NativeTypes fallback maps.
    */
  def quoteChar(dialect: String): String = dialect match {
    case "mysql" | "mariadb" | "bigquery" | "clickhouse" | "proton" |
         "starrocks" | "databricks" | "athena" | "hive" | "spark" => "`"
    case _ => "\""
  }

  /** Dialects whose catalog stores unquoted names upper-case
    * (dbio_types.go:218-224 DBNameUpperCase + `variable.column_upper`:
    * oracle, snowflake, exasol, db2.yaml:413).
    */
  def nameUpperCase(dialect: String): Boolean = dialect match {
    case "oracle" | "snowflake" | "exasol" | "db2" => true
    case _ => false
  }

  /** Quote one identifier with the dialect's quote char, stripping any
    * existing quoting first (dbio_types.go:603-622 Template.Quote — no
    * case normalization; casing is decided upstream at configuration).
    */
  def quoteIdent(dialect: String, name: String): String = {
    val q = quoteChar(dialect)
    val bare = name.stripPrefix("\"").stripSuffix("\"")
      .stripPrefix("`").stripSuffix("`")
    // a quote char INSIDE the identifier doubles, per every listed
    // engine's convention — otherwise a discovered column named `a"b`
    // renders unbalanced (or injectable) SQL
    s"$q${bare.replace(q, q + q)}$q"
  }

  /** Schema-evolution ADD COLUMN (base.yaml `add_column`; Oracle and the
    * T-SQL family drop the COLUMN keyword — oracle.yaml/sqlserver.yaml/
    * azuresql/azuredwh/fabric `add_column` overrides). Types render
    * through the dialect's native map, so an evolved column gets the same
    * DDL the initial staged create would.
    */
  def addColumnSql(dialect: String, table: String,
      field: org.apache.spark.sql.types.StructField): String = {
    val t = graft.model.NativeTypes.render(dialect, field)
    dialect match {
      case "oracle" | "sqlserver" | "azuresql" | "azuredwh" | "fabric" =>
        s"alter table $table add ${field.name} $t"
      case _ => s"alter table $table add column ${field.name} $t"
    }
  }

  /** Schema-evolution type widen (`alter_columns` + `modify_column`
    * composed per dialect): postgres `alter column … type …`,
    * mysql/mariadb/starrocks `modify`, oracle `modify (…)`, T-SQL
    * `alter column`, snowflake `alter … set data type`, clickhouse
    * `modify column`, duckdb `alter … type`. Engines whose template is a
    * table-recreate workaround (bigquery, redshift) are not rendered here.
    */
  def alterColumnSql(dialect: String, table: String,
      field: org.apache.spark.sql.types.StructField): String = {
    val c = field.name
    val t = graft.model.NativeTypes.render(dialect, field)
    dialect match {
      case "postgres" => s"alter table $table alter column $c type $t"
      case "mysql" | "mariadb" | "starrocks" =>
        s"alter table $table modify $c $t"
      case "oracle" => s"alter table $table modify ($c $t)"
      case "sqlserver" | "azuresql" | "azuredwh" | "fabric" =>
        s"alter table $table alter column $c $t"
      case "snowflake" => s"alter table $table alter $c set data type $t"
      case "clickhouse" | "proton" =>
        s"alter table $table modify column $c $t"
      case "duckdb" | "motherduck" | "ducklake" =>
        s"alter table $table alter $c type $t"
      // Spark SQL grammar: ALTER COLUMN c TYPE t (no SET DATA TYPE)
      case "spark" | "databricks" =>
        s"alter table $table alter column $c type $t"
      // HiveQL has no alter-column-type verb; CHANGE COLUMN re-declares
      case "hive" => s"alter table $table change column $c $c $t"
      // ANSI / DB2-family verb; engines whose widen is a table-recreate
      // workaround (bigquery, redshift, sqlite) must not get DDL here
      case "db2" | "derby" | "trino" =>
        s"alter table $table alter column $c set data type $t"
      case other => throw new IllegalArgumentException(
        s"no alter-column template for dialect '$other' (table-recreate workaround needed)")
    }
  }

  /** Temp-table DDL for staged loads, rendered with the dialect's native
    * type map (templates/<dialect>.yaml general_type_map via
    * model.NativeTypes) — the `create_temporary_table` shape the reference
    * fills per dialect before merging.
    */
  def stageTableDdl(dialect: String, table: String,
      schema: org.apache.spark.sql.types.StructType): String =
    graft.model.NativeTypes.createTable(dialect, table, schema)

  /** Per-dialect default merge strategy — engines without a native MERGE
    * or correlated UPDATE fall back to delete_insert
    * (redshift.yaml:709-710 `default_merge_strategy: delete_insert`;
    * clickhouse.yaml:44-46 `merge_update_insert: null`).
    */
  def defaultMergeStrategy(dialect: String): String = dialect match {
    case "clickhouse" | "redshift" | "mariadb" => "delete_insert"
    // duckdb.yaml:325 + :53-55 — update_insert is null (sling-created
    // tables carry no PK constraint, so INSERT OR REPLACE can't be used);
    // motherduck/ducklake are duckdb-family
    case "duckdb" | "motherduck" | "ducklake" => "delete_insert"
    // starrocks.yaml:506 — PK tables make plain insert the upsert
    case "starrocks" => "insert"
    // athena.yaml nulls every strategy but merge_insert (athena.yaml:74-78);
    // insert-missing is the only executable strategy on standard tables
    case "athena" => "insert"
    // proton.yaml:269 — append-only streaming engine
    case "proton" => "insert"
    case _ => "update_insert" // base.yaml:473
  }

  /** Executable strategy × dialect matrix: Some(statements) when the
    * reference's template defines the strategy for the dialect, None
    * where the template nulls it — clickhouse/redshift/mariadb and the
    * duckdb family null merge_update_insert (clickhouse.yaml:44-46,
    * redshift.yaml:709-710, duckdb.yaml:53-55), starrocks' upsert is the
    * engine's PK-table native insert (starrocks.yaml:506 — not
    * expressible as portable SQL), athena nulls everything but
    * merge_insert (athena.yaml:74-78), and proton is append-only
    * (proton.yaml:269). Strategy names follow templates/base.yaml:52-80.
    */
  def strategyFor(dialect: String, strategy: String,
      s: MergeSpec): Option[Seq[String]] = strategy match {
    case "update_insert" => dialect match {
      case "clickhouse" | "redshift" | "mariadb" | "duckdb" | "motherduck" |
          "ducklake" | "starrocks" | "athena" | "proton" => None
      case d => Some(upsertFor(d, s))
    }
    case "delete_insert" => dialect match {
      case "sqlserver" | "azuresql" | "azuredwh" | "fabric" =>
        Some(sqlserverDeleteInsert(s))
      case "redshift" => Some(redshiftDeleteInsert(s))
      case "mariadb" => Some(mariadbDeleteInsert(s))
      case "starrocks" => Some(starrocksDeleteInsert(s))
      case "clickhouse" => Some(clickhouseDeleteInsert(s))
      case "athena" | "proton" => None
      case _ => Some(mergeDeleteInsert(s))
    }
    case "merge_update" => dialect match {
      // no correlated UPDATE (clickhouse mutations can't join; starrocks
      // PK tables update via insert; athena/proton null it)
      case "clickhouse" | "starrocks" | "athena" | "proton" => None
      case _ => Some(Seq(mergeUpdate(s)))
    }
    case "merge_insert" => dialect match {
      case "clickhouse" => Some(Seq(clickhouseInsertMissing(s)))
      case "athena" => Some(Seq(athenaInsertMissing(s)))
      case "proton" => None
      case _ => Some(Seq(mergeInsert(s)))
    }
    // plain INSERT…SELECT appends on every SQL engine
    case "append" => Some(Seq(protonInsert(s)))
    case _ => None
  }

  /** Dialect dispatch for the default merge strategy. */
  def upsertFor(dialect: String, s: MergeSpec): Seq[String] = dialect match {
    case "postgres" => Seq(postgresUpsert(s))
    case "mysql" => Seq(mysqlUpsert(s))
    case "sqlserver" => Seq(sqlserverUpsert(s))
    case "oracle" => Seq(oracleUpsert(s))
    case "sqlite" | "d1" => Seq(sqliteUpsert(s)) // d1.yaml:38-42 same shape
    // azuredwh speaks T-SQL over the sqlserver wire (see Connections) —
    // its MERGE needs the same trailing ';' as the rest of the family
    case "azuresql" | "fabric" | "azuredwh" => Seq(tsqlCloudUpsert(s))
    // no native MERGE → the dialect's delete_insert strategy
    case "clickhouse" => clickhouseDeleteInsert(s)
    case "redshift" => redshiftDeleteInsert(s)
    case "mariadb" => mariadbDeleteInsert(s)
    case "duckdb" | "motherduck" | "ducklake" => mergeDeleteInsert(s)
    // PK-table native upsert / insert-only engines
    case "starrocks" => Seq(starrocksUpsert(s))
    case "athena" => Seq(athenaInsertMissing(s))
    case "proton" => Seq(protonInsert(s))
    // MERGE source must be a base table, not a subquery
    case "db2" => Seq(db2Upsert(s))
    case "exasol" => Seq(exasolUpsert(s))
    case "derby" => Seq(mergeUpdateInsert(s, srcAsTable = true))
    // ansi: snowflake/bigquery/trino/databricks/azuredwh/firebird
    case _ => Seq(mergeUpdateInsert(s))
  }
}
