package graft.repl

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{Metadata, MetadataBuilder, StructField, StructType}

/** Generic identity-aware schema migration (reference suite.cli id=189,
  * tests/pipelines/schema_migration/p.23: "Identity seed/increment only
  * returned for identity columns, not all columns").
  *
  * Shape: read the SOURCE table's JDBC metadata (auto-increment flag +
  * seed/increment, primary key, nullability), graft it onto the Spark
  * schema, render target-dialect CREATE TABLE DDL where ONLY
  * identity-flagged columns carry the identity clause, create, and copy
  * rows. The bug the reference fixed — seed/increment attaching to every
  * column — is structurally impossible here: identity metadata is only
  * written for columns whose JDBC IS_AUTOINCREMENT says YES.
  */
object SchemaMigration {

  final case class Report(
      identityCols: Seq[String],
      nonIdentityCols: Seq[String],
      rowsCopied: Long,
      ddl: String)

  /** Column facts from JDBC metadata: (autoIncrement, nullable, pk). */
  private def columnFacts(url: String, table: String)
      : (Map[String, Boolean], Map[String, Boolean], Set[String]) = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val md = conn.getMetaData
      val autoInc = collection.mutable.Map[String, Boolean]()
      val nullable = collection.mutable.Map[String, Boolean]()
      val rs = md.getColumns(null, null, table, null)
      while (rs.next()) {
        val n = rs.getString("COLUMN_NAME")
        autoInc(n) = "YES".equalsIgnoreCase(rs.getString("IS_AUTOINCREMENT"))
        nullable(n) =
          rs.getInt("NULLABLE") != java.sql.DatabaseMetaData.columnNoNulls
      }
      rs.close()
      val pks = collection.mutable.Set[String]()
      val prs = md.getPrimaryKeys(null, null, table)
      while (prs.next()) pks += prs.getString("COLUMN_NAME")
      prs.close()
      (autoInc.toMap, nullable.toMap, pks.toSet)
    } finally conn.close()
  }

  /** Identity (seed, increment) per column. Derby exposes them in its
    * system catalog; other dialects fall back to (1, 1) — the generic
    * shape carries the FLAG everywhere and the exact seed where the
    * catalog provides it. */
  private def identityParams(url: String, table: String): Map[String, (Long, Long)] = {
    if (!url.toLowerCase.startsWith("jdbc:derby")) return Map.empty
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      val rs = st.executeQuery(
        s"""SELECT c.COLUMNNAME, c.AUTOINCREMENTSTART, c.AUTOINCREMENTINC
           |FROM SYS.SYSCOLUMNS c JOIN SYS.SYSTABLES t
           |  ON c.REFERENCEID = t.TABLEID
           |WHERE t.TABLENAME = '${table.replace("'", "''")}'
           |  AND c.AUTOINCREMENTSTART IS NOT NULL""".stripMargin)
      val out = collection.mutable.Map[String, (Long, Long)]()
      while (rs.next())
        out(rs.getString(1)) = (rs.getLong(2), rs.getLong(3))
      rs.close(); st.close()
      out.toMap
    } finally conn.close()
  }

  /** Migrate `table` from `fromUrl` to `targetTable` on `toUrl`.
    * `options` selects which source facts carry over (the reference's
    * SLING_SCHEMA_MIGRATION list): auto_increment, primary_key, nullable.
    */
  def migrate(spark: SparkSession, fromUrl: String, table: String,
      toUrl: String, targetTable: String, dialect: String = "derby",
      options: Set[String] = Set("auto_increment", "primary_key", "nullable"))
      : Report = {
    val src = graft.sources.Jdbc.read(spark, fromUrl, table)
    val (autoInc, nullOk, pks) = columnFacts(fromUrl, table)
    val seeds = identityParams(fromUrl, table)
    def key(n: String): String =
      autoInc.keys.find(_.equalsIgnoreCase(n)).getOrElse(n)
    val fields = src.schema.fields.map { f =>
      val k = key(f.name)
      val mb = new MetadataBuilder().withMetadata(f.metadata)
      val isIdent = options.contains("auto_increment") &&
        autoInc.getOrElse(k, false)
      if (isIdent) {
        val (s0, i0) = seeds.getOrElse(k, (1L, 1L))
        mb.putLong("identity_seed", s0)
        mb.putLong("identity_increment", i0)
      }
      if (options.contains("primary_key") && pks.contains(k))
        mb.putBoolean("primary_key", true)
      val nn =
        if (options.contains("nullable")) nullOk.getOrElse(k, f.nullable)
        else f.nullable
      // pk columns must be declared not null for the ADD PRIMARY KEY below
      StructField(f.name, f.dataType, nn && !pks.contains(k), mb.build())
    }
    val schema = StructType(fields)
    val ddl = graft.model.NativeTypes.createTable(dialect, targetTable, schema)
    try graft.sources.Jdbc.execute(toUrl, s"DROP TABLE $targetTable")
    catch { case _: Exception => () }
    graft.sources.Jdbc.execute(toUrl, ddl)
    if (options.contains("primary_key") && pks.nonEmpty)
      graft.sources.Jdbc.execute(toUrl,
        s"ALTER TABLE $targetTable ADD PRIMARY KEY (${pks.mkString(", ")})")
    src.write.format("jdbc")
      .option("url", toUrl).option("dbtable", targetTable)
      .mode(org.apache.spark.sql.SaveMode.Append).save()
    val rows = src.count()
    val identCols = fields.filter(_.metadata.contains("identity_seed"))
      .map(_.name).toSeq
    Report(identCols,
      fields.map(_.name).toSeq.diff(identCols), rows, ddl)
  }
}
