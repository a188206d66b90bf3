package graft.sources

import java.sql.DriverManager

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC source/sink — the reference's primary surface (database.go).
  *
  * Reads support the chunked/partitioned form (partitionColumn + bounds →
  * one query per executor slice), the exact analogue of the reference's
  * range chunking (replication.go:688-930). Writes go through Spark's JDBC
  * writer (batched inserts); [[merge]] implements the temp-table + ANSI
  * MERGE strategy the reference templates per dialect
  * (templates/base.yaml:66-71) — staged load, transactional merge inside
  * the target DB, temp cleanup.
  *
  * Tested end-to-end against embedded Derby (no external DB in the test
  * environment); the code paths are dialect-generic Spark JDBC.
  */
object Jdbc {

  def write(df: DataFrame, url: String, table: String,
      mode: SaveMode = SaveMode.Overwrite,
      batchSize: Option[Int] = None): Unit = {
    val w = df.write.format("jdbc")
      .option("url", url).option("dbtable", table)
    batchSize.foreach(n => w.option("batchsize", n))
    w.mode(mode).save()
  }

  /** Capability-dispatched bulk write (the reference's BulkImportFlow):
    * dialects with a streaming fast path take it — postgres COPY through
    * the injected transport (`PgCopy.bulkLoad`, one channel per Spark
    * partition, no driver row movement) — everything else falls back to
    * Spark's batched JDBC inserts. The transport is injectable because
    * the COPY wire protocol needs the PG driver's CopyManager, absent in
    * this offline build; `PgCopySpec` drives the seam with a recording
    * transport and the encoder is oracle-gated (`op_pg_copy_encode`).
    * Returns the rows sent on the fast path, -1 when batched JDBC ran.
    */
  def bulkWrite(df: DataFrame, url: String, table: String, dialect: String,
      copyTransport: Option[graft.write.PgCopy.CopyTransport] = None): Long =
    (graft.write.BulkStage.fastPathFor(dialect), copyTransport) match {
      case ("copy_stdin", Some(t)) =>
        graft.write.PgCopy.bulkLoad(df, table, t)
      case _ =>
        write(df, url, table); -1L
    }

  /** Run one statement against the target DB (pre_sql/post_sql hooks,
    * config.go target options). */
  def execute(url: String, sql: String): Unit = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute(sql) finally st.close()
    } finally conn.close()
  }

  def read(spark: SparkSession, url: String, table: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table).load()

  /** Case-folding existence probe; a qualified name splits into
    * (schemaPattern, tablePattern). */
  def tableExists(url: String, name: String): Boolean = {
    val conn = DriverManager.getConnection(url)
    try {
      val md = conn.getMetaData
      val (sch0, tbl0) = name.lastIndexOf('.') match {
        case -1 => (null: String, name)
        case i  => (name.substring(0, i), name.substring(i + 1))
      }
      def folds(n: String): Seq[String] =
        (Seq(n) ++
          (if (md.storesUpperCaseIdentifiers) Seq(n.toUpperCase) else Nil) ++
          (if (md.storesLowerCaseIdentifiers) Seq(n.toLowerCase) else Nil))
          .distinct
      val schemas = if (sch0 == null) Seq(null: String) else folds(sch0)
      schemas.exists(sp => folds(tbl0).exists { n =>
        val rs = md.getTables(null, sp, n, null)
        try rs.next() finally rs.close()
      })
    } finally conn.close()
  }

  /** Partitioned read: numPartitions parallel range queries on partitionCol. */
  def readPartitioned(spark: SparkSession, url: String, table: String,
      partitionCol: String, lower: Long, upper: Long, numPartitions: Int): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("partitionColumn", partitionCol)
      .option("lowerBound", lower).option("upperBound", upper)
      .option("numPartitions", numPartitions)
      .load()

  /** Temp-table + MERGE upsert inside the target DB: stage `df` into
    * `<table>_tmp`, MERGE on `pk`, drop the stage. Mirrors
    * task_run_write.go:163-498 + the update_insert template.
    */
  def merge(df: DataFrame, url: String, table: String, pk: Seq[String],
      tableTmp: Option[String] = None): Unit =
    mergeStrategy(df, url, table, pk, "update_insert", tableTmp)

  /** Staged-load merge with the reference's four strategies
    * (task_run_write.go merge_strategy → templates/base.yaml
    * merge_insert/merge_update/merge_update_insert/merge_delete_insert):
    * stage `df` into a temp table, apply the strategy in-DB, drop the
    * stage. SQL is built in the portable subset embedded engines accept
    * (MERGE for the update paths; EXISTS forms for insert/delete).
    */
  def mergeStrategy(df: DataFrame, url: String, table: String,
      pk: Seq[String], strategy: String,
      tableTmp: Option[String] = None): Unit = {
    require(pk.nonEmpty, s"merge strategy $strategy needs primary_key")
    // first load of an absent target: every strategy degenerates to a
    // plain create-and-insert (task_run_write.go creates before merging)
    if (!tableExists(url, table)) {
      write(df, url, table, SaveMode.ErrorIfExists)
      return
    }
    val tmp = tableTmp.getOrElse(s"${table}_STAGE")
    write(df, url, tmp, SaveMode.Overwrite)
    // Spark's JDBC writer creates columns as quoted (case-exact) identifiers;
    // quote them here too or the DB folds references to uppercase
    def q(c: String) = "\"" + c + "\""
    val cols = df.columns.toSeq
    val onClause = pk.map(k => s"t.${q(k)} = s.${q(k)}").mkString(" AND ")
    val nonKey = cols.filterNot(pk.contains)
    val setClause = nonKey.map(c => s"t.${q(c)} = s.${q(c)}").mkString(", ")
    val insertCols = cols.map(q).mkString(", ")
    val insertVals = cols.map(c => s"s.${q(c)}").mkString(", ")
    // a pure-keys table has nothing to UPDATE — an empty SET clause is a
    // syntax error on every dialect, so reduce to insert-if-absent
    val matched =
      if (nonKey.isEmpty) "" else s"\nWHEN MATCHED THEN UPDATE SET $setClause"
    val stmts: Seq[String] = strategy match {
      case "update_insert" => Seq(
        s"""MERGE INTO $table t USING $tmp s ON $onClause$matched
           |WHEN NOT MATCHED THEN INSERT ($insertCols) VALUES ($insertVals)"""
          .stripMargin)
      case "update" =>
        if (nonKey.isEmpty) Nil // nothing updatable
        else Seq(
          s"""MERGE INTO $table t USING $tmp s ON $onClause
             |WHEN MATCHED THEN UPDATE SET $setClause""".stripMargin)
      case "insert" => Seq(
        s"""INSERT INTO $table ($insertCols)
           |SELECT $insertVals FROM $tmp s WHERE NOT EXISTS (
           |  SELECT 1 FROM $table t WHERE $onClause)""".stripMargin)
      case "delete_insert" =>
        val delExists = pk.map(k => s"s.${q(k)} = $table.${q(k)}")
          .mkString(" AND ")
        Seq(
          s"""DELETE FROM $table WHERE EXISTS (
             |  SELECT 1 FROM $tmp s WHERE $delExists)""".stripMargin,
          s"INSERT INTO $table ($insertCols) SELECT $insertVals FROM $tmp s")
      case other =>
        throw new IllegalArgumentException(s"unknown merge_strategy $other")
    }
    val conn = DriverManager.getConnection(url)
    try {
      conn.setAutoCommit(false)
      val st = conn.createStatement()
      try {
        stmts.foreach(st.executeUpdate)
        st.executeUpdate(s"DROP TABLE $tmp")
        conn.commit()
      } catch {
        case e: Throwable =>
          // roll back BEFORE close: closing with an open transaction throws
          // on embedded engines and would mask the real MERGE failure; the
          // stage table is dropped best-effort so reruns don't collide
          try conn.rollback() catch { case _: Exception => () }
          try {
            conn.setAutoCommit(true)
            conn.createStatement().executeUpdate(s"DROP TABLE $tmp")
          } catch { case _: Exception => () }
          throw e
      } finally st.close()
    } finally conn.close()
  }
}
