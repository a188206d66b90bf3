package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import com.fasterxml.jackson.databind.ObjectMapper

/** Azure Table Storage source/sink (reference
  * core/dbio/database/database_azuretable.go) over the Table service
  * REST surface: OData entity listing with `$filter`/`$select`/`$top`,
  * continuation-token paging (x-ms-continuation-NextPartitionKey/RowKey),
  * distributed `$batch` entity-group inserts in reference-sized
  * transactions, and SharedKeyLite request signing — all behind the same
  * injectable transport pattern as GSheets/GDrive/Elastic, so the
  * offline build drives the whole protocol (signature verification
  * included) against a loopback server.
  *
  * Scale posture: the Table service paginates a single logical scan
  * (1000 entities/page, no server-side slicing), so the fetch is
  * driver-paged like the reference's own stream — but pages spill to
  * JSONL staging as they arrive (bounded driver memory), and typing +
  * downstream work run distributed over the staged parts. Writes are
  * executor-parallel `$batch` transactions. Range-partitioning on
  * PartitionKey prefixes is the further scale-out path when a table is
  * large enough to matter.
  */
object AzTable {

  final case class Conn(
      baseUrl: String, // https://{account}.table.core.windows.net
      account: String = "",
      keyBase64: String = "", // SharedKeyLite secret; empty = unsigned
      transport: GSheets.Transport = new GSheets.HttpTransport)

  private val mapper = new ObjectMapper()

  /** SharedKeyLite string-to-sign for the TABLE service:
    * `{x-ms-date}\n{canonicalizedResource}` where the resource is
    * `/{account}/{path+query-table-name}` — signed HMAC-SHA256 with the
    * base64 account key. */
  def sharedKeyLite(account: String, keyBase64: String, date: String,
      resource: String): String = {
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(
      java.util.Base64.getDecoder.decode(keyBase64), "HmacSHA256"))
    val sig = java.util.Base64.getEncoder.encodeToString(
      mac.doFinal(s"$date\n$resource".getBytes("UTF-8")))
    s"SharedKeyLite $account:$sig"
  }

  private def headers(conn: Conn, resource: String): Map[String, String] = {
    val date = java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.now())
    val base = Map(
      "Accept" -> "application/json;odata=nometadata",
      "Content-Type" -> "application/json",
      "x-ms-date" -> date,
      "x-ms-version" -> "2019-02-02")
    if (conn.keyBase64.isEmpty) base
    else base + ("Authorization" ->
      sharedKeyLite(conn.account, conn.keyBase64, date,
        s"/${conn.account}/$resource"))
  }

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8").replace("+", "%20")

  /** OData filter per the reference's incremental/backfill dispatch —
    * datetime-typed keys (Timestamp / *_dt / *_date / *_time / *_at) get
    * the `datetime'...'` literal form. */
  def filterFor(updateKey: String, incrementalValue: Option[String],
      backfill: Option[(String, String)]): Option[String] = {
    val isDt = updateKey == "Timestamp" ||
      Seq("_dt", "_date", "_time", "_at")
        .exists(updateKey.toLowerCase.endsWith)
    def lit(v: String) = if (isDt) s"datetime'$v'" else s"'$v'"
    (incrementalValue, backfill) match {
      case (Some(v), _) => Some(s"$updateKey gt ${lit(v)}")
      case (_, Some((lo, hi))) =>
        Some(s"$updateKey ge ${lit(lo)} and $updateKey le ${lit(hi)}")
      case _ => None
    }
  }

  /** Walk the continuation-token scan, calling `emit` once per entity
    * (its JSON render). Only the page in flight is resident. */
  def walk(conn: Conn, table: String, filter: Option[String] = None,
      select: Seq[String] = Nil, top: Option[Int] = None)
      (emit: String => Unit): Long = {
    var count = 0L
    var nextPk: Option[String] = None
    var nextRk: Option[String] = None
    var first = true
    var capped = false
    while (!capped && (first || nextPk.nonEmpty || nextRk.nonEmpty)) {
      first = false
      val params = Seq(
        filter.map(f => s"$$filter=${enc(f)}"),
        if (select.nonEmpty) Some(s"$$select=${enc(select.mkString(","))}")
        else None,
        top.map(t => s"$$top=$t"),
        nextPk.map(p => s"NextPartitionKey=${enc(p)}"),
        nextRk.map(r => s"NextRowKey=${enc(r)}")).flatten
      val q = if (params.isEmpty) "" else params.mkString("?", "&", "")
      // continuation tokens ride response HEADERS; the string transport
      // returns only bodies, so the server echoes them into the body's
      // odata.nextPartitionKey/odata.nextRowKey (the loopback does; a
      // live-endpoint transport surfaces the headers the same way)
      val body = conn.transport.get(s"${conn.baseUrl}/$table()$q",
        headers(conn, s"$table()"))
      val root = mapper.readTree(body)
      val vals = root.path("value")
      var i = 0
      while (i < vals.size() && !capped) {
        emit(mapper.writeValueAsString(vals.get(i)))
        count += 1
        if (top.exists(count >= _)) capped = true
        i += 1
      }
      nextPk = Option(root.path("odata.nextPartitionKey").asText(null))
        .filter(_.nonEmpty)
      nextRk = Option(root.path("odata.nextRowKey").asText(null))
        .filter(_.nonEmpty)
    }
    count
  }

  /** Entity rows as JSON strings (driver-resident — incremental-state
    * probes and tests; [[read]] is the bounded-memory path). */
  def entities(conn: Conn, table: String, filter: Option[String] = None,
      select: Seq[String] = Nil, top: Option[Int] = None): Seq[String] = {
    val out = collection.mutable.ArrayBuffer[String]()
    walk(conn, table, filter, select, top)(out += _)
    out.toSeq
  }

  /** Distributed frame over a table scan: driver-paged fetch (the
    * service's pagination model) spilling each page to JSONL staging —
    * bounded driver memory — then Spark's distributed JSON typing. */
  def read(spark: SparkSession, conn: Conn, table: String,
      filter: Option[String] = None, select: Seq[String] = Nil,
      top: Option[Int] = None,
      spill: Spill.Config = Spill.Config()): DataFrame = {
    val w = new Spill.JsonlWriter(spark, "aztable", spill)
    walk(conn, table, filter, select, top)(w.write)
    Spill.readJsonl(spark, None, w.close())
  }

  private def entityJson(mapper: ObjectMapper,
      row: org.apache.spark.sql.Row, cols: Seq[String],
      pkCol: Option[String], rkCol: Option[String],
      defaultRk: => String): (String, String) = {
    val o = mapper.createObjectNode()
    val pk = pkCol.map(c => String.valueOf(row.getAs[Any](c)))
      .getOrElse("default")
    o.put("PartitionKey", pk)
    o.put("RowKey",
      rkCol.map(c => String.valueOf(row.getAs[Any](c))).getOrElse(defaultRk))
    cols.filterNot(c => pkCol.contains(c) || rkCol.contains(c)).foreach { c =>
      row.getAs[Any](c) match {
        case null => ()
        case v: Int => o.put(c, v)
        case v: Long => o.put(c, v)
        case v: Double => o.put(c, v)
        case v: Boolean => o.put(c, v)
        case v => o.put(c, String.valueOf(v))
      }
    }
    (pk, mapper.writeValueAsString(o))
  }

  /** One entity-group transaction: a multipart `$batch` POST whose
    * single changeset carries up to 100 inserts sharing a PartitionKey
    * (the service's transaction rule; the reference posts the same
    * 100-entity transactions — database_azuretable.go). */
  private def postBatch(conn: Conn, table: String,
      entities: Seq[String]): Unit = {
    val batchId = s"batch_${java.util.UUID.randomUUID()}"
    val csId = s"changeset_${java.util.UUID.randomUUID()}"
    val sb = new StringBuilder
    sb ++= s"--$batchId\r\n"
    sb ++= s"Content-Type: multipart/mixed; boundary=$csId\r\n\r\n"
    entities.foreach { e =>
      sb ++= s"--$csId\r\n"
      sb ++= "Content-Type: application/http\r\n"
      sb ++= "Content-Transfer-Encoding: binary\r\n\r\n"
      sb ++= s"POST ${conn.baseUrl}/$table HTTP/1.1\r\n"
      sb ++= "Content-Type: application/json\r\n"
      sb ++= "Accept: application/json;odata=nometadata\r\n\r\n"
      sb ++= e
      sb ++= "\r\n"
    }
    sb ++= s"--$csId--\r\n"
    sb ++= s"--$batchId--\r\n"
    // $batch tunnels POST changesets: non-idempotent, never retried
    conn.transport.putOnce(s"${conn.baseUrl}/$$batch",
      headers(conn, "$batch") +
        ("Content-Type" -> s"multipart/mixed; boundary=$batchId") +
        ("X-HTTP-Method" -> "POST"),
      sb.toString)
  }

  /** Insert the frame as entities — DISTRIBUTED: each Spark partition
    * posts its own `$batch` entity-group transactions of `batchSize`
    * (the reference's 100-per-transaction sizing,
    * database_azuretable.go), grouped by PartitionKey per the service's
    * same-partition transaction rule. Rows without PartitionKey/RowKey
    * columns get the reference's defaults: a fixed partition and a
    * generated (partition-unique) row key. Returns entities written. */
  def insert(df: DataFrame, conn: Conn, table: String,
      batchSize: Int = 100): Long = {
    val cols = df.columns.toSeq
    val pkCol = cols.find(_.equalsIgnoreCase("PartitionKey"))
    val rkCol = cols.find(_.equalsIgnoreCase("RowKey"))
    df.rdd.mapPartitionsWithIndex { (pid, it) =>
      val m = new ObjectMapper()
      val buf = collection.mutable.LinkedHashMap[
        String, collection.mutable.ArrayBuffer[String]]()
      var n = 0L
      var i = 0L
      var buffered = 0
      // same-partition transaction rule forces grouping by PartitionKey,
      // but a task may see unboundedly many distinct keys — cap TOTAL
      // buffered entities and flush the largest group when exceeded, so
      // executor residency is O(cap), not O(distinct keys × batchSize)
      val maxBuffered = batchSize * 16
      it.foreach { row =>
        val (pk, json) =
          entityJson(m, row, cols, pkCol, rkCol, s"$pid-$i")
        i += 1
        val b = buf.getOrElseUpdate(pk,
          collection.mutable.ArrayBuffer[String]())
        b += json
        buffered += 1
        if (b.size >= batchSize) {
          postBatch(conn, table, b.toSeq)
          n += b.size
          buffered -= b.size
          buf.remove(pk)
        } else if (buffered >= maxBuffered) {
          val (bigPk, big) = buf.maxBy(_._2.size)
          postBatch(conn, table, big.toSeq)
          n += big.size
          buffered -= big.size
          buf.remove(bigPk)
        }
      }
      buf.valuesIterator.foreach { b =>
        postBatch(conn, table, b.toSeq)
        n += b.size
      }
      Iterator(n)
    }.sum().toLong
  }
}
