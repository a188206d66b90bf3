package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import com.fasterxml.jackson.databind.ObjectMapper

/** Azure Table Storage source/sink (reference
  * core/dbio/database/database_azuretable.go) over the Table service
  * REST surface: OData entity listing with `$filter`/`$select`/`$top`,
  * continuation-token paging (x-ms-continuation-NextPartitionKey/RowKey),
  * per-entity inserts in reference-sized batches, and SharedKeyLite
  * request signing — all behind the same injectable transport pattern as
  * GSheets/GDrive/Elastic, so the offline build drives the whole
  * protocol (signature verification included) against a loopback server.
  *
  * Scale posture: the Table service paginates a single logical scan
  * (1000 entities/page, no server-side slicing), so the fetch is
  * driver-paged like the reference's own stream; rows then type through
  * the shared inference engine and all downstream work is distributed.
  * Range-partitioning on PartitionKey prefixes is the scale-out path
  * when a table is large enough to matter.
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

  /** Entity rows as JSON strings, following continuation tokens until
    * the scan is exhausted. */
  def entities(conn: Conn, table: String, filter: Option[String] = None,
      select: Seq[String] = Nil, top: Option[Int] = None): Seq[String] = {
    val out = collection.mutable.ArrayBuffer[String]()
    var nextPk: Option[String] = None
    var nextRk: Option[String] = None
    var first = true
    while (first || nextPk.nonEmpty || nextRk.nonEmpty) {
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
      (0 until vals.size()).foreach(i =>
        out += mapper.writeValueAsString(vals.get(i)))
      nextPk = Option(root.path("odata.nextPartitionKey").asText(null))
        .filter(_.nonEmpty)
      nextRk = Option(root.path("odata.nextRowKey").asText(null))
        .filter(_.nonEmpty)
      if (top.exists(t => out.size >= t)) { nextPk = None; nextRk = None }
    }
    top.map(t => out.take(t).toSeq).getOrElse(out.toSeq)
  }

  /** Distributed frame over a table scan: driver-paged fetch (the
    * service's pagination model), then Spark's JSON typing. */
  def read(spark: SparkSession, conn: Conn, table: String,
      filter: Option[String] = None, select: Seq[String] = Nil,
      top: Option[Int] = None): DataFrame = {
    import spark.implicits._
    val rows = entities(conn, table, filter, select, top)
    spark.read.json(spark.createDataset(rows))
  }

  /** Insert the frame as entities (POST per entity, the reference's
    * 100-per-transaction batch sizing as the flush unit). Rows without
    * PartitionKey/RowKey columns get the reference's defaults: a fixed
    * partition and a generated row key. Returns entities written. */
  def insert(df: DataFrame, conn: Conn, table: String,
      batchSize: Int = 100): Long = {
    val cols = df.columns.toSeq
    val pkCol = cols.find(_.equalsIgnoreCase("PartitionKey"))
    val rkCol = cols.find(_.equalsIgnoreCase("RowKey"))
    var n = 0L
    val it = df.toLocalIterator()
    while (it.hasNext) {
      val row = it.next()
      val o = mapper.createObjectNode()
      o.put("PartitionKey",
        pkCol.map(c => String.valueOf(row.getAs[Any](c))).getOrElse("default"))
      o.put("RowKey",
        rkCol.map(c => String.valueOf(row.getAs[Any](c))).getOrElse(n.toString))
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
      conn.transport.put(s"${conn.baseUrl}/$table",
        headers(conn, table) + ("X-HTTP-Method" -> "POST"),
        mapper.writeValueAsString(o))
      n += 1
    }
    n
  }
}
