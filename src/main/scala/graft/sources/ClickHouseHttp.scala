package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** ClickHouse source/sink over the HTTP interface (the public REST
  * surface of the engine the reference drives natively;
  * database_clickhouse.go semantics): `POST /` with the SQL body,
  * `FORMAT JSONEachRow` both directions, X-ClickHouse-User/Key auth,
  * database selection via query param.
  *
  * Reads append `FORMAT JSONEachRow` (unless a FORMAT is already
  * declared) and type the NDJSON through distributed JSON inference.
  * Writes stream `INSERT INTO t FORMAT JSONEachRow` bodies in bounded
  * chunks — the same wire shape the reference's bulk path produces.
  * Parallel reads come from the ChunkedRead range pattern (per-chunk
  * WHERE predicates), as with any single-cursor SQL source.
  */
object ClickHouseHttp {

  final case class Conn(baseUrl: String, user: String = "default",
      password: String = "", database: String = "") {
    def headers: Map[String, String] =
      Map("X-ClickHouse-User" -> user) ++
        (if (password.isEmpty) Map.empty
         else Map("X-ClickHouse-Key" -> password))
    def url: String =
      if (database.isEmpty) s"$baseUrl/"
      else s"$baseUrl/?database=${java.net.URLEncoder.encode(database, "UTF-8")}"
  }

  private def post(conn: Conn, body: String): String = {
    val http = new java.net.URI(conn.url).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    http.setRequestMethod("POST")
    http.setConnectTimeout(10000)
    http.setReadTimeout(300000)
    conn.headers.foreach { case (k, v) => http.setRequestProperty(k, v) }
    http.setDoOutput(true)
    val os = http.getOutputStream
    try os.write(body.getBytes("UTF-8")) finally os.close()
    val code = http.getResponseCode
    val is = if (code >= 400) http.getErrorStream else http.getInputStream
    val out = new String(
      Option(is).map(_.readAllBytes()).getOrElse(Array.empty), "UTF-8")
    http.disconnect()
    if (code >= 400)
      throw new java.sql.SQLException(s"clickhouse $code: ${out.take(300)}")
    out
  }

  /** Query → typed frame: JSONEachRow lines through JSON inference. */
  def read(spark: SparkSession, conn: Conn, sql: String): DataFrame = {
    import spark.implicits._
    val q = if (sql.toUpperCase.contains("FORMAT ")) sql.trim
      else s"${sql.trim} FORMAT JSONEachRow"
    val lines = post(conn, q).split("\n").filter(_.nonEmpty).toSeq
    spark.read.json(spark.createDataset(lines))
  }

  /** Frame → `INSERT INTO table FORMAT JSONEachRow` chunks. Rows render
    * via Spark's own JSON writer semantics (toJSON), so types match what
    * a file export would carry. DISTRIBUTED: each Spark partition posts
    * its own bounded chunks (ClickHouse's HTTP interface takes concurrent
    * INSERTs; parts merge server-side) — the earlier driver-side
    * toLocalIterator form funneled the whole frame through one connection.
    * Returns rows written. */
  def insert(df: DataFrame, conn: Conn, table: String,
      chunkRows: Int = 10000): Long =
    df.toJSON.rdd.mapPartitions { it =>
      var n = 0L
      it.grouped(chunkRows).foreach { batch =>
        post(conn, s"INSERT INTO $table FORMAT JSONEachRow\n" +
          batch.mkString("\n") + "\n")
        n += batch.size
      }
      Iterator(n)
    }.sum().toLong

  /** Run a statement for its side effect (TRUNCATE before a
    * full-refresh insert, DDL); returns the raw response body. */
  def execute(conn: Conn, sql: String): String = post(conn, sql)
}
