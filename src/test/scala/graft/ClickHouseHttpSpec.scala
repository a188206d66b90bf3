package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ClickHouseHttp

/** ClickHouse HTTP interface over a loopback server: JSONEachRow reads,
  * chunked INSERT bodies, header auth, error surfaces. */
class ClickHouseHttpSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private class FakeCh {
    val inserts = collection.mutable.ArrayBuffer[String]()
    var seenUser = ""
    val rows = collection.mutable.ArrayBuffer[String](
      """{"id":1,"name":"a","v":1.5}""",
      """{"id":2,"name":"b","v":2.5}""",
      """{"id":3,"name":null,"v":3.5}""")
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      try {
        seenUser = Option(
          ex.getRequestHeaders.getFirst("X-ClickHouse-User")).getOrElse("")
        val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
        val resp: String =
          if (body.startsWith("INSERT INTO")) {
            inserts += body
            body.split("\n").drop(1).filter(_.nonEmpty).foreach(rows += _)
            ""
          } else if (body.contains("boom"))
            throw new RuntimeException("fail below") // 500 path via catch
          else rows.mkString("\n") + "\n"
        val bytes = resp.getBytes("UTF-8")
        ex.sendResponseHeaders(200, bytes.length.toLong)
        ex.getResponseBody.write(bytes)
      } catch {
        case _: RuntimeException =>
          val err = "Code: 62. DB::Exception: Syntax error".getBytes("UTF-8")
          ex.sendResponseHeaders(400, err.length.toLong)
          ex.getResponseBody.write(err)
          ex.close()
      } finally ex.close()
    })
    server.start()
    def conn: ClickHouseHttp.Conn = ClickHouseHttp.Conn(
      s"http://127.0.0.1:${server.getAddress.getPort}", user = "etl")
    def stop(): Unit = server.stop(0)
  }

  test("JSONEachRow read types rows; auth header sent") {
    val fake = new FakeCh
    try {
      val df = ClickHouseHttp.read(spark, fake.conn, "SELECT * FROM t")
      assert(df.count() == 3)
      assert(df.schema("id").dataType == org.apache.spark.sql.types.LongType)
      assert(df.schema("v").dataType == org.apache.spark.sql.types.DoubleType)
      assert(fake.seenUser == "etl")
    } finally fake.stop()
  }

  test("insert streams chunked JSONEachRow bodies and rows round-trip") {
    import spark.implicits._
    val fake = new FakeCh
    try {
      val add = Seq((10L, "x", 0.5), (11L, "y", 0.75))
        .toDF("id", "name", "v")
      val n = ClickHouseHttp.insert(add, fake.conn, "t", chunkRows = 1)
      assert(n == 2)
      assert(fake.inserts.size == 2, "chunkRows=1 must flush per row")
      assert(fake.inserts.forall(_.startsWith(
        "INSERT INTO t FORMAT JSONEachRow\n")))
      val back = ClickHouseHttp.read(spark, fake.conn, "SELECT * FROM t")
      assert(back.count() == 5)
    } finally fake.stop()
  }

  test("engine errors surface with clickhouse's message") {
    val fake = new FakeCh
    try {
      val e = intercept[java.sql.SQLException] {
        ClickHouseHttp.read(spark, fake.conn, "SELECT boom FROM")
      }
      assert(e.getMessage.contains("DB::Exception"))
    } finally fake.stop()
  }
}
