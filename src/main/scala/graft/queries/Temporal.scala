package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, ChunkedRead}
import graft.sources.Tables
import graft.streaming.EventStream

/** Temporal operators: as-of join, structured-streaming windowed aggregation,
  * sessionization, and range-chunked scans.
  */
object Temporal {

  private def scratch(name: String, sfDir: String): String =
    Scratch.dir(name, sfDir)

  def queries: Seq[Q] = Seq(

    // as-of join: each event gets the customer's latest order as of the
    // event time; right side deduped to one row per (custkey, orderdate) so
    // the "latest" row is well-defined in both engines
    Q("t_asof_join",
      (s, dir) => {
        val e = Tables(s, dir, "events")
          .select("event_id", "user_id", "ts")
        val rw = Window.partitionBy(col("o_custkey"), col("o_orderdate"))
          .orderBy(col("o_orderkey").desc)
        val o = Tables(s, dir, "orders")
          .withColumn("__rn", row_number().over(rw)).filter(col("__rn") === 1)
          .select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
        AsOfJoin.leftAsOf(e, o, "user_id", "o_custkey", "ts", "o_orderdate")
          .orderBy("event_id")
      },
      Some("""WITH r AS (SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
          ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
            ORDER BY o_orderkey DESC) rn FROM orders)
        SELECT e.event_id, e.user_id, e.ts, r.o_orderkey, r.o_totalprice,
          r.o_orderdate AS asof_o_orderdate
        FROM events e ASOF LEFT JOIN (SELECT * FROM r WHERE rn = 1) r
          ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate
        ORDER BY event_id""")),

    Q("t_stream_window",
      (s, dir) => {
        val path = scratch("stream_events", dir)
        Tables(s, dir, "events").write.mode("overwrite").parquet(path)
        EventStream.windowedAgg(s, path, "t_stream_window_sink")
          .orderBy("window_start", "event_type")
      },
      Some("""SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
        event_type, COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""")),

    // true-streaming sessionization: flatMapGroupsWithState carries
    // per-user (last ts, session count) across batches; per-user summary
    // must equal the batch window-function sessionization
    Q("t_stream_sessionize",
      (s, dir) => {
        val path = scratch("stream_sess_events", dir)
        Tables(s, dir, "events").write.mode("overwrite").parquet(path)
        EventStream.streamingSessionize(s, path, "t_stream_sess_sink",
            gapMinutes = 30)
          .orderBy("user_id")
      },
      Some("""WITH g AS (SELECT user_id, ts, event_id,
          CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
              (PARTITION BY user_id ORDER BY ts, event_id) > 30*60*1000000
            OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
          THEN 1 ELSE 0 END AS new_s
          FROM events)
        SELECT user_id, CAST(SUM(new_s) AS BIGINT) AS n_sessions,
          COUNT(*) AS n_events
        FROM g GROUP BY user_id ORDER BY user_id""")),

    // streaming dedup with watermark-bounded state over an at-least-once
    // (self-unioned) stream; output = each event exactly once
    Q("t_stream_dedup",
      (s, dir) => {
        val path = scratch("stream_dedup_events", dir)
        Tables(s, dir, "events").write.mode("overwrite").parquet(path)
        EventStream.streamingDedup(s, path, "t_stream_dedup_sink")
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id, event_type, value
        FROM events ORDER BY event_id""")),

    Q("t_sessionize",
      (s, dir) => EventStream.sessionize(Tables(s, dir, "events"), gapMinutes = 30)
        .select("event_id", "user_id", "ts", "session_num")
        .orderBy("event_id"),
      Some("""WITH g AS (SELECT event_id, user_id, ts,
          CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
              (PARTITION BY user_id ORDER BY ts, event_id) > 30*60*1000000
            OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
          THEN 1 ELSE 0 END AS new_session
        FROM events)
        SELECT event_id, user_id, ts,
          CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_num
        FROM g ORDER BY event_id""")),

    Q("t_chunked_read",
      (s, dir) => ChunkedRead.unionAll(Tables(s, dir, "lineitem"), "l_orderkey", 8)
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"), col("l_shipdate"), col("l_partkey"),
          col("l_suppkey"), col("l_discount"), col("l_tax"),
          col("l_returnflag"), col("l_linestatus")),
      Some("""SELECT * FROM lineitem ORDER BY l_orderkey, l_linenumber,
        l_quantity, l_extendedprice, l_shipdate, l_partkey, l_suppkey,
        l_discount, l_tax, l_returnflag, l_linestatus""")),

    // expression chunking (chunk_expr/chunk_count, ref r.20.chunking.expr):
    // hash-mod-style buckets; the tagged union proves every row lands in
    // exactly one chunk with the declared bucket value
    Q("t_chunked_expr",
      (s, dir) => {
        val c = Tables(s, dir, "customer")
        ChunkedRead.byExpr(c, "c_custkey % 4", 4).zipWithIndex
          .map { case (d, i) => d.withColumn("chunk", lit(i).cast("long")) }
          .reduce(_.unionByName(_))
          .orderBy("c_custkey")
      },
      Some("""SELECT *, c_custkey % 4 AS chunk FROM customer
        ORDER BY c_custkey"""))
  )
}
