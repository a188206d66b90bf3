package graft.sources

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import Cql._

/** In-process CQL native-protocol v4 server — the offline stand-in for a
  * live ScyllaDB/Cassandra node, like [[LoopbackMongo]] for mongod.
  * Speaks STARTUP/READY and QUERY/RESULT with paging, and implements the
  * statement subset the [[Cql]] client issues: `SELECT * FROM t` with an
  * optional `token(pk) > lo AND token(pk) <= hi` range and `LIMIT`,
  * bound-value `INSERT` (upsert by the declared partition key), and
  * `TRUNCATE`. The token function is a deterministic in-process hash —
  * the client never computes tokens, it only splits the int64 ring, so
  * any full-range hash exercises the same range-covering contract a
  * Murmur3 ring does. Test/fixture harness — not a database.
  */
final class LoopbackCql(user: String = "", password: String = "")
  extends AutoCloseable {

  /** (keyspace, table) → (column specs, partition-key names, rows by pk). */
  private final case class Table(cols: Seq[(String, CqlType)], pk: Seq[String],
      rows: scala.collection.concurrent.TrieMap[Seq[Any], Seq[Any]]) {
    // ring-ordered snapshot with its token array, recomputed only when
    // the row set changes. The tokens are kept alongside the rows so a
    // range select binary-searches its bounds instead of re-hashing all
    // n rows per select — at the 16M probe step the per-select full scan
    // (and a per-select full sort before it) blew past the client's
    // 120 s read timeout.
    @volatile private var sortedCache
        : (Int, Array[Long], Array[Seq[Any]]) = (-1, Array.empty, Array.empty)
    def sortedSnapshot(tokenOf: Seq[Any] => Long,
        pkOf: Seq[Any] => Seq[Any]): (Array[Long], Array[Seq[Any]]) = {
      val size = rows.size
      val cached = sortedCache
      if (cached._1 == size) (cached._2, cached._3)
      else {
        val pairs = rows.values.iterator
          .map(r => (tokenOf(pkOf(r)), r)).toArray
        java.util.Arrays.sort(pairs,
          Ordering.by[(Long, Seq[Any]), Long](_._1))
        val toks = pairs.map(_._1)
        val rws = pairs.map(_._2)
        sortedCache = (size, toks, rws)
        (toks, rws)
      }
    }
  }
  private val tables = new ConcurrentHashMap[(String, String), Table]()
  // paging cursors: id-bytes → remaining rows
  private val cursors = new ConcurrentHashMap[Long, (Table, Seq[Seq[Any]])]()
  private val nextCursor = new AtomicLong(100L)
  @volatile private var selectCount = 0L

  def define(keyspace: String, table: String, cols: Seq[(String, CqlType)],
      pk: Seq[String]): Unit =
    tables.put((keyspace, table),
      Table(cols, pk, scala.collection.concurrent.TrieMap.empty))

  def load(keyspace: String, table: String, rows: Seq[Seq[Any]]): Unit = {
    val t = tables.get((keyspace, table))
    rows.foreach(r => t.rows.put(pkOf(t, r), r))
  }

  def rowsOf(keyspace: String, table: String): Seq[Seq[Any]] =
    Option(tables.get((keyspace, table)))
      .map(_.rows.values.toSeq).getOrElse(Nil)

  /** SELECT statements served (instrumentation). */
  def selects: Long = selectCount

  private def pkOf(t: Table, row: Seq[Any]): Seq[Any] =
    t.pk.map(k => row(t.cols.indexWhere(_._1 == k)))

  /** Deterministic full-range token for a pk tuple. */
  private def tokenOf(pk: Seq[Any]): Long = {
    val h = pk.map {
      case b: Array[Byte] => java.util.Arrays.hashCode(b)
      case v => if (v == null) 0 else v.hashCode
    }.foldLeft(1469598103934665603L)((acc, x) =>
      (acc ^ x) * 1099511628211L)
    h
  }

  private val server = new java.net.ServerSocket(
    0, 50, java.net.InetAddress.getLoopbackAddress)
  def port: Int = server.getLocalPort

  private val acceptor = new Thread(() => {
    try while (!server.isClosed) {
      val sock = server.accept()
      val t = new Thread(() => serve(sock), "loopback-cql-conn")
      t.setDaemon(true)
      t.start()
    } catch { case _: Throwable => () }
  }, "loopback-cql-accept")
  acceptor.setDaemon(true)
  acceptor.start()

  /** Probe hygiene: free fixture rows even while lingering serve
    * threads pin this instance. */
  def clear(): Unit = {
    import scala.jdk.CollectionConverters._
    // fresh Table per entry: clearing rows alone would leave the sorted
    // snapshot arrays cached on the old instance
    tables.keySet.asScala.toSeq.foreach { k =>
      val t = tables.get(k)
      tables.put(k, Table(t.cols, t.pk,
        scala.collection.concurrent.TrieMap.empty))
    }
  }

  override def close(): Unit = server.close()

  // ---- wire ----

  private def serve(sock: java.net.Socket): Unit = {
    val in = new java.io.DataInputStream(
      new java.io.BufferedInputStream(sock.getInputStream))
    val out = new java.io.BufferedOutputStream(sock.getOutputStream)
    var authed = false // per-connection PasswordAuthenticator state
    def reply(stream: Short, opcode: Int, body: Array[Byte]): Unit = {
      val head = ByteBuffer.allocate(9)
      head.put(0x84.toByte).put(0.toByte).putShort(stream)
        .put(opcode.toByte).putInt(body.length)
      out.write(head.array()); out.write(body); out.flush()
    }
    try while (true) {
      val hdr = new Array[Byte](9)
      in.readFully(hdr)
      val hb = ByteBuffer.wrap(hdr)
      hb.get() // version 0x04
      hb.get() // flags
      val stream = hb.getShort
      val opcode = hb.get() & 0xff
      val len = hb.getInt
      val body = new Array[Byte](len)
      in.readFully(body)
      opcode match {
        case 0x01 => // STARTUP → READY, or AUTHENTICATE when configured
          if (password.isEmpty) reply(stream, 0x02, Array.empty)
          else {
            val o = new java.io.ByteArrayOutputStream()
            Cql.writeString(o,
              "org.apache.cassandra.auth.PasswordAuthenticator")
            reply(stream, 0x0e, o.toByteArray)
          }
        case 0x0f => // AUTH_RESPONSE: SASL PLAIN \0user\0pass
          val bb = ByteBuffer.wrap(body)
          val n = bb.getInt
          val tok = new Array[Byte](n); bb.get(tok)
          val parts = new String(tok, java.nio.charset.StandardCharsets.UTF_8)
            .split("\u0000", -1)
          if (parts.length == 3 && parts(1) == user && parts(2) == password) {
            authed = true
            // AUTH_SUCCESS with a null token
            reply(stream, 0x10,
              ByteBuffer.allocate(4).putInt(-1).array())
          } else {
            val o = new java.io.ByteArrayOutputStream()
            o.write(ByteBuffer.allocate(4).putInt(0x0100).array(), 0, 4)
            Cql.writeString(o, "Provided username/password are incorrect")
            reply(stream, 0x00, o.toByteArray)
          }
        case 0x05 => // OPTIONS → SUPPORTED (empty multimap)
          reply(stream, 0x06, Array[Byte](0, 0))
        case 0x07 if password.nonEmpty && !authed =>
          val o = new java.io.ByteArrayOutputStream()
          o.write(ByteBuffer.allocate(4).putInt(0x0100).array(), 0, 4)
          Cql.writeString(o, "not authenticated")
          reply(stream, 0x00, o.toByteArray)
        case 0x07 =>
          try reply(stream, 0x08, runQuery(ByteBuffer.wrap(body)))
          catch {
            case e: Exception =>
              val o = new java.io.ByteArrayOutputStream()
              o.write(ByteBuffer.allocate(4).putInt(0x2200).array(), 0, 4)
              Cql.writeString(o, String.valueOf(e.getMessage))
              reply(stream, 0x00, o.toByteArray)
          }
        case other =>
          val o = new java.io.ByteArrayOutputStream()
          o.write(ByteBuffer.allocate(4).putInt(0x000a).array(), 0, 4)
          Cql.writeString(o, s"unsupported opcode $other")
          reply(stream, 0x00, o.toByteArray)
      }
    } catch { case _: java.io.IOException => () }
    finally sock.close()
  }

  // ---- QUERY execution ----

  private def runQuery(buf: ByteBuffer): Array[Byte] = {
    val cqlLen = buf.getInt
    val cqlBytes = new Array[Byte](cqlLen); buf.get(cqlBytes)
    val cql = new String(cqlBytes, UTF_8).trim
    buf.getShort // consistency
    val flags = buf.get() & 0xff
    val values: Seq[Array[Byte]] =
      if ((flags & 0x01) != 0) {
        val n = buf.getShort & 0xffff
        (0 until n).map(_ => Cql.readBytes(buf))
      } else Nil
    val pageSize = if ((flags & 0x04) != 0) buf.getInt else Int.MaxValue
    val pagingState =
      if ((flags & 0x08) != 0) Option(Cql.readBytes(buf)) else None

    val lower = cql.toLowerCase
    if (lower.startsWith("select")) runSelect(cql, pageSize, pagingState)
    else if (lower.startsWith("insert")) runInsert(cql, values)
    else if (lower.startsWith("truncate")) {
      val name = cql.split("\\s+").last
      val t = resolve(name)
      t.rows.clear()
      voidResult()
    }
    else throw new IllegalArgumentException(s"unsupported statement: $cql")
  }

  private def resolve(name: String): Table = {
    val parts = name.split("\\.", 2)
    val key =
      if (parts.length == 2) (parts(0), parts(1))
      else tables.keySet().stream().filter(_._2 == name).findFirst()
        .orElseThrow(() => new IllegalArgumentException(s"no table $name"))
    Option(tables.get(key)).getOrElse(
      throw new IllegalArgumentException(s"no table $name"))
  }

  private val FromRe = "(?is)^select\\s+\\*\\s+from\\s+([\\w.]+)".r
  private val LimitRe = "(?is)\\s+limit\\s+(\\d+)\\s*$".r
  private val TokenRangeRe =
    ("(?is)where\\s+token\\(([^)]+)\\)\\s*(>=|>)\\s*(-?\\d+)\\s+and\\s+" +
      "token\\([^)]+\\)\\s*<=\\s*(-?\\d+)").r

  private def runSelect(cql: String, pageSize: Int,
      pagingState: Option[Array[Byte]]): Array[Byte] = {
    selectCount += 1
    pagingState match {
      case Some(ps) => // continuation: drain the cursor
        val id = ByteBuffer.wrap(ps).getLong
        val (t, rest) = Option(cursors.remove(id)).getOrElse(
          throw new IllegalArgumentException(s"no cursor $id"))
        rowsResult(t, rest, pageSize)
      case None =>
        val name = FromRe.findFirstMatchIn(cql).map(_.group(1)).getOrElse(
          throw new IllegalArgumentException(s"unsupported select: $cql"))
        val limit = LimitRe.findFirstMatchIn(cql).map(_.group(1).toInt)
        val tail = LimitRe.replaceFirstIn(
          cql.substring(FromRe.findFirstMatchIn(cql).get.end), "").trim
        val t = resolve(name)
        // ring order, stable paging; token bounds binary-search the
        // cached snapshot (O(log n + k) per range select)
        val (toks, all) = t.sortedSnapshot(tokenOf, pkOf(t, _))
        var rows: Seq[Seq[Any]] = scala.collection.immutable.ArraySeq
          .unsafeWrapArray(all)
        if (tail.nonEmpty) TokenRangeRe.findFirstMatchIn(tail) match {
          case Some(m) =>
            val (op, lo, hi) =
              (m.group(2), m.group(3).toLong, m.group(4).toLong)
            // first index with token satisfying the lower bound
            def lowerIdx(bound: Long, inclusive: Boolean): Int = {
              var a = 0; var b = toks.length
              while (a < b) {
                val mid = (a + b) >>> 1
                val ok = if (inclusive) toks(mid) >= bound
                  else toks(mid) > bound
                if (ok) b = mid else a = mid + 1
              }
              a
            }
            val from = lowerIdx(lo, op == ">=")
            val until = lowerIdx(hi, inclusive = false) // tk <= hi
            rows = scala.collection.immutable.ArraySeq
              .unsafeWrapArray(java.util.Arrays.copyOfRange(
                all.asInstanceOf[Array[AnyRef]], from, math.max(from, until))
                .asInstanceOf[Array[Seq[Any]]])
          case None =>
            throw new IllegalArgumentException(s"unsupported where: $tail")
        }
        limit.foreach(l => rows = rows.take(l))
        rowsResult(t, rows, pageSize)
    }
  }

  private val InsertRe =
    "(?is)insert\\s+into\\s+([\\w.]+)\\s*\\(([^)]*)\\)\\s*values\\s*\\(([^)]*)\\)\\s*".r

  private def runInsert(cql: String, values: Seq[Array[Byte]]): Array[Byte] =
    cql match {
      case InsertRe(name, colList, placeholders) =>
        require(placeholders.split(",").forall(_.trim == "?"),
          "only bound-value inserts supported")
        val t = resolve(name)
        val names = colList.split(",").map(_.trim).toSeq
        val typeOf = t.cols.toMap
        val row = t.cols.map { case (cn, _) =>
          val i = names.indexOf(cn)
          if (i < 0) null
          else Cql.decodeValue(values(i), typeOf(cn))
        }
        t.rows.put(pkOf(t, row), row) // INSERT is an upsert by pk
        voidResult()
      case _ => throw new IllegalArgumentException(s"unsupported insert: $cql")
    }

  // ---- RESULT encoding ----

  private def voidResult(): Array[Byte] =
    ByteBuffer.allocate(4).putInt(1).array()

  private def writeType(o: java.io.ByteArrayOutputStream, t: CqlType): Unit = {
    val id = Cql.typeId(t)
    o.write((id >> 8) & 0xff); o.write(id & 0xff)
    t match {
      case TList(e) => writeType(o, e)
      case TSet(e) => writeType(o, e)
      case TMap(k, v) => writeType(o, k); writeType(o, v)
      case _ => ()
    }
  }

  private def rowsResult(t: Table, rows: Seq[Seq[Any]],
      pageSize: Int): Array[Byte] = {
    val (page, rest) = rows.splitAt(pageSize.max(1))
    val o = new java.io.ByteArrayOutputStream()
    o.write(ByteBuffer.allocate(4).putInt(2).array(), 0, 4) // kind Rows
    val hasMore = rest.nonEmpty
    val flags = 0x01 | (if (hasMore) 0x02 else 0)
    o.write(ByteBuffer.allocate(4).putInt(flags).array(), 0, 4)
    o.write(ByteBuffer.allocate(4).putInt(t.cols.size).array(), 0, 4)
    if (hasMore) {
      val id = nextCursor.incrementAndGet()
      cursors.put(id, (t, rest))
      Cql.writeBytes(o, ByteBuffer.allocate(8).putLong(id).array())
    }
    Cql.writeString(o, "ks"); Cql.writeString(o, "t") // global table spec
    t.cols.foreach { case (n, ct) => Cql.writeString(o, n); writeType(o, ct) }
    o.write(ByteBuffer.allocate(4).putInt(page.size).array(), 0, 4)
    page.foreach { r =>
      r.zip(t.cols).foreach { case (v, (_, ct)) =>
        Cql.writeBytes(o, Cql.encodeValue(v, ct))
      }
    }
    o.toByteArray
  }
}
