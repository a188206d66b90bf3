package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** ScyllaDB / Cassandra source-sink over the CQL native protocol v4 (the
  * public binary protocol; the reference drives Scylla through the gocql
  * driver, `core/dbio/database/database_scylladb.go:52-190`).
  *
  * Spark-first shape: parallel reads split the Murmur3 token ring — each
  * Spark partition issues `SELECT … WHERE token(pk) > lo AND token(pk)
  * <= hi` against its own connection and pages its slice independently
  * (the canonical Cassandra bulk-read pattern; the reference streams a
  * single cursor, `database_scylladb.go:274-340`). Column metadata from
  * a one-row driver probe types the frame EXACTLY (no JSON inference):
  * CQL scalars map onto Spark types; decimal/varint/uuid/inet surface as
  * strings like the reference's row conversion
  * (`database_scylladb.go:318` decimal handling).
  *
  * Writes are per-partition `INSERT` statements with protocol-level
  * bound values — INSERT is an upsert-by-PK in CQL, which is exactly why
  * the reference lists scylla among its upsertByInsert direct-write
  * targets (`core/sling/task_run_write.go:212`).
  *
  * Auth: the AUTHENTICATE challenge is answered with a SASL PLAIN
  * initial response (RFC 4616) — what Cassandra/Scylla's
  * PasswordAuthenticator expects — exercised offline against the
  * loopback server's verifier.
  */
object Cql {

  final case class Conn(host: String, port: Int, keyspace: String,
      user: String = "", password: String = "") extends Serializable

  // opcodes (protocol v4 §2.4)
  private final val OpError = 0x00
  private final val OpStartup = 0x01
  private final val OpReady = 0x02
  private final val OpQuery = 0x07
  private final val OpResult = 0x08
  private final val OpAuthenticate = 0x0e
  private final val OpAuthResponse = 0x0f
  private final val OpAuthSuccess = 0x10

  /** A parsed RESULT: column specs (name, cql type), decoded rows, and
    * the server's paging state when more pages exist. */
  final case class Result(columns: Seq[(String, CqlType)],
      rows: Seq[Seq[Any]], pagingState: Option[Array[Byte]])

  /** CQL wire types (option ids, protocol v4 §6). */
  sealed trait CqlType extends Serializable
  case object TAscii extends CqlType
  case object TBigint extends CqlType
  case object TBlob extends CqlType
  case object TBoolean extends CqlType
  case object TCounter extends CqlType
  case object TDecimal extends CqlType
  case object TDouble extends CqlType
  case object TFloat extends CqlType
  case object TInt extends CqlType
  case object TTimestamp extends CqlType
  case object TUuid extends CqlType
  case object TVarchar extends CqlType
  case object TVarint extends CqlType
  case object TTimeuuid extends CqlType
  case object TInet extends CqlType
  case object TDate extends CqlType
  case object TTime extends CqlType
  case object TSmallint extends CqlType
  case object TTinyint extends CqlType
  final case class TList(elem: CqlType) extends CqlType
  final case class TMap(key: CqlType, value: CqlType) extends CqlType
  final case class TSet(elem: CqlType) extends CqlType

  /** One socket speaking v4 frames. Not thread-safe. */
  final class Client(host: String, port: Int, user: String = "",
      password: String = "") extends AutoCloseable {
    private val socket = new java.net.Socket()
    socket.connect(new java.net.InetSocketAddress(host, port), 10000)
    socket.setSoTimeout(120000)
    private val in = new java.io.DataInputStream(
      new java.io.BufferedInputStream(socket.getInputStream))
    private val out = new java.io.BufferedOutputStream(socket.getOutputStream)
    private var stream: Short = 0

    // STARTUP handshake (§4.1.1): version negotiation + READY
    {
      val body = new java.io.ByteArrayOutputStream()
      writeShort(body, 1)
      writeString(body, "CQL_VERSION"); writeString(body, "3.0.0")
      val (op, resp) = exchange(OpStartup, body.toByteArray)
      if (op == OpAuthenticate) {
        // server names its authenticator (§4.2.3); answer with the SASL
        // PLAIN initial response (RFC 4616: \0authcid\0passwd) — what
        // PasswordAuthenticator expects
        if (password.isEmpty) throw new java.io.IOException(
          "server requires authentication but no credentials configured")
        val token = new java.io.ByteArrayOutputStream()
        token.write(0); token.write(user.getBytes(UTF_8))
        token.write(0); token.write(password.getBytes(UTF_8))
        val ar = new java.io.ByteArrayOutputStream()
        writeBytes(ar, token.toByteArray)
        // a bad-credentials ERROR surfaces from the reply reader itself
        val (op2, _) = exchange(OpAuthResponse, ar.toByteArray)
        require(op2 == OpAuthSuccess || op2 == OpReady,
          s"expected AUTH_SUCCESS, got opcode $op2")
      }
      else require(op == OpReady, s"expected READY, got opcode $op")
    }

    def query(cql: String, pageSize: Int = 5000,
        pagingState: Option[Array[Byte]] = None,
        values: Seq[Array[Byte]] = Nil): Result = {
      val body = new java.io.ByteArrayOutputStream()
      writeLongString(body, cql)
      writeShort(body, 1) // consistency ONE
      var flags = 0x04 // page_size
      if (values.nonEmpty) flags |= 0x01
      if (pagingState.isDefined) flags |= 0x08
      body.write(flags)
      if (values.nonEmpty) {
        writeShort(body, values.size)
        values.foreach(v => writeBytes(body, v))
      }
      writeInt(body, pageSize)
      pagingState.foreach(ps => writeBytes(body, ps))
      val (op, resp) = exchange(OpQuery, body.toByteArray)
      require(op == OpResult, s"expected RESULT, got opcode $op")
      parseResult(resp)
    }

    /** Pipelined inserts: keep up to `window` QUERYs in flight on this
      * connection (distinct stream ids, §2.1.3 — how real drivers get
      * throughput out of one socket) and drain replies as the window
      * fills. Returns rows written; throws on the first server error. */
    def executeMany(statements: Iterator[(String, Seq[Array[Byte]])],
        window: Int = 128): Long = {
      var inFlight = 0
      var n = 0L
      // flush before blocking on a reply — buffered requests the server
      // hasn't seen yet would deadlock the window
      def drainOne(): Unit = { out.flush(); readReply(); inFlight -= 1; n += 1 }
      statements.foreach { case (cql, values) =>
        val body = new java.io.ByteArrayOutputStream()
        writeLongString(body, cql)
        writeShort(body, 1) // consistency ONE
        body.write(0x01) // values flag only
        writeShort(body, values.size)
        values.foreach(v => writeBytes(body, v))
        send(OpQuery, body.toByteArray)
        inFlight += 1
        if (inFlight >= window) drainOne()
      }
      out.flush()
      while (inFlight > 0) drainOne()
      n
    }

    private def send(opcode: Int, body: Array[Byte]): Unit = {
      stream = ((stream + 1) & 0x7fff).toShort
      val head = ByteBuffer.allocate(9)
      head.put(0x04.toByte).put(0.toByte).putShort(stream)
        .put(opcode.toByte).putInt(body.length)
      out.write(head.array()); out.write(body)
    }

    private def readReply(): (Int, ByteBuffer) = {
      val hdr = new Array[Byte](9)
      in.readFully(hdr)
      val hb = ByteBuffer.wrap(hdr)
      val version = hb.get()
      require((version & 0x7f) == 0x04, f"unexpected version 0x$version%02x")
      val op = hb.get(4) & 0xff
      val len = hb.getInt(5)
      val payload = new Array[Byte](len)
      in.readFully(payload)
      val buf = ByteBuffer.wrap(payload)
      if (op == OpError) {
        val code = buf.getInt
        throw new java.io.IOException(
          s"cql error 0x${code.toHexString}: ${readString(buf)}")
      }
      (op, buf)
    }

    private def exchange(opcode: Int, body: Array[Byte]): (Int, ByteBuffer) = {
      send(opcode, body)
      out.flush()
      readReply()
    }

    override def close(): Unit = socket.close()
  }

  // ---- frame primitives (big-endian, §3) ----

  private def writeShort(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write((v >> 8) & 0xff); o.write(v & 0xff)
  }
  private def writeInt(o: java.io.ByteArrayOutputStream, v: Int): Unit =
    o.write(ByteBuffer.allocate(4).putInt(v).array(), 0, 4)
  private[sources] def writeString(o: java.io.ByteArrayOutputStream,
      s: String): Unit = {
    val b = s.getBytes(UTF_8); writeShort(o, b.length); o.write(b, 0, b.length)
  }
  private def writeLongString(o: java.io.ByteArrayOutputStream,
      s: String): Unit = {
    val b = s.getBytes(UTF_8); writeInt(o, b.length); o.write(b, 0, b.length)
  }
  private[sources] def writeBytes(o: java.io.ByteArrayOutputStream,
      b: Array[Byte]): Unit = {
    if (b == null) writeInt(o, -1)
    else { writeInt(o, b.length); o.write(b, 0, b.length) }
  }
  private[sources] def readString(buf: ByteBuffer): String = {
    val len = buf.getShort & 0xffff
    val b = new Array[Byte](len); buf.get(b); new String(b, UTF_8)
  }
  private[sources] def readBytes(buf: ByteBuffer): Array[Byte] = {
    val len = buf.getInt
    if (len < 0) null
    else { val b = new Array[Byte](len); buf.get(b); b }
  }

  // ---- RESULT parsing (§4.2.5) ----

  private[sources] def parseResult(buf: ByteBuffer): Result =
    buf.getInt match {
      case 1 => Result(Nil, Nil, None) // Void
      case 2 =>
        val flags = buf.getInt
        val colCount = buf.getInt
        val paging =
          if ((flags & 0x02) != 0) Option(readBytes(buf)) else None
        val global = (flags & 0x01) != 0
        if (global) { readString(buf); readString(buf) } // keyspace, table
        val cols = (0 until colCount).map { _ =>
          if (!global) { readString(buf); readString(buf) }
          val name = readString(buf)
          (name, readType(buf))
        }
        val rowCount = buf.getInt
        val rows = (0 until rowCount).map { _ =>
          cols.map { case (_, t) => decodeValue(readBytes(buf), t) }
        }
        Result(cols, rows, paging)
      case 3 => readString(buf); Result(Nil, Nil, None) // Set_keyspace
      case other =>
        throw new java.io.IOException(s"unsupported RESULT kind $other")
    }

  private def readType(buf: ByteBuffer): CqlType =
    (buf.getShort & 0xffff) match {
      case 0x0001 => TAscii
      case 0x0002 => TBigint
      case 0x0003 => TBlob
      case 0x0004 => TBoolean
      case 0x0005 => TCounter
      case 0x0006 => TDecimal
      case 0x0007 => TDouble
      case 0x0008 => TFloat
      case 0x0009 => TInt
      case 0x000b => TTimestamp
      case 0x000c => TUuid
      case 0x000d => TVarchar
      case 0x000e => TVarint
      case 0x000f => TTimeuuid
      case 0x0010 => TInet
      case 0x0011 => TDate
      case 0x0012 => TTime
      case 0x0013 => TSmallint
      case 0x0014 => TTinyint
      case 0x0020 => TList(readType(buf))
      case 0x0021 => TMap(readType(buf), readType(buf))
      case 0x0022 => TSet(readType(buf))
      case other => throw new java.io.IOException(
        f"unsupported CQL type 0x$other%04x")
    }

  /** Option id for a type (server-side encoding mirrors readType). */
  private[sources] def typeId(t: CqlType): Int = t match {
    case TAscii => 0x0001; case TBigint => 0x0002; case TBlob => 0x0003
    case TBoolean => 0x0004; case TCounter => 0x0005; case TDecimal => 0x0006
    case TDouble => 0x0007; case TFloat => 0x0008; case TInt => 0x0009
    case TTimestamp => 0x000b; case TUuid => 0x000c; case TVarchar => 0x000d
    case TVarint => 0x000e; case TTimeuuid => 0x000f; case TInet => 0x0010
    case TDate => 0x0011; case TTime => 0x0012; case TSmallint => 0x0013
    case TTinyint => 0x0014
    case TList(_) => 0x0020; case TMap(_, _) => 0x0021; case TSet(_) => 0x0022
  }

  // ---- value codec (§6) ----

  /** Wire bytes → Spark external value. uuid/inet/decimal/varint land as
    * strings (the reference's row shape); others keep native types. */
  private[graft] def decodeValue(b: Array[Byte], t: CqlType): Any = {
    if (b == null) return null
    val buf = ByteBuffer.wrap(b)
    t match {
      case TAscii | TVarchar => new String(b, UTF_8)
      case TBigint | TCounter => buf.getLong
      case TBlob => b
      case TBoolean => b(0) != 0
      case TDecimal =>
        val scale = buf.getInt
        val unscaled = new Array[Byte](b.length - 4); buf.get(unscaled)
        new java.math.BigDecimal(
          new java.math.BigInteger(unscaled), scale).toPlainString
      case TDouble => buf.getDouble
      case TFloat => buf.getFloat
      case TInt => buf.getInt
      case TTimestamp => new java.sql.Timestamp(buf.getLong)
      case TUuid | TTimeuuid =>
        new java.util.UUID(buf.getLong, buf.getLong).toString
      case TVarint => new java.math.BigInteger(b).toString
      case TInet => java.net.InetAddress.getByAddress(b).getHostAddress
      case TDate =>
        // uint32 days with epoch at 2^31
        val days = (buf.getInt.toLong & 0xffffffffL) - 0x80000000L
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(days))
      case TTime => buf.getLong // nanos since midnight
      case TSmallint => buf.getShort
      case TTinyint => b(0)
      case TList(e) => readCollection(buf).map(decodeValue(_, e))
      case TSet(e) => readCollection(buf).map(decodeValue(_, e))
      case TMap(k, v) =>
        val n = buf.getInt
        (0 until n).map { _ =>
          (decodeValue(readBytes(buf), k), decodeValue(readBytes(buf), v))
        }.toMap
    }
  }

  private def readCollection(buf: ByteBuffer): Seq[Array[Byte]] = {
    val n = buf.getInt
    (0 until n).map(_ => readBytes(buf))
  }

  /** Spark external value → wire bytes (insert path + loopback server). */
  private[graft] def encodeValue(v: Any, t: CqlType): Array[Byte] = {
    if (v == null) return null
    def alloc(n: Int) = ByteBuffer.allocate(n)
    t match {
      case TAscii | TVarchar => v.toString.getBytes(UTF_8)
      case TBigint | TCounter =>
        alloc(8).putLong(v.asInstanceOf[Number].longValue).array()
      case TBlob => v.asInstanceOf[Array[Byte]]
      case TBoolean =>
        Array[Byte](if (v.asInstanceOf[Boolean]) 1 else 0)
      case TDecimal =>
        val bd = v match {
          case d: java.math.BigDecimal => d
          case d: scala.math.BigDecimal => d.underlying
          case s: String => new java.math.BigDecimal(s)
          case n: Number => new java.math.BigDecimal(n.toString)
        }
        val unscaled = bd.unscaledValue.toByteArray
        alloc(4 + unscaled.length).putInt(bd.scale).put(unscaled).array()
      case TDouble =>
        alloc(8).putDouble(v.asInstanceOf[Number].doubleValue).array()
      case TFloat =>
        alloc(4).putFloat(v.asInstanceOf[Number].floatValue).array()
      case TInt => alloc(4).putInt(v.asInstanceOf[Number].intValue).array()
      case TTimestamp =>
        val ms = v match {
          case t: java.sql.Timestamp => t.getTime
          case i: java.time.Instant => i.toEpochMilli
          case n: Number => n.longValue
        }
        alloc(8).putLong(ms).array()
      case TUuid | TTimeuuid =>
        val u = java.util.UUID.fromString(v.toString)
        alloc(16).putLong(u.getMostSignificantBits)
          .putLong(u.getLeastSignificantBits).array()
      case TVarint => new java.math.BigInteger(v.toString).toByteArray
      case TInet => java.net.InetAddress.getByName(v.toString).getAddress
      case TDate =>
        val days = v match {
          case d: java.sql.Date => d.toLocalDate.toEpochDay
          case d: java.time.LocalDate => d.toEpochDay
          case s: String => java.time.LocalDate.parse(s).toEpochDay
        }
        alloc(4).putInt((days + 0x80000000L).toInt).array()
      case TTime => alloc(8).putLong(v.asInstanceOf[Number].longValue).array()
      case TSmallint =>
        alloc(2).putShort(v.asInstanceOf[Number].shortValue).array()
      case TTinyint => Array(v.asInstanceOf[Number].byteValue)
      case TList(e) =>
        val items = v.asInstanceOf[Seq[Any]]
        val o = new java.io.ByteArrayOutputStream()
        writeInt(o, items.size)
        items.foreach(x => writeBytes(o, encodeValue(x, e)))
        o.toByteArray
      case TSet(e) => encodeValue(v, TList(e))
      case TMap(k, vt) =>
        val entries = v.asInstanceOf[Map[Any, Any]]
        val o = new java.io.ByteArrayOutputStream()
        writeInt(o, entries.size)
        entries.foreach { case (kk, vv) =>
          writeBytes(o, encodeValue(kk, k)); writeBytes(o, encodeValue(vv, vt))
        }
        o.toByteArray
    }
  }

  /** CQL type → Spark type, matching decodeValue's external values. */
  def sparkType(t: CqlType): DataType = t match {
    case TAscii | TVarchar | TUuid | TTimeuuid | TInet | TDecimal |
        TVarint => StringType
    case TBigint | TCounter | TTime => LongType
    case TBlob => BinaryType
    case TBoolean => BooleanType
    case TDouble => DoubleType
    case TFloat => FloatType
    case TInt => IntegerType
    case TTimestamp => TimestampType
    case TDate => DateType
    case TSmallint => ShortType
    case TTinyint => ByteType
    case TList(e) => ArrayType(sparkType(e))
    case TSet(e) => ArrayType(sparkType(e))
    case TMap(k, v) => MapType(sparkType(k), sparkType(v))
  }

  /** Spark type → CQL type for the insert path. */
  def cqlType(t: DataType): CqlType = t match {
    case StringType => TVarchar
    case LongType => TBigint
    case IntegerType => TInt
    case ShortType => TSmallint
    case ByteType => TTinyint
    case DoubleType => TDouble
    case FloatType => TFloat
    case BooleanType => TBoolean
    case BinaryType => TBlob
    case TimestampType => TTimestamp
    case DateType => TDate
    case _: DecimalType => TDecimal
    case ArrayType(e, _) => TList(cqlType(e))
    case MapType(k, v, _) => TMap(cqlType(k), cqlType(v))
    case other => throw new IllegalArgumentException(
      s"no CQL mapping for Spark type $other")
  }

  // ---- distributed read ----

  /** Page a statement to exhaustion on one connection. */
  private[graft] def drain(client: Client, cql: String,
      pageSize: Int): (Seq[(String, CqlType)], Seq[Seq[Any]]) = {
    var res = client.query(cql, pageSize)
    val cols = res.columns
    val rows = Seq.newBuilder[Seq[Any]]
    rows ++= res.rows
    while (res.pagingState.isDefined) {
      res = client.query(cql, pageSize, res.pagingState)
      rows ++= res.rows
    }
    (cols, rows.result())
  }

  /** Token-range partitioned table read: the Murmur3 ring
    * [-2^63, 2^63-1] splits into `splits` ranges; each Spark partition
    * drains `token(pk) ∈ (lo, hi]` on its own connection. `partitionKey`
    * names the pk column(s) for the token() call; without it (or for
    * SQL-text streams) the read is one paged cursor. A one-row driver
    * probe fixes the schema before the fan-out. */
  def read(spark: SparkSession, conn: Conn, table: String,
      partitionKey: Seq[String] = Nil, splits: Int = 4,
      pageSize: Int = 5000): DataFrame = {
    val isSql = table.matches("(?is)\\s*select\\b[\\s\\S]*")
    val base = if (isSql) table.trim.stripSuffix(";")
      else s"SELECT * FROM ${qualify(conn, table)}"

    // driver schema probe — one row, no data fan-in
    val probeCql =
      if (base.matches("(?is)[\\s\\S]*\\blimit\\s+\\d+\\s*$")) base
      else s"$base LIMIT 1"
    val probe = new Client(conn.host, conn.port, conn.user, conn.password)
    val cols =
      try probe.query(probeCql, 1).columns
      finally probe.close()
    val schema = StructType(cols.map { case (n, t) =>
      StructField(n, sparkType(t)) })
    if (cols.isEmpty) return spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], schema)

    val statements: Seq[String] =
      if (isSql || partitionKey.isEmpty || splits <= 1) Seq(base)
      else {
        val tk = s"token(${partitionKey.mkString(", ")})"
        val span = (BigInt(Long.MaxValue) - BigInt(Long.MinValue)) + 1
        val bounds = (0 to splits).map(i =>
          (BigInt(Long.MinValue) + span * i / splits).toLong)
        (0 until splits).map { i =>
          val loOp = if (i == 0) ">=" else ">"
          val hi = if (i == splits - 1) Long.MaxValue else bounds(i + 1)
          s"$base WHERE $tk $loOp ${bounds(i)} AND $tk <= $hi"
        }
      }

    val rdd = spark.sparkContext
      .parallelize(statements.indices, statements.size)
      .flatMap { i =>
        val c = new Client(conn.host, conn.port, conn.user, conn.password)
        try drain(c, statements(i), pageSize)._2.map(Row.fromSeq)
        finally c.close()
      }
    spark.createDataFrame(rdd, schema)
  }

  /** Distributed upsert-by-PK insert: each partition binds its rows into
    * `INSERT … VALUES (?,…)` on its own connection (the reference's
    * InsertStream shape, `database_scylladb.go:445-525`, fanned out per
    * Spark partition instead of 16 goroutines on one driver). */
  def insert(df: DataFrame, conn: Conn, table: String): Long = {
    val names = df.schema.fields.map(_.name).toSeq
    val types = df.schema.fields.map(f => cqlType(f.dataType)).toSeq
    val cql = s"INSERT INTO ${qualify(conn, table)} (${names.mkString(", ")})" +
      s" VALUES (${names.map(_ => "?").mkString(", ")})"
    df.rdd.mapPartitions { rows =>
      if (rows.isEmpty) Iterator(0L)
      else {
        val c = new Client(conn.host, conn.port, conn.user, conn.password)
        try Iterator(c.executeMany(rows.map { r =>
          (cql, types.indices.map(i => encodeValue(r.get(i), types(i))))
        })) finally c.close()
      }
    }.sum().toLong
  }

  /** Run a statement for its side effect (TRUNCATE, DDL). */
  def execute(conn: Conn, cql: String): Unit = {
    val c = new Client(conn.host, conn.port, conn.user, conn.password)
    try c.query(cql) finally c.close()
  }

  private def qualify(conn: Conn, table: String): String =
    if (table.contains(".") || conn.keyspace.isEmpty) table
    else s"${conn.keyspace}.$table"
}
