package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import Bson.BDoc

/** In-process MongoDB server speaking the OP_MSG wire surface the
  * [[Mongo]] client uses — the offline stand-in for a live mongod, like
  * [[LoopbackObjectStore]] for S3-style backends. Implements the command
  * subset the reference's source path exercises
  * (`core/dbio/database/database_mongo.go:316-483`): `hello`, `find`
  * (equality / `$gt $gte $lt $lte $eq $ne $in` / `$and` / `$or` filters,
  * single- or multi-key sort, projection, limit, batched cursors),
  * `getMore`, `killCursors`, `insert`, and `aggregate` with
  * `$match`/`$sort`/`$limit` stages. Test/fixture harness — not a
  * database.
  */
final class LoopbackMongo(user: String = "", password: String = "")
  extends AutoCloseable {

  private val collections =
    new ConcurrentHashMap[(String, String), Vector[BDoc]]()
  // live cursors: id → (collection key, remaining docs)
  private val cursors =
    new ConcurrentHashMap[Long, ((String, String), Vector[BDoc])]()
  private val nextCursorId = new AtomicLong(1000L)
  @volatile private var queryCount = 0L

  def put(db: String, coll: String, docs: Seq[BDoc]): Unit =
    collections.put((db, coll), docs.toVector)
  def docsOf(db: String, coll: String): Vector[BDoc] =
    Option(collections.get((db, coll))).getOrElse(Vector.empty)
  /** find/aggregate commands served (test instrumentation). */
  def queries: Long = queryCount

  private val server = new java.net.ServerSocket(
    0, 50, java.net.InetAddress.getLoopbackAddress)
  def port: Int = server.getLocalPort

  private val acceptor = new Thread(() => {
    try while (!server.isClosed) {
      val sock = server.accept()
      val t = new Thread(() => serve(sock), "loopback-mongo-conn")
      t.setDaemon(true)
      t.start()
    } catch { case _: Throwable => () } // closed
  }, "loopback-mongo-accept")
  acceptor.setDaemon(true)
  acceptor.start()

  /** Probe hygiene: free fixture docs even while lingering serve
    * threads pin this instance (listener close alone doesn't). */
  def clear(): Unit = collections.clear()

  override def close(): Unit = server.close()

  // ---- wire ----

  private def serve(sock: java.net.Socket): Unit = {
    val in = new java.io.DataInputStream(
      new java.io.BufferedInputStream(sock.getInputStream))
    val out = new java.io.BufferedOutputStream(sock.getOutputStream)
    val auth = new ConnAuth // per-connection SCRAM conversation state
    try while (true) {
      val lenBytes = new Array[Byte](4)
      in.readFully(lenBytes)
      val total = ByteBuffer.wrap(lenBytes).order(ByteOrder.LITTLE_ENDIAN).getInt
      val rest = new Array[Byte](total - 4)
      in.readFully(rest)
      val buf = ByteBuffer.wrap(rest).order(ByteOrder.LITTLE_ENDIAN)
      val requestId = buf.getInt
      buf.getInt // responseTo
      val opCode = buf.getInt
      require(opCode == 2013, s"loopback mongo only speaks OP_MSG, got $opCode")
      buf.getInt // flagBits
      val kind = buf.get()
      require(kind == 0, s"only kind-0 sections supported, got $kind")
      val cmd = Bson.readDoc(buf)
      val reply = try dispatch(cmd, auth) catch {
        case e: Exception =>
          BDoc("ok" -> 0.0, "errmsg" -> String.valueOf(e.getMessage),
            "code" -> 1)
      }
      val body = Bson.encode(reply)
      val head = ByteBuffer.allocate(21).order(ByteOrder.LITTLE_ENDIAN)
      head.putInt(21 + body.length).putInt(0).putInt(requestId).putInt(2013)
      head.putInt(0)
      head.put(0.toByte)
      out.write(head.array()); out.write(body); out.flush()
    } catch { case _: java.io.IOException => () } // client closed
    finally sock.close()
  }

  // ---- commands ----

  /** Per-connection SCRAM-SHA-256 verifier state. */
  private final class ConnAuth {
    var session: Scram.ServerSession = _
    var authed: Boolean = false
  }

  private def dispatch(cmd: BDoc, auth: ConnAuth): BDoc = {
    val db = cmd.getString("$db").getOrElse("test")
    def utf8(b: Array[Byte]) =
      new String(b, java.nio.charset.StandardCharsets.UTF_8)
    def payloadOf(c: BDoc): Array[Byte] = c.get("payload").collect {
      case b: Array[Byte] => b
    }.getOrElse(Array.emptyByteArray)
    cmd.fields.headOption.map(_._1) match {
      case Some("hello") | Some("isMaster") | Some("ismaster") =>
        BDoc("helloOk" -> true, "maxWireVersion" -> 17,
          "minWireVersion" -> 0, "ok" -> 1.0)
      case Some("saslStart") =>
        require(cmd.getString("mechanism").contains("SCRAM-SHA-256"),
          "loopback mongod only speaks SCRAM-SHA-256")
        auth.session = new Scram.ServerSession(password)
        val serverFirst = auth.session.serverFirst(utf8(payloadOf(cmd)))
        BDoc("conversationId" -> 1,
          "payload" -> serverFirst.getBytes(
            java.nio.charset.StandardCharsets.UTF_8),
          "done" -> false, "ok" -> 1.0)
      case Some("saslContinue") =>
        val p = payloadOf(cmd)
        if (p.isEmpty) // empty final round
          BDoc("conversationId" -> 1,
            "payload" -> Array.emptyByteArray, "done" -> true, "ok" -> 1.0)
        else {
          require(auth.session != null, "saslContinue without saslStart")
          if (auth.session.username != user)
            throw new IllegalArgumentException("Authentication failed")
          val serverFinal = auth.session.serverFinal(utf8(p)) // throws on bad proof
          auth.authed = true
          BDoc("conversationId" -> 1,
            "payload" -> serverFinal.getBytes(
              java.nio.charset.StandardCharsets.UTF_8),
            "done" -> true, "ok" -> 1.0)
        }
      case Some(op) if password.nonEmpty && !auth.authed &&
          op != "ping" && op != "endSessions" =>
        throw new IllegalArgumentException(
          s"command $op requires authentication")
      case Some("ping") => BDoc("ok" -> 1.0)
      case Some("endSessions") => BDoc("ok" -> 1.0)
      case Some("find") => runFind(db, cmd)
      case Some("getMore") => runGetMore(cmd)
      case Some("killCursors") =>
        cmd.getSeq("cursors").foreach {
          case id: Long => cursors.remove(id)
          case id: Int => cursors.remove(id.toLong)
          case _ => ()
        }
        BDoc("ok" -> 1.0)
      case Some("insert") =>
        val coll = cmd.getString("insert").get
        val docs = cmd.getSeq("documents").collect { case d: BDoc => d }
        collections.merge((db, coll), docs.toVector, (a, b) => a ++ b)
        BDoc("n" -> docs.size, "ok" -> 1.0)
      case Some("drop") =>
        val coll = cmd.getString("drop").get
        if (collections.remove((db, coll)) == null)
          throw new IllegalArgumentException("ns not found")
        BDoc("ok" -> 1.0)
      case Some("aggregate") => runAggregate(db, cmd)
      case other =>
        throw new IllegalArgumentException(s"unsupported command: $other")
    }
  }

  private def batchReply(key: (String, String), docs: Vector[BDoc],
      batchSize: Int, field: String): BDoc = {
    val (page, rest) = docs.splitAt(batchSize.max(1))
    val id =
      if (rest.isEmpty) 0L
      else {
        val cid = nextCursorId.incrementAndGet()
        cursors.put(cid, (key, rest))
        cid
      }
    BDoc("cursor" -> BDoc(
      field -> (page: Seq[Any]),
      "id" -> id,
      "ns" -> s"${key._1}.${key._2}"), "ok" -> 1.0)
  }

  private def runFind(db: String, cmd: BDoc): BDoc = {
    queryCount += 1
    val coll = cmd.getString("find").get
    val filter = cmd.getDoc("filter").getOrElse(BDoc(Nil))
    var docs = docsOf(db, coll).filter(matches(_, filter))
    cmd.getDoc("sort").foreach { s => docs = sorted(docs, s) }
    cmd.getLong("limit").filter(_ > 0).foreach { l => docs = docs.take(l.toInt) }
    cmd.getDoc("projection").foreach { p => docs = docs.map(project(_, p)) }
    val batch = cmd.getLong("batchSize").map(_.toInt).getOrElse(101)
    batchReply((db, coll), docs, batch, "firstBatch")
  }

  private def runGetMore(cmd: BDoc): BDoc = {
    val id = cmd.getLong("getMore").get
    val (key, rest) = Option(cursors.remove(id)).getOrElse(
      throw new IllegalArgumentException(s"cursor $id not found"))
    val batch = cmd.getLong("batchSize").map(_.toInt).getOrElse(101)
    batchReply(key, rest, batch, "nextBatch")
  }

  private def runAggregate(db: String, cmd: BDoc): BDoc = {
    queryCount += 1
    val coll = cmd.getString("aggregate").get
    var docs = docsOf(db, coll)
    cmd.getSeq("pipeline").collect { case st: BDoc => st }.foreach { stage =>
      stage.fields.headOption match {
        case Some(("$match", f: BDoc)) => docs = docs.filter(matches(_, f))
        case Some(("$sort", s: BDoc)) => docs = sorted(docs, s)
        case Some(("$limit", n)) =>
          docs = docs.take(BDoc(Seq("n" -> n)).getLong("n").getOrElse(0L).toInt)
        case Some(("$project", p: BDoc)) => docs = docs.map(project(_, p))
        case other =>
          throw new IllegalArgumentException(s"unsupported stage: $other")
      }
    }
    val batch = cmd.getDoc("cursor")
      .flatMap(_.getLong("batchSize")).map(_.toInt).getOrElse(101)
    batchReply((db, coll), docs, batch, "firstBatch")
  }

  // ---- query semantics ----

  private def matches(doc: BDoc, filter: BDoc): Boolean =
    filter.fields.forall {
      case ("$and", subs: Seq[_]) =>
        subs.collect { case d: BDoc => d }.forall(matches(doc, _))
      case ("$or", subs: Seq[_]) =>
        subs.collect { case d: BDoc => d }.exists(matches(doc, _))
      case (field, ops: BDoc) if ops.fields.forall(_._1.startsWith("$")) =>
        val v = doc.get(field).orNull
        ops.fields.forall {
          case ("$eq", x) => Bson.compareValues(v, x) == 0
          case ("$ne", x) => Bson.compareValues(v, x) != 0
          case ("$gt", x) => Bson.compareValues(v, x) > 0
          case ("$gte", x) => Bson.compareValues(v, x) >= 0
          case ("$lt", x) => Bson.compareValues(v, x) < 0
          case ("$lte", x) => Bson.compareValues(v, x) <= 0
          case ("$in", xs: Seq[_]) =>
            xs.exists(x => Bson.compareValues(v, x) == 0)
          case (op, _) =>
            throw new IllegalArgumentException(s"unsupported operator $op")
        }
      case (field, value) =>
        Bson.compareValues(doc.get(field).orNull, value) == 0
    }

  private def sorted(docs: Vector[BDoc], sort: BDoc): Vector[BDoc] =
    docs.sortWith { (a, b) =>
      var cmp = 0
      val it = sort.fields.iterator
      while (cmp == 0 && it.hasNext) {
        val (field, dir) = it.next()
        val sign = dir match {
          case i: Int => i
          case l: Long => l.toInt
          case d: Double => d.toInt
          case _ => 1
        }
        cmp = sign * Bson.compareValues(a.get(field).orNull, b.get(field).orNull)
      }
      cmp < 0
    }

  private def project(doc: BDoc, projection: BDoc): BDoc = {
    val includes = projection.fields.collect {
      case (f, i: Int) if i != 0 => f
      case (f, b: Boolean) if b => f
      case (f, l: Long) if l != 0L => f
      case (f, d: Double) if d != 0.0 => f
    }.toSet
    val idExcluded = projection.get("_id").exists {
      case 0 | 0L | 0.0 | false => true
      case _ => false
    }
    if (includes.isEmpty) doc // exclusion-style projections not needed
    else BDoc(doc.fields.filter { case (k, _) =>
      includes.contains(k) || (k == "_id" && !idExcluded) })
  }
}
