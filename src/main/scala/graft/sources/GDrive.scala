package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper

/** Google Drive file backend (reference
  * core/dbio/filesys/fs_googledrive.go): gdrive:// paths resolve by
  * walking folder parents from `root` (or a configured FOLDER_ID),
  * listings via files.list queries, downloads via files.get?alt=media,
  * uploads via the multipart endpoint — over the same injectable-
  * transport pattern as [[GSheets]], so the offline build drives the
  * whole protocol against a loopback Drive-v3 server. Drive is a
  * fetch-to-staging backend like sftp/ftp/http: bytes land in a staging
  * dir and the normal distributed reader takes over (a Drive file is a
  * driver-scale object; cluster-scale data lives on object stores).
  */
object GDrive {

  /** Byte-level HTTP seam (downloads are binary; GSheets' string
    * transport would corrupt them). */
  trait ByteTransport {
    def get(url: String, headers: Map[String, String]): Array[Byte]
    def post(url: String, headers: Map[String, String],
        body: Array[Byte]): Array[Byte]
  }

  final class HttpByteTransport extends ByteTransport {
    private def call(method: String, url: String,
        headers: Map[String, String], body: Option[Array[Byte]]): Array[Byte] =
      HttpRetry.retry(url)(callOnce(method, url, headers, body))

    private def callConnectRetry(method: String, url: String,
        headers: Map[String, String], body: Option[Array[Byte]]): Array[Byte] =
      HttpRetry.retryConnectOnly(url)(callOnce(method, url, headers, body))

    private def callOnce(method: String, url: String,
        headers: Map[String, String], body: Option[Array[Byte]]): Array[Byte] = {
      val conn = new java.net.URI(url).toURL.openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      conn.setRequestMethod(method)
      conn.setConnectTimeout(10000)
      conn.setReadTimeout(120000)
      headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
      body.foreach(_ => conn.setDoOutput(true)) // config precedes connect
      HttpRetry.connecting(conn.connect())
      body.foreach { b =>
        val os = conn.getOutputStream
        try os.write(b) finally os.close()
      }
      val code = conn.getResponseCode
      val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
      val out = Option(is).map(_.readAllBytes()).getOrElse(Array.empty[Byte])
      conn.disconnect()
      if (code >= 400)
        throw new HttpRetry.HttpStatusException(code,
          s"drive api $code for $url: ${new String(out.take(300), "UTF-8")}")
      out
    }
    def get(url: String, headers: Map[String, String]): Array[Byte] =
      call("GET", url, headers, None)
    // uploads create files: a lost response after the server committed
    // would duplicate on replay, so POSTs only retry connect-phase
    // failures (request never sent)
    def post(url: String, headers: Map[String, String],
        body: Array[Byte]): Array[Byte] =
      callConnectRetry("POST", url, headers, Some(body))
  }

  /** Connection: base URL + bearer token + root folder (FOLDER_ID). */
  final case class Conn(
      baseUrl: String = "https://www.googleapis.com",
      token: () => String = () => "",
      rootFolderId: String = "",
      transport: ByteTransport = new HttpByteTransport) {
    def headers: Map[String, String] = {
      val t = token()
      if (t.isEmpty) Map.empty else Map("Authorization" -> s"Bearer $t")
    }
    def root: String = if (rootFolderId.nonEmpty) rootFolderId else "root"
  }

  /** Build a Conn from file-backend props (the reference's
    * GDRIVE_-prefixed or bare keys): ACCESS_TOKEN or KEY_BODY
    * (service-account JSON, drive scope), FOLDER_ID, BASE_URL override. */
  def connFrom(get: String => Option[String]): Conn = {
    def p(k: String) = get(k).orElse(get(s"GDRIVE_$k"))
    val token: () => String = p("ACCESS_TOKEN") match {
      case Some(t) => () => t
      case None => p("KEY_BODY") match {
        case Some(key) =>
          lazy val tok = GSheets.serviceAccountToken(key,
            scope = "https://www.googleapis.com/auth/drive")
          () => tok
        case None => () => ""
      }
    }
    Conn(
      baseUrl = p("BASE_URL").getOrElse("https://www.googleapis.com"),
      token = token,
      rootFolderId = p("FOLDER_ID").getOrElse(""))
  }

  private val mapper = new ObjectMapper()

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8").replace("+", "%20")

  final case class Node(id: String, name: String, folder: Boolean, size: Long)

  /** files.list under a query; returns (id, name, mimeType, size) rows. */
  private def queryList(conn: Conn, q: String): Seq[Node] = {
    val body = conn.transport.get(
      s"${conn.baseUrl}/drive/v3/files?q=${enc(q)}" +
        "&fields=files(id,name,mimeType,size)&pageSize=1000",
      conn.headers)
    val files = mapper.readTree(body).path("files")
    (0 until files.size()).map { i =>
      val f = files.get(i)
      Node(f.path("id").asText(), f.path("name").asText(),
        f.path("mimeType").asText() == "application/vnd.google-apps.folder",
        f.path("size").asLong(0))
    }
  }

  /** Resolve a /-separated path to a file/folder id by walking parents
    * (fs_googledrive.go:229-283 getFileID). Empty path = the root. */
  def resolveId(conn: Conn, path: String): String = {
    val parts = path.split("/").filter(_.nonEmpty)
    parts.foldLeft(conn.root) { (parent, part) =>
      val esc = part.replace("'", "\\'")
      queryList(conn,
        s"name='$esc' and '$parent' in parents and trashed=false")
        .headOption.map(_.id)
        .getOrElse(throw new java.io.FileNotFoundException(
          s"gdrive path not found: $path (at '$part')"))
    }
  }

  /** Children of a folder path. */
  def list(conn: Conn, path: String): Seq[Node] = {
    val id = resolveId(conn, path)
    queryList(conn, s"'$id' in parents and trashed=false").sortBy(_.name)
  }

  /** Download a file's bytes (files.get?alt=media). */
  def fetchPath(conn: Conn, path: String): Array[Byte] =
    conn.transport.get(
      s"${conn.baseUrl}/drive/v3/files/${resolveId(conn, path)}?alt=media",
      conn.headers)

  /** Upload bytes as `name` under the folder `dirPath` (multipart
    * uploadType, fs_googledrive.go:284-357). Returns the new file id. */
  def upload(conn: Conn, dirPath: String, name: String,
      bytes: Array[Byte]): String = {
    val parent = resolveId(conn, dirPath)
    val meta = mapper.createObjectNode()
    meta.put("name", name)
    meta.putArray("parents").add(parent)
    val boundary = "graft_gdrive_boundary"
    val head = (s"--$boundary\r\n" +
      "Content-Type: application/json; charset=UTF-8\r\n\r\n" +
      mapper.writeValueAsString(meta) + s"\r\n--$boundary\r\n" +
      "Content-Type: application/octet-stream\r\n\r\n").getBytes("UTF-8")
    val tail = s"\r\n--$boundary--".getBytes("UTF-8")
    val body = head ++ bytes ++ tail
    val resp = conn.transport.post(
      s"${conn.baseUrl}/upload/drive/v3/files?uploadType=multipart",
      conn.headers + ("Content-Type" ->
        s"multipart/related; boundary=$boundary"),
      body)
    mapper.readTree(resp).path("id").asText()
  }

  /** [[graft.sources.FileBackends.RemoteTransport]] adapter: gdrive://
    * URLs stage like sftp/ftp/http. A directory URL lists its files; a
    * file URL fetches directly. */
  final class DriveTransport(conn: Conn) extends FileBackends.RemoteTransport {
    private def pathOf(url: String): String = {
      val u = java.net.URI.create(url)
      (Option(u.getHost).getOrElse("") + Option(u.getPath).getOrElse(""))
        .stripPrefix("/")
    }
    def list(dirUrl: String): Seq[String] = {
      val p = pathOf(dirUrl)
      val id = resolveId(conn, p)
      val kids = queryList(conn, s"'$id' in parents and trashed=false")
      if (kids.isEmpty) Seq(dirUrl) // a plain file URL
      else kids.filterNot(_.folder).sortBy(_.name)
        .map(n => if (p.isEmpty) s"gdrive://${n.name}" else s"gdrive://$p/${n.name}")
    }
    def fetch(url: String): Array[Byte] = fetchPath(conn, pathOf(url))
  }
}
