package graft.sources

import java.io.File
import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath, RawLocalFileSystem}

/** Loopback `s3a://` FileSystem for the zero-egress oracle suite — the
  * object-store analogue of `op_http_source`'s loopback HTTP server: it
  * proves the whole seam (URI rewrite → Hadoop conf wiring → Spark's
  * distributed split planning over a non-`file:` scheme → committer
  * rename/list protocol) end-to-end without AWS connectivity.
  *
  * `s3a://bucket/key` maps to `<graft.mock.fs.root>/bucket/key` on local
  * disk. Registered per-test via `fs.s3a.impl`; a real deployment never
  * loads this class — the genuine S3A connector binds the same conf keys
  * rendered by [[FileBackends.renderS3a]].
  */
final class LoopbackObjectStore extends RawLocalFileSystem {

  private var fsUri: URI = _

  override def initialize(name: URI, conf: Configuration): Unit = {
    fsUri = URI.create(s"${name.getScheme}://${name.getAuthority}")
    super.initialize(name, conf)
    // the mock root must pre-exist or the committer's recursive mkdirs
    // (which stops at the bucket) has no parent to build on
    new File(root).mkdirs()
  }

  // fsUri is null while FileSystem's reflective constructor runs (the
  // superclass qualifies its initial working dir before initialize)
  override def getUri: URI =
    if (fsUri == null) URI.create("file:///") else fsUri
  override def getScheme: String = getUri.getScheme

  // getConf is null while FileSystem's reflective constructor runs
  // (makeQualified(getWorkingDirectory) fires before initialize)
  private def root: String = Option(getConf)
    .map(_.get("graft.mock.fs.root",
      sys.props("java.io.tmpdir") + "/graft-mock-fs"))
    .getOrElse(sys.props("java.io.tmpdir") + "/graft-mock-fs")

  /** Qualified paths produced by list/status already carry the local
    * absolute path under the mock root; fresh user paths carry the bucket
    * key. Distinguish by prefix so both round-trip.
    */
  override def pathToFile(path: HPath): File = {
    val u = path.toUri
    val p = u.getPath
    // already-local only at a path-SEGMENT boundary: a bucket key that
    // merely starts with the root string (or a sibling dir root + suffix)
    // must still be resolved under the bucket
    val underRoot = p == root || p.startsWith(root + "/")
    if (underRoot) new File(p)
    else new File(root + "/" + Option(u.getAuthority).getOrElse(
      fsUri.getAuthority) + p)
  }

  // local-FS working dir / home dir must not be re-qualified against the
  // s3a uri (RawLocalFileSystem would prepend the bucket scheme and then
  // fail checkPath on the next access)
  override def getHomeDirectory: HPath = new HPath(root)
  override def getWorkingDirectory: HPath = new HPath(root)
  override def setWorkingDirectory(dir: HPath): Unit = ()

  /** Local absolute file → canonical bucket-relative s3a path (the exact
    * inverse of pathToFile's mapping), so listed children are genuine
    * descendants of the s3a base path — Spark's partition discovery
    * requires that.
    */
  private def qualify(f: File): HPath = {
    val key = f.getAbsolutePath.stripPrefix(root)
      .stripPrefix("/" + fsUri.getAuthority)
    new HPath(s"${fsUri.getScheme}://${fsUri.getAuthority}$key")
  }

  // RawLocalFileSystem's lazy permission loading does `new File(status
  // .getPath.toUri)`, which rejects non-"file" schemes — return eager
  // FileStatus objects instead (permissions are irrelevant to the mock)
  override def getFileStatus(f: HPath): org.apache.hadoop.fs.FileStatus = {
    val file = pathToFile(f)
    if (!file.exists())
      throw new java.io.FileNotFoundException(s"$f (mock root $root)")
    new org.apache.hadoop.fs.FileStatus(file.length, file.isDirectory, 1,
      getDefaultBlockSize(f), file.lastModified, qualify(file))
  }

  override def listStatus(f: HPath): Array[org.apache.hadoop.fs.FileStatus] = {
    val dir = pathToFile(f)
    if (!dir.exists())
      throw new java.io.FileNotFoundException(s"$f (mock root $root)")
    if (dir.isFile) Array(getFileStatus(f))
    else {
      // listFiles returns null if the dir vanished after the exists check
      // (concurrent commit cleanup) — surface the FileNotFoundException
      // Hadoop callers handle, not an NPE
      val children = dir.listFiles()
      if (children == null)
        throw new java.io.FileNotFoundException(s"$f (deleted concurrently)")
      children.map(c =>
        new org.apache.hadoop.fs.FileStatus(c.length, c.isDirectory, 1,
          getDefaultBlockSize(f), c.lastModified, qualify(c)))
    }
  }

  override def checkPath(path: HPath): Unit = {
    val s = Option(path.toUri.getScheme)
    require(s.isEmpty || s.contains(fsUri.getScheme),
      s"wrong scheme for $path (fs is $fsUri)")
  }
}
