package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.FileBackends
import graft.sources.FileBackends.Conn

/** FileBackend conf rendering + URI rewriting (ref fs.go:76-134,
  * fs_s3.go:67-82 prop vocabulary). The end-to-end read/write over the
  * loopback s3a FileSystem is oracle-gated (op_fs_object_store).
  */
class FileBackendSpec extends AnyFunSuite {

  test("s3a conf: static keys, endpoint forces path-style, region") {
    val m = FileBackends.renderS3a(Conn(Map(
      "ACCESS_KEY_ID" -> "AK", "SECRET_ACCESS_KEY" -> "SK",
      "ENDPOINT" -> "http://minio:9000", "REGION" -> "us-east-2")))
    assert(m("fs.s3a.access.key") == "AK")
    assert(m("fs.s3a.secret.key") == "SK")
    assert(m("fs.s3a.endpoint") == "http://minio:9000")
    assert(m("fs.s3a.path.style.access") == "true")
    assert(m("fs.s3a.endpoint.region") == "us-east-2")
  }

  test("s3a conf: AWS_-prefixed fallbacks accepted (fs_s3.go:68-74)") {
    val m = FileBackends.renderS3a(Conn(Map(
      "AWS_ACCESS_KEY_ID" -> "AK2", "AWS_SECRET_ACCESS_KEY" -> "SK2")))
    assert(m("fs.s3a.access.key") == "AK2")
    assert(m("fs.s3a.secret.key") == "SK2")
  }

  test("s3a conf: session token and anonymous pick credential providers") {
    val tok = FileBackends.renderS3a(Conn(Map(
      "ACCESS_KEY_ID" -> "a", "SECRET_ACCESS_KEY" -> "s",
      "SESSION_TOKEN" -> "t")))
    assert(tok("fs.s3a.aws.credentials.provider").contains("Temporary"))
    val anon = FileBackends.renderS3a(Conn(Map("ANONYMOUS" -> "true")))
    assert(anon("fs.s3a.aws.credentials.provider").contains("Anonymous"))
  }

  test("abfs conf: account key is account-scoped") {
    val m = FileBackends.renderAbfs(Conn(Map("ACCOUNT_KEY" -> "K")), "acct")
    assert(m("fs.azure.account.key.acct.dfs.core.windows.net") == "K")
    assert(m("fs.azure.account.auth.type.acct.dfs.core.windows.net")
      == "SharedKey")
  }

  test("gcs conf: keyfile + project") {
    val m = FileBackends.renderGcs(Conn(Map(
      "KEY_FILE" -> "/k.json", "PROJECT" -> "p1")))
    assert(m("google.cloud.auth.service.account.json.keyfile") == "/k.json")
    assert(m("fs.gs.project.id") == "p1")
  }

  test("uri rewrite: s3→s3a, az container@account→abfs FQDN, gs untouched") {
    assert(FileBackends.sparkUri("s3://b/k/f.parquet") == "s3a://b/k/f.parquet")
    assert(FileBackends.sparkUri("az://cont@acct/path")
      == "abfs://cont@acct.dfs.core.windows.net/path")
    assert(FileBackends.sparkUri("gs://b/k") == "gs://b/k")
    assert(FileBackends.sparkUri("/local/path") == "/local/path")
  }

  test("per-backend concurrency: ftp is sequential (fs.go:93-95)") {
    assert(FileBackends.concurrencyLimit("ftp") == 1)
    assert(FileBackends.concurrencyLimit("") == 20)
    assert(FileBackends.concurrencyLimit("s3a") > 1)
  }

  test("staging: loopback transport lands listed files in staging dir") {
    val tmp = java.nio.file.Files.createTempDirectory("stage").toString
    val t = new FileBackends.RemoteTransport {
      def list(d: String): Seq[String] =
        Seq("sftp://h/a.csv", "sftp://h/b.csv")
      def fetch(u: String): Array[Byte] = u.split('/').last.getBytes
    }
    val staged = FileBackends.stage("sftp://h/", tmp, t)
    assert(staged.map(_.getFileName.toString).sorted == Seq("a.csv", "b.csv"))
    assert(new String(java.nio.file.Files.readAllBytes(staged.head))
      == "a.csv")
  }

  test("transportFor rejects object-store schemes (config-only path)") {
    intercept[IllegalArgumentException] {
      FileBackends.transportFor("s3a", Conn())
    }
  }
}
