package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.DataType

/** HTTP file source — fetch-to-staging, then the normal distributed
  * inference read (the reference's http filesystem client,
  * core/dbio/filesys/fs_http.go, reads remote URLs into the same dataflow;
  * non-seekable remote protocols stage first, fs.go:76-134).
  *
  * The fetch is driver-side and sequential per URL (an HTTP URL list is a
  * driver-scale input — object-store paths are the cluster-scale path);
  * everything after staging is the standard parallel scan. The fetcher is
  * injectable so tests run against a local fixture server; the default
  * uses `java.net.http` with redirects on.
  */
object HttpSource {

  type Fetcher = String => Array[Byte]

  lazy val defaultFetcher: Fetcher = {
    val client = HttpClient.newBuilder()
      .followRedirects(HttpClient.Redirect.NORMAL)
      .build()
    url => HttpRetry.retry(url) {
      val req = HttpRequest.newBuilder(URI.create(url)).GET().build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofByteArray())
      if (resp.statusCode() / 100 != 2)
        throw new HttpRetry.HttpStatusException(resp.statusCode(),
          s"GET $url returned HTTP ${resp.statusCode()}")
      resp.body()
    }
  }

  /** Download each URL into `stagingDir`, preserving the URL's file name
    * (suffixed with an index to avoid collisions). Returns local paths.
    */
  def stage(urls: Seq[String], stagingDir: String,
      fetcher: Fetcher = defaultFetcher): Seq[Path] = {
    val dir = Paths.get(stagingDir)
    // the read step consumes the WHOLE directory, so stale files from an
    // earlier staging run would silently union into the result
    if (Files.isDirectory(dir)) {
      val old = Files.list(dir)
      try old.forEach(p => Files.deleteIfExists(p))
      finally old.close()
    }
    Files.createDirectories(dir)
    urls.zipWithIndex.map { case (url, i) =>
      val name = url.split('/').last.split('?').head match {
        case "" => s"download-$i"
        case n => s"$i-$n"
      }
      val target = dir.resolve(name)
      Files.write(target, fetcher(url))
      target
    }
  }

  /** Fetch CSV URLs to staging and read through the inference engine. */
  def csv(spark: SparkSession, urls: Seq[String], stagingDir: String,
      fetcher: Fetcher = defaultFetcher, header: Boolean = true,
      overrides: Map[String, DataType] = Map.empty): DataFrame = {
    stage(urls, stagingDir, fetcher)
    FileSources.csv(spark, stagingDir, header = header, overrides = overrides)
  }

  /** Fetch JSONL URLs to staging and read through the inference engine. */
  def jsonl(spark: SparkSession, urls: Seq[String], stagingDir: String,
      fetcher: Fetcher = defaultFetcher,
      overrides: Map[String, DataType] = Map.empty): DataFrame = {
    stage(urls, stagingDir, fetcher)
    FileSources.jsonl(spark, stagingDir, overrides = overrides)
  }
}
