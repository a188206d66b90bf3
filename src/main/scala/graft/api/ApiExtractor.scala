package graft.api

import scala.collection.mutable

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Declarative REST-extraction interpreter — the reference's API framework
  * (core/dbio/api/spec.go): request templating, pagination loop with
  * next-state + stop condition, record extraction by response path, and
  * PK-based dedup. The transport is injected so tests run against a local
  * stub; a production deployment plugs an HTTP client into the same seam.
  * Extraction is driver-side (like the reference) and lands JSONL staging
  * files that Spark then reads — the cluster never blocks on the API.
  */
object ApiExtractor {

  /** Minimal endpoint spec: fetch pages, pull records at `recordsPath`
    * (a jmespath-style path — nested fields, `[N]`, `[]`/`[*]` flatten,
    * evaluated by [[graft.transform.JsonPathX]]; spec.go:1331-1341),
    * follow `nextTokenPath` until absent, dedup on `primaryKey`.
    */
  final case class EndpointSpec(
      name: String,
      url: String,
      recordsPath: String = "data",
      nextTokenPath: String = "next",
      primaryKey: Option[String] = None,
      maxPages: Int = 1000,
      maxRows: Long = 5000000L)

  /** Transport seam: (url, queryParams) → response body. */
  type Transport = (String, Map[String, String]) => String

  private val mapper = new ObjectMapper()

  /** Run the pagination loop; returns raw JSON records (JSONL lines). */
  def extract(spec: EndpointSpec, transport: Transport): Seq[String] = {
    val out = mutable.ArrayBuffer[String]()
    val seen = mutable.HashSet[String]()
    var missingPk = 0L
    var next: Option[String] = Some("")
    var pages = 0
    while (next.isDefined && pages < spec.maxPages) {
      val params = if (next.get.isEmpty) Map.empty[String, String]
        else Map("page_token" -> next.get)
      val body = transport(spec.url, params)
      val root = mapper.readTree(body)
      // a path match that is itself an array contributes its elements (the
      // plain-field case, e.g. "data"); a flattened match contributes itself
      val records = graft.transform.JsonPathX.eval(root, spec.recordsPath)
        .flatMap { m =>
          if (m.isArray) {
            val b = mutable.ArrayBuffer[JsonNode]()
            m.forEach(n => b += n)
            b.toSeq
          } else Seq(m)
        }
      records.foreach { rec =>
        val keep = spec.primaryKey match {
          // a record MISSING the pk field must not dedup (every MissingNode
          // renders "", which would collapse all such records to one) —
          // it is kept and counted so a misconfigured pk is visible
          case Some(pk) if rec.path(pk).isMissingNode =>
            missingPk += 1; true
          case Some(pk) => seen.add(rec.path(pk).asText)
          case None => true
        }
        if (keep) out += mapper.writeValueAsString(rec)
      }
      // API extraction is driver-side BY DESIGN (the reference's extractor
      // is a single client loop too); the cap turns a runaway endpoint
      // into a fast, named failure instead of a driver OOM
      if (out.size > spec.maxRows) throw new IllegalStateException(
        s"api endpoint ${spec.name} exceeded max_rows=${spec.maxRows} " +
          s"after $pages page(s); raise maxRows or narrow the endpoint")
      val nt = graft.transform.JsonPathX.eval(root, spec.nextTokenPath)
        .headOption.getOrElse(
          com.fasterxml.jackson.databind.node.MissingNode.getInstance())
      // an empty-string token means "no more pages" too — Some("") would map
      // back to no page_token param and re-fetch page 0 until maxPages
      next = if (nt.isMissingNode || nt.isNull || nt.asText.isEmpty) None
        else Some(nt.asText)
      pages += 1
    }
    if (missingPk > 0) System.err.println(
      s"[api] warn: $missingPk record(s) missing primary-key field " +
        s"'${spec.primaryKey.get}' were kept without dedup — check the pk path")
    out.toSeq
  }

  /** Deterministic stub transport: `total` records served `pageSize` at a
    * time as {"data":[{"id":N,"value":2N}...],"next":token}; the last page
    * of each id range is re-served with overlap to exercise PK dedup.
    */
  def stubTransport(total: Int, pageSize: Int): Transport = (url, params) => {
    val start = params.get("page_token").map(_.toInt).getOrElse(0)
    // one record of overlap with the previous page exercises dedup
    val from = math.max(0, start - 1)
    val until = math.min(start + pageSize, total)
    val recs = (from until until)
      .map(i => s"""{"id":$i,"value":${2L * i}}""").mkString(",")
    val next = if (until >= total) "null" else s""""$until""""
    s"""{"data":[$recs],"next":$next}"""
  }
}
