package graft.transform

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** jmespath/jq-style record extraction over JSON payloads — the reference
  * applies such expressions in its JSON reader (core/dbio/iop/json.go:530
  * `JqRun`) and API specs (core/dbio/api/spec.go:1331-1341).
  *
  * Path grammar (the subset those call sites use):
  *   - `a.b.c`        nested fields (leading `$.` optional)
  *   - `a[2].b`       array index
  *   - `a[].b` / `a[*].b`  array flatten — each element continues the path
  *
  * Two evaluators over the same grammar:
  *   - [[scalar]] / [[flatten]]: distributed, compiled to codegen'd Spark
  *     built-ins (`get_json_object`, `from_json` + `explode`) — no UDFs;
  *   - [[eval]]: driver-side over Jackson trees, for the API extractor's
  *     records-path (extraction is driver-side like the reference).
  */
object JsonPathX {

  sealed trait Seg
  final case class Field(name: String) extends Seg
  final case class Index(i: Int) extends Seg
  case object Flatten extends Seg

  /** Parse `a.b[2].c[].d` into segments. */
  def parse(path: String): Seq[Seg] = {
    val clean = path.stripPrefix("$").stripPrefix(".")
    if (clean.isEmpty) Seq.empty
    else clean.split('.').toSeq.flatMap { part =>
      val open = part.indexOf('[')
      val (field, brackets) =
        if (open < 0) (part, "") else (part.take(open), part.drop(open))
      val head: Seq[Seg] = if (field.isEmpty) Seq.empty else Seq(Field(field))
      val tail = "\\[([^\\]]*)\\]".r.findAllMatchIn(brackets).map(_.group(1)).map {
        case "" | "*" => Flatten
        case n => Index(n.toInt)
      }.toSeq
      head ++ tail
    }
  }

  // ---- distributed (Spark built-ins) -------------------------------------

  /** Render a run of non-flatten segments back into a JSONPath for
    * `get_json_object` (which handles fields and indices natively).
    */
  private def renderScalarPath(segs: Seq[Seg]): String =
    "$" + segs.map {
      case Field(n) => s".$n"
      case Index(i) => s"[$i]"
      case Flatten =>
        throw new IllegalArgumentException("flatten inside scalar path")
    }.mkString

  /** Scalar extraction: a path with no flatten segments, compiled to one
    * `get_json_object` call (whole-stage codegen, pushes through Catalyst).
    */
  def scalar(json: Column, path: String): Column = {
    val segs = parse(path)
    require(!segs.contains(Flatten), s"path $path flattens; use flatten()")
    get_json_object(json, renderScalarPath(segs))
  }

  /** Flattening extraction: each `[]`/`[*]` segment explodes the array and
    * continues on the element. Returns the input with `as` holding the
    * extracted JSON string per output row (one row per matched element).
    */
  def flatten(df: DataFrame, json: Column, path: String, as: String): DataFrame = {
    val segs = parse(path)
    val runs = splitOnFlatten(segs)
    var cur = df.withColumn(as, json)
    runs.zipWithIndex.foreach { case (run, i) =>
      val scalarStep =
        if (run.isEmpty) col(as)
        else get_json_object(col(as), renderScalarPath(run))
      cur =
        if (i < runs.size - 1)
          // flatten boundary: parse as array of raw JSON strings and explode
          cur.withColumn(as,
            explode(from_json(scalarStep, ArrayType(StringType))))
        else cur.withColumn(as, scalarStep)
    }
    cur
  }

  private def splitOnFlatten(segs: Seq[Seg]): Seq[Seq[Seg]] = {
    val runs = collection.mutable.ArrayBuffer(collection.mutable.ArrayBuffer[Seg]())
    segs.foreach {
      case Flatten => runs += collection.mutable.ArrayBuffer[Seg]()
      case s => runs.last += s
    }
    runs.map(_.toSeq).toSeq
  }

  // ---- driver-side (Jackson), for the API records path -------------------

  /** Evaluate the path over a Jackson tree; flatten segments fan out. */
  def eval(node: JsonNode, path: String): Seq[JsonNode] =
    parse(path).foldLeft(Seq(node)) { (nodes, seg) =>
      nodes.flatMap { n =>
        seg match {
          case Field(f) =>
            val c = n.path(f)
            if (c.isMissingNode) Seq.empty else Seq(c)
          case Index(i) =>
            val c = n.path(i)
            if (c.isMissingNode) Seq.empty else Seq(c)
          case Flatten =>
            if (n.isArray) n.elements().asScala.toSeq else Seq.empty
        }
      }
    }
}
