package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}

import scala.collection.mutable
import scala.xml.XML

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{DataType, StringType, StructField, StructType}

/** XLSX read/write without POI — an .xlsx file is a zip of OOXML parts, and
  * the JDK zip + scala-xml cover the worksheet subset the reference handles
  * (sheet selection + A1:C10 range, core/dbio/iop/sheet_excel.go:1-474).
  *
  * Excel is a small-data format by nature (its own hard row limit is ~1M),
  * so like the reference (which materializes sheets as a Dataset, not a
  * Datastream) the writer collects to the driver and the reader parses
  * driver-side; the result feeds the normal distributed inference/cast
  * pipeline. Strings are written inline (`t="inlineStr"`); the reader also
  * resolves `t="s"` through sharedStrings.xml for files written by Excel.
  */
object ExcelIO {

  // ---- A1 addressing -----------------------------------------------------

  private[graft] def colIndex(ref: String): Int =
    ref.takeWhile(_.isLetter).foldLeft(0)((acc, c) => acc * 26 + (c - 'A' + 1)) - 1

  private[graft] def colLetter(i: Int): String = {
    var n = i + 1
    val sb = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    sb.toString
  }

  /** "A1:C10" → (row0, col0, row1, col1), zero-based inclusive. */
  private def parseRange(range: String): (Int, Int, Int, Int) = {
    val Array(a, b) = range.split(":")
    def cell(s: String) =
      (s.dropWhile(_.isLetter).toInt - 1, colIndex(s))
    val ((r0, c0), (r1, c1)) = (cell(a), cell(b))
    (r0, c0, r1, c1)
  }

  // ---- write -------------------------------------------------------------

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Write `df` (collected driver-side — xlsx is inherently a single file)
    * to one worksheet. The cap is probed BEFORE collecting (limit+count, a
    * cheap bounded scan) so a misrouted huge stream fails fast instead of
    * OOMing the driver; the reference caps sheet writes the same way.
    */
  def write(df: DataFrame, path: String, sheet: String = "Sheet1",
      maxRows: Int = 1048575): Unit = {
    val probed = df.limit(maxRows + 1).count()
    require(probed <= maxRows, s"xlsx cap: > $maxRows rows; route to a splittable format")
    val rows = df.collect()
    val header = df.columns

    val sb = new StringBuilder
    sb ++= """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>"""
    sb ++= """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>"""
    def emitRow(rowIdx: Int, vals: Seq[Any]): Unit = {
      sb ++= s"""<row r="${rowIdx + 1}">"""
      vals.zipWithIndex.foreach { case (v, c) =>
        val ref = s"${colLetter(c)}${rowIdx + 1}"
        v match {
          case null => // empty cell omitted
          case n: Number =>
            sb ++= s"""<c r="$ref"><v>$n</v></c>"""
          case b: Boolean =>
            sb ++= s"""<c r="$ref" t="b"><v>${if (b) 1 else 0}</v></c>"""
          case other =>
            sb ++= s"""<c r="$ref" t="inlineStr"><is><t>${xmlEscape(other.toString)}</t></is></c>"""
        }
      }
      sb ++= "</row>"
    }
    emitRow(0, header.toSeq)
    rows.zipWithIndex.foreach { case (r, i) => emitRow(i + 1, r.toSeq) }
    sb ++= "</sheetData></worksheet>"

    val parts = Seq(
      "[Content_Types].xml" ->
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
          """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
          """<Default Extension="xml" ContentType="application/xml"/>""" +
          """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
          """<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""" +
          """</Types>"""),
      "_rels/.rels" ->
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
          """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
          """</Relationships>"""),
      "xl/workbook.xml" ->
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" """ +
          """xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
          s"""<sheets><sheet name="${xmlEscape(sheet)}" sheetId="1" r:id="rId1"/></sheets></workbook>"""),
      "xl/_rels/workbook.xml.rels" ->
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
          """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>""" +
          """</Relationships>"""),
      "xl/worksheets/sheet1.xml" -> sb.toString)

    val bos = new ByteArrayOutputStream()
    val zip = new ZipOutputStream(bos)
    parts.foreach { case (name, content) =>
      zip.putNextEntry(new ZipEntry(name))
      zip.write(content.getBytes(StandardCharsets.UTF_8))
      zip.closeEntry()
    }
    zip.close()

    val p = new Path(path)
    val fs = p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(bos.toByteArray) finally out.close()
  }

  // ---- read --------------------------------------------------------------

  private def zipEntries(spark: SparkSession, path: String): Map[String, Array[Byte]] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = new ZipInputStream(fs.open(p))
    try {
      val out = mutable.Map[String, Array[Byte]]()
      var e = in.getNextEntry
      while (e != null) {
        if (!e.isDirectory) out(e.getName) = in.readAllBytes()
        e = in.getNextEntry
      }
      out.toMap
    } finally in.close()
  }

  /** Read one worksheet (optionally an A1:C10 range) as an all-string
    * DataFrame with a header row, then run sampling inference + cast —
    * the same decision engine as CSV.
    */
  def read(spark: SparkSession, path: String, sheetIndex: Int = 1,
      range: Option[String] = None, header: Boolean = true,
      overrides: Map[String, DataType] = Map.empty): DataFrame = {
    val entries = zipEntries(spark, path)
    val sheetXml = entries.getOrElse(s"xl/worksheets/sheet$sheetIndex.xml",
      throw new IllegalArgumentException(s"no sheet$sheetIndex in $path"))

    // some writers emit a UTF-8 BOM ahead of the XML declaration — the
    // SAX parser rejects it ("content is not allowed in prolog")
    def xmlString(bytes: Array[Byte]): String = {
      val s = new String(bytes, StandardCharsets.UTF_8)
      if (s.nonEmpty && s.charAt(0) == '\uFEFF') s.substring(1) else s
    }
    val shared: IndexedSeq[String] = entries.get("xl/sharedStrings.xml") match {
      case Some(bytes) =>
        (XML.loadString(xmlString(bytes)) \ "si")
          .map(si => (si \\ "t").map(_.text).mkString).toIndexedSeq
      case None => IndexedSeq.empty
    }

    val sheet = XML.loadString(xmlString(sheetXml))
    // sparse grid: (row, col) → value
    val cells = mutable.Map[(Int, Int), String]()
    var maxRow = -1; var maxCol = -1
    (sheet \ "sheetData" \ "row").foreach { rowNode =>
      (rowNode \ "c").foreach { c =>
        val ref = (c \ "@r").text
        val row = ref.dropWhile(_.isLetter).toInt - 1
        val col = colIndex(ref)
        val t = (c \ "@t").text
        val v = t match {
          case "inlineStr" => (c \ "is" \ "t").text
          case "s" => shared((c \ "v").text.toInt)
          case "b" => if ((c \ "v").text == "1") "true" else "false"
          case _ => (c \ "v").text
        }
        cells((row, col)) = v
        maxRow = math.max(maxRow, row); maxCol = math.max(maxCol, col)
      }
    }
    val (r0, c0, r1, c1) = range.map(parseRange)
      .getOrElse((0, 0, maxRow, maxCol))

    val grid = (r0 to r1).map(r => (c0 to c1).map(c => cells.get((r, c)).orNull))
    val (names, dataRows) =
      if (header && grid.nonEmpty)
        (grid.head.zipWithIndex.map { case (h, i) =>
          Option(h).getOrElse(s"_c$i") }, grid.tail)
      else ((c0 to c1).map(i => s"_c${i - c0}"), grid)

    val schema = StructType(names.map(n => StructField(n, StringType)))
    val raw = spark.createDataFrame(
      spark.sparkContext.parallelize(dataRows.map(r => Row.fromSeq(r)), 4), schema)
    // the grid is already driver-held — infer over EVERY row, not a
    // sample, so a tail value can't break an ANSI cast later
    graft.model.TypeInference.castTo(raw,
      graft.model.TypeInference.infer(raw.collect().toSeq,
        names.toSeq, overrides))
  }
}
