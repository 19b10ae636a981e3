package graft.io

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import graft.config.{DestinationConfig, SourceConfig}
import scala.jdk.CollectionConverters._
import scala.xml.XML

/**
 * Minimal OOXML (.xlsx) reader/writer — hand-rolled (no POI offline;
 * SURVEY §7d). An .xlsx is a ZIP of XML parts; we handle shared
 * strings, inline strings, and numbers. The reference reads FORMATTED
 * cell display values via excelize GetCellValue (xlsx.go:150-156), so
 * styled numeric cells (dates, percents, thousands) render through
 * [[NumFmt]]; General-format numbers render Go-style.
 *
 * Reference: internal/io/xlsx.go:32-170 (read), :191-304 (write).
 * Sheet selection: name > index > first (xlsx.go:60-88). All values
 * strings; duplicate header -> last wins; header row defines keys.
 */
object Xlsx {

  def read(spark: SparkSession, src: SourceConfig): DataFrame = {
    val zf = new java.util.zip.ZipFile(src.file)
    try {
      def entryText(name: String): Option[String] =
        Option(zf.getEntry(name)).map { e =>
          new String(zf.getInputStream(e).readAllBytes(), "UTF-8")
        }

      // shared strings table
      val shared: IndexedSeq[String] = entryText("xl/sharedStrings.xml") match {
        case Some(xmlStr) =>
          val x = XML.loadString(xmlStr)
          (x \ "si").map(si => (si \\ "t").map(_.text).mkString).toIndexedSeq
        case None => IndexedSeq.empty
      }

      // sheet name -> rId -> worksheet part
      val workbook = XML.loadString(entryText("xl/workbook.xml")
        .getOrElse(throw new IllegalArgumentException(s"${src.file}: missing workbook.xml")))
      val rels = XML.loadString(entryText("xl/_rels/workbook.xml.rels").getOrElse(""))
      val relMap = (rels \ "Relationship").map { r =>
        (r \@ "Id") -> (r \@ "Target")
      }.toMap
      val sheets = (workbook \ "sheets" \ "sheet").map { sh =>
        val rid = sh.attribute("http://schemas.openxmlformats.org/officeDocument/2006/relationships", "id")
          .map(_.text).getOrElse("")
        (sh \@ "name", relMap.getOrElse(rid, ""))
      }
      val target = src.sheetName match {
        case Some(n) => sheets.find(_._1 == n)
          .getOrElse(throw new IllegalArgumentException(s"sheet '$n' not found"))._2
        case None => src.sheetIndex match {
          case Some(i) if i >= 0 && i < sheets.size => sheets(i)._2
          case _ => sheets.headOption
            .getOrElse(throw new IllegalArgumentException("workbook has no sheets"))._2
        }
      }
      val sheetPath = if (target.startsWith("/")) target.substring(1) else "xl/" + target
      val ws = XML.loadString(entryText(sheetPath)
        .getOrElse(throw new IllegalArgumentException(s"missing $sheetPath")))

      // style (cellXfs) index -> number-format code, for FORMATTED
      // display values (dates/percents — GetCellValue parity)
      val numFmtByXf: IndexedSeq[Option[String]] = entryText("xl/styles.xml") match {
        case Some(xmlStr) =>
          val st = XML.loadString(xmlStr)
          val custom = (st \ "numFmts" \ "numFmt").flatMap { nf =>
            scala.util.Try((nf \@ "numFmtId").toInt -> (nf \@ "formatCode")).toOption
          }.toMap
          (st \ "cellXfs" \ "xf").map { xf =>
            val id = scala.util.Try((xf \@ "numFmtId").toInt).getOrElse(0)
            custom.get(id).orElse(NumFmt.builtin.get(id))
          }.toIndexedSeq
        case None => IndexedSeq.empty
      }

      val rows: Seq[Seq[(Int, String)]] = (ws \ "sheetData" \ "row").map { r =>
        (r \ "c").map { c =>
          val ref = c \@ "r" // e.g. "B3"
          val colIdx = colIndex(ref.takeWhile(_.isLetter))
          val t = c \@ "t"
          val v = t match {
            case "s" => shared((c \ "v").text.trim.toInt)
            case "inlineStr" => ((c \ "is") \\ "t").map(_.text).mkString
            case "b" => if ((c \ "v").text.trim == "1") "true" else "false"
            case _ =>
              val raw = (c \ "v").text
              val fmt = (c \@ "s") match {
                case s if s.nonEmpty =>
                  scala.util.Try(s.toInt).toOption.flatMap(i => numFmtByXf.lift(i).flatten)
                case _ => None
              }
              (fmt, scala.util.Try(raw.trim.toDouble).toOption) match {
                case (Some(code), Some(d)) => NumFmt.format(d, code)
                case _ => formatNumber(raw)
              }
          }
          colIdx -> v
        }.toSeq
      }.toSeq

      if (rows.isEmpty)
        return spark.createDataFrame(spark.sparkContext.emptyRDD[Row], StructType(Nil))

      val headerCells = rows.head.toMap
      val width = (rows.flatMap(_.map(_._1)) :+ -1).max + 1
      // duplicate header -> last wins; empty -> dropped (xlsx.go parity
      // with csv.go header rules)
      val lastIdx = (0 until width)
        .map(i => headerCells.getOrElse(i, "") -> i)
        .filter(_._1.nonEmpty)
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).max }
      val keep = lastIdx.toSeq.sortBy(_._2)
      val schema = StructType(keep.map { case (n, _) => StructField(n, StringType, nullable = true) })
      val data = rows.tail.map { r =>
        val cells = r.toMap
        Row.fromSeq(keep.map { case (_, i) => cells.getOrElse(i, "") })
      }
      spark.createDataFrame(data.asJava, schema)
    } finally zf.close()
  }

  /** "ABC" -> 0-based column index. */
  private[io] def colIndex(letters: String): Int =
    letters.foldLeft(0)((acc, c) => acc * 26 + (c - 'A' + 1)) - 1

  private[io] def colLetters(idx: Int): String = {
    var i = idx + 1
    val sb = new StringBuilder
    while (i > 0) {
      val rem = (i - 1) % 26
      sb.insert(0, ('A' + rem).toChar)
      i = (i - 1) / 26
    }
    sb.toString
  }

  /** Excel stores numbers as doubles; render Go-style (no ".0"). */
  private def formatNumber(raw: String): String =
    if (raw.isEmpty) ""
    else scala.util.Try(raw.toDouble).toOption match {
      case Some(d) => graft.functions.GoFloatFormat.format(d)
      case None => raw
    }

  // ------------------------------------------------------------------

  /** Write a minimal single-sheet workbook: header row (sorted keys) +
    * inline-string cells; bools as "true"/"false" (xlsx.go:281-283). */
  def write(df: DataFrame, dest: DestinationConfig): Unit = {
    val sheetName = dest.sheetName.getOrElse("Sheet1")
    val cols = df.columns.sorted
    val stringDf = {
      import org.apache.spark.sql.functions.col
      df.select(cols.toIndexedSeq.map { c =>
        graft.transforms.Transforms.goToString(col(c),
          df.schema(c).dataType).as(c)
      }: _*)
    }

    val zip = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(dest.file))
    def put(name: String, content: String): Unit = {
      zip.putNextEntry(new java.util.zip.ZipEntry(name))
      zip.write(content.getBytes("UTF-8"))
      zip.closeEntry()
    }
    try {
      put("[Content_Types].xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
          |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
          |<Default Extension="xml" ContentType="application/xml"/>
          |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
          |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
          |</Types>""".stripMargin)
      put("_rels/.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
          |</Relationships>""".stripMargin)
      put("xl/workbook.xml",
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
           |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
           |<sheets><sheet name="${escape(sheetName)}" sheetId="1" r:id="rId1"/></sheets>
           |</workbook>""".stripMargin)
      put("xl/_rels/workbook.xml.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
          |</Relationships>""".stripMargin)

      val sb = new StringBuilder
      sb.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
      sb.append("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
      def rowXml(rowIdx: Int, values: Seq[String]): Unit = {
        sb.append(s"""<row r="$rowIdx">""")
        values.zipWithIndex.foreach { case (v, i) =>
          sb.append(s"""<c r="${colLetters(i)}$rowIdx" t="inlineStr"><is><t xml:space="preserve">${escape(v)}</t></is></c>""")
        }
        sb.append("</row>")
      }
      rowXml(1, cols.toIndexedSeq)
      var r = 2
      val it = stringDf.toLocalIterator()
      while (it.hasNext) {
        val row = it.next()
        rowXml(r, (0 until row.length).map(i => Option(row.getString(i)).getOrElse("")))
        r += 1
      }
      sb.append("</sheetData></worksheet>")
      put("xl/worksheets/sheet1.xml", sb.toString)
    } finally zip.close()
  }

  private def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
}
