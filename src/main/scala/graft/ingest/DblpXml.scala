package graft.ingest

import java.io.StringReader
import javax.xml.parsers.SAXParserFactory
import org.xml.sax.InputSource
import org.xml.sax.helpers.DefaultHandler
import org.xml.sax.Attributes
import scala.collection.mutable

/** S2: the DBLP XML → JSON producer shape (reference
  * /root/reference/src/scipikafka/src/main/java/dblp/DblpParser.java:62-159,
  * element map DblpPublication.java:84-100) as a SAX pass over DBLP XML,
  * emitting one JSON string per `<inproceedings>` with
  * {key, title, year, conference, authors[]} — the exact shape
  * [[graft.model.Publication.fromDblpJson]] consumes.
  *
  * An ingest tool, not an engine operator: at scale it runs inside
  * `mapPartitions` over raw XML splits (or a Kafka producer, as in the
  * reference); JDK-builtin SAX keeps it dependency-free. Parse errors
  * are counted and skipped, mirroring the reference's error counter
  * (DblpParser.java:47-51,142-146).
  */
object DblpXml {

  case class Result(records: Seq[String], errors: Int)

  private val Fields = Set("title", "year", "booktitle")

  def parse(xml: String): Result = {
    val out = mutable.ArrayBuffer.empty[String]
    var errors = 0
    val handler = new DefaultHandler {
      var inRecord = false
      var current: String = null
      val text = new StringBuilder
      var key: String = null
      val fields = mutable.Map.empty[String, String]
      val authors = mutable.ArrayBuffer.empty[String]

      override def startElement(uri: String, local: String, qName: String, attrs: Attributes): Unit =
        qName match {
          case "inproceedings" =>
            inRecord = true; key = attrs.getValue("key")
            fields.clear(); authors.clear()
          case f if inRecord && (Fields(f) || f == "author") =>
            current = f; text.clear()
          case _ => ()
        }

      override def characters(ch: Array[Char], start: Int, len: Int): Unit =
        if (current != null) text.appendAll(ch, start, len)

      override def endElement(uri: String, local: String, qName: String): Unit = qName match {
        case "inproceedings" =>
          if (key != null && fields.contains("title")) out += toJson()
          else errors += 1
          inRecord = false
        case f if f == current =>
          if (f == "author") authors += text.toString.trim
          else fields(f) = text.toString.trim
          current = null
        case _ => ()
      }

      private def esc(s: String) =
        s.flatMap {
          case '"' => "\\\""; case '\\' => "\\\\"
          case c if c < ' ' => f"\\u${c.toInt}%04x"
          case c => c.toString
        }

      private def toJson(): String = {
        val as = authors.map(a => s""""${esc(a)}"""").mkString(",")
        s"""{"key":"${esc(key)}","title":"${esc(fields("title"))}",""" +
          s""""year":"${esc(fields.getOrElse("year", ""))}",""" +
          s""""conference":"${esc(fields.getOrElse("booktitle", ""))}","authors":[$as]}"""
      }
    }
    val factory = SAXParserFactory.newInstance()
    factory.setFeature("http://apache.org/xml/features/nonvalidating/load-external-dtd", false)
    try factory.newSAXParser().parse(new InputSource(new StringReader(xml)), handler)
    catch { case _: Exception => errors += 1 }
    Result(out.toSeq, errors)
  }
}
