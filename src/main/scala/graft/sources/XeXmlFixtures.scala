package graft.sources

import java.io.{BufferedWriter, FileOutputStream, OutputStreamWriter}
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/**
 * Fixture writer for the XML event source: serializes a DataFrame into
 * one `<events>` document per key value — the XML export of an XE
 * session's rollover set (see [[XeXmlFormat]] for the element shape).
 * Driver-side by design, mirroring [[XelbFixtures]]: it generates test
 * inputs for the DSv2 READ path, which is the production surface.
 *
 * Column conventions (inverse of the reader's): `event_name` → the
 * `name` attribute, `e_time_of_event_utc` → the `timestamp` attribute,
 * `c_*` → `<data>` elements, `a_*` → `<action>` elements; each element
 * carries `<type name=…/>` from the §1.3 inverse mapping. NULL values
 * omit the element (the reader leaves missing fields null).
 */
object XeXmlFixtures {

  def writeByKey(df: DataFrame, keyCol: String, dir: String,
                 sessionName: String = "GraftSession"): Seq[String] = {
    XelbFixtures.guardRows(df, "XeXmlFixtures") // driver-collect ceiling
    Files.createDirectories(Paths.get(dir))
    val schema = df.schema
    val keyIdx = schema.fieldIndex(keyCol)
    def keyStr(k: Any): String = k match {
      case n: Long => f"$n%09d"
      case n: Int => f"$n%09d"
      case other => other.toString
    }
    val rows = df.collect().groupBy(r => r.get(keyIdx))
    rows.toSeq.sortBy(r => keyStr(r._1)).map { case (key, rs) =>
      val file = s"$dir/${sessionName}_${keyStr(key)}_0.xml"
      val w = new BufferedWriter(new OutputStreamWriter(
        new FileOutputStream(file), "UTF-8"), 1 << 20)
      try {
        w.write("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n<events>\n")
        rs.foreach { r =>
          val name = Option(r.get(schema.fieldIndex("event_name")))
            .map(_.toString).getOrElse("unknown_event")
          val tsAttr = schema.fieldNames.indexOf("e_time_of_event_utc") match {
            case -1 => ""
            case i if r.isNullAt(i) => ""
            case i =>
              val inst = r.getTimestamp(i).toInstant
              s""" timestamp="${java.time.format.DateTimeFormatter.ISO_INSTANT.format(inst)}""""
          }
          w.write(s"""  <event name="${XeXmlFormat.escape(name)}" package="graft"$tsAttr>\n""")
          schema.fields.zipWithIndex.foreach { case (f, i) =>
            val isData = f.name.startsWith("c_")
            val isAction = f.name.startsWith("a_")
            if ((isData || isAction) && !r.isNullAt(i)) {
              val tag = if (isData) "data" else "action"
              val bare = f.name.drop(2)
              val t = XeXmlFormat.xeTypeName(f.dataType)
              val v = valueText(r.get(i), f.dataType)
              w.write(s"""    <$tag name="${XeXmlFormat.escape(bare)}">""" +
                s"""<type name="$t" package="graft"/>""" +
                s"""<value>${XeXmlFormat.escape(v)}</value></$tag>\n""")
            }
          }
          w.write("  </event>\n")
        }
        w.write("</events>\n")
      } finally w.close()
      file
    }
  }

  private def valueText(v: Any, dt: DataType): String = dt match {
    case BinaryType => XeXmlFormat.bytesToHex(v.asInstanceOf[Array[Byte]])
    case TimestampType => java.time.format.DateTimeFormatter.ISO_INSTANT
      .format(v.asInstanceOf[java.sql.Timestamp].toInstant)
    case _ => v.toString
  }
}
