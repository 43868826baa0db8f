package graft.sources

import java.io.{BufferedOutputStream, DataOutputStream, FileOutputStream}
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame

/**
 * Fixture writer for the XELB source: serializes a DataFrame into one
 * .xelb file per key value — the shape of an XE session's rollover set
 * (`SessionName_PartitionID_TimeStampInfo.xel`, `FileProcessor.cs:351`).
 * Driver-side by design: it exists to generate test inputs for the DSv2
 * READ path, which is the production surface; a distributed writer would
 * belong in a `SupportsWrite` extension of [[XelbTable]].
 */
object XelbFixtures {

  def writeByKey(df: DataFrame, keyCol: String, dir: String,
                 sessionName: String = "GraftSession"): Seq[String] = {
    val schema = org.apache.spark.sql.types.StructType(
      df.schema.fields.filter(_.name != keyCol))
    require(schema.fields.forall(f => XelbFormat.supported(f.dataType)),
      s"unsupported column types in ${schema.toDDL}")
    Files.createDirectories(Paths.get(dir))
    val keyIdx = df.schema.fieldIndex(keyCol)
    val rows = df.collect().groupBy(_.get(keyIdx))
    // zero-pad numeric rollover keys: lexical file order must equal
    // numeric arrival order or streaming offsets would remap at key 10
    def keyStr(k: Any): String = k match {
      case n: Long =>
        require(n >= 0, s"rollover keys must be non-negative (got $n): zero-padding " +
          "cannot make negative numbers sort lexically in numeric order")
        f"$n%09d"
      case n: Int =>
        require(n >= 0, s"rollover keys must be non-negative (got $n)")
        f"$n%09d"
      case other => other.toString
    }
    rows.toSeq.sortBy(r => keyStr(r._1)).map { case (key, rs) =>
      val file = s"$dir/${sessionName}_${keyStr(key)}_0.xelb"
      val out = new DataOutputStream(new BufferedOutputStream(new FileOutputStream(file)))
      try {
        XelbFormat.writeHeader(out, schema)
        val proj = rs.map(r => org.apache.spark.sql.Row.fromSeq(
          r.toSeq.zipWithIndex.collect { case (v, i) if i != keyIdx => v }))
        proj.foreach(XelbFormat.writeRecord(out, _, schema))
      } finally out.close()
      file
    }
  }
}
