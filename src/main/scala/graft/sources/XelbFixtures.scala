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

  /** Hard ceiling on rows a fixture writer will `collect()`: these
    * writers are driver-side BY DESIGN (they generate test inputs for
    * the DSv2 read path), and every caller slices its input to a few
    * thousand rows — but that bound has always lived in the CALLER. A
    * regenerated fixture or a dropped filter must fail here, loudly,
    * instead of silently turning the collect into a driver OOM.
    * Distributed writes belong to `XelNativeFixtures.writeDistributed`. */
  private[graft] val MaxFixtureRows = 100000L

  private[sources] def guardRows(df: DataFrame, who: String): Unit = {
    // limit+1 bounds the guard's own cost: the count job stops scanning
    // at the ceiling instead of counting an unexpectedly-huge frame
    val n = df.limit(MaxFixtureRows.toInt + 1).count()
    require(n <= MaxFixtureRows,
      s"$who.writeByKey collects to the driver by design and refuses > " +
        s"$MaxFixtureRows rows (got at least $n) — slice the input, or use " +
        "XelNativeFixtures.writeDistributed for large fixtures")
  }

  def writeByKey(df: DataFrame, keyCol: String, dir: String,
                 sessionName: String = "GraftSession"): Seq[String] = {
    val schema = org.apache.spark.sql.types.StructType(
      df.schema.fields.filter(_.name != keyCol))
    require(schema.fields.forall(f => XelbFormat.supported(f.dataType)),
      s"unsupported column types in ${schema.toDDL}")
    guardRows(df, "XelbFixtures")
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
