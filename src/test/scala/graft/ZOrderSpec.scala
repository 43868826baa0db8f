package graft

import graft.operators.ZOrder
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkTestBase {
  import spark.implicits._

  test("zValue interleaves bits: known vectors") {
    // bit i of x -> position 2i, bit i of y -> position 2i+1
    val got = Seq((1L, 0L), (0L, 1L), (3L, 3L), (5L, 2L), (65535L, 65535L))
      .toDF("x", "y")
      .select(ZOrder.zValue(col("x"), col("y")).as("z"))
      .as[Long].collect().toSeq
    assert(got == Seq(1L, 2L, 15L, 25L, (1L << 32) - 1))
  }

  test("zValue equals the generated SQL formula on random input") {
    val rnd = new scala.util.Random(3)
    val df = (1 to 500).map(_ =>
      (rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong)).toDF("x", "y")
    val viaCol = df.select(col("x"), col("y"),
      ZOrder.zValue(col("x"), col("y")).as("z1"))
    val viaSql = viaCol.withColumn("z2", expr(ZOrder.zOrderSql("x", "y")))
    assert(viaSql.filter(col("z1") =!= col("z2")).count() == 0)
  }

  test("zValueN: N=2 matches zValue; N=3 places bits round-robin") {
    val df = Seq((5L, 2L, 1L)).toDF("x", "y", "w")
    val r = df.select(
      ZOrder.zValue(col("x"), col("y")).as("z2"),
      ZOrder.zValueN(Seq(col("x"), col("y")), 16).as("z2n"),
      ZOrder.zValueN(Seq(col("x"), col("y"), col("w")), 4).as("z3")).head()
    assert(r.getLong(0) == r.getLong(1))
    // x=101b -> positions 0,6; y=10b -> position 4; w=1b -> position 2
    assert(r.getLong(2) == ((1L << 0) | (1L << 6) | (1L << 4) | (1L << 2)))
  }

  test("z-layout prunes parquet row groups on a y-only predicate (measured, not a proxy)") {
    // The skipping claim, measured end-to-end: write the SAME rows in a
    // z-sorted layout and an x-sorted layout with ~64 KB row groups, run
    // the same pushed-down y-range predicate over both, and read the
    // scan's numOutputRows metric — the rows the parquet READER produced
    // after row-group min/max pruning (Spark re-filters on top). In the
    // z layout every row group covers a bounded y-rectangle, so groups
    // missing the y range are skipped; in the x-sorted layout y is
    // unsorted within every group and nothing can be skipped.
    val n = 200000
    val rnd = new scala.util.Random(11)
    val data = (1 to n).map(_ =>
      (rnd.nextInt(16384).toLong, rnd.nextInt(16384).toLong)).toDF("x", "y")
      .withColumn("z", ZOrder.zValue(col("x"), col("y"), 14))
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    data.repartitionByRange(4, col("z")).sortWithinPartitions("z")
      .write.option("parquet.block.size", 64 * 1024).parquet(s"$dir/zsort")
    data.repartitionByRange(4, col("x")).sortWithinPartitions("x")
      .write.option("parquet.block.size", 64 * 1024).parquet(s"$dir/xsort")
    def scanRows(path: String): (Long, Long) = {
      val q = spark.read.parquet(path)
        .filter(col("y") >= 1000L && col("y") < 1500L)
      val matched = q.collect().length.toLong
      val readerRows = flattenPlan(q.queryExecution.executedPlan)
        .collect { case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.metrics("numOutputRows").value }
        .sum
      (matched, readerRows)
    }
    val (zMatched, zRead) = scanRows(s"$dir/zsort")
    val (xMatched, xRead) = scanRows(s"$dir/xsort")
    assert(zMatched == xMatched, "both layouts must return identical rows")
    // x-sorted layout: y is unsorted everywhere, no group can be skipped
    assert(xRead == n, s"x-sorted layout unexpectedly pruned: read $xRead of $n")
    // z layout: the y-range covers ~1/32 of the y domain; bounded-y row
    // groups must actually skip — demand at least a 3x read reduction
    assert(zRead * 3 <= n,
      s"z layout pruned too little: reader produced $zRead of $n rows")
  }

  test("coarse z-buckets bound BOTH dimensions (the file-skipping property)") {
    val rnd = new scala.util.Random(9)
    val df = (1 to 5000).map(_ =>
      (rnd.nextInt(20000).toLong, rnd.nextInt(1000).toLong)).toDF("x", "y")
    // bucket = z >> 20 → a 1024×1024 z-square: max in-bucket span ≤ 1023
    // in EACH dimension. A plain sort by x gives y spans the full domain.
    val spans = df
      .withColumn("b", shiftright(ZOrder.zValue(col("x"), col("y")), 20))
      .groupBy("b")
      .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
    assert(spans.filter(col("sx") > 1023 || col("sy") > 1023).count() == 0)
  }
}
