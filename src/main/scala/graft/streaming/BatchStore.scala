package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StructType}

/** Reader for the growing `batch=<id>/` parquet stores the closed
  * ingest loops append to — ONE definition (IngestDedup and
  * NearDupIngest previously carried near-identical copies, and both had
  * the same wedge: an UNschema'd `spark.read.parquet` dies on schema
  * inference when every batch partition is fileless, which is exactly
  * what an all-empty first micro-batch produces — Spark writes no part
  * files for empty tasks — and then every restart replays into the same
  * crash).
  *
  * The read always passes the caller's schema (+ the `batch` partition
  * column) explicitly, so a store of empty partitions is just an empty
  * frame. `excludeBatch` hides one partition — the caller's own batch
  * id on replay, so a replayed batch never sees its previous partial
  * attempt's output and self-refuses (see admitLoop). */
object BatchStore {
  def read(spark: SparkSession, dir: String, schema: StructType,
           excludeBatch: Option[Long] = None): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasBatches = fs.exists(p) && fs.listStatus(p)
      .exists(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
    if (!hasBatches)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else {
      val all = spark.read.schema(schema.add("batch", LongType))
        .parquet(dir)
      excludeBatch.fold(all)(b => all.filter(col("batch") =!= b))
        .select(schema.fieldNames.toSeq.map(col): _*)
    }
  }
}
