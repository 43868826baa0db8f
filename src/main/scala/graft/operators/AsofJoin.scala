package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Backward as-of join — the time-series join the reference's event model
 * implies but Spark lacks as a built-in: for each left row, attach the
 * most recent right row whose time is <= the left row's time, within the
 * same key group (e.g. "the purchase that preceded this click", "the
 * config snapshot active when this event fired").
 *
 * Spark-first design (SURVEY.md §7.1 preference (a): compose existing
 * operators). The classic formulations both die at scale:
 *   - theta-join `l.t >= r.t` + row_number: a per-key cross product;
 *   - per-left-row probe: a driver loop.
 * Instead, union the two sides and make ONE window pass per key ordered
 * by time: a right row's payload is carried forward by
 * `last(payload, ignoreNulls)` onto every later left row. Cost = one
 * shuffle of (|L| + |R|) rows keyed by the join key, then a linear
 * within-partition sort-scan — the same shape at 60k rows and at 100 TB
 * (skewed keys go through the same salting/AQE levers as any wide join).
 *
 * Tie semantics: a right row at exactly t matches a left row at t
 * (`<=`), so right rows sort BEFORE left rows at equal time. Multiple
 * right rows with identical (key, time) are the caller's ambiguity —
 * pre-aggregate the right side to unique (key, time) for deterministic
 * output (mirrors DuckDB's ASOF JOIN contract used as the oracle).
 */
object AsofJoin {

  /** @param payloadCols right-side columns to attach (null when no right
    *                    row is at-or-before the left row's time) */
  def backward(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // right rows get priority 0 so they sort before left rows at equal
    // time — that is exactly the <= in "most recent right with t <= left"
    val l = left.select(
      col(key).as("_asof_k"), col(leftTime).as("_asof_t"),
      lit(1).as("_asof_prio"),
      lit(null).cast(StructTypeDdl.of(right.select(payloadCols.map(col): _*)))
        .as("_asof_pay"),
      struct(leftCols.map(col): _*).as("_asof_row"))
    val r = right.select(
      col(key).as("_asof_k"), col(rightTime).as("_asof_t"),
      lit(0).as("_asof_prio"),
      struct(payloadCols.map(col): _*).as("_asof_pay"),
      lit(null).cast(StructTypeDdl.of(left)).as("_asof_row"))
    val w = Window.partitionBy(col("_asof_k"))
      .orderBy(col("_asof_t"), col("_asof_prio"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("_asof_carried", last(col("_asof_pay"), ignoreNulls = true).over(w))
      .filter(col("_asof_prio") === 1)
      .select(leftCols.map(c => col(s"_asof_row.$c").as(c)) ++
        payloadCols.map(c => col(s"_asof_carried.$c").as(c)): _*)
  }

  /** Forward as-of join — the mirror: for each left row, the EARLIEST
    * right row with time >= the left row's time ("the next deploy after
    * this alert"). Same single-shuffle union+window shape, with the
    * window running from the future backwards: descending time order,
    * right rows still sorting ahead of same-time left rows (>=). */
  def forward(left: DataFrame, right: DataFrame, key: String,
              leftTime: String, rightTime: String,
              payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left.select(
      col(key).as("_asof_k"), col(leftTime).as("_asof_t"),
      lit(1).as("_asof_prio"),
      lit(null).cast(StructTypeDdl.of(right.select(payloadCols.map(col): _*)))
        .as("_asof_pay"),
      struct(leftCols.map(col): _*).as("_asof_row"))
    val r = right.select(
      col(key).as("_asof_k"), col(rightTime).as("_asof_t"),
      lit(0).as("_asof_prio"),
      struct(payloadCols.map(col): _*).as("_asof_pay"),
      lit(null).cast(StructTypeDdl.of(left)).as("_asof_row"))
    val w = Window.partitionBy(col("_asof_k"))
      .orderBy(col("_asof_t").desc, col("_asof_prio"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("_asof_carried", last(col("_asof_pay"), ignoreNulls = true).over(w))
      .filter(col("_asof_prio") === 1)
      .select(leftCols.map(c => col(s"_asof_row.$c").as(c)) ++
        payloadCols.map(c => col(s"_asof_carried.$c").as(c)): _*)
  }
}

/** DDL string of a DataFrame's schema as a struct type — used to type
  * the null-payload column on the side that doesn't carry it. */
private object StructTypeDdl {
  def of(df: DataFrame): String =
    "struct<" + df.schema.fields
      .map(f => s"${f.name}:${f.dataType.sql}").mkString(",") + ">"
}
