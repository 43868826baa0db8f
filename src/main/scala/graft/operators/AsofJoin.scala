package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of joins — the time-series joins the reference's event model implies
 * but Spark lacks as built-ins: for each left row, attach the right row
 * nearest in time within the same key group. `backward` takes the most
 * recent right row at-or-before the left time ("the purchase that
 * preceded this click", "the config snapshot active when this event
 * fired"); `forward` the earliest at-or-after ("the next deploy after
 * this alert").
 *
 * Spark-first design (SURVEY.md §7.1 preference (a): compose existing
 * operators). The classic formulations both die at scale:
 *   - theta-join `l.t >= r.t` + row_number: a per-key cross product;
 *   - per-left-row probe: a driver loop.
 * Instead, union the two sides and make ONE window pass per key ordered
 * by time: a right row's payload is carried by
 * `last(payload, ignoreNulls)` onto every left row on its matching side.
 * Cost = one shuffle of (|L| + |R|) rows keyed by the join key, then a
 * linear within-partition sort-scan — the same shape at 60k rows and at
 * 100 TB (skewed keys go through the same salting/AQE levers as any
 * wide join).
 *
 * NULL semantics match a real join (and DuckDB's ASOF JOIN, the oracle):
 * NULLs never match — right rows with NULL key/time are dropped, left
 * rows with NULL key/time come through with NULL payload.
 *
 * Tie semantics: a right row at exactly t matches (<= / >=), so right
 * rows sort ahead of left rows at equal time. Multiple right rows with
 * identical (key, time) are the caller's ambiguity — pre-aggregate the
 * right side to unique (key, time) for deterministic output.
 */
object AsofJoin {

  /** Most recent right at-or-before each left row's time. `tolerance`
    * (same units as the time columns) bounds the look-back: a match
    * farther than `leftTime - tolerance` reads as no match — pandas
    * merge_asof semantics. */
  def backward(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               payloadCols: Seq[String],
               tolerance: Option[Long] = None): DataFrame =
    join(left, right, key, leftTime, rightTime, payloadCols,
      descending = false, tolerance)

  /** Earliest right at-or-after each left row's time — the mirror: the
    * window runs from the future backwards (descending time), right rows
    * still ahead of same-time left rows. `tolerance` bounds the
    * look-ahead symmetrically. */
  def forward(left: DataFrame, right: DataFrame, key: String,
              leftTime: String, rightTime: String,
              payloadCols: Seq[String],
              tolerance: Option[Long] = None): DataFrame =
    join(left, right, key, leftTime, rightTime, payloadCols,
      descending = true, tolerance)

  private def join(left: DataFrame, right: DataFrame, key: String,
                   leftTime: String, rightTime: String,
                   payloadCols: Seq[String], descending: Boolean,
                   tolerance: Option[Long]): DataFrame = {
    val leftCols = left.columns.toSeq
    // caller-supplied names are data, not dot-paths: resolve them quoted
    // so `purchase.value` means the top-level column of that name
    def qcol(n: String): Column = col("`" + n.replace("`", "``") + "`")
    // the carried struct leads with the right row's own time (hidden
    // field _asof_rt) so a tolerance bound can measure the match gap
    // after the window pass; payload columns must not use that name
    require(!payloadCols.contains("_asof_rt"), "payload column name _asof_rt is reserved")
    val payFields = qcol(rightTime).as("_asof_rt") +: payloadCols.map(qcol)
    val payDdl = structDdl(right.select(payFields: _*))
    val rowDdl = structDdl(left)
    // right rows get priority 0 so they sort ahead of left rows at equal
    // time — that is exactly the <= / >= tie inclusion
    val l = left.select(
      qcol(key).as("_asof_k"), qcol(leftTime).as("_asof_t"),
      lit(1).as("_asof_prio"),
      lit(null).cast(payDdl).as("_asof_pay"),
      struct(leftCols.map(qcol): _*).as("_asof_row"))
    val r = right
      // NULLs never match: a NULL-key/time right row would otherwise sort
      // into a real position and leak its payload onto left rows
      .filter(qcol(key).isNotNull && qcol(rightTime).isNotNull)
      .select(
        qcol(key).as("_asof_k"), qcol(rightTime).as("_asof_t"),
        lit(0).as("_asof_prio"),
        struct(payFields: _*).as("_asof_pay"),
        lit(null).cast(rowDdl).as("_asof_row"))
    val timeOrder = if (descending) col("_asof_t").desc_nulls_last
                    else col("_asof_t").asc_nulls_first
    val w = Window.partitionBy(col("_asof_k"))
      .orderBy(timeOrder, col("_asof_prio"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // a NULL-time left row must see no payload: asc puts it before every
    // right row already; desc would put it after them, so mask explicitly
    val leftNull = col("_asof_k").isNull || col("_asof_t").isNull
    l.unionByName(r)
      .withColumn("_asof_carried",
        when(leftNull, lit(null).cast(payDdl))
          .otherwise(last(col("_asof_pay"), ignoreNulls = true).over(w)))
      // tolerance: a carried match whose gap exceeds the bound reads as
      // no match (pandas merge_asof); gap sign follows the direction
      .withColumn("_asof_carried", tolerance.fold(col("_asof_carried")) { tol =>
        val rt = col("_asof_carried").getField("_asof_rt")
        val gap = if (descending) rt - col("_asof_t") else col("_asof_t") - rt
        when(gap > tol, lit(null).cast(payDdl)).otherwise(col("_asof_carried"))
      })
      .filter(col("_asof_prio") === 1)
      .select(leftCols.map(c => col("_asof_row").getField(c).as(c)) ++
        payloadCols.map(c => col("_asof_carried").getField(c).as(c)): _*)
  }

  /** DDL string of a DataFrame's schema as a struct type — used to type
    * the null columns on the side that doesn't carry them. Field names
    * are backtick-quoted (internal backticks doubled) so dots, spaces,
    * colons, commas in column names survive the DDL round-trip. */
  private def structDdl(df: DataFrame): String =
    "struct<" + df.schema.fields
      .map(f => s"`${f.name.replace("`", "``")}`:${f.dataType.sql}")
      .mkString(",") + ">"
}
