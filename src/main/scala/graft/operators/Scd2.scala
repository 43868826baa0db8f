package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 history builder — the CDC/merge
  * surface a warehouse loader (the reference's SQL Server target:
  * `/root/reference/README.md:29`) gives its users via `MERGE INTO`,
  * re-expressed as one declarative window chain.
  *
  * Input is the VERSION stream: the initial snapshot plus every change
  * image, each row a full attribute image stamped with its
  * effective-from instant (exactly what a CDC feed or nightly batch
  * extract delivers). Output is the type-2 history: per key, the
  * surviving versions chained into [effective_from, effective_to)
  * intervals with a version number and an is-current flag.
  *
  * Semantics pinned by Scd2Spec:
  *  - consecutive no-op images (all tracked attributes unchanged
  *    vs the previous surviving version) are DROPPED — a CDC feed
  *    that re-emits unchanged rows must not fragment history;
  *  - intervals chain over the survivors: effective_to = next
  *    survivor's effective_from, `endOfTime` (9999-12-31 by
  *    convention) on the open current row;
  *  - version numbers are dense over survivors, 1-based.
  *
  * Scale: the whole operator is two window passes over ONE
  * key-hash exchange (the no-op filter preserves the sort, so
  * Catalyst plans a single Exchange + Sort feeding both Window
  * operators — plan-gated in PlanSpec). State is never driver-side;
  * a 10⁹-row dimension with 10⁸ daily changes shuffles each row
  * once by key.
  */
object Scd2 {

  /** Build the type-2 history from a version stream.
    *
    * @param versions  snapshot ∪ change images; one row per (key, image),
    *                  full attribute image per row
    * @param keyCols   business-key columns
    * @param attrCols  tracked attribute columns (change detection is
    *                  null-safe over this set)
    * @param fromCol   effective-from column (date or timestamp)
    * @param endOfTime high-date sentinel for the open current row —
    *                  must be a literal of `fromCol`'s type
    * @param tieCols   deterministic order WITHIN an effective-from
    *                  instant (the [[Sessions.assign]] tieCol contract):
    *                  a CDC feed that can emit several images of one key
    *                  at the same instant (snapshot + same-instant
    *                  correction) MUST pass its arrival-order column
    *                  here — without it the window order is non-unique,
    *                  so survivor choice and version numbering become
    *                  partitioning-dependent, and two survivors at one
    *                  instant produce a zero-width [d, d) interval no
    *                  validity lookup can match
    */
  def history(versions: DataFrame, keyCols: Seq[String], attrCols: Seq[String],
              fromCol: String = "effective_from",
              endOfTime: Column = to_date(lit("9999-12-31")),
              tieCols: Seq[String] = Seq.empty): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((fromCol +: tieCols).map(col): _*)
    val attrs = struct(attrCols.map(col): _*)
    // null-safe change detection: the first image per key has a NULL
    // lag-struct, and `x <=> null` is false, so it always survives
    val kept = versions
      .withColumn("_prev_img", lag(attrs, 1).over(w))
      .filter(!(attrs <=> col("_prev_img")))
      .drop("_prev_img")
    // second pass over the SURVIVORS with the same (partition, order)
    // spec: the filter preserves the exchange and the sort, so this adds
    // a Window operator, not a shuffle
    kept
      .withColumn("effective_to",
        coalesce(lead(col(fromCol), 1).over(w), endOfTime))
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("is_current", col("effective_to") === endOfTime)
  }
}
