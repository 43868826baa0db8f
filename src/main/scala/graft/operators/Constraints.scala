package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Declarative data-quality checks (the dbt-tests / Deequ-style audit
 * surface): a named list of constraints evaluated over a frame in ONE
 * aggregation pass, returning a per-check violation census. Two check
 * kinds cover the standard battery:
 *
 *  - row checks: a violation PREDICATE evaluated per row (not-null,
 *    accepted-values, range, non-empty, custom boolean logic) —
 *    aggregated as conditional sums, all inside one map-side-combined
 *    reduce;
 *  - uniqueness checks: violations = count(col) − countDistinct(col)
 *    (the duplicate surplus) — these ride the SAME aggregate (Spark
 *    plans the distinct aggregates via Expand).
 *
 * Scale: one pass over the frame regardless of how many checks are
 * declared — a 100 TB audit costs one scan, not one scan per check.
 * Output: (check_name, n_rows, n_violations, passed), one row per
 * check, in declaration order via the check name's sort prefix or the
 * caller's ORDER BY.
 */
object Constraints {

  sealed trait Check { def name: String }
  /** `violation` is TRUE on rows that break the constraint. */
  final case class RowCheck(name: String, violation: Column) extends Check
  /** duplicate-surplus uniqueness on one column (nulls not counted). */
  final case class UniqueCheck(name: String, column: String) extends Check

  def notNull(name: String, c: Column): RowCheck = RowCheck(name, c.isNull)
  def acceptedValues(name: String, c: Column, allowed: Seq[String]): RowCheck =
    RowCheck(name, c.isNull || !c.isin(allowed: _*))
  def inRange(name: String, c: Column, lo: Long, hi: Long): RowCheck =
    RowCheck(name, c.isNull || c < lo || c > hi)

  /** Evaluate every check in one aggregation pass. */
  def audit(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "Constraints.audit needs at least one check")
    // coalesce: sum over a ZERO-ROW frame is NULL, which would make an
    // empty-partition audit report passed = NULL (neither pass nor
    // fail) for row checks while unique checks report 0/true
    val aggs = checks.zipWithIndex.map {
      case (RowCheck(_, viol), i) =>
        coalesce(sum(when(viol, 1L).otherwise(0L)), lit(0L)).as(s"v$i")
      case (UniqueCheck(_, c), i) =>
        (count(col(c)) - countDistinct(col(c))).as(s"v$i")
    }
    val row = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    // unstack to one row per check with typed Columns (never string SQL:
    // a quote or other metacharacter in a check name must stay data)
    val pairs = checks.zipWithIndex.map { case (c, i) =>
      struct(lit(c.name).as("check_name"), col(s"v$i").as("n_violations"))
    }
    row.select(col("n_rows"), explode(array(pairs: _*)).as("kv"))
      .select(col("kv.check_name").as("check_name"), col("n_rows"),
        col("kv.n_violations").as("n_violations"),
        (col("kv.n_violations") === 0L).as("passed"))
  }
}
