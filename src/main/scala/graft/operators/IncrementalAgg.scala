package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the materialized-view refresh
  * algebra that makes a 100 TB rolling metric table affordable: keep a
  * PARTIAL-aggregate state table at group grain (count / sum / min /
  * max over fixed-point longs — all associative and commutative), and
  * on each refresh merge the state with the partials of just the new
  * partition, never rescanning history. The state table is
  * group-cardinality-sized (KBs to GBs), the delta is one partition —
  * the refresh cost is O(delta + |groups|) regardless of how much
  * history the metric covers.
  *
  * Fixed-point longs (micro-units, the codebase-wide pattern) rather
  * than doubles: double sums are addition-order-dependent, so a
  * state+delta merge could drift from a full recompute — exactly the
  * invariant ([[merge]] ∘ [[partials]]* ≡ full aggregate) the
  * `events_incr_refresh` oracle gate proves, which only holds exactly
  * in integer arithmetic.
  */
object IncrementalAgg {

  /** Partial-aggregate state at `keyCols` grain over a fixed-point
    * value: (keys..., cnt, sum_fp, min_fp, max_fp). Map-side combined
    * by Catalyst — at most |groups| rows per input partition reach the
    * exchange. */
  def partials(df: DataFrame, keyCols: Seq[String], valueFp: Column): DataFrame =
    df.groupBy(keyCols.map(col): _*).agg(
      count(valueFp).as("cnt"),
      sum(valueFp).as("sum_fp"),
      min(valueFp).as("min_fp"),
      max(valueFp).as("max_fp"))

  /** Merge partial-state frames (any number ≥ 1) into one state at the
    * same grain — associative/commutative, so refresh order and
    * partition boundaries never change the result. Each input is
    * |groups|-sized; the merge shuffles state rows, never raw data. */
  def merge(states: Seq[DataFrame], keyCols: Seq[String]): DataFrame =
    states.reduce(_ unionByName _)
      .groupBy(keyCols.map(col): _*).agg(
        sum(col("cnt")).as("cnt"),
        sum(col("sum_fp")).as("sum_fp"),
        min(col("min_fp")).as("min_fp"),
        max(col("max_fp")).as("max_fp"))
}
