package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Range (interval) joins — the second time-series join the reference's
 * event model implies but Spark lacks as a built-in (alongside
 * [[AsofJoin]]): match rows on CONTAINMENT (`lo <= p <= hi`) or OVERLAP
 * rather than equality.
 *
 * Naively expressed, both are pure non-equi joins, and Catalyst's only
 * plans for them are BroadcastNestedLoopJoin / CartesianProduct — O(n·m)
 * row comparisons, dead at scale. The fix is the standard bucketization
 * (SURVEY.md §7.1 preference (a): compose existing operators): quantize
 * the range dimension into fixed-width buckets, explode each interval to
 * every bucket it touches, give each point its single bucket, and
 * equi-join on the bucket before verifying the exact predicate. The
 * shuffle is keyed by bucket — linear in input size plus interval span /
 * bucket width — and the per-bucket verify only compares rows that are
 * already within one bucket width of each other.
 *
 * `bucketWidth` trades explode factor against bucket occupancy: pick it
 * near the TYPICAL interval length, so most intervals explode to ~2
 * buckets. Skewed buckets (a hot hour, say) go through the same
 * salting / AQE-skew levers as any equi-join key.
 *
 * All range columns are caller-cast to LONG (epoch micros, days, ids —
 * any totally-ordered integer domain works; this operator does not care
 * which).
 */
object RangeJoin {

  /** Inner join of points to every interval containing them:
    * `lo <= p <= hi`. Output = all point columns + all interval columns
    * (caller pre-projects/renames to avoid collisions). A point has
    * exactly one bucket, so no pair can meet twice — no dedup pass.
    *
    * NULL semantics match a real join: NULL point or NULL endpoint rows
    * never match (sequence() on NULLs would be undefined anyway — they
    * are filtered before the explode).
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, loCol: String, hiCol: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val p = points
      .filter(col(pointCol).isNotNull)
      .withColumn("_rj_bucket", bucket(col(pointCol), bucketWidth))
    val iv = intervals
      .filter(col(loCol).isNotNull && col(hiCol).isNotNull &&
        col(loCol) <= col(hiCol))
      .withColumn("_rj_bucket",
        explode(sequence(bucket(col(loCol), bucketWidth),
          bucket(col(hiCol), bucketWidth))))
    p.join(iv, Seq("_rj_bucket"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("_rj_bucket")
  }

  /** Inner join of interval pairs that OVERLAP: `aLo <= bHi AND bLo <= aHi`
    * (closed intervals). Both sides explode to their bucket ranges; a
    * crossing pair shares every bucket in the overlap region, so the pair
    * is emitted only from ONE canonical bucket — the later of the two
    * start buckets — instead of a distinct() over duplicates.
    */
  def intervalOverlap(a: DataFrame, b: DataFrame,
                      aLo: String, aHi: String, bLo: String, bHi: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    def exploded(df: DataFrame, lo: String, hi: String): DataFrame =
      df.filter(col(lo).isNotNull && col(hi).isNotNull && col(lo) <= col(hi))
        .withColumn("_rj_bucket",
          explode(sequence(bucket(col(lo), bucketWidth),
            bucket(col(hi), bucketWidth))))
    exploded(a, aLo, aHi).join(exploded(b, bLo, bHi), Seq("_rj_bucket"))
      .filter(col(aLo) <= col(bHi) && col(bLo) <= col(aHi))
      // canonical bucket: emit each overlapping pair exactly once
      .filter(col("_rj_bucket") ===
        greatest(bucket(col(aLo), bucketWidth), bucket(col(bLo), bucketWidth)))
      .drop("_rj_bucket")
  }

  /** Floor-division bucket id, correct for negative values too: pmod
    * makes the numerator the exact floor multiple, so the (double)
    * division is exact below 2^53 and — because FP division and the
    * long cast are both monotone — bucket(x) stays monotone in x at ANY
    * magnitude, which is the only property the join proofs above need. */
  private def bucket(c: Column, width: Long): Column =
    ((c - pmod(c, lit(width))) / width).cast("long")
}
