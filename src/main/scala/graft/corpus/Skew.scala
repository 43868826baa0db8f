package graft.corpus

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew-mitigation operators (the "salting" leg of the 100 TB design).
 * A hot key — one session id carrying 10% of a day's events, one dup-text
 * digest with a million copies — turns a hash-partitioned join or
 * aggregate into a single straggler task. Salting splits each hot key's
 * rows across `saltBuckets` partitions and reassembles exact results.
 *
 * AQE's skew-join handling covers sort-merge joins after the fact; these
 * operators are for the cases AQE does not rewrite (broadcast-side
 * explosion, two-stage aggregates) and for pinning the plan shape
 * deterministically.
 */
object Skew {

  /** Salted equi-join: the big (skewed) side gets a per-row salt in
    * [0, saltBuckets); the small side is replicated once per salt value.
    * Join keys become (key, salt) — a hot key's rows now land on
    * `saltBuckets` reducers instead of one. Exact same rows as the
    * unsalted join (inner). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltBuckets: Int): DataFrame = {
    // rand(seed) is fine here: ANY salt distribution yields correct
    // results, determinism of the assignment is not required for the
    // join output to be exact.
    val saltedBig = big.withColumn("__salt", (rand(42) * saltBuckets).cast("int"))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedBig.join(replicatedSmall,
        saltedBig(key) === replicatedSmall(key) &&
          saltedBig("__salt") === replicatedSmall("__salt"))
      .drop(replicatedSmall(key))
      .drop("__salt")
  }

  /** Two-stage salted aggregation for algebraic aggregates (sum/count/
    * min/max): stage 1 aggregates per (key, salt) — spreading a hot key
    * over many reducers — stage 2 combines the partials per key. For
    * count-distinct-style queries, first-stage dedup on (key, salt, value)
    * bounds the second stage by the distinct count, not the row count. */
  def saltedSumCount(df: DataFrame, key: Column, value: Column,
                     saltBuckets: Int): DataFrame = {
    val salted = df.withColumn("__salt", (rand(42) * saltBuckets).cast("int"))
    salted.groupBy(key.as("k"), col("__salt"))
      .agg(sum(value).as("partial_sum"), count(lit(1)).as("partial_n"))
      .groupBy(col("k"))
      .agg(sum(col("partial_sum")).as("total"), sum(col("partial_n")).as("n"))
  }
}
