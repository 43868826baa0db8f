package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Blocked approximate-string matching (entity-resolution resolve): map
 * each "dirty" string to its best match in a clean dictionary under an
 * edit-distance budget. The classic use in a training-data pipeline is
 * reconciling noisy metadata — product names, author strings, domain
 * labels — against a canonical vocabulary before grouping on it.
 *
 * Blocking contract: candidate pairs are generated ONLY within a block
 * (shared `prefixLen`-char prefix) and further gated by a length band
 * before the edit distance runs. That is the standard ER trade: the
 * block key bounds per-block pair work (no all-pairs O(|dirty|·|clean|)
 * product), and the operator's declared semantics are "best match among
 * same-block candidates" — a typo model that corrupts the block prefix
 * is out of scope by contract, not silently missed.
 *
 * Scale: the join is a plain equi-join on the block key, so Catalyst
 * hash-partitions both sides by prefix; `levenshtein` (codegen'd
 * builtin) runs only on within-block, length-banded survivors. Clean
 * dictionaries are vocab-bounded (distinct names, not corpus rows) —
 * callers with a small dictionary should pass it through
 * `functions.broadcast` to keep the dirty side shuffle-free.
 */
object FuzzyMatch {

  /** For each distinct value of `dirty(dirtyCol)`, the best match among
    * distinct `clean(cleanCol)` values sharing its `prefixLen`-char
    * block whose length differs by ≤ `lenBand` and whose Levenshtein
    * distance is ≤ `maxDist`. Winner = (min distance, lexicographically
    * smallest match) — fully deterministic. Output columns:
    * (dirty, best_match, dist, n_candidates); dirty values with no
    * qualifying candidate are absent (callers left-join if they need
    * explicit misses). */
  def bestMatch(dirty: DataFrame, clean: DataFrame, dirtyCol: String,
                cleanCol: String, maxDist: Int, lenBand: Int,
                prefixLen: Int = 1): DataFrame = {
    val d = dirty.select(col(dirtyCol).as("dirty")).distinct()
      .withColumn("blk", substring(col("dirty"), 1, prefixLen))
    val c = clean.select(col(cleanCol).as("best_match")).distinct()
      .withColumn("blk", substring(col("best_match"), 1, prefixLen))
    val cand = d.join(c, Seq("blk"))
      .filter(abs(length(col("dirty")) - length(col("best_match"))) <= lenBand)
      .withColumn("dist", levenshtein(col("dirty"), col("best_match")).cast("long"))
      .filter(col("dist") <= maxDist)
    val byDirty = Window.partitionBy(col("dirty"))
    cand
      .withColumn("n_candidates", count(lit(1)).over(byDirty))
      .withColumn("rn",
        row_number().over(byDirty.orderBy(col("dist"), col("best_match"))))
      .filter(col("rn") === 1)
      .select(col("dirty"), col("best_match"), col("dist"), col("n_candidates"))
  }
}
