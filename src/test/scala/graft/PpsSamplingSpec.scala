package graft

import graft.corpus.Dedup
import org.apache.spark.sql.functions._

/** Sequential Poisson (PPS) sampling: determinism under repartitioning
  * and the weight-proportional selection property. */
class PpsSamplingSpec extends SparkTestBase {
  import spark.implicits._

  test("ppsSample is deterministic and partitioning-independent") {
    val docs = (1L to 500L).map(i => (i, "s", 10L + i % 90)).toDF("id", "src", "w")
    val a = Dedup.ppsSample(docs, "id", "src", col("w"), 20, "t")
      .select("id").as[Long].collect().sorted
    val b = Dedup.ppsSample(docs.repartition(7), "id", "src", col("w"), 20, "t")
      .select("id").as[Long].collect().sorted
    assert(a.sameElements(b) && a.length == 20)
  }

  test("heavier items are selected far more often (PPS property)") {
    // two weight classes, 1:50 — across many salts, heavy items must
    // dominate the sample
    val docs = ((1L to 100L).map(i => (i, "s", 1L)) ++
      (101L to 200L).map(i => (i, "s", 50L))).toDF("id", "src", "w")
    val heavyFrac = (1 to 5).map { s =>
      val kept = Dedup.ppsSample(docs, "id", "src", col("w"), 20, s"salt$s")
        .select("id").as[Long].collect()
      kept.count(_ > 100L).toDouble / kept.length
    }.sum / 5
    assert(heavyFrac > 0.8, s"heavy fraction $heavyFrac should approach 1")
  }

  test("per-stratum cap honored with tie-free deterministic ranking") {
    val docs = (1L to 60L).map(i => (i, if (i % 2 == 0) "a" else "b", 5L))
      .toDF("id", "src", "w")
    val kept = Dedup.ppsSample(docs, "id", "src", col("w"), 7, "x")
      .groupBy("src").count().as[(String, Long)].collect().toMap
    assert(kept == Map("a" -> 7L, "b" -> 7L))
  }
}
