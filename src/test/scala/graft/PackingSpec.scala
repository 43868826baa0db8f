package graft

import graft.corpus.Packing
import org.apache.spark.sql.functions._

class PackingSpec extends SparkTestBase {
  import spark.implicits._

  test("selectWithinBudget: greedy best-first fill, budget-crossing doc rejected") {
    val docs = Seq(
      // (id, stratum, score, cost)
      (1L, "a", 0.9, 40L), (2L, "a", 0.8, 40L), (3L, "a", 0.7, 40L),
      (4L, "a", 0.6, 10L), // still rejected: cum at rank-4 = 130 > 100
      (5L, "b", 0.5, 100L)
    ).toDF("doc_id", "src", "score", "cost")
    val kept = Packing.selectWithinBudget(docs, "src", "doc_id",
        col("score"), col("cost"), budget = 100L)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(1L, 2L, 5L),
      "cut must be monotone in score order — no later doc sneaks under the line")
  }

  test("chunk: overlap, tail chunk, empty doc") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "")                                        // no chunks
    ).toDF("doc_id", "text")
    val got = Packing.chunk(docs, "doc_id", "text", chunkSize = 4, stride = 3)
      .orderBy("doc_id", "chunk_idx").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    // starts 1,4,7,10 → lens 4,4,4,1
    assert(got.toSeq == Seq((1L, 0, 4), (1L, 1, 4), (1L, 2, 4), (1L, 3, 1)))
  }

  test("packOffsets refuses binSize < 1 (div-by-zero would null silently)") {
    val docs = Seq((1L, "a", 300)).toDF("doc_id", "src", "n")
    intercept[IllegalArgumentException] {
      Packing.packOffsets(docs, "src", "doc_id", col("n"), binSize = 0)
    }
  }

  test("packOffsets: offsets contiguous per stratum, bin spans exact") {
    val docs = Seq(
      (1L, "a", 300), (2L, "a", 300), (3L, "a", 500), (4L, "b", 10)
    ).toDF("doc_id", "src", "n")
    val got = Packing.packOffsets(docs, "src", "doc_id", col("n"), binSize = 512)
      .orderBy("src", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getLong(5)))
    // a: doc1 [0,300) bin0; doc2 [300,600) bins 0-1; doc3 [600,1100) bins 1-2
    assert(got.toSeq == Seq(
      (1L, 0L, 0L, 1L), (2L, 300L, 0L, 2L), (3L, 600L, 1L, 2L), (4L, 0L, 0L, 1L)))
  }
}
