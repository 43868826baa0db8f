package graft

import graft.operators.{IncrementalAgg, Scd2}
import org.apache.spark.sql.functions._

/** Semantics of the SCD type-2 history builder and the incremental
  * aggregate maintenance algebra (their oracle rows prove cross-engine
  * parity; these pin the operator CONTRACTS on adversarial inputs the
  * fixture-derived queries don't exercise). */
class Scd2Spec extends SparkTestBase {
  import spark.implicits._

  private def hist(rows: Seq[(Long, String, String, String)]) =
    Scd2.history(
      rows.toDF("k", "a", "b", "d").withColumn("effective_from", to_date(col("d")))
        .drop("d"),
      Seq("k"), Seq("a", "b"))
      .select("k", "a", "b", "effective_from", "effective_to", "version",
        "is_current")

  test("no-op re-emissions are suppressed; intervals chain over survivors") {
    val out = hist(Seq(
      (1L, "x", "p", "2020-01-01"),
      (1L, "x", "p", "2020-06-01"), // CDC re-emission — must vanish
      (1L, "y", "p", "2021-01-01"),
      (1L, "y", "p", "2021-06-01"), // again
      (1L, "y", "q", "2022-01-01")))
      .orderBy("version")
      .collect()
    assert(out.length === 3)
    // interval chain skips the dropped rows: 2020-01-01 → 2021-01-01
    assert(out(0).getDate(3).toString === "2020-01-01")
    assert(out(0).getDate(4).toString === "2021-01-01")
    assert(out(1).getDate(4).toString === "2022-01-01")
    assert(out(2).getDate(4).toString === "9999-12-31")
    assert(out.map(_.getLong(5)).toSeq === Seq(1L, 2L, 3L))
    assert(out.map(_.getBoolean(6)).toSeq === Seq(false, false, true))
  }

  test("attribute flip-back is a real change, not a no-op") {
    // x → y → x: all three survive (only CONSECUTIVE equality drops)
    val out = hist(Seq(
      (1L, "x", "p", "2020-01-01"),
      (1L, "y", "p", "2021-01-01"),
      (1L, "x", "p", "2022-01-01")))
    assert(out.count() === 3)
  }

  test("null attributes compare null-safely") {
    val rows = Seq(
      (1L, null.asInstanceOf[String], "p", "2020-01-01"),
      (1L, null.asInstanceOf[String], "p", "2020-06-01"), // null == null: no-op
      (1L, "x", "p", "2021-01-01"), // null → x: change
      (1L, null.asInstanceOf[String], "p", "2022-01-01")) // x → null: change
    val out = hist(rows).orderBy("version").collect()
    assert(out.length === 3)
    assert(out.map(_.getLong(5)).toSeq === Seq(1L, 2L, 3L))
  }

  test("keys never mix; single-version keys are current from the start") {
    val out = hist(Seq(
      (1L, "x", "p", "2020-01-01"),
      (2L, "x", "p", "2020-01-01"),
      (2L, "y", "p", "2021-01-01")))
    val k1 = out.filter(col("k") === 1).collect()
    assert(k1.length === 1 && k1(0).getBoolean(6))
    assert(out.filter(col("is_current")).count() === 2)
  }

  test("incremental merge over any partition split equals the full aggregate") {
    val ev = (1L to 1000L).map(i => (s"t${i % 7}", i * 13 % 997)).toDF("k", "v")
    val full = IncrementalAgg.partials(ev, Seq("k"), col("v"))
    // three-way split on an unrelated predicate, merged in two shapes
    val parts = Seq(ev.filter(col("v") % 3 === 0), ev.filter(col("v") % 3 === 1),
      ev.filter(col("v") % 3 === 2)).map(IncrementalAgg.partials(_, Seq("k"), col("v")))
    val m1 = IncrementalAgg.merge(parts, Seq("k"))
    val m2 = IncrementalAgg.merge(Seq(
      IncrementalAgg.merge(parts.take(2), Seq("k")), parts(2)), Seq("k"))
    assert(m1.except(full).isEmpty && full.except(m1).isEmpty)
    assert(m2.except(full).isEmpty && full.except(m2).isEmpty)
  }

  test("merge with an empty delta is the identity") {
    val ev = (1L to 50L).map(i => ("a", i)).toDF("k", "v")
    val state = IncrementalAgg.partials(ev, Seq("k"), col("v"))
    val delta = IncrementalAgg.partials(ev.filter(col("v") > 1000), Seq("k"), col("v"))
    val merged = IncrementalAgg.merge(Seq(state, delta), Seq("k"))
    assert(merged.except(state).isEmpty && state.except(merged).isEmpty)
  }

  test("same-instant images order deterministically via tieCols") {
    val rows = Seq(
      (1L, "x", "p", "2020-01-01", 1L),
      (1L, "y", "p", "2020-01-01", 2L), // same-instant correction
      (1L, "z", "p", "2021-01-01", 3L))
    val out = Scd2.history(
      rows.toDF("k", "a", "b", "d", "seq")
        .withColumn("effective_from", to_date(col("d"))).drop("d"),
      Seq("k"), Seq("a", "b"), tieCols = Seq("seq"))
      .orderBy("version").collect()
    // arrival order decides: x then its same-instant correction y (a
    // zero-width interval — never valid, which is the correct reading of
    // a superseded same-instant image), then z
    // raw history output: k, a, b, seq, effective_from, effective_to,
    // version, is_current
    assert(out.map(_.getString(1)).toSeq === Seq("x", "y", "z"))
    assert(out(0).getDate(5).toString === "2020-01-01") // zero-width
    assert(out(1).getDate(5).toString === "2021-01-01")
    assert(out(2).getBoolean(7))
  }

  test("property: history matches an in-memory reference on random version streams") {
    // deterministic LCG — no Random seed ambiguity across runs
    var s = 0x2545F4914F6CDD1DL
    def next(n: Int): Int = { s = s * 6364136223846793005L + 1442695040888963407L
      (((s >>> 33) % n + n) % n).toInt }
    val attrs = Array("p", "q", "r", null)
    val streams = (1 to 5).map { _ =>
      // per key: 1-6 images at strictly increasing dates with random attrs
      (1L to 20L).flatMap { k =>
        val m = 1 + next(6)
        (0 until m).map { i =>
          (k, attrs(next(4)), attrs(next(4)),
            java.sql.Date.valueOf(f"20${10 + i}%02d-0${1 + next(9)}%01d-15"))
        }
      }
    }
    for (rows <- streams) {
      val got = Scd2.history(
        rows.toDF("k", "a", "b", "effective_from"), Seq("k"), Seq("a", "b"))
        .select("k", "a", "b", "effective_from", "effective_to", "version")
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getDate(3).toString, r.getDate(4).toString, r.getLong(5)))
        .toSet
      // reference: per key sort by date, drop consecutive-equal images,
      // chain intervals, number versions
      val want = rows.groupBy(_._1).flatMap { case (k, imgs) =>
        val sorted = imgs.sortBy(_._4.toString)
        val kept = sorted.foldLeft(Vector.empty[(Long, String, String, java.sql.Date)]) {
          (acc, img) =>
            if (acc.nonEmpty && acc.last._2 == img._2 && acc.last._3 == img._3) acc
            else acc :+ img
        }
        kept.zipWithIndex.map { case ((_, a, b, d), i) =>
          val to = if (i + 1 < kept.size) kept(i + 1)._4.toString else "9999-12-31"
          (k, a, b, d.toString, to, (i + 1).toLong)
        }
      }.toSet
      assert(got === want,
        s"missing=${want -- got}\nextra=${got -- want}")
    }
  }
}
