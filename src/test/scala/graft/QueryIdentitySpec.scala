package graft

import graft.queries.RelationalQueries
import org.apache.spark.sql.Row

/** Pins the closed-form window identities used by the monitoring
  * queries to their textbook recursive definitions — the oracle gate
  * proves Spark ≡ DuckDB, these prove both ≡ the algorithm the
  * docstring claims.
  */
class QueryIdentitySpec extends SparkTestBase {

  /** Textbook one-sided CUSUM: S_t = max(0, S_{t-1} + inc_t). */
  private def cusumRecursive(incs: Seq[Long]): Seq[Long] =
    incs.scanLeft(0L)((s, inc) => math.max(0L, s + inc)).tail

  /** The window identity the query uses: S_t = cs_t − min(0, min_{j≤t} cs_j). */
  private def cusumIdentity(incs: Seq[Long]): Seq[Long] = {
    val cs = incs.scanLeft(0L)(_ + _).tail
    cs.zipWithIndex.map { case (c, i) =>
      c - math.min(0L, cs.take(i + 1).min)
    }
  }

  test("CUSUM window identity ≡ the max(0, ·) recursion on random walks") {
    val rng = new scala.util.Random(42)
    for (trial <- 0 until 200) {
      val n = 1 + rng.nextInt(60)
      // mixed-sign increments, including all-negative and all-positive runs
      val bias = trial % 5 - 2
      val incs = Seq.fill(n)(rng.nextInt(21).toLong - 10 + bias)
      assert(cusumIdentity(incs) == cusumRecursive(incs),
        s"diverged on incs=$incs")
    }
  }

  test("events_cusum matches a driver-side recursive replay at sf0.001") {
    val dir = sf("sf0.001")
    // replay: daily zero-filled counts per type -> recursion -> report
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .selectExpr("event_type", "CAST(ts AS DATE) AS day")
      .groupBy("event_type", "day").count()
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    val allDays = ev.map(_._2).distinct.sorted
    val expected = ev.map(_._1).distinct.sorted.map { t =>
      val byDay = ev.filter(_._1 == t).map(r => r._2 -> r._3).toMap
      val xs = allDays.map(d => byDay.getOrElse(d, 0L))
      val n = xs.size.toLong
      val s = xs.sum
      val incs = xs.map(x => n * x - s - s / 2)
      val cus = cusumRecursive(incs)
      val alarms = allDays.zip(cus).filter { case (_, c) => c > 4 * s }
      (t, n, alarms.size.toLong,
        alarms.headOption.map(_._1).orNull,
        cus.max / n)
    }
    val got = RelationalQueries.queries("events_cusum")(spark, dir)
      .collect().map { r: Row =>
        (r.getString(0), r.getLong(1), r.getLong(2),
          Option(r.getDate(3)).map(_.toString).orNull, r.getLong(4))
      }.toSeq
    assert(got == expected.toSeq)
  }

  test("events_stickiness WAU matches a brute-force trailing-7-day distinct") {
    val dir = sf("sf0.001")
    val ud = spark.read.parquet(s"$dir/events.parquet")
      .selectExpr("user_id", "CAST(ts AS DATE) AS d").distinct()
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val days = ud.map(_._2).distinct.sorted(Ordering.by((d: java.time.LocalDate) => d.toEpochDay))
    val expected = days.map { day =>
      val dau = ud.count(_._2 == day).toLong
      val wau = ud.filter { case (_, d) =>
        !d.isAfter(day) && !d.isBefore(day.minusDays(6))
      }.map(_._1).distinct.size.toLong
      (day.toString, dau, wau, dau * 10000 / wau)
    }
    val got = RelationalQueries.queries("events_stickiness")(spark, dir)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1),
        r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected.toSeq)
  }

  test("Benford CASE-ladder constants ARE round(1e6*log10(1+1/d)) and sum to 1e6") {
    val table = (1 to 9).map(d => math.round(1e6 * math.log10(1.0 + 1.0 / d)))
    assert(table == Seq(301030L, 176091L, 124939L, 96910L, 79181L,
      66947L, 57992L, 51153L, 45757L))
    assert(table.sum == 1000000L)
  }

  test("events_benford matches a driver-side first-digit replay at sf0.001") {
    val dir = sf("sf0.001")
    val vs = spark.read.parquet(s"$dir/events.parquet")
      .selectExpr("event_type", "CAST(round(value * 1000000, 0) AS BIGINT) AS v")
      .where("v IS NOT NULL AND v > 0")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val benford = Map(1L -> 301030L, 2L -> 176091L, 3L -> 124939L,
      4L -> 96910L, 5L -> 79181L, 6L -> 66947L, 7L -> 57992L,
      8L -> 51153L, 9L -> 45757L)
    val expected = vs.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (t, rows) =>
      val total = rows.size.toLong
      rows.groupBy(r => r._2.toString.head.asDigit.toLong).toSeq.sortBy(_._1)
        .map { case (d, g) =>
          val obs = g.size.toLong * 1000000L / total
          (t, d, g.size.toLong, obs, benford(d), math.abs(obs - benford(d)))
        }
    }
    val got = RelationalQueries.queries("events_benford")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected)
  }

  test("events_theilsen matches a driver-side exact-rational median replay") {
    val dir = sf("sf0.001")
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .selectExpr("event_type", "CAST(ts AS DATE) AS day")
      .groupBy("event_type", "day").count()
      .collect().map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2)))
    val allDays = ev.map(_._2).distinct.sortBy(_.toEpochDay)
    val expected = ev.map(_._1).distinct.sorted.map { t =>
      val byDay = ev.filter(_._1 == t).map(r => r._2 -> r._3).toMap
      val xs = allDays.map(d => (d, byDay.getOrElse(d, 0L)))
      val pairs = for {
        i <- xs.indices; j <- (i + 1) until xs.size
      } yield (xs(j)._2 - xs(i)._2,
        xs(j)._1.toEpochDay - xs(i)._1.toEpochDay)
      // the query's exact ordering: double quotient, then (num, den)
      val sorted = pairs.sortBy { case (n, d) => (n.toDouble / d, n, d) }
      val med = sorted((sorted.size + 1) / 2 - 1)
      (t, pairs.size.toLong, med._1, med._2)
    }
    val got = RelationalQueries.queries("events_theilsen")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == expected.toSeq)
  }

  test("events_autocorr matches the n-scaled centered ACF replayed on the driver") {
    val dir = sf("sf0.001")
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .selectExpr("event_type", "CAST(ts AS DATE) AS day")
      .groupBy("event_type", "day").count()
      .collect().map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2)))
    val allDays = ev.map(_._2).distinct.sortBy(_.toEpochDay)
    val expected = ev.map(_._1).distinct.sorted.flatMap { t =>
      val byDay = ev.filter(_._1 == t).map(r => r._2 -> r._3).toMap
      val xs = allDays.map(d => (d, byDay.getOrElse(d, 0L)))
      val n = xs.size.toLong
      val s = xs.map(_._2).sum
      val ys = xs.map { case (d, x) => (d, n * x - s) }
      val den = ys.map(y => y._2 * y._2).sum
      (1L to 7L).flatMap { lag =>
        val terms = for {
          (d1, y1) <- ys; (d2, y2) <- ys
          l = d2.toEpochDay - d1.toEpochDay if l == lag
        } yield y1 * y2
        // truncating division: Spark `div` and DuckDB `//` both
        // truncate toward zero on negatives (= Scala Long `/`)
        if (terms.isEmpty) None
        else Some((t, lag, terms.size.toLong,
          if (den == 0) 0L else 1000000L * terms.sum / den))
      }
    }
    val got = RelationalQueries.queries("events_autocorr")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == expected.toSeq)
  }
}
