package graft

import graft.corpus.{Sketches, TextAnalysis => T}
import org.apache.spark.sql.functions._

/** Bloom / Count-Min sketches: the mergeable Aggregator form must be
  * value-equal to the explode/groupBy SQL form the oracle replays, and
  * each sketch's one-sided error guarantee must hold on real tokens. */
class BloomCmsSpec extends SparkTestBase {
  import spark.implicits._

  private val m = 512
  private val d = 3
  private val w = 128

  private lazy val docs = spark.read
    .parquet(sf("sf0.001") + "/documents.parquet").select("doc_id", "text")

  test("BloomAggregator bitset equals the explode-distinct position set") {
    val toks = docs.select(explode(T.tokens(col("text"))).as("token")).distinct()
    val viaSql = toks
      .select(explode(Sketches.saltedPositions(col("token"), d, m)).as("pos"))
      .distinct().count()
    val bitset = toks
      .agg(Sketches.bloomAgg(m, Sketches.saltedPositions(col("token"), d, m))
        .as("bs"))
      .select(Sketches.bloomBitsSet(col("bs")).as("n"), col("bs"))
    val row = bitset.head()
    assert(row.getLong(0) == viaSql)

    // no false negatives: every inserted token tests positive
    val bs = row.getSeq[Long](1)
    val misses = toks.select(col("token"),
        Sketches.bloomMightContain(
          typedLit(bs), Sketches.saltedPositions(col("token"), d, m)).as("hit"))
      .filter(!col("hit")).count()
    assert(misses == 0L)
  }

  test("CmsAggregator matrix point-estimates equal the groupBy-min form and bound exact counts") {
    val occ = docs.select(explode(T.tokens(col("text"))).as("token"))
    val sketchRow = occ
      .agg(Sketches.cmsAgg(d, w, Sketches.saltedPositions(col("token"), d, w))
        .as("sk")).head()
    val sk = sketchRow.getSeq[Long](0)
    assert(sk.sum == occ.count() * d) // every occurrence lands in each row

    val cells = occ
      .select(posexplode(Sketches.saltedPositions(col("token"), d, w))
        .as(Seq("i", "pos")))
      .groupBy("i", "pos").agg(count(lit(1)).as("c"))
    val exact = occ.groupBy("token").agg(count(lit(1)).as("exact"))
    val viaAgg = exact.select(col("token"), col("exact"),
      Sketches.cmsEstimate(typedLit(sk),
        Sketches.saltedPositions(col("token"), d, w), d, w).as("est_agg"))
    val viaSql = exact.select(col("token").as("t2"))
      .withColumn("parr", Sketches.saltedPositions(col("t2"), d, w))
      .select(col("t2"), posexplode(col("parr")).as(Seq("i", "pos")))
      .join(cells, Seq("i", "pos"), "left")
      .groupBy("t2").agg(min(coalesce(col("c"), lit(0L))).as("est_sql"))
    val joined = viaAgg.join(viaSql, viaAgg("token") === viaSql("t2")).cache()
    assert(joined.filter(col("est_agg") =!= col("est_sql")).count() == 0)
    assert(joined.filter(col("est_agg") < col("exact")).count() == 0) // CMS never underestimates
    joined.unpersist()
  }

  test("HLL UDAF registers equal the SQL register form; estimate within error bound") {
    val toks = docs.select(explode(T.tokens(col("text"))).as("token"))
      .select(T.hash60(col("token")).as("h"))
    // SQL register form (what the oracle replays)
    val regsSql = toks
      .groupBy(Sketches.hllRegister(col("h")).as("reg"))
      .agg(max(Sketches.hllRho(col("h"))).as("m_rho"))
      .collect().map(r => r.getLong(0).toInt -> r.getInt(1)).toMap
    val full = (0 until Sketches.HllM).map(i => regsSql.getOrElse(i, 0))
    // UDAF form
    val viaUdaf = toks.agg(Sketches.hllSketch(col("h")).as("sk"))
      .select(col("sk"),
        Sketches.hllSketchEstimate(col("sk")).as("est"))
      .head()
    assert(viaUdaf.getSeq[Int](0) == full)
    // estimate sanity: within 4σ of exact (σ = 1.04/√64 = 13%)
    val exact = toks.distinct().count().toDouble
    val est = viaUdaf.getDouble(1)
    assert(math.abs(est - exact) / exact < 0.52,
      s"est=$est exact=$exact")
  }

  test("HLL sketches merge associatively and union = merge of partials") {
    val toks = docs.select(pmod(col("doc_id"), lit(2L)).as("g"),
      explode(T.tokens(col("text"))).as("token"))
      .select(col("g"), T.hash60(col("token")).as("h"))
    val oneShot = toks.agg(Sketches.hllSketch(col("h"))).head().getSeq[Int](0)
    // per-group partial sketches, unioned via hllMerge column algebra
    val partials = toks.groupBy(col("g"))
      .agg(Sketches.hllSketch(col("h")).as("sk"))
      .agg(collect_list(col("sk")).as("sks"))
      .select(aggregate(col("sks"),
        typedLit(Seq.fill(Sketches.HllM)(0)),
        (acc, sk) => Sketches.hllMerge(acc, sk)).as("merged"))
      .head().getSeq[Int](0)
    assert(oneShot == partials)
  }

  test("HLL linear-counting branch: small sets report the literal-table value") {
    import spark.implicits._
    val small = (1L to 10L).toDF("v").select(T.hash60(col("v").cast("string")).as("h"))
    val row = small.agg(Sketches.hllSketch(col("h")).as("sk"))
      .select(Sketches.hllSketchEstimate(col("sk")).as("est"),
        size(filter(col("sk"), _ === 0)).as("zeros"))
      .head()
    val zeros = row.getInt(1)
    assert(zeros > Sketches.HllM - 11) // ≤10 occupied registers
    assert(row.getDouble(0) == Sketches.HllLinearCounting(zeros - 1).toDouble)
  }

  test("HLL of zero rows is the empty sketch with estimate 0") {
    import spark.implicits._
    val row = Seq.empty[Long].toDF("h")
      .agg(Sketches.hllSketch(col("h")).as("sk"))
      .select(Sketches.hllSketchEstimate(col("sk")).as("est"), col("sk"))
      .head()
    assert(row.getSeq[Int](1).forall(_ == 0))
    assert(row.getDouble(0) == 0.0) // V = m → linear counting m·ln(m/m)
  }

  test("bloom and CMS sketches merge associatively across groups") {
    // build per-doc-parity partial sketches, merge via the aggregator's
    // merge path (two-level aggregation), compare with the one-shot build
    val toks = docs.select(pmod(col("doc_id"), lit(2L)).as("g"),
      explode(T.tokens(col("text"))).as("token"))
    val oneShot = toks
      .agg(Sketches.cmsAgg(d, w, Sketches.saltedPositions(col("token"), d, w)))
      .head().getSeq[Long](0)
    val partials = toks.repartition(4, col("g"))
      .agg(Sketches.cmsAgg(d, w, Sketches.saltedPositions(col("token"), d, w)))
      .head().getSeq[Long](0)
    assert(oneShot == partials)
  }

  test("logHistQuantiles: estimates bracket the exact quantile within the bucket ratio") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    // lognormal-ish positive longs over several decades — the shape
    // durations/sizes actually have
    val vals = (1 to 20000).map(_ =>
      ("k", math.max(1L, math.exp(rnd.nextGaussian() * 2 + 8).toLong)))
    val df = vals.toDF("key", "v")
    val got = Sketches.logHistQuantiles(df, "key", "v",
        Seq(("p50", 1, 2), ("p95", 19, 20), ("p99", 99, 100)))
      .collect().map(r => r.getString(1) -> r.getLong(3)).toMap
    val exact = df.stat.approxQuantile("v", Array(0.5, 0.95, 0.99), 0.0)
    for (((q, est), ex) <- Seq("p50", "p95", "p99").map(q => q -> got(q)).zip(exact)) {
      // the log2 bucket bounds relative error by the bucket ratio: the
      // estimate and the exact value live within a factor of 2
      assert(est.toDouble / ex < 2.0 && ex / est.toDouble < 2.0,
        s"$q: est=$est exact=$ex outside the 2x bucket bound")
    }
    // total row count flows through
    assert(Sketches.logHistQuantiles(df, "key", "v", Seq(("p50", 1, 2)))
      .head().getLong(2) == 20000L)
    // reserved-name keys refuse loudly: output names AND the whole
    // underscore prefix (the working columns _v/_b/_n/… live there)
    for (bad <- Seq("q", "n_total", "est", "_v", "_cum", "_anything")) {
      val e = intercept[IllegalArgumentException] {
        Sketches.logHistQuantiles(df.withColumnRenamed("key", bad), bad, "v",
          Seq(("p50", 1, 2)))
      }
      assert(e.getMessage.contains("collides"), s"$bad: ${e.getMessage}")
    }
  }

  test("logHistQuantiles: histograms merge by addition (partials = one shot)") {
    import spark.implicits._
    val vals = (1 to 5000).map(i => ("k", (i * 37 % 100000 + 1).toLong))
    val df = vals.toDF("key", "v")
    // the sketch state is the (b -> n) counter map; splitting the data
    // and ADDING histograms must give the same quantiles as one pass —
    // the mergeable-synopsis property that makes it a sketch
    val half1 = df.filter(col("v") % 2 === 0)
    val half2 = df.filter(col("v") % 2 =!= 0)
    def hist(d: org.apache.spark.sql.DataFrame) = d.filter(col("v") > 0)
      .groupBy((length(bin(col("v"))) - 1).as("b")).agg(count(lit(1)).as("n"))
    val merged = hist(half1).unionByName(hist(half2))
      .groupBy("b").agg(sum(col("n")).as("n"))
    val oneShot = hist(df).collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val viaMerge = merged.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(oneShot == viaMerge)
  }
}
