package graft

import org.apache.spark.sql.SparkSession

/** GraftExtensions as a WHOLE-SESSION install: a session built with
  * `spark.sql.extensions=graft.plans.GraftExtensions` exposes the custom
  * codegen kernels as SQL functions and carries the optimizer rule —
  * the `spark.sql` user surface, not just the DataFrame one. */
class ExtensionsSpec extends SparkTestBase {

  private def withExtendedSession[A](f: SparkSession => A): A = {
    val prevActive = SparkSession.getActiveSession
    val prevDefault = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // reuses the test SparkContext. withExtensions applies the instance
      // at session construction — the `spark.sql.extensions` STATIC conf
      // route only works on the FIRST context of the JVM (an existing
      // SparkContext's conf is frozen, which is exactly the production
      // story: set the conf at cluster launch, or use withExtensions).
      val s = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new graft.plans.GraftExtensions())
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
      f(s)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }

  test("SQL functions: dot_f/norm_f match the DataFrame kernels") {
    withExtendedSession { s =>
      val r = s.sql(
        """SELECT dot_f(CAST(array(1.0, 2.0, 3.0) AS array<float>),
          |             CAST(array(4.0, 5.0, 6.0) AS array<float>)) AS d,
          |       norm_f(CAST(array(3.0, 4.0) AS array<float>)) AS n""".stripMargin)
        .head()
      assert(r.getDouble(0) == 32.0 && r.getDouble(1) == 5.0)
    }
  }

  test("SQL minhash_sig/simhash_sig equal the column API") {
    withExtendedSession { s =>
      import graft.corpus.{MinHashSig, SimHashSig}
      import org.apache.spark.sql.functions._
      val df = s.sql("SELECT array('a b c', 'b c d', 'c d e') AS sh, " +
        "array('x', 'y', 'x') AS toks")
      val viaSql = s.sql(
        "SELECT minhash_sig(array('a b c', 'b c d', 'c d e'), 4) AS mh, " +
          "simhash_sig(array('x', 'y', 'x'), 16) AS sh16").head()
      val viaCol = df.select(
        MinHashSig.toColumn(col("sh"), 4).as("mh"),
        SimHashSig.toColumn(col("toks"), 16).as("sh16")).head()
      assert(viaSql.getSeq[Long](0) == viaCol.getSeq[Long](0))
      assert(viaSql.getLong(1) == viaCol.getLong(1))
    }
  }

  test("SQL kgrams/shingles equal the column API") {
    withExtendedSession { s =>
      import org.apache.spark.sql.functions._
      val got = s.sql(
        "SELECT kgrams(' a b a b ', 2) AS kg, shingles(' a b a b ', 2) AS sh")
        .head()
      assert(got.getSeq[String](0) == Seq("a b", "b a", "a b"))
      assert(got.getSeq[String](1) == Seq("a b", "b a"))
      val viaCol = s.range(1).select(
        graft.corpus.TextAnalysis.kgrams(lit(" a b a b "), 2)).head()
      assert(got.getSeq[String](0) == viaCol.getSeq[String](0))
    }
  }

  test("SQL text_features equals the column API") {
    withExtendedSession { s =>
      import org.apache.spark.sql.functions._
      val got = s.sql(
        "SELECT text_features('the der le el 中 !') AS f").head().getStruct(0)
      val viaCol = s.range(1).select(
        graft.corpus.TextAnalysis.textFeatures(lit("the der le el 中 !")))
        .head().getStruct(0)
      assert(got == viaCol)
      assert(got.getInt(0) == 6)               // n_tokens
      assert((1 to 4).map(got.getInt) == Seq(1, 1, 1, 1)) // one hit per lang
      assert(got.getInt(6) == 1)               // n_cjk
    }
  }

  test("SQL normalize_text equals the column API and the regex witness") {
    withExtendedSession { s =>
      import org.apache.spark.sql.functions._
      val raw = "  Hello,  WORLD!!  42\tfoo\n"
      val got = s.sql(s"SELECT normalize_text('${raw.replace("\n", "\\n").replace("\t", "\\t")}') AS n")
        .head().getString(0)
      val viaCol = s.range(1)
        .select(graft.corpus.TextAnalysis.normalizeText(lit(raw)))
        .head().getString(0)
      val witness = s.range(1)
        .select(graft.corpus.TextAnalysis.normalizeTextRegex(lit(raw)))
        .head().getString(0)
      assert(got == viaCol && got == witness)
      assert(got == "hello world 42 foo")
    }
  }

  test("SQL callstack_debug_cmd formats like the column API") {
    withExtendedSession { s =>
      import org.apache.spark.sql.functions._
      val hex = "00FFAA11223344556677889900AABBCC"
      val viaSql = s.sql(
        s"SELECT callstack_debug_cmd(unhex('$hex'), 16, 'dc') AS c")
        .head().getString(0)
      val viaCol = s.sql(s"SELECT unhex('$hex') AS cs")
        .select(graft.xel.XelFunctions.callstackDebugCmd(col("cs"), 16, "dc"))
        .head().getString(0)
      assert(viaSql == viaCol && viaSql.nonEmpty)
    }
  }

  test("wrong arity is an IllegalArgumentException naming the function") {
    withExtendedSession { s =>
      val e = intercept[Exception] {
        s.sql("SELECT dot_f(array(CAST(1.0 AS FLOAT)))").collect()
      }
      assert(e.getMessage.contains("dot_f expects 2 arguments, got 1"),
        s"expected the arity gate, got: ${e.getMessage}")
      val e3 = intercept[Exception] {
        s.sql("SELECT norm_f()").collect()
      }
      assert(e3.getMessage.contains("norm_f expects 1 argument, got 0"),
        s"expected the arity gate, got: ${e3.getMessage}")
    }
  }

  test("non-literal parameters are rejected loudly") {
    withExtendedSession { s =>
      val e = intercept[Exception] {
        s.sql("SELECT minhash_sig(array('a'), CAST(id AS INT)) FROM range(1)")
          .collect()
      }
      assert(e.getMessage.contains("literal INT"))
    }
  }

  test("the extended session also carries the CollapseTruncation rule") {
    withExtendedSession { s =>
      val df = s.sql(
        "SELECT substring(substring('abcdefghij', 1, 8), 1, 5) AS t")
      val substrings = df.queryExecution.optimizedPlan.expressions
        .flatMap(_.collect {
          case x: org.apache.spark.sql.catalyst.expressions.Substring => x
        })
      assert(substrings.size <= 1)
      assert(df.head().getString(0) == "abcde")
    }
  }
}
