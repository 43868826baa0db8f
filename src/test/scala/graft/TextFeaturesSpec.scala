package graft

import graft.corpus.{TextAnalysis => T}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The single-pass TextFeatures kernel must be VALUE-IDENTICAL to the
  * regex/split builtin forms it replaced — on the fixture corpus and on
  * adversarial whitespace/unicode inputs (the kernel's fast path is
  * ASCII-only; unicode routes stopword counting through the builtin
  * pipeline, and these cases prove the routing is airtight). */
class TextFeaturesSpec extends SparkTestBase {
  import spark.implicits._

  private def assertAllEqual(df: DataFrame): Unit = {
    val f = T.textFeatures(col("text"))
    val checked = df.select(
      col("text"),
      f.getField("n_tokens").as("k_ntok"),
      T.nTokensSplit(col("text")).as("w_ntok"),
      (f.getField("stop_en") + f.getField("stop_de") +
        f.getField("stop_fr") + f.getField("stop_es")).as("k_stop"),
      T.matchCount(lower(col("text")),
        T.langStopwords.map(_._2).mkString("|")).as("w_stop"),
      f.getField("n_nonalnum").as("k_non"),
      T.matchCount(col("text"), "[^a-zA-Z0-9\\s]").as("w_non"),
      f.getField("n_cjk").as("k_cjk"),
      T.matchCount(col("text"), T.cjkPattern).as("w_cjk"),
      f.getField("n_chars").as("k_len"),
      length(col("text")).as("w_len"),
      T.qualityScore(col("text")).as("k_q"),
      T.qualityScoreRegex(col("text")).as("w_q"),
      T.langId(col("text")).as("k_lang"),
      T.langIdRegex(col("text")).as("w_lang"))
    val bad = checked.filter(
      col("k_ntok") =!= col("w_ntok") || col("k_stop") =!= col("w_stop") ||
        col("k_non") =!= col("w_non") || col("k_cjk") =!= col("w_cjk") ||
        col("k_len") =!= col("w_len") || col("k_q") =!= col("w_q") ||
        col("k_lang") =!= col("w_lang"))
    val rows = bad.select("text", "k_ntok", "w_ntok", "k_stop", "w_stop",
      "k_non", "w_non", "k_q", "w_q", "k_lang", "w_lang").take(5)
    assert(rows.isEmpty, s"kernel != witness on: ${rows.mkString("; ")}")
  }

  test("kernel equals the regex/split witnesses on the fixture corpus") {
    assertAllEqual(
      spark.read.parquet(sf("sf0.001") + "/documents.parquet").select("text"))
  }

  test("kernel equals the witnesses on adversarial whitespace and per-language counts") {
    assertAllEqual(Seq(
      "", " ", "   ", "\t", "\t\t", "a", " a ", "\ta b\t", "a\t\tb",
      "\n\nthe and of\r\n", "the", "the the the", "the_1 the the1 _the the",
      "the,the.the;is", "a-b the-best", "der und die das", "le est une dans",
      "el es una en y", "is ist est es", "1 2 3 the 4", "____ the ____",
      "x" * 5000 + " the", ("the " * 2000).trim
    ).toDF("text"))
  }

  test("kernel equals the witnesses on unicode restructuring cases") {
    assertAllEqual(Seq(
      "中文文档 the end",        // CJK + latin mix
      "一鿿䷿ꀀ",                // CJK range boundaries
      "İstanbul is",                        // İ lowercases to 2 chars
      "Kis the",                            // Kelvin sign lowers to 'k'
      "café the cafés",                // accents inside runs
      "a the b",                            // NBSP is NOT a Java \s char
      "😀 the 😀",           // supplementary plane emoji
      "straße und STRAẞe und"          // ß / ẞ casing
    ).toDF("text"))
  }

  test("normalize kernel equals the regexp_replace chain on fixture + edge cases") {
    def check(df: DataFrame): Unit = {
      val bad = df.select(col("text"),
          T.normalizeText(col("text")).as("k"),
          T.normalizeTextRegex(col("text")).as("w"))
        .filter(col("k") =!= col("w"))
      val rows = bad.take(5)
      assert(rows.isEmpty, s"normalize kernel != witness on: ${rows.mkString("; ")}")
    }
    check(spark.read.parquet(sf("sf0.001") + "/documents.parquet").select("text"))
    check(Seq(
      "", " ", "\t\n", "a", " A!B?C ", "a\t \tb", "..!!..", "_a_b_",
      "İstanbul IS", "Kis", "中文 a 中文", "😀a😀 b", "café CAFÉS",
      "STRAẞE und straße", "a  b   c", "\t a \t"
    ).toDF("text"))
  }

  test("per-language kernel counts equal the per-language regex counts") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .select("text")
    val f = T.textFeatures(col("text"))
    val langs = Seq("en", "de", "fr", "es")
    val checked = docs.select(
      (langs.map(l => f.getField(s"stop_$l").as(s"k_$l")) ++
        T.langStopwords.map { case (l, p) =>
          T.matchCount(lower(col("text")), p).as(s"w_$l") }): _*)
    val bad = checked.filter(langs.map(l =>
      col(s"k_$l") =!= col(s"w_$l")).reduce(_ || _))
    assert(bad.count() == 0)
  }
}
