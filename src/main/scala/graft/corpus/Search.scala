package graft.corpus

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * BM25 keyword search over a document corpus — the retrieval primitive of
 * corpus curation (find near-query training docs, build eval retrieval
 * sets) expressed as one aggregation pass + one broadcast join:
 *
 *   1. per-doc term frequencies for the FIXED query terms come from one
 *      conditional aggregation over the token explode (no per-term scan);
 *   2. corpus stats (N, avgdl, per-term document frequencies) reduce to a
 *      single broadcast row;
 *   3. the score is a pure projection over (tf_t, dl, stats).
 *
 * At 100 TB: the explode+groupBy is the only shuffle (keyed by doc), the
 * stats row broadcasts, and top-k goes through TakeOrdered — no global
 * sort.
 *
 * Determinism: per-term addends are summed in FIXED term order as columns
 * (a groupBy sum over per-term rows would add floats in partition order —
 * unreproducible across engines); every arithmetic step is written with
 * the same shape/order as the DuckDB oracle; one final round(.,6).
 */
object Search {

  val K1 = 1.2
  val B = 0.75

  /** tf-side BM25 normalizer: tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)).
    * Literal constants fold on the Scala side ((K1+1.0), (1.0-B)) — the
    * oracle SQL uses the SAME folded values so both engines evaluate an
    * identical expression tree. */
  private def tfNorm(tf: Column, dl: Column, avgdl: Column): Column =
    tf.cast("double") * (K1 + 1.0) /
      (tf.cast("double") +
        lit(K1) * (lit(1.0 - B) + lit(B) * dl.cast("double") / avgdl))

  /** Robertson-Sparck-Jones idf: ln(1 + (N - df + 0.5)/(df + 0.5)). */
  private def idf(n: Column, df: Column): Column =
    log(lit(1.0) + (n.cast("double") - df.cast("double") + 0.5) /
      (df.cast("double") + 0.5))

  /** Top-k docs by BM25 over `terms`. Output: (doc_id, n_matched_terms,
    * bm25) — score rounded to 6dp, ties broken by doc id.
    *
    * Docs containing NO query term never leave the token filter — the
    * doc-keyed shuffle carries only matching occurrences. N/avgdl come
    * from a separate integer-only reduce over the corpus (two scans
    * total; both reduce to one broadcast row — no data-sized exchange
    * besides the matching-doc groupBy). */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty, "bm25TopK needs at least one query term")
    require(terms.distinct == terms,
      s"duplicate query terms would double-count their score addend: $terms")
    val toks = TextAnalysis.tokens(col(textCol))
    val base = docs.select(col(idCol).as("doc_id"),
      size(toks).as("dl"), toks.as("ws"))

    // inverted-index pass: only query-term occurrences reach the shuffle;
    // per-doc tf lands in FIXED columns (one conditional sum per term)
    val occ = base.select(col("doc_id"), col("dl"), explode(col("ws")).as("token"))
      .filter(col("token").isin(terms: _*))
    val tfAggs = min(col("dl")).as("dl") +:
      terms.zipWithIndex.map { case (t, i) =>
        sum(when(col("token") === t, 1L).otherwise(0L)).as(s"tf_$i")
      }
    val perDoc = occ.groupBy(col("doc_id")).agg(tfAggs.head, tfAggs.tail: _*)

    // corpus stats (N, total length) and per-term dfs — two 1-row frames
    val corpus = base.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val dfAggs = terms.indices.map(i =>
      sum(when(col(s"tf_$i") > 0, 1L).otherwise(0L)).as(s"df_$i"))
    val dfs = perDoc.agg(dfAggs.head, dfAggs.tail: _*)

    val withStats = perDoc
      .crossJoin(broadcast(corpus)).crossJoin(broadcast(dfs))
      .withColumn("avgdl",
        col("sum_dl").cast("double") / col("n_docs").cast("double"))
    // fixed-order sum of per-term scores
    val score = terms.indices.map { i =>
      when(col(s"tf_$i") > 0,
        idf(col("n_docs"), col(s"df_$i")) *
          tfNorm(col(s"tf_$i"), col("dl"), col("avgdl")))
        .otherwise(0.0)
    }.reduce(_ + _)
    val matched = terms.indices.map(i =>
      when(col(s"tf_$i") > 0, 1L).otherwise(0L)).reduce(_ + _)

    withStats
      .select(col("doc_id"), matched.as("n_matched_terms"),
        round(score, 6).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)
  }

  /** Inverted-index materialization — the index-build side of retrieval:
    * per token, document frequency, total term frequency, and the top
    * document by tf (ties → smaller doc id). `minDf` drops the long tail
    * so the output is the dictionary-sized head.
    *
    * Two token-keyed exchanges, BOTH of aggregated rows: the raw explode
    * never shuffles (map-side combine folds it to (token, doc_id, tf)
    * partials first), and the per-token pass is a plain aggregate whose
    * top-doc rides a struct-min — min(struct(-tf, doc_id)) is
    * lexicographic largest-tf-then-smallest-id, so the old
    * row_number window (a full sort of the tf frame that ALSO forced
    * its own exchange, since hash(token, doc_id) does not satisfy a
    * token-only window) disappears and the second exchange carries
    * map-combined per-token partials instead of every tf row. */
  def postingsSummary(docs: DataFrame, idCol: String, textCol: String,
                      minDf: Long): DataFrame = {
    val tf = docs
      .select(col(idCol).as("doc_id"),
        explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy(col("token"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
    tf.groupBy(col("token"))
      .agg(count(lit(1)).as("df"),
        sum(col("tf")).as("total_tf"),
        min(struct((-col("tf")).as("_ntf"), col("doc_id").as("doc_id"),
          col("tf").as("tf"))).as("_top"))
      .select(col("token"), col("df"), col("total_tf"),
        col("_top.doc_id").as("top_doc_id"), col("_top.tf").as("top_tf"))
      .filter(col("df") >= minDf)
  }

  /** Exact phrase search over a POSITIONAL postings index: term j of the
    * phrase must sit at position p+j for an occurrence anchored at p —
    * the capability BM25's bag-of-words scoring cannot express (it ranks
    * "value table" and "table value" identically). Returns one row per
    * matching doc: (doc_id, n_occ).
    *
    * Scale: the token explode filters to the PHRASE TERMS before any
    * shuffle — only matching postings move, the classic query-term-only
    * postings discipline — and each chain step is a (doc, anchor-pos)
    * equi-join whose left side only ever shrinks (it holds anchors that
    * matched the phrase prefix so far). No window, no self-join on the
    * full postings. */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
                   phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one term")
    val toks = docs
      .select(col(idCol).as("doc_id"),
        posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("pos", "token")))
      .filter(col("token").isin(phrase.distinct: _*))
    def termAt(w: String, j: Int): DataFrame =
      toks.filter(col("token") === w)
        .select(col("doc_id"), (col("pos") - j).as("p"))
    val anchors = phrase.zipWithIndex.tail.foldLeft(termAt(phrase.head, 0)) {
      case (acc, (w, j)) => acc.join(termAt(w, j), Seq("doc_id", "p"))
    }
    anchors.groupBy(col("doc_id")).agg(count(lit(1)).as("n_occ"))
  }
}
