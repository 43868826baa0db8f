package graft.corpus

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Vocabulary-coverage scoring (SURVEY.md §7 phase F) — the deterministic
 * sibling of the perplexity quality filter: docs whose tokens fall
 * outside the corpus' high-frequency vocabulary are boilerplate, noise
 * or the wrong language. A true LM-perplexity filter needs a trained
 * model AND transcendental math (ln differs in the last ulp across
 * libms, which would break the cross-engine hash gate); OOV rate keeps
 * the signal while staying in exact integer counts + one division.
 *
 * Scale shape: the frequency aggregation is one linear shuffle keyed by
 * token with map-side partial counts; top-K is a TakeOrdered (per-
 * partition heap, no global sort); the resulting vocabulary is ≤ K rows
 * BY CONSTRUCTION, so the coverage join broadcasts at any corpus size.
 */
object Vocab {

  /** Top-K corpus vocabulary by occurrence count, ties broken by token
    * string — deterministic across engines. Returns (token, n_occurrences). */
  def topK(docs: DataFrame, textCol: String, k: Int): DataFrame =
    Dedup.fanout(docs.select(col(textCol)))
      .select(explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("token").asc)
      .limit(k)

  /** Per-doc vocabulary coverage against a (small, broadcastable) vocab
    * frame with a `token` column: token occurrences, occurrences outside
    * the vocab, and their ratio. Token-less docs survive with rate 0. */
  def oovStats(docs: DataFrame, idCol: String, textCol: String,
               vocab: DataFrame): DataFrame =
    // fanout: the token explode is scan-stage compute — serialized on a
    // few-file corpus without the re-spread (no-op at real file counts)
    Dedup.fanout(docs.select(col(idCol), col(textCol)))
      .select(col(idCol).as("doc_id"),
        explode_outer(TextAnalysis.tokens(col(textCol))).as("tok"))
      // distinct: a duplicate vocab row would MULTIPLY matching token
      // rows through the left join, silently inflating n_tokens
      .join(broadcast(vocab.select(col("token").as("tok")).distinct()
        .withColumn("_in_vocab", lit(1))), Seq("tok"), "left")
      .groupBy(col("doc_id"))
      .agg(count(col("tok")).as("n_tokens"),
        coalesce(sum(when(col("tok").isNotNull && col("_in_vocab").isNull, 1L)
          .otherwise(0L)), lit(0L)).as("n_oov"))
      .withColumn("oov_rate",
        when(col("n_tokens") === 0, 0.0).otherwise(
          round(col("n_oov").cast("double") / col("n_tokens").cast("double"), 6)))

  /** Ceiling on the word dictionary [[bpeMerges]] will collect: BPE
    * training runs over the word-FREQUENCY table, which is
    * vocabulary-bounded by construction — the same small-side argument
    * as the PQ training sums and the union-find edge gate. The guard
    * makes the assumption loud instead of a silent driver OOM. */
  val bpeMaxVocab = 1000000

  /** Symbol-count cap on trainable words (shared with the oracle): the
    * fixed replace-pass nest in the SQL replay is exact only when
    * 2^passes covers the longest word. 64 symbols ≫ any natural word;
    * longer "words" are unsegmented junk a tokenizer should skip. */
  val bpeMaxWordLen = 64

  /** BPE merge-rule training (Sennrich et al. 2016, arXiv:1508.07909):
    * learn the first `nMerges` merge rules over the corpus' word
    * frequency table. The distributed part is the word-count
    * aggregation (one linear token shuffle, map-side combined); the
    * merge loop then runs on the COLLECTED dictionary — how production
    * BPE trainers work, because the dictionary is vocabulary-bounded
    * while the corpus is not.
    *
    * Determinism contract (what lets a DuckDB oracle replay training):
    * words are lowercased, restricted to `[a-z0-9]+` (pre-tokenization;
    * also sidesteps engine-specific unicode segmentation) and capped at
    * [[bpeMaxWordLen]] symbols; pair counts include overlapping
    * occurrences weighted by word frequency; the best pair breaks count
    * ties by (left, right) string order; and merging rewrites every
    * word by iterating the literal leftmost non-overlapping replace of
    * " x y " with " xy " over the space-delimited symbol string TO A
    * FIXPOINT. java.lang.String.replace and DuckDB replace() are
    * byte-identical per pass (verified, including the resumption
    * corner: one pass turns " a a a a a " into " aa a aa " — the
    * leftmost-resumption grouping, not the left-fold's " aa aa a ");
    * each pass merges every other member of an adjacent-occurrence
    * chain, so the fixpoint arrives within ⌈log₂(word symbols)⌉ + 1
    * passes and the oracle's fixed 8-pass nest is exact under the
    * 64-symbol cap. The space padding makes every match align to whole
    * symbols. Returns (rank, lhs, rhs, pair_count) — the ordered merge
    * table a tokenizer ships, with no duplicate rules (a single-pass
    * contract would re-learn the same pair from its own leftovers). */
  def bpeMerges(docs: DataFrame, textCol: String, nMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    trainBpe(docs, textCol, nMerges)._2.toDF("rank", "lhs", "rhs", "pair_count")
  }

  /** The trained tokenizer APPLIED to its own dictionary: every
    * trainable word mapped to its subword-token count after the
    * `nMerges` learned rules. The application join side — broadcast at
    * any corpus size (vocabulary-bounded). */
  def bpeSegmentations(docs: DataFrame, textCol: String, nMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    trainBpe(docs, textCol, nMerges)._1
      .map { case (w, s, _) => (w, s.trim.split(" ").length.toLong) }
      .toSeq.toDF("word", "n_sub")
  }

  /** Shared trainer: returns (final dictionary as (word, padded symbol
    * string, count), ordered merges). */
  private def trainBpe(docs: DataFrame, textCol: String, nMerges: Int)
      : (Array[(String, String, Long)], Seq[(Int, String, String, Long)]) = {
    val wordsDf = Dedup.fanout(docs.select(col(textCol)))
      .select(explode(TextAnalysis.tokens(lower(col(textCol)))).as("w"))
      .filter(col("w").rlike("^[a-z0-9]+$") && length(col("w")) <= bpeMaxWordLen)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint(false)
    // the gate must fire BEFORE the dictionary lands on the driver — a
    // require after collect() cannot prevent the OOM it documents; the
    // checkpoint keeps the count from recomputing the aggregation
    val nWords = wordsDf.count()
    require(nWords <= bpeMaxVocab,
      s"word dictionary $nWords exceeds bpeMaxVocab $bpeMaxVocab — " +
        "raise the gate only with driver memory to back it")
    val words = wordsDf.collect()
    // space-delimited symbol strings, padded so every symbol is
    // space-bounded and a literal " x y " match aligns to whole symbols
    var dict: Array[(String, String, Long)] = words.map { r =>
      (r.getString(0),
        " " + r.getString(0).map(_.toString).mkString(" ") + " ",
        r.getLong(1))
    }
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    var rank = 1
    var exhausted = false
    while (rank <= nMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap[(String, String), Long]()
      dict.foreach { case (_, s, c) =>
        val syms = s.trim.split(" ")
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + c
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val ((l, r), c) = counts.minBy { case ((l, r), c) => (-c, l, r) }
        merges += ((rank, l, r, c))
        val (pat, rep) = (s" $l $r ", s" $l$r ")
        dict = dict.map { case (w, s0, cnt) =>
          var cur = s0
          var prev = ""
          while (cur != prev) { prev = cur; cur = cur.replace(pat, rep) }
          (w, cur, cnt)
        }
        rank += 1
      }
    }
    (dict, merges.toSeq)
  }
}
