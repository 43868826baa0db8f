package graft

import graft.corpus.Vocab
import org.apache.spark.sql.functions._

/** BPE merge training: hand-computable merges on a planted corpus, the
  * replace-merge contract (including the odd-run corner), determinism,
  * and the dictionary-size gate. */
class VocabSpec extends SparkTestBase {
  import spark.implicits._

  test("oovStats: duplicate vocab rows don't inflate n_tokens") {
    val docs = Seq((1L, "the cat and the hat")).toDF("doc_id", "text")
    val dupVocab = Seq("the", "the", "cat").toDF("token") // union of 2 lists
    val got = Vocab.oovStats(docs, "doc_id", "text", dupVocab).collect().head
    assert(got.getLong(1) == 5L, s"n_tokens must be 5, got ${got.getLong(1)}")
    assert(got.getLong(2) == 2L, "and/hat are OOV")
  }

  test("bpeMerges learns hand-computable rules in frequency order") {
    // "abab" x3 and "cd" x2: pairs round 1 — (a,b): 2 per word x3 = 6,
    // (b,a): 1x3 = 3, (c,d): 2. First merge (a,b) -> ab; round 2 the
    // "ab ab" words give (ab,ab): 3 vs (c,d): 2 -> second merge (ab,ab).
    val docs = Seq("abab abab abab cd cd").toDF("text")
    val m = Vocab.bpeMerges(docs, "text", 3).orderBy("rank")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m(0) == ((1, "a", "b", 6L)))
    assert(m(1) == ((2, "ab", "ab", 3L)))
    assert(m(2) == ((3, "c", "d", 2L)))
  }

  test("bpeMerges: odd-run corner follows the literal-replace contract") {
    // one word "aaaaa" x1: round 1 pair (a,a) count 4 (overlapping).
    // The replace-merge contract rewrites ' a a a a a ' -> ' aa a aa '
    // (NOT the fold's ' aa aa a '), so round 2's top pair over symbols
    // [aa, a, aa] is (aa, a) tied with (a, aa) -> tie-break picks
    // (a, aa) by left string order ("a" < "aa").
    val docs = Seq("aaaaa").toDF("text")
    val m = Vocab.bpeMerges(docs, "text", 2).orderBy("rank")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m(0) == ((1, "a", "a", 4L)))
    assert(m(1) == ((2, "a", "aa", 1L)))
  }

  test("bpeMerges: tie-breaks by (lhs, rhs); case folds; non-alnum words drop") {
    // "xy" and "xz" tie at count 1 -> (x,y) wins by rhs order; "A-B!"
    // fails the [a-z0-9]+ pre-tokenization filter entirely; "XY" folds
    // into the same word as "xy", breaking the tie in its favor
    val tied = Seq("xy xz A-B!").toDF("text")
    val m1 = Vocab.bpeMerges(tied, "text", 1).head()
    assert((m1.getString(1), m1.getString(2), m1.getLong(3)) == (("x", "y", 1L)))
    val folded = Seq("xy xz XY").toDF("text")
    val m2 = Vocab.bpeMerges(folded, "text", 1).head()
    assert((m2.getString(1), m2.getString(2), m2.getLong(3)) == (("x", "y", 2L)))
  }

  test("bpeSegmentations maps each dict word to its post-merge token count") {
    // after merges (a,b) then (ab,ab): "abab" collapses to ONE token,
    // "cd" (whose pair never won) stays two characters
    val docs = Seq("abab abab abab cd cd").toDF("text")
    val seg = Vocab.bpeSegmentations(docs, "text", 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(seg == Map("abab" -> 1L, "cd" -> 2L))
    // zero merges = character segmentation
    val seg0 = Vocab.bpeSegmentations(docs, "text", 0)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(seg0 == Map("abab" -> 4L, "cd" -> 2L))
  }

  test("bpeMerges stops early when no pairs remain; empty corpus trains nothing") {
    // single-char words have no adjacent pairs
    val singles = Seq("a b c a").toDF("text")
    assert(Vocab.bpeMerges(singles, "text", 5).count() == 0)
    val empty = Seq.empty[String].toDF("text")
    assert(Vocab.bpeMerges(empty, "text", 5).count() == 0)
  }
}
