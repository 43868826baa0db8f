package graft.corpus

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis column library for large-scale training-data pipelines —
 * the "beyond the reference" surface (SURVEY.md §7 phase F). The reference
 * stops at loading text payloads (`c_statement`, `a_sql_text`,
 * `XELoader/EventMetadata.cs:324-330`); a modern corpus pipeline needs
 * tokenization, language ID, quality scoring and fingerprinting over those
 * columns. Everything here is a pure `Column => Column` built from
 * codegen'd Spark built-ins (no UDFs — SURVEY.md "Functions, not UDFs"),
 * so plans stay inside WholeStageCodegen and scale linearly with input.
 *
 * Determinism contract: every function has an exact ANSI-SQL twin runnable
 * in DuckDB (see CorpusQueries.oracles); the md5-based 60-bit hash is the
 * cross-engine portable hash used by all dedup/similarity operators.
 */
object TextAnalysis {

  /** Whitespace tokens of trimmed text; single source of truth for token
    * semantics across all corpus operators. Empty OR NULL text → empty
    * array (NULL would otherwise propagate through split() and turn
    * every downstream ratio/score NULL, silently dropping null-text
    * rows — routine after PERMISSIVE ingest — from filters and
    * aggregates instead of scoring them as empty). */
  def tokens(text: Column): Column = {
    val t = trim(coalesce(text, lit("")))
    when(length(t) === 0, array().cast("array<string>"))
      .otherwise(split(t, "\\s+"))
  }

  /** Portable 60-bit hash: first 15 hex chars of md5, as a non-negative
    * long. 15 hex chars = 60 bits < 2^63, so the conv() result always fits
    * a signed long identically in Spark and DuckDB
    * (`('0x' || substring(md5(s),1,15))::BIGINT`). */
  def hash60(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")

  /** Salted variant for minhash permutations: hash60(i ++ "|" ++ s).
    * Salting through the hash replaces the classic (a*h+b) mod p family —
    * no 64-bit overflow concerns and byte-identical across engines. */
  def hash60Salted(salt: Int, s: Column): Column =
    hash60(concat(lit(s"${salt}|"), s))

  /** Word k-shingles (k consecutive tokens joined by one space), distinct
    * in first-occurrence order. Docs with fewer than k tokens yield an
    * empty array — callers decide whether such docs participate in dedup.
    * Native codegen kernel ([[KGrams]]); [[kgramsHof]] is the builtin-HOF
    * twin the equivalence property test replays. */
  def shingles(text: Column, k: Int): Column =
    KGrams.toColumn(text, k, distinct = true)

  /** Raw (non-distinct) word k-grams — [[shingles]] without the dedup
    * (repetition scoring needs the duplicate windows shingles removes). */
  def kgrams(text: Column, k: Int): Column =
    KGrams.toColumn(text, k, distinct = false)

  /** The pre-round-12 builtin-HOF form of [[kgrams]], kept ONLY as the
    * independent semantics witness for the native kernel (property-tested
    * equal on random and adversarial inputs — the two implementations
    * share no code).
    *
    * Two non-obvious constraints shape it:
    *  - Spark's sequence(a,b) generates a DESCENDING sequence when b<a
    *    (never empty), hence the explicit n<k guard;
    *  - HOFs evaluate interpreted (no codegen CSE), so a naked
    *    `element_at(tokens(text), i)` would re-run the regex split per
    *    element reference. Binding the token array as a lambda variable
    *    of an outer single-element transform forces one split per row.
    * That interpreter re-entry is also why it lost its production spot
    * to the kernel (~2.5-3x on the sf0.1 postings explode). */
  private[graft] def kgramsHof(text: Column, k: Int): Column =
    element_at(
      transform(array(tokens(text)), ws => {
        val n = size(ws)
        when(n < k, array().cast("array<string>")).otherwise(
          transform(sequence(lit(1), n - (k - 1)), i =>
            concat_ws(" ", (0 until k).map(j => element_at(ws, i + j)): _*)))
      }),
      1)

  /** Polynomial rolling-hash fingerprint of the first `maxChars` chars of
    * the lowercased text: h = fold(h*131 + code) mod 1e9+7. Intermediate
    * values stay ≤ ~1.3e11, far from int64 overflow, so Spark (Java wrap)
    * and DuckDB (overflow-checked) agree. A custom codegen Expression
    * could avoid the per-char array, but the HOF form is already
    * whole-stage-codegen'd and O(maxChars) per row. */
  def rollingFingerprint(text: Column, maxChars: Int = 200): Column =
    // bind the normalized prefix ONCE as a lambda variable — inlined, the
    // lower/trim/substring chain would re-run per character (maxChars×/row)
    element_at(
      transform(array(substring(lower(trim(text)), 1, maxChars)), s =>
        aggregate(
          transform(sequence(lit(1), greatest(length(s), lit(1))), i =>
            ascii(substring(s, i, lit(1))).cast("long")),
          lit(0L),
          (h, c) => (h * 131L + c) % 1000000007L)),
      1)

  /** Count of regex matches — langid/quality building block. */
  def matchCount(text: Column, pattern: String): Column =
    regexp_count(text, lit(pattern))

  /** BPE-ish pre-tokenizer pattern (GPT-2-family shape): contraction
    * suffixes, space-prefixed letter runs, space-prefixed digit runs,
    * space-prefixed punctuation runs, residual whitespace. Every
    * alternative is anchored to a distinct first-character class AND
    * ordered longest-capable-first, so Java's leftmost-FIRST alternation
    * (Spark) and RE2's leftmost-LONGEST (DuckDB) pick identical matches
    * — no lookarounds, which RE2 lacks. */
  val bpeishPattern: String =
    "'(?:s|d|m|t|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+|\\s+"

  /** Token count a BPE-family tokenizer would produce (pre-tokenization
    * segments — the unit that budgets LLM training data). Whitespace
    * token counts under-estimate code/punctuation-heavy text; this is
    * the standard better proxy. */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpeishPattern), lit(0)))

  /** Stopword-profile language ID. Scores each candidate language by its
    * stopword hit count over the lowercased text; ties break in fixed
    * order en > de > fr > es; CJK codepoints short-circuit to zh; zero
    * hits → 'und'. A real system would use char-n-gram profiles; the
    * operator shape (N regex counters + argmax) is identical. */
  val langStopwords: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|a|of|and|to|in|is)\\b",
    "de" -> "\\b(der|die|das|und|ist|ein|zu)\\b",
    "fr" -> "\\b(le|les|et|est|une|dans)\\b",
    "es" -> "\\b(el|los|y|es|una|en)\\b"
  )
  val cjkPattern = "[\\x{4e00}-\\x{9fff}]"

  /** All per-doc text features from the single-pass [[TextFeatures]]
    * kernel (token count, per-language stopword hits, non-alnum count,
    * CJK count, char count). The quality/lang-id functions below build
    * their column algebra from this ONE struct; Catalyst's common-
    * subexpression elimination computes the kernel once per row however
    * many of them a query combines. The `*Regex` forms further down are
    * the original multi-regex-pass implementations, kept as equivalence
    * WITNESSES (TextFeaturesSpec pins kernel ≡ witness on the fixture
    * corpus plus adversarial whitespace/unicode cases). */
  def textFeatures(text: Column): Column = TextFeatures.toColumn(text)

  private def stopTotal(f: Column): Column =
    Seq("stop_en", "stop_de", "stop_fr", "stop_es")
      .map(f.getField).reduce(_ + _)

  def langId(text: Column): Column = {
    val f = textFeatures(text)
    val counts = Seq("en" -> f.getField("stop_en"), "de" -> f.getField("stop_de"),
      "fr" -> f.getField("stop_fr"), "es" -> f.getField("stop_es"))
    val best = counts.tail.foldLeft((lit(counts.head._1), counts.head._2)) {
      case ((bl, bc), (l, c)) => (when(c > bc, lit(l)).otherwise(bl), greatest(c, bc))
    }
    when(f.getField("n_cjk") > 0, lit("zh"))
      .when(best._2 === 0, lit("und"))
      .otherwise(best._1)
  }

  def langIdRegex(text: Column): Column = {
    val lo = lower(text)
    val counts = langStopwords.map { case (l, p) => l -> matchCount(lo, p) }
    val best = counts.tail.foldLeft((lit(counts.head._1), counts.head._2)) {
      case ((bl, bc), (l, c)) => (when(c > bc, lit(l)).otherwise(bl), greatest(c, bc))
    }
    when(matchCount(text, cjkPattern) > 0, lit("zh"))
      .when(best._2 === 0, lit("und"))
      .otherwise(best._1)
  }

  /** Heuristic quality features (Gopher/C4-style, simplified):
    * doc length, mean token length, stopword ratio, non-alnum ratio.
    * Composite score in [0,1] with exact integer/regex-count inputs so the
    * double arithmetic is a deterministic function of counts. */
  def nTokens(text: Column): Column = textFeatures(text).getField("n_tokens")

  def nTokensSplit(text: Column): Column = size(tokens(text))

  def stopwordRatio(text: Column): Column = {
    val f = textFeatures(text)
    val n = f.getField("n_tokens")
    when(n === 0, lit(0.0)).otherwise(
      stopTotal(f).cast("double") / n.cast("double"))
  }

  def stopwordRatioRegex(text: Column): Column = {
    val n = nTokensSplit(text)
    when(n === 0, lit(0.0)).otherwise(
      matchCount(lower(text), langStopwords.map(_._2).mkString("|"))
        .cast("double") / n.cast("double"))
  }

  def nonAlnumRatio(text: Column): Column = {
    val f = textFeatures(text)
    when(f.getField("n_chars") === 0, lit(0.0)).otherwise(
      f.getField("n_nonalnum").cast("double") / f.getField("n_chars").cast("double"))
  }

  def nonAlnumRatioRegex(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      matchCount(text, "[^a-zA-Z0-9\\s]").cast("double") / length(text).cast("double"))

  /** Score = mean of three [0,1] signals: length window, stopword presence,
    * alnum cleanliness. Thresholds mirror common corpus-filtering rules. */
  def qualityScore(text: Column): Column = {
    val n = nTokens(text)
    val lenOk = when(n.between(10, 1000), lit(1.0)).otherwise(lit(0.0))
    val stopOk = least(stopwordRatio(text) * 10.0, lit(1.0))
    val cleanOk = lit(1.0) - least(nonAlnumRatio(text) * 5.0, lit(1.0))
    round((lenOk + stopOk + cleanOk) / 3.0, 6)
  }

  /** Witness twin of [[qualityScore]] built from the regex/split forms —
    * identical column-algebra structure, so equal inputs give
    * bit-identical doubles. */
  def qualityScoreRegex(text: Column): Column = {
    val n = nTokensSplit(text)
    val lenOk = when(n.between(10, 1000), lit(1.0)).otherwise(lit(0.0))
    val stopOk = least(stopwordRatioRegex(text) * 10.0, lit(1.0))
    val cleanOk = lit(1.0) - least(nonAlnumRatioRegex(text) * 5.0, lit(1.0))
    round((lenOk + stopOk + cleanOk) / 3.0, 6)
  }

  /** Encoding-anomaly counters (the "mojibake census" a web-scale text
    * pipeline runs before language ID — mis-decoded bytes poison both
    * n-gram language detection and tokenizer training):
    *  - U+FFFD REPLACEMENT CHARACTER occurrences: a decoder already gave
    *    up on those bytes upstream;
    *  - UTF-8-as-Latin-1 pair signature: 'Ã' (U+00C3) followed by a char
    *    in U+00A0..U+00BF — exactly the shape every 2-byte UTF-8
    *    sequence for U+00C0..U+00FF (é, ü, ñ, …) decays to when decoded
    *    as Latin-1, and a near-impossible bigram in intentional text;
    *  - non-ASCII count, for the ratio denominator of downstream gates.
    * All three are single-regex counters (codegen'd `regexp_count`),
    * mirrored in DuckDB with chr()-built patterns — the oracle SQL never
    * needs raw non-ASCII bytes. */
  def replacementCharCount(text: Column): Column =
    regexp_count(text, lit("�")).cast("long")

  def mojibakePairCount(text: Column): Column =
    regexp_count(text, lit("Ã[\\u00A0-\\u00BF]")).cast("long")

  def nonAsciiCount(text: Column): Column =
    regexp_count(text, lit("[^\\x00-\\x7F]")).cast("long")

  /** Dedup-normalization: lowercase, strip non-alphanumerics, collapse
    * whitespace. Most corpus dedup hashes NORMALIZED text — byte-exact
    * dedup misses trivial reformat duplicates (case, punctuation,
    * spacing). Pure regexp_replace chain, identical in DuckDB with the
    * 'g' flag. */
  def normalizeText(text: Column): Column = NormalizeText.toColumn(text)

  /** Witness twin of [[normalizeText]] — the original regexp_replace
    * chain (TextFeaturesSpec pins kernel ≡ witness; the DuckDB oracles
    * keep this exact form). */
  def normalizeTextRegex(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9\\s]", ""),
      "\\s+", " "))

  // ---- PII scrubbing ------------------------------------------------
  // Redaction is a standard pre-training step: strip contact details
  // before anything else sees the text. Patterns are deliberately
  // conservative and written in the Java∩RE2 common subset (no
  // lookarounds, no alternation whose leftmost-first vs leftmost-longest
  // choice could diverge), so the DuckDB oracle reproduces every
  // replacement byte-for-byte. All of it is regexp_replace/regexp_count
  // over codegen'd built-ins — a pure projection at any scale.

  /** RFC-ish email: local part @ dotted domain + ≥2-letter TLD. */
  val emailPattern: String =
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 (word-bounded; \\b is ASCII in RE2, and the
    * surrounding text here is ASCII digits/dots either way). */
  val ipv4Pattern: String =
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** International phone: plus-prefixed digit run. Deliberately narrow —
    * bare digit runs collide with ids/quantities and redaction must not
    * eat real data. NO upper bound on the run: a {7,15} cap would match
    * only the first 15 digits of a longer run and LEAK the tail after
    * the `<PHONE>` placeholder (lookarounds are banned for RE2 parity,
    * so an unbounded run is the redaction-safe spelling). */
  val phonePattern: String =
    "\\+\\d{7,}"

  /** Per-kind PII match counts — the audit side of redaction. */
  def piiCounts(text: Column): (Column, Column, Column) =
    (matchCount(text, emailPattern).cast("long"),
      matchCount(text, ipv4Pattern).cast("long"),
      matchCount(text, phonePattern).cast("long"))

  /** Redact emails, then IPv4s, then phones (this order: the earlier
    * placeholders contain no digits, so later patterns cannot match
    * inside them). */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailPattern, "<EMAIL>"),
        ipv4Pattern, "<IP>"),
      phonePattern, "<PHONE>")

  // ---- HTML boilerplate stripping -----------------------------------
  // Web-crawl text arrives wrapped in markup; extraction-to-clean-text is
  // the first transform of every crawl-derived corpus. Tag/entity handling
  // is a regexp_replace chain (Java∩RE2 subset, no alternation), so the
  // whole step is a codegen'd projection — and a DuckDB oracle pins every
  // output byte.

  /** One HTML tag (open, close, or self-closing, with attributes). `[^>]*`
    * has a single possible parse — both regex engines agree. */
  val htmlTagPattern: String = "<[^>]*>"

  /** Markup → clean text: tags become spaces (so `a</p><p>b` does not fuse
    * into `ab`), then the five core entities decode — `&amp;` LAST, so a
    * literal `&amp;lt;` yields `&lt;` and is not double-decoded — then
    * whitespace collapses. */
  def stripHtml(text: Column): Column = {
    val noTags = regexp_replace(text, htmlTagPattern, " ")
    val ent = regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(noTags, "&nbsp;", " "),
            "&lt;", "<"),
          "&gt;", ">"),
        "&quot;", "\""),
      "&#39;", "'")
    trim(regexp_replace(regexp_replace(ent, "&amp;", "&"), "\\s+", " "))
  }

  /** Fraction of the raw bytes that are tag markup — the text-to-markup
    * ratio used to drop boilerplate-heavy pages (nav/ad shells carry far
    * more tag than text). 0.0 on empty text (the sibling-ratio
    * contract: an unguarded 0/0 is NULL and silently drops empty docs
    * from boilerplate filters and per-domain averages). */
  def markupRatio(text: Column): Column =
    when(length(text) === 0, 0.0).otherwise(
      round((length(text) - length(regexp_replace(text, htmlTagPattern, "")))
        .cast("double") / length(text).cast("double"), 6))

  /** Non-overlapping `segLen`-token segments in document order (last one
    * may be short) — the "line" unit of C4-style repeated-boilerplate
    * removal when the corpus carries no newline structure. Same bind-once
    * outer-transform idiom as [[kgrams]] (one tokenize per row); the
    * `when` guard keeps sequence() from descending on empty docs. Integer
    * segment count via floor() — exact for any real doc length. */
  def tokenSegments(text: Column, segLen: Int): Column =
    element_at(
      transform(array(tokens(text)), ws => {
        val n = size(ws)
        val nSeg = floor((n + lit(segLen - 1)).cast("double") / segLen)
          .cast("int")
        when(n === 0, array().cast("array<string>"))
          .otherwise(transform(sequence(lit(1), nSeg), i =>
            concat_ws(" ", slice(ws, (i - lit(1)) * segLen + 1, lit(segLen)))))
      }),
      1)
}
