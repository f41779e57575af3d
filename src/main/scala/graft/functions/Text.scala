package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis functions for large-scale training-data pipelines, expressed
  * as pure Catalyst `Column` compositions (codegen-friendly, no UDFs unless
  * noted). The reference's scalar-function surface is thin wrappers over Arrow
  * compute kernels (`/root/reference/libtenzir/builtins/functions/string.cpp:242`);
  * these play the same role over Spark's built-in expressions.
  *
  * Everything is deterministic (seeded hashes, no wall clock) so results are
  * byte-identical across replays and cluster sizes.
  */
object Text {

  /** Whitespace tokens of a text column (empty input → empty array). */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => length(t) > 0)

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish subword proxy count: runs of letters, runs of digits, and single
    * other non-space chars — the standard pre-tokenizer regex shape.
    */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("long")

  /** Canonical normalized form: lowercase, whitespace collapsed to single
    * spaces, trimmed. The basis for exact-dup fingerprints.
    */
  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Deterministic html→text extraction over raw page bytes — the derivation
    * behind the north rule's "byte-identical extracted text per url" replay
    * invariant (the WAL carries `html: binary`; `text` must be a pure
    * function of it so any replay reconverges bit-for-bit). Contract:
    * drop script/style subtrees, strip all tags, decode the common HTML
    * entities (`&amp;` last — no double-decode), collapse whitespace, trim.
    * Pure codegen'd Column pipeline (Java regex here, RE2 in the DuckDB
    * oracle twin — patterns stay in the shared subset: no backreferences).
    */
  def extractText(html: Column): Column = {
    val s0 = decode(html, "UTF-8")
    val noScript = regexp_replace(s0, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noStyle, "<[^>]*>", " ")
    val ent = regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(noTags, "&nbsp;", " "),
              "&lt;", "<"),
            "&gt;", ">"),
          "&quot;", "\""),
        "&#39;", "'"),
      "&amp;", "&")
    trim(regexp_replace(ent, "\\s+", " "))
  }

  /** Exact-dup fingerprint: md5 hex of the normalized text. */
  def fingerprintMd5(text: Column): Column = md5(normalize(text))

  /** 60-bit hash from the first 15 hex chars of md5 — the oracle-checkable
    * hash family: DuckDB computes the identical value as
    * `('0x' || substr(md5(x), 1, 15))::BIGINT`, so every sketch built on it
    * (minhash, simhash, hyperplane LSH) gets a hard DuckDB oracle instead of
    * `no_oracle` (round-1 lesson: xxhash64 has no DuckDB twin). Always
    * non-negative (fits comfortably in a long).
    */
  def md5h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** 64-bit rolling polynomial fingerprint over normalized tokens
    * (FNV-prime multiplier; long arithmetic wraps — deterministic).
    */
  def fingerprint64(text: Column): Column =
    aggregate(tokens(normalize(text)), lit(0xcbf29ce484222325L),
      (acc, w) => acc * lit(1099511628211L) + xxhash64(w))

  /** Word n-gram shingles (distinct), the unit set for Jaccard similarity.
    * Documents shorter than n words yield their full text as one shingle so
    * they still participate in dedup.
    *
    * Construction is shift-and-zip — n shifted views of the token array,
    * zipped with string concat — NOT `transform(sequence(...), i =>
    * slice(toks, …))`: a lambda body that references the tokenization subtree
    * re-evaluates it per element (per shingle!), turning an O(len) row into
    * O(len²). Here tokenization appears n+1 times at the top level of one
    * projection → O(n) evaluations per row.
    */
  def shingles(text: Column, n: Int): Column = {
    // null text → empty token array (not null), so the empty-doc guard below
    // fires and null-text docs still participate in dedup as [""].
    val toks = coalesce(tokens(normalize(text)), array().cast("array<string>"))
    // window count; min 1 so short docs yield their full text as one shingle
    val wins = greatest(size(toks) - (n - 1), lit(1))
    val shifted = (0 until n).map(j => slice(toks, lit(j + 1), wins))
    // zip_with pads the shorter side with null; concat_ws skips nulls, so
    // short docs degrade gracefully to "all tokens joined"
    val grams = shifted.reduce((a, b) => zip_with(a, b, (x, y) => concat_ws(" ", x, y)))
    // empty doc: [""] (one empty shingle), matching the sequence-based form
    when(size(toks) === 0, array(lit(""))).otherwise(array_distinct(grams))
  }

  /** [[md5h60]] of each normalized token — materialize this once (as a
    * column) and feed it to the per-bit/per-component folds in simhash.
    */
  def tokenHashes(text: Column): Column =
    transform(tokens(normalize(text)), w => md5h60(w))

  // ------------------------------------------------------------- quality

  /** Ratio of punctuation/symbol characters to total characters. */
  def punctRatio(text: Column): Column = {
    val len = length(text).cast("double")
    when(len === 0, 0.0).otherwise(
      length(regexp_replace(text, "[A-Za-z0-9\\s]", "")).cast("double") / len)
  }

  /** Type-token ratio: distinct tokens / tokens (lexical diversity). */
  def typeTokenRatio(text: Column): Column = {
    val t = tokens(normalize(text))
    when(size(t) === 0, 0.0)
      .otherwise(size(array_distinct(t)).cast("double") / size(t).cast("double"))
  }

  /** Mean token length in characters. */
  def meanTokenLen(text: Column): Column = {
    val t = tokens(normalize(text))
    when(size(t) === 0, 0.0).otherwise(
      aggregate(t, lit(0L), (acc, w) => acc + length(w)).cast("double") / size(t).cast("double"))
  }

  /** Fraction of tokens that appear in a stopword list (signals natural
    * prose vs. boilerplate/code).
    */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val t = tokens(normalize(text))
    when(size(t) === 0, 0.0).otherwise(
      size(filter(t, w => w.isin(stopwords.map(lit): _*))).cast("double")
        / size(t).cast("double"))
  }

  val EnglishStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "for", "on",
    "with", "as", "at", "by", "this", "that", "be", "are", "was", "from")

  /** Composite quality score in [0,1]: length band, lexical diversity,
    * stopword presence, low punctuation. Fixed weights; deterministic.
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / 500.0, lit(1.0))
    val diversity = typeTokenRatio(text)
    val stop = least(stopwordRatio(text, EnglishStopwords) * 5.0, lit(1.0))
    val punct = greatest(lit(1.0) - punctRatio(text) * 4.0, lit(0.0))
    lenScore * 0.25 + diversity * 0.25 + stop * 0.25 + punct * 0.25
  }

  // ------------------------------------------------------------- language ID

  /** Tiny per-language stopword profiles (n-gram-heuristic class of language
    * ID). Intentionally small — the point is the distributed scoring shape.
    */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "des", "un", "une", "dans", "que"),
    "es" -> Seq("el", "la", "los", "y", "es", "de", "un", "una", "en", "que"),
    "pt" -> Seq("o", "a", "os", "e", "de", "um", "uma", "em", "que", "para"))

  /** Predicted language: argmax over per-profile stopword hit counts, with a
    * deterministic tiebreak (score, then language code) via struct-array max —
    * pure Column logic, whole-stage-codegen eligible.
    */
  def langId(text: Column, default: String = "und"): Column = {
    val t = tokens(normalize(text))
    val scored = LangProfiles.map { case (lang, words) =>
      struct(
        size(filter(t, w => w.isin(words.map(lit): _*))).as("score"),
        lit(lang).as("lang"))
    }
    val best = array_max(array(scored: _*))
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit(default))
  }

  // -------------------------------------------- repetition / boilerplate

  /** ALL word n-gram windows (non-distinct, document order): the unit for
    * repetition signals, where multiplicity is the whole point — contrast
    * [[shingles]], which is distinct-set-valued for Jaccard. Docs shorter
    * than n words yield an empty array. Shift-and-zip construction for the
    * same O(len) reason documented on [[shingles]].
    */
  def windowsAll(text: Column, n: Int): Column = {
    val toks = coalesce(tokens(normalize(text)), array().cast("array<string>"))
    val wins = greatest(size(toks) - (n - 1), lit(1))
    val shifted = (0 until n).map(j => slice(toks, lit(j + 1), wins))
    val grams = shifted.reduce((a, b) => zip_with(a, b, (x, y) => concat_ws(" ", x, y)))
    when(size(toks) < n, array().cast("array<string>")).otherwise(grams)
  }

  /** Longest run length in a sorted string array — i.e. the max multiplicity
    * of any value. One codegen'd left fold, no shuffle, no explode.
    */
  private def maxMultiplicity(sorted: Column): Column =
    aggregate(sorted,
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + lit(1L))
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))

  /** Sum of `weight(x)` over every element of a sorted array that is a
    * REPEAT of its predecessor (occurrences 2..k of each value) — the shared
    * core of the duplicate-fraction signals.
    */
  private def repeatWeight(sorted: Column, weight: Column => Column): Column =
    aggregate(sorted,
      struct(lit("").as("prev"), lit(false).as("started"), lit(0L).as("dup")),
      (acc, x) => {
        val isRep = acc.getField("started") && (x === acc.getField("prev"))
        struct(x.as("prev"), lit(true).as("started"),
          (acc.getField("dup") + when(isRep, weight(x)).otherwise(lit(0L))).as("dup"))
      },
      acc => acc.getField("dup"))

  /** Gopher-style "fraction of tokens covered by the single most frequent
    * word n-gram": maxcount(n-gram) * n / tokens, capped at 1.0 (overlapping
    * occurrences of a self-overlapping gram — "a a a a" — would otherwise
    * overcount covered tokens past the document length). 0 for docs with no
    * windows. High values flag templated/spammy pages.
    */
  def topNgramFraction(text: Column, n: Int): Column = {
    val toks = coalesce(tokens(normalize(text)), array().cast("array<string>"))
    val ntok = size(toks)
    val best = maxMultiplicity(array_sort(windowsAll(text, n)))
    when(ntok === 0, lit(0.0))
      .otherwise(least((best * n).cast("double") / ntok.cast("double"), lit(1.0)))
  }

  /** Fraction of word n-gram windows that are duplicates of another window
    * in the same document (all occurrences of any repeated n-gram count).
    */
  def dupNgramFraction(text: Column, n: Int): Column = {
    val grams = array_sort(windowsAll(text, n))
    val nw = size(grams)
    val inRuns = aggregate(grams,
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("dups")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + lit(1L))
          .otherwise(lit(1L))
        val add = when(run === 2L, lit(2L)).when(run > 2L, lit(1L)).otherwise(lit(0L))
        struct(x.as("prev"), run.as("run"), (acc.getField("dups") + add).as("dups"))
      },
      acc => acc.getField("dups"))
    when(nw === 0, lit(0.0)).otherwise(inRuns.cast("double") / nw.cast("double"))
  }

  /** Fraction of lines (split on \n, kept verbatim) that are duplicates of
    * an earlier line: (total - distinct) / total. 0 for empty/null text.
    */
  def dupLineFraction(text: Column): Column = {
    val lines = split(coalesce(text, lit("")), "\n")
    val total = size(lines)
    when(total === 0, lit(0.0)).otherwise(
      (total - size(array_distinct(lines))).cast("double") / total.cast("double"))
  }

  /** Fraction of characters that sit inside repeated lines (occurrences
    * 2..k of each duplicated line), per Gopher's duplicate-line-chars
    * signal. Newlines themselves are not counted on either side.
    */
  def dupLineCharFraction(text: Column): Column = {
    val lines = array_sort(split(coalesce(text, lit("")), "\n"))
    val totalChars = aggregate(lines, lit(0L), (acc, x) => acc + length(x))
    val dupChars = repeatWeight(lines, x => length(x).cast("long"))
    when(totalChars === 0L, lit(0.0))
      .otherwise(dupChars.cast("double") / totalChars.cast("double"))
  }

  // ------------------------------- published composite quality filters

  /** C4 line-keep rule (Raffel et al. 2020 §2.2): a line survives iff it
    * ends in a terminal punctuation mark (. ! ? or a closing double quote),
    * has at least `minWords` whitespace words, and does not mention
    * "javascript" (case-insensitive). Pure predicate over one line.
    */
  private def c4LineKeep(line: Column, minWords: Int): Column = {
    val words = filter(split(trim(line), "\\s+"), w => length(w) > 0)
    line.rlike("[.!?\"]$") && size(words) >= minWords &&
      !lower(line).contains("javascript")
  }

  /** C4 cleaning (Raffel et al. 2020): split on newlines, keep only lines
    * passing [[c4LineKeep]], re-join. Returns a struct with the cleaned
    * text plus the line counts the doc-level rule needs — one pass, zero
    * shuffle, codegen'd HOFs (the shape that survives a 100 TB scan).
    */
  def c4Clean(text: Column, minWords: Int = 5): Column = {
    val lines = split(coalesce(text, lit("")), "\n")
    val kept = filter(lines, l => c4LineKeep(l, minWords))
    struct(
      array_join(kept, "\n").as("clean_text"),
      size(kept).cast("long").as("kept_lines"),
      size(lines).cast("long").as("total_lines"))
  }

  /** C4 doc-keep rule: at least `minLines` retained lines (the paper's
    * "fewer than 3 sentences" drop, at line granularity), no "lorem ipsum",
    * and no curly brace (code leakage). Takes the ALREADY-COMPUTED
    * [[c4Clean]] struct so the line-split/filter HOF chain is evaluated
    * once per document, not rebuilt inside the predicate (nested HOF
    * lambdas are not reliably CSE'd). The paper's bad-words list is a
    * deployment-supplied dictionary — compose with an `isin`/`rlike`
    * predicate over it; not baked in here.
    */
  def c4Keep(text: Column, cleaned: Column, minLines: Int = 3): Column =
    cleaned.getField("kept_lines") >= minLines &&
      !lower(coalesce(text, lit(""))).contains("lorem ipsum") &&
      !coalesce(text, lit("")).contains("{")

  /** Gopher quality signals (Rae et al. 2021, Table A1) as one struct —
    * word count band, mean word length band, per-symbol word ratios (hash;
    * ellipsis), bullet-start / ellipsis-end line fractions, alphabetic-word
    * fraction, and the "contains ≥2 required stopwords" rule. One scan,
    * zero shuffle; compose with the repetition signals
    * ([[topNgramFraction]]/[[dupLineFraction]]/…) for the paper's full
    * repetition section.
    */
  def gopherSignals(text: Column): Column = {
    val toks = coalesce(tokens(normalize(text)), array().cast("array<string>"))
    val nWords = size(toks).cast("long")
    val meanLen = when(nWords === 0L, lit(0.0)).otherwise(
      aggregate(toks, lit(0L), (a, w) => a + length(w)).cast("double")
        / nWords.cast("double"))
    // Rae et al. threshold each symbol's ratio SEPARATELY (drop if > 0.1
    // "for either the hash symbol or the ellipsis") — one combined ratio
    // would be strictly more aggressive than the published recipe
    val hashWords = size(filter(toks, w => w.contains("#")))
    val hashRatio = when(nWords === 0L, lit(0.0))
      .otherwise(hashWords.cast("double") / nWords.cast("double"))
    val ellipsisWords = size(filter(toks,
      w => w.contains("...") || w.contains("…")))
    val ellipsisRatio = when(nWords === 0L, lit(0.0))
      .otherwise(ellipsisWords.cast("double") / nWords.cast("double"))
    val lines = split(coalesce(text, lit("")), "\n")
    val nLines = size(lines)
    val bulletStart = size(filter(lines,
      l => trim(l).rlike("^([-*•])")))
    val ellipsisEnd = size(filter(lines,
      l => trim(l).rlike("(\\.\\.\\.|…)$")))
    val bulletFrac = when(nLines === 0, lit(0.0))
      .otherwise(bulletStart.cast("double") / nLines.cast("double"))
    val ellipsisFrac = when(nLines === 0, lit(0.0))
      .otherwise(ellipsisEnd.cast("double") / nLines.cast("double"))
    val alphaWords = size(filter(toks, w => w.rlike("[a-z]")))
    val alphaFrac = when(nWords === 0L, lit(0.0))
      .otherwise(alphaWords.cast("double") / nWords.cast("double"))
    val required = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val stopHits = size(filter(array(required.map(lit): _*),
      s => array_contains(toks, s))).cast("long")
    struct(
      nWords.as("n_words"), meanLen.as("mean_word_len"),
      hashRatio.as("hash_ratio"), ellipsisRatio.as("ellipsis_ratio"),
      bulletFrac.as("bullet_frac"),
      ellipsisFrac.as("ellipsis_frac"), alphaFrac.as("alpha_frac"),
      stopHits.as("stop_hits"))
  }

  /** Gopher doc-keep decision over [[gopherSignals]] with the paper's
    * published thresholds: 50 ≤ words ≤ 100k, 3 ≤ mean word length ≤ 10,
    * hash ratio ≤ 0.1 AND ellipsis ratio ≤ 0.1 (each thresholded
    * separately, per Table A1), ≤ 90% bullet lines, ≤ 30% ellipsis lines,
    * ≥ 80% alphabetic words, ≥ 2 required stopwords. Takes the
    * ALREADY-COMPUTED [[gopherSignals]] struct so the seven-signal
    * expression tree is evaluated once per document.
    */
  def gopherKeep(s: Column): Column =
    s.getField("n_words") >= 50L && s.getField("n_words") <= 100000L &&
      s.getField("mean_word_len") >= 3.0 && s.getField("mean_word_len") <= 10.0 &&
      s.getField("hash_ratio") <= 0.1 &&
      s.getField("ellipsis_ratio") <= 0.1 &&
      s.getField("bullet_frac") <= 0.9 &&
      s.getField("ellipsis_frac") <= 0.3 &&
      s.getField("alpha_frac") >= 0.8 &&
      s.getField("stop_hits") >= 2L

  // ------------------------------------------------------------- vectors

  /** Dot product of two array<numeric> columns in double precision,
    * left-to-right fold (deterministic; matches an oracle computing the same
    * sequential sum).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; null-safe zero for zero-norm vectors. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b); val na = norm(a); val nb = norm(b)
    when(na === 0.0 || nb === 0.0, 0.0).otherwise(d / (na * nb))
  }
}
