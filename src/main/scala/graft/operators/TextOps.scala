package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for the LLM-data-pipeline extension (SURVEY.md
  * §2.10): tokenization, token counting, language ID, quality scoring,
  * document fingerprinting.
  *
  * Everything is built from higher-order array functions and regexes —
  * pure Catalyst expressions, no UDFs — so the whole pipeline stays inside
  * whole-stage codegen and runs as a single narrow projection over the
  * scan: zero shuffles, scales linearly to any number of partitions.
  */
object TextOps {

  /** Whitespace tokens with empties dropped (leading/trailing/repeated
    * whitespace would otherwise produce "" tokens).
    */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= "")

  /** Token count as BIGINT (size() is INT; the oracle's len() is BIGINT). */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish subword segmentation: runs of letters, runs of digits, or a
    * single other non-space character — the classic pre-tokenizer shape.
    */
  def subTokens(text: Column): Column =
    regexp_extract_all(text, lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))

  /** Count of tokens (distinct) that appear in a fixed vocabulary. */
  def vocabHits(toks: Column, vocab: Seq[String]): Column =
    size(array_intersect(array_distinct(toks),
      array(vocab.map(lit): _*))).cast("long")

  /** Tiny per-language function-word lists for the heuristic language ID.
    * Order is the deterministic tie-break priority.
    */
  val langVocab: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "es" -> Seq("el", "los", "las", "y", "es", "una"),
    "fr" -> Seq("le", "les", "et", "est", "une", "dans"),
    "zh" -> Seq("的", "是", "了", "在"))

  /** Heuristic language ID: argmax of function-word hits with a fixed
    * priority order on ties (en > de > es > fr > zh), "und"(etermined)
    * when nothing matches. Same CASE shape as the oracle SQL.
    */
  def langId(toks: Column): Column = {
    val scores = langVocab.map { case (l, v) => l -> vocabHits(toks, v) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((l, s), elseCol) =>
      when(s > 0 && s === best, lit(l)).otherwise(elseCol)
    }
  }

  /** Punctuation ratio: fraction of non-(alnum/space) characters. */
  def punctRatio(text: Column): Column = {
    val len = length(text).cast("double")
    val cleaned = length(regexp_replace(text, "[a-z0-9\\s]", ""))
    when(len === 0, lit(0.0)).otherwise(cleaned / len)
  }

  /** Stopword ratio over the English function-word list. */
  def stopwordRatio(toks: Column): Column = {
    val n = size(toks).cast("double")
    val hits = size(filter(toks,
      t => array_contains(array(langVocab.head._2.map(lit): _*), t)))
    when(n === 0, lit(0.0)).otherwise(hits / n)
  }

  /** Composite quality score in [0,1]: length credit (saturating at 100
    * tokens) discounted by punctuation noise.
    */
  def qualityScore(text: Column): Column = {
    val lenCredit = least(lit(1.0), tokenCount(text).cast("double") / 100.0)
    lenCredit * (lit(1.0) - punctRatio(text))
  }

  /** Deterministic per-document token cap — the co-occurrence analog of
    * the candidate-generator frequency caps (maxDocFreq / maxChunkFreq /
    * maxBucketFreq): sort + slice keeps the lexicographically first
    * `cap` entries of a distinct-token array, so any in-row pair
    * expansion over the result is O(cap²) per document no matter how
    * long the document is. Sort + slice (rather than slice alone)
    * because array_distinct preserves encounter order, which is not a
    * property an oracle engine reproduces; lexicographic order is.
    */
  def capDistinctTokens(distinctToks: Column, cap: Int): Column =
    slice(array_sort(distinctToks), 1, cap)

  /** Sliding token chunks for RAG/packing pipelines: windows of
    * `chunkSize` tokens starting at 0, stride, 2·stride, … < n (the
    * short tail chunk is kept, so every token lands in ≥1 chunk and
    * consecutive chunks overlap by chunkSize − stride). One narrow
    * `sequence` + per-start `slice` — zero shuffle, embarrassingly
    * parallel at any scale. Requires a non-empty token array (an empty
    * doc would yield one empty chunk; callers filter instead, because
    * "no chunks" is the semantics a chunker downstream expects).
    * Returns an array of (chunk_idx, start, chunk) structs.
    */
  def tokenChunks(toks: Column, chunkSize: Int, stride: Int): Column =
    transform(
      sequence(lit(0), size(toks) - 1, lit(stride)),
      s => struct((s / stride).cast("long").as("chunk_idx"),
        s.cast("long").as("start"),
        slice(toks, s + 1, lit(chunkSize)).as("chunk")))

  /** Rolling polynomial fingerprint over the document's characters:
    * fold(acc*31 + codepoint) mod 1e9+7 — order-sensitive, so equal
    * fingerprints mean equal character streams (mod collisions).
    */
  def rollingFingerprint(text: Column): Column =
    aggregate(split(text, ""), lit(0L),
      (acc, ch) => (acc * 31 + ascii(ch)) % 1000000007L)

  /** 60-bit stable content hash: first 15 hex digits of md5, as BIGINT.
    * Shared with DedupOps — the md5 route is the cross-engine-portable
    * hash (Spark's murmur3 `hash()` seeds differ from other engines).
    * Native single-digest expression; [[md5Prefix60Spec]] is the
    * composed-Catalyst executable spec it is property-tested against.
    */
  def md5Prefix60(c: Column): Column =
    org.apache.spark.sql.graft.HashExpressions.md5Prefix60(c)

  /** Composed-Catalyst spec of [[md5Prefix60]] (hex render → substring →
    * conv parse). Kept for the value-equality property test; the native
    * form skips the three per-row string passes.
    */
  def md5Prefix60Spec(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  // ---- PII scrubbing + canonical normalization (curation family) -----

  /** Email/phone patterns, deliberately restricted to syntax both Java
    * regex (Spark) and RE2 (DuckDB, the oracle engine) interpret
    * identically: character classes, bounded/unbounded greedy repeats —
    * no backreferences, no lookaround (RE2 has neither).
    */
  val EmailRe: String = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val PhoneRe: String = "\\+1-555-[0-9]{4}"

  /** Number of pattern matches in `text` (codegen'd regexp_extract_all;
    * BIGINT to match the oracle's len()).
    */
  def matchCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long")

  /** Replace every email/phone match with a typed placeholder. Order
    * matters only if the patterns overlap (these don't: '@' vs '+1-').
    */
  def redactPii(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailRe, "<EMAIL>"),
      PhoneRe, "<PHONE>")

  /** Canonical text form for dedup keying: lowercase, punctuation →
    * space, whitespace runs collapsed, trimmed. Idempotent (CurationSpec
    * pins it) — the property that makes it safe to re-apply at any
    * pipeline stage.
    */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9\\s]", " "), "\\s+", " "))
}
