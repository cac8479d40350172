package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis + near-dup operators for a training-data pipeline
  * (builder prompt: dedup families, language-ID, quality scoring, token
  * counting, fingerprinting), generalizing the reference's text-similarity
  * surface (`/root/reference/src/ai.py`) to corpus scale.
  *
  * Everything is pure column expressions (whole-stage codegen); the hash
  * primitive for MinHash is md5 so the DuckDB oracle can reproduce
  * signatures bit-for-bit (Spark's murmur `hash()` is not portable).
  */
object TextOps {

  /** Lowercased whitespace tokens, empties removed. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => length(t) > 0)

  /** Word n-shingles (n=2): zip the token array with its own tail.
    * `zip_with` pads the shorter side with null → trailing null shingle
    * filtered out; safe for 0/1-token docs (empty result).
    */
  def wordBigrams(toks: Column): Column =
    array_distinct(filter(
      zip_with(toks, slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
        (a, b) => concat_ws(" ", a, b)),
      s => s.isNotNull && length(s) - length(regexp_replace(s, " ", "")) === 1))

  /** Jaccard similarity of two shingle sets; 0 when both empty. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni === 0, lit(0.0)).otherwise(inter / uni)
  }

  /** One MinHash value: min over the shingle set of md5(seed || '|' || s).
    * Lexicographic min over fixed-width hex = uniform min-hash; portable
    * to any engine with md5. Null for empty shingle sets.
    */
  def minhash(shingles: Column, seed: Int): Column =
    array_min(transform(shingles, s => md5(concat(lit(s"$seed|"), s))))

  /** MinHash signature as an array of `n` independent hashes. */
  def minhashSignature(shingles: Column, n: Int): Column =
    array((0 until n).map(i => minhash(shingles, i)): _*)

  /** LSH band keys: signature split into `bands` bands of `rowsPerBand`,
    * each band's hashes concatenated into one bucket key. Docs sharing any
    * band key are candidate near-dups — turns the O(n²) pair scan into a
    * shuffle on band keys (SURVEY.md §2.4 scale note).
    */
  def lshBandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      concat((0 until rowsPerBand).map(r => element_at(sig, b * rowsPerBand + r + 1)): _*)
    }: _*)

  /** SimHash over tokens: per-token md5 → first 32 bits → bit-majority
    * vote → 32-bit fingerprint. Portable (md5-based).
    */
  def simhash32(toks: Column): Column = {
    val hashes = transform(toks, t => conv(substring(md5(t), 1, 8), 16, 10).cast("long"))
    val bits = (0 until 32).map { b =>
      val votes = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, b).bitwiseAND(1) === 1, 1L).otherwise(-1L))
      when(votes > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Document fingerprint: md5 of the whitespace-normalized lowercase text
    * — the exact-dedup key (hash-groupBy dedup at any scale).
    */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: runs of letters, digits, or single other
    * non-space chars — a portable regex proxy for a real tokenizer.
    */
  def bpeishTokenCount(text: Column): Column =
    regexp_count(text, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"))

  val Stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "for", "on", "with")

  /** Quality metrics: token count, mean token length, stopword ratio,
    * alphabetic-char ratio, and a weighted quality score. All single-op
    * double arithmetic (deterministic across engines).
    */
  def qualityMetrics(df: DataFrame, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val nTok = size(toks).cast("double")
    val nStop = size(filter(toks, t => t.isin(Stopwords.map(lit): _*))).cast("double")
    val nChars = length(col(textCol)).cast("double")
    val nAlpha = length(regexp_replace(col(textCol), "[^a-zA-Z]", "")).cast("double")
    df.withColumn("n_tokens", nTok.cast("long"))
      .withColumn("mean_token_len", when(nTok === 0, 0.0).otherwise(nAlpha / nTok))
      .withColumn("stopword_ratio", when(nTok === 0, 0.0).otherwise(nStop / nTok))
      .withColumn("alpha_ratio", when(nChars === 0, 0.0).otherwise(nAlpha / nChars))
  }

  /** Language-ID: marker-stopword voting. Deterministic n-gram-free
    * heuristic (the container has no langid model); the DuckDB oracle
    * reproduces the same votes, which is the correctness contract.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of"),
    "es" -> Seq("el", "la", "de"),
    "de" -> Seq("der", "die", "und"))

  def langScore(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isin(markers.map(lit): _*)))

  /** Predicted language = first lang (in LangMarkers order) with the max
    * marker count; "und" when all scores are 0.
    */
  def predictLang(text: Column): Column = {
    val toks = tokens(text)
    val scores = LangMarkers.map { case (lang, m) => (lang, langScore(toks, m)) }
    val maxScore = greatest(scores.map(_._2): _*)
    // when-chain in declaration order: earlier langs win ties
    scores.foldRight(lit("und")) { case ((lang, s), acc) =>
      when(s === maxScore && maxScore > 0, lit(lang)).otherwise(acc)
    }
  }
}
