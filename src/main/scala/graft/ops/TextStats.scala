package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language id, quality
  * scoring, token counting, fingerprinting. All declarative built-ins (no UDF),
  * map-side only — they compose with any scan and never shuffle. */
object TextStats {

  import Dedup.tokens

  /** Per-language stopword profiles for the n-gram/stopword-vote language id.
    * Deliberately small; extend per corpus. */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is", "to", "in"),
    "de" -> Seq("der", "die", "das", "und", "ist", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "de"),
    "es" -> Seq("el", "los", "las", "y", "es", "de"))

  private def countIn(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words)))

  /** Stopword-vote language id: argmax over profiles, ties/zero -> "und".
    * Tiebreak: first profile in declaration order with the max votes. */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val votes = langProfiles.map { case (lang, ws) => (lang, countIn(toks, ws)) }
    val maxV = greatest(votes.map(_._2): _*)
    val pick = votes.foldRight(lit("und")) { case ((lang, v), acc) =>
      when(v === maxV && maxV > 0, lit(lang)).otherwise(acc)
    }
    // foldRight builds nested whens; first-in-order profile wins a tie because
    // its `when` is outermost
    pick
  }

  val defaultStopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "is", "to", "in", "it", "that")

  /** Quality metrics: token count, char count, mean token length,
    * type-token ratio, stopword ratio, punctuation ratio. Exact-division
    * doubles over integer counts — engine-portable bit-for-bit. */
  def quality(df: DataFrame, text: Column, id: Column): DataFrame = {
    val toks = tokens(text)
    val nTok = size(toks).cast("double")
    df.select(
      id.as("id"),
      size(toks).as("n_tokens"),
      length(text).as("n_chars"),
      (length(text).cast("double") / nTok).as("chars_per_token"),
      (size(array_distinct(toks)).cast("double") / nTok).as("type_token_ratio"),
      (countIn(toks, defaultStopwords).cast("double") / nTok).as("stopword_ratio"),
      (size(filter(toks, t => t.rlike("[^\\p{L}\\p{N}]"))).cast("double") / nTok)
        .as("punct_token_ratio"))
  }

  /** Repetition signals (the Gopher-rules family): duplicate-line fraction
    * and the share of bigram occurrences taken by the single most frequent
    * bigram — the two cheap detectors for boilerplate/looping text. Map-side
    * built-ins, row-local: the mode count is O(distinct×n) WITHIN a row, no
    * shuffle. Arrays are materialized in their own projection first so the
    * nested HOF lambdas reference only attributes (see [[Dedup.shingles]] on
    * the outer-capture re-evaluation trap). */
  def repetition(df: DataFrame, text: Column, id: Column): DataFrame = {
    val base = df.select(id.as("id"),
      split(text, "\n").as("lines"),
      Dedup.shingles(tokens(text), 2).as("bg"))
    base.select(col("id"),
      size(col("lines")).cast("long").as("n_lines"),
      ((size(col("lines")) - size(array_distinct(col("lines")))).cast("double") /
        size(col("lines")).cast("double")).as("dup_line_frac"),
      when(size(col("bg")) === 0, lit(0.0)).otherwise(
        array_max(transform(array_distinct(col("bg")),
          s => size(filter(col("bg"), x => x === s)))).cast("double") /
          size(col("bg")).cast("double")).as("top_bigram_frac"))
  }

  /** BPE-ish subword token count: word pieces + standalone punctuation via
    * regex extraction (the usual pre-tokenizer shape). */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(raw"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]"), lit(0)))

  /** Canonical document fingerprint: md5 over the space-joined sorted distinct
    * token set (robust to token order / duplication). */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(text)))).cast("binary"))
}
