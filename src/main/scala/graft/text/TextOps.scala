package graft.text

/** Deterministic text utilities.
  *
  * The per-row invariant (BASELINE.json input_hint) is byte-identical extracted
  * text per url; everything here is pure, locale-independent Scala so the same
  * bytes come out on every executor, every run.
  */
object TextOps {

  /** Deterministic html -> text extraction.
    *
    * The reference ingests plain text (arelight/run/utils.py:48-51); the engine's
    * input is Common-Crawl-style pages with an `html` binary column. Extraction is
    * intentionally simple and exactly invertible for the synthetic generator
    * (graft.gen.PageGen wraps text with the same template), so the byte-identity
    * invariant is testable: extractText(gen.html(text)) == text.
    *
    * Rules (applied in order, single pass semantics):
    *  1. drop <head>...</head>, <script>...</script> and <style>...</style>
    *     blocks (case-insensitive) — head metadata (title) is not page text
    *  2. <br> and CLOSING block tags (</p>, </div>, </li>, </h1..6>, </tr>)
    *     become '\n' (closing-only so <p>x</p><p>y</p> yields exactly one break)
    *  3. every other tag is dropped
    *  4. decode the five standard entities (&amp; &lt; &gt; &quot; &#39;) + &nbsp;
    *  5. collapse runs of spaces/tabs to one space; trim each line; drop
    *     leading/trailing blank lines (interior blank lines are preserved --
    *     sentence indices must count them, see TextOps.splitLines)
    */
  def extractText(html: Array[Byte]): String =
    extractText(new String(html, java.nio.charset.StandardCharsets.UTF_8))

  def extractText(html: String): String = {
    val noBlocks = raw"(?is)<(head|script|style)\b.*?</\1>".r.replaceAllIn(html, "")
    val breakTags = raw"(?i)<\s*(br\s*/?|/p|/div|/li|/h[1-6]|/tr)\s*>".r
    val withBreaks = breakTags.replaceAllIn(noBlocks, "\n")
    val noTags = raw"(?s)<[^>]*>".r.replaceAllIn(withBreaks, "")
    val decoded = noTags
      .replace("&lt;", "<")
      .replace("&gt;", ">")
      .replace("&quot;", "\"")
      .replace("&#39;", "'")
      .replace("&nbsp;", " ")
      .replace("&amp;", "&") // last, so &amp;lt; decodes to &lt; not <
    val lines = decoded
      .split("\n", -1)
      .map(l => ("[ \\t" + "\u00A0" + "]+").r.replaceAllIn(l, " ").trim)
    val trimmed = lines.dropWhile(_.isEmpty).reverse.dropWhile(_.isEmpty).reverse
    trimmed.mkString("\n")
  }

  /** Reference `linesplit` sentence parser, exact semantics
    * (arelight/run/utils.py:17-18): split on '\n', strip each part,
    * EMPTY PARTS ARE KEPT — sent_ind counts them. */
  def splitLines(text: String): Seq[String] =
    text.split("\n", -1).toSeq.map(_.trim)

  /** Deterministic punkt-equivalent (reference `nltk`/`ru_sent_tokenize`
    * options, arelight/run/utils.py:19-23, test/utils.py:27): whitespace runs
    * (incl. newlines) are normalized to single spaces, then the text splits
    * after [.!?]+ when followed by an uppercase letter / digit / quote /
    * opening bracket. Not byte-compatible with the model-based tokenizers;
    * this is the engine's documented deterministic stand-in (it reproduces the
    * reference fixtures' sentence boundaries, see RuFixtureSpec). */
  private val sentenceBoundary =
    raw"""(?<=[.!?])(?<!\b[A-Z]\.)\s+(?=[\p{Lu}0-9"'\(\[«])""".r

  def splitSentences(text: String): Seq[String] = {
    val normalized = raw"\s+".r.replaceAllIn(text.trim, " ")
    if (normalized.isEmpty) Seq.empty
    else sentenceBoundary.split(normalized).toSeq.map(_.trim)
  }

  /** Exactly the char set of Java regex \s — tokenize must stay bit-compatible
    * with the previous Pattern.compile("\\s+").split implementation AND the
    * DuckDB oracle's regexp_split_to_array(text, '\s+'). */
  @inline private[graft] def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Whitespace tokenization, mirroring AREkit split_by_whitespaces
    * (usage arelight/run/infer.py:184). Empty input yields no terms.
    * Manual scan (no regex machinery) — this runs once per sentence on the
    * hot path of 10^12 documents; identical output to `\s+` split. */
  def tokenize(sentence: String): Seq[String] = {
    // trim first (Java trim strips ALL chars <= U+0020 at the ends — the \s
    // set does not cover every control char; returns `this` when already clean)
    val s = sentence.trim
    val n = s.length
    if (n == 0) return Seq.empty
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < n) {
      var j = i
      while (j < n && !isWs(s.charAt(j))) j += 1
      out += s.substring(i, j)
      i = j
      while (i < n && isWs(s.charAt(i))) i += 1
    }
    out.result()
  }

  private val nonAlnum = java.util.regex.Pattern.compile(raw"[^\p{L}\p{N}]")

  /** Cue-word key: canonical form with punctuation stripped. This runs once
    * per term on the scoring hot path (10^12 docs × every term), so the common
    * case — an already-clean lowercase ASCII token — returns the SAME string
    * with zero allocation; only dirty tokens pay the regex + lowercase path.
    * (Measured: the allocation-heavy path contributed to an 18% GC-time
    * fraction at 32 threads, BENCH gc_fraction.) */
  def cueKey(value: String): String = {
    var i = 0
    while (i < value.length) {
      val c = value.charAt(i)
      if ((c < 'a' || c > 'z') && (c < '0' || c > '9')) return cueKeySlow(value)
      i += 1
    }
    value
  }

  private def cueKeySlow(value: String): String =
    nonAlnum.matcher(canonicalKey(value)).replaceAll("")

  /** Canonical form used as synonym-dictionary key: trim + ROOT-locale
    * lowercase (the reference lemmatizes via language-specific stemmers,
    * arelight/stemmers/ru_mystem.py:31-49; lowercase-trim is the engine's
    * language-neutral key). Locale.ROOT, not the JVM default: group ids and
    * dictionary keys must be identical across heterogeneous executors (a
    * tr/az default locale would map I -> dotless i and silently split
    * synonym groups between nodes), and it keeps the fused kernel's
    * allocation-free ASCII lowercase fast path exactly equivalent. */
  def canonicalKey(value: String): String =
    value.trim.toLowerCase(java.util.Locale.ROOT)
}
