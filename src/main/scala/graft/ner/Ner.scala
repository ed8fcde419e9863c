package graft.ner

/** NER abstraction: a tagger turns a sentence's term list into (index, value, type)
  * span triples. Mirrors the reference's pluggable entity-parser seam
  * (arelight/third_party/dp_130.py:8-17 wired at arelight/run/infer.py:180-190).
  *
  * Implementations must be pure/deterministic per term list: they run inside
  * `mapPartitions` on executors and the north_rule requires resume-stable output.
  */
final case class RawMention(ind: Int, value: String, eType: String)

trait Ner extends Serializable {

  /** Tag one sentence (a term list). Returns mentions plus the possibly-rewritten
    * term list (BIO span merging can fuse several input terms into one entity term,
    * so output terms may be shorter than input; `RawMention.ind` indexes the
    * RETURNED list). */
  def tag(terms: Seq[String]): (Seq[String], Seq[RawMention])

  /** Batched entry point — the ONNX implementation overrides this to run one
    * model invocation per chunk batch (reference batching: chunk_limit=128,
    * arelight/run/infer.py:189 + arelight/arekit/chunk_it.py). */
  def tagBatch(batch: Seq[Seq[String]]): Seq[(Seq[String], Seq[RawMention])] =
    batch.map(tag)
}

/** The reference's own deterministic test oracle
  * (test/utils_entity_parser.py:16-29): a term spelled `[value]` IS an entity
  * mention; everything else is a plain word. Type is UNDEFINED there; here a
  * type function is injected (the synthetic generator encodes type as
  * `[TYPE:value]`, falling back to UNDEFINED for plain `[value]`). */
object BracketNer extends Ner {
  def tag(terms: Seq[String]): (Seq[String], Seq[RawMention]) = {
    // Hot path (runs per sentence of 10^12 docs): output length == input
    // length (1:1 rewrite), so terms land in one pre-sized array instead of a
    // per-term cons list; sentences without any bracket return the input
    // sequence unchanged (zero allocation).
    val n = terms.length
    var hasBracket = false
    var i = 0
    while (i < n && !hasBracket) {
      val w = terms(i)
      hasBracket = w.length >= 3 && w.charAt(0) == '[' && w.charAt(w.length - 1) == ']'
      i += 1
    }
    if (!hasBracket) return (terms, Nil)
    val out = new Array[String](n)
    val ms = Seq.newBuilder[RawMention]
    i = 0
    while (i < n) {
      val w = terms(i)
      if (w.length >= 3 && w.charAt(0) == '[' && w.charAt(w.length - 1) == ']') {
        val inner = w.substring(1, w.length - 1)
        val colon = inner.indexOf(':')
        // value kept VERBATIM incl. dashes — the reference does `word[1:-1]`
        // (test/utils_entity_parser.py:20-22) and its fixture pins values like
        // "Джо-Байден" (opennre-data-test-predict.sqlite entity_values).
        val (tpe, value) =
          if (colon > 0 && inner.substring(0, colon).forall(c => c.isUpper || c == '_'))
            (inner.substring(0, colon), inner.substring(colon + 1))
          else ("UNDEFINED", inner)
        out(i) = value
        ms += RawMention(i, value, tpe)
      } else out(i) = w
      i += 1
    }
    (scala.collection.immutable.ArraySeq.unsafeWrapArray(out), ms.result())
  }
}

/** Closed-vocabulary tagger: any term whose canonical form is in the lexicon is a
  * mention of the mapped type. Used for the driver-verifiable queries over the
  * synthetic `documents` table (lower-case word salad, no orthographic cues) —
  * fully SQL-expressible so DuckDB can oracle-check the whole KG tail. */
final case class LexiconNer(lexicon: Map[String, String]) extends Ner {
  def tag(terms: Seq[String]): (Seq[String], Seq[RawMention]) = {
    // index loop, no per-term Option/tuple garbage (hot path; already-lowercase
    // terms also hit String.toLowerCase's return-this fast path in canonicalKey)
    val b = Seq.newBuilder[RawMention]
    var i = 0
    while (i < terms.length) {
      val w = terms(i)
      val t = lexicon.getOrElse(graft.text.TextOps.canonicalKey(w), null)
      if (t != null) b += RawMention(i, w, t)
      i += 1
    }
    (terms, b.result())
  }
}

/** Capitalization-heuristic tagger for natural-cased text: maximal runs of
  * capitalized tokens (not sentence-initial unless the run extends past it)
  * become single merged mentions. A cheap stand-in for the BERT/ONNX path with
  * the same span-merging output shape. */
object CapitalizedNer extends Ner {
  private def isCap(w: String): Boolean =
    w.nonEmpty && w.head.isUpper && w.exists(_.isLetter)

  def tag(terms: Seq[String]): (Seq[String], Seq[RawMention]) = {
    val out = Seq.newBuilder[String]
    val ms = Seq.newBuilder[RawMention]
    var i = 0
    var outIdx = 0
    while (i < terms.length) {
      if (isCap(terms(i)) && !(i == 0 && (terms.length == 1 || !isCap(terms(1))))) {
        var j = i
        while (j < terms.length && isCap(terms(j))) j += 1
        val value = terms.slice(i, j).mkString(" ").replaceAll(raw"[,.;:]+$$", "")
        out += value
        ms += RawMention(outIdx, value, "UNDEFINED")
        outIdx += 1
        i = j
      } else {
        out += terms(i)
        outIdx += 1
        i += 1
      }
    }
    (out.result(), ms.result())
  }
}

object NerOps {

  /** Reference NER-type filter (P5): keep mentions whose type is in `types`
    * (default ORG|PERSON|LOC|GPE, arelight/run/utils.py:13); empty set = keep all. */
  def filterTypes(ms: Seq[RawMention], types: Set[String]): Seq[RawMention] =
    if (types.isEmpty) ms else ms.filter(m => types.contains(m.eType))

  /** Reference chunking (P4, arelight/arekit/chunk_it.py:1-31): re-chunk term
    * sequences into <=limit windows tagged with their source sentence index, so a
    * fixed-size model input never truncates long sentences. Returns
    * (sourceIdx, offset, chunk) triples; mention indices from a chunk are
    * re-based by adding `offset`. */
  def chunked(sentences: Seq[Seq[String]], limit: Int): Seq[(Int, Int, Seq[String])] =
    sentences.zipWithIndex.flatMap { case (terms, src) =>
      if (terms.isEmpty) Seq.empty
      else terms.grouped(limit).zipWithIndex.map { case (chunk, k) => (src, k * limit, chunk) }.toSeq
    }
}
