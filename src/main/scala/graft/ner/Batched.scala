package graft.ner

/** Batched span-tagging NER — the production shape of the reference's
  * DeepPavlov adapter (arelight/third_party/dp_130.py:8-17 wired at
  * arelight/run/infer.py:180-190): sentences are re-chunked to <=chunkLimit
  * terms (chunk_it.py), chunks are batched into fixed-size model calls, BIO
  * label sequences come back, and spans are decoded into merged entity terms.
  *
  * The model seam is [[SpanTagger]]. The ONNX session implementation is a
  * STUB here (no onnxruntime in this environment — see [[StubBioTagger]], a
  * deterministic fake); the surrounding plumbing — chunking, batch assembly,
  * chunk reassembly across the 128-term boundary, BIO -> span decode with
  * term-list rewriting — is the real engine code and is fully tested.
  */
trait SpanTagger extends Serializable {
  /** One model invocation: a batch of term chunks -> one BIO label per term
    * (labels: "O", "B-<TYPE>", "I-<TYPE>"). */
  def tagBatchBio(chunks: Seq[Seq[String]]): Seq[Seq[String]]
}

/** Deterministic fake model (STUB standing in for the ONNX BERT session):
  * capitalized tokens are PERSON spans (consecutive capitalized tokens
  * continue the span), all-caps tokens are ORG. Deterministic per input —
  * good enough to exercise every plumbing path. */
object StubBioTagger extends SpanTagger {
  def tagBatchBio(chunks: Seq[Seq[String]]): Seq[Seq[String]] =
    chunks.map { terms =>
      var prevEntity = false
      terms.map { t =>
        val letters = t.filter(_.isLetter)
        val label =
          if (letters.nonEmpty && letters.forall(_.isUpper) && letters.length >= 2)
            if (prevEntity) "I-ORG" else "B-ORG"
          else if (letters.nonEmpty && t.head.isUpper)
            if (prevEntity) "I-PERSON" else "B-PERSON"
          else "O"
        prevEntity = label != "O"
        label
      }
    }
}

/** BIO-driven NER with reference-parity chunking and batching. Mirrors the
  * output shape of the reference's NERPipelineItem: each decoded span becomes
  * ONE term (values space-joined), and mention indices address the REWRITTEN
  * term list. */
final case class BatchedNer(
    tagger: SpanTagger,
    chunkLimit: Int = 128, // arelight/run/infer.py:189
    batchSize: Int = 16    // test/test_document_parsing_benchmark.py:55
) extends Ner {

  def tag(terms: Seq[String]): (Seq[String], Seq[RawMention]) =
    tagBatch(Seq(terms)).head

  override def tagBatch(sentences: Seq[Seq[String]]): Seq[(Seq[String], Seq[RawMention])] = {
    // 1. chunk all sentences (P4), 2. run the model in fixed-size batches,
    // 3. reassemble labels per sentence, 4. decode spans.
    val chunks = NerOps.chunked(sentences, chunkLimit)
    val labels: Seq[Seq[String]] =
      chunks.map(_._3).grouped(batchSize).flatMap(tagger.tagBatchBio).toSeq
    val bySentence = Array.fill(sentences.length)(Vector.empty[String])
    chunks.zip(labels).foreach { case ((src, _, _), ls) =>
      bySentence(src) = bySentence(src) ++ ls // chunks arrive in offset order
    }
    sentences.zipWithIndex.map { case (terms, i) => decode(terms, bySentence(i)) }
  }

  /** BIO -> spans; merged span = one output term. A span crossing a chunk
    * boundary survives because labels are reassembled before decoding. */
  private[ner] def decode(terms: Seq[String], labels: Seq[String]): (Seq[String], Seq[RawMention]) = {
    require(labels.length == terms.length, s"model returned ${labels.length} labels for ${terms.length} terms")
    val outTerms = Seq.newBuilder[String]
    val mentions = Seq.newBuilder[RawMention]
    var i = 0
    var outIdx = 0
    while (i < terms.length) {
      val l = labels(i)
      if (l.startsWith("B-")) {
        val tpe = l.substring(2)
        var j = i + 1
        while (j < terms.length && labels(j) == s"I-$tpe") j += 1
        val value = terms.slice(i, j).mkString(" ")
        outTerms += value
        mentions += RawMention(outIdx, value, tpe)
        outIdx += 1
        i = j
      } else { // O, or dangling I- treated as outside (standard lenient decode)
        outTerms += terms(i)
        outIdx += 1
        i += 1
      }
    }
    (outTerms.result(), mentions.result())
  }
}
