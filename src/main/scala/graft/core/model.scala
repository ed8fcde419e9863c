package graft.core

import java.sql.Timestamp

/** Core data model of the KG-construction engine.
  *
  * Shapes derive from the reference's fixed row schemas (see SURVEY.md §1):
  *  - `Page` mirrors BASELINE.json `input_hint`:
  *    (url:string, warc_ts:timestamp, html:binary, text:string, lang:string).
  *  - `Sample` mirrors the reference's `contents` table
  *    (reference fixture test/data/samples_and_predict-test.sqlite; forced columns at
  *    arelight/run/infer.py:158-160) with comma-joined list columns replaced by real arrays.
  *  - `Prediction` replaces the one-hot `col_<uint>` layout (arelight/predict/provider.py:10-48)
  *    with the label byte; the one-hot form is an export view only.
  *  - `Triple` mirrors the read API record of
  *    arelight/arekit/sample_service.py:27-68 (subject, label, object + provenance).
  */
final case class Page(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/** One entity mention inside a document's term stream.
  *
  * @param sentInd  sentence index within the document (empty sentences count,
  *                 matching the reference's linesplit: arelight/run/utils.py:17-18)
  * @param ind      term index within the sentence's term list
  * @param value    surface value (normalized), reference IndexedEntity.Value
  *                 (arelight/arekit/indexed_entity.py:4-15)
  * @param eType    NER type, e.g. ORG|PERSON|LOC|GPE (arelight/run/utils.py:13)
  * @param id       mention id, unique within the document (reference: global IdAssigner;
  *                 per-doc ordinal here for deterministic resume, SURVEY.md §4.3)
  * @param groupId  synonym-group id after canonicalization (reference GroupIndex,
  *                 arelight/run/infer.py:293-298)
  */
final case class Mention(
    sentInd: Int,
    ind: Int,
    value: String,
    eType: String,
    id: Long,
    groupId: Long)

/** A sentence as a term stream: word tokens, with entity mentions occupying
  * single term positions (mention.ind points into terms). */
final case class Sentence(sentInd: Int, terms: Seq[String], mentions: Seq[Mention])

/** A fully parsed document. Kept as one row per document so that pair
  * generation / sampling never shuffle: all downstream per-doc work is row-local. */
final case class ParsedDoc(url: String, lang: String, sentences: Seq[Sentence])

/** One context sample — the central relation (reference `contents` schema, SURVEY.md §1.2).
  * `id` is a deterministic composite ("url#opinionId") rather than a global counter so that
  * generation is resume-stable and requires no global coordination at 10^12-doc scale. */
final case class Sample(
    id: String,
    docId: String,
    textA: String,
    textB: String,
    sInd: Int,
    tInd: Int,
    opinionId: Long,
    linkageId: Long,
    entities: Seq[Int],
    entityValues: Seq[String],
    entityTypes: Seq[String],
    sentInd: Int,
    // engine extras (not in the reference schema; used by scorer + triples)
    sValue: String,
    sType: String,
    tValue: String,
    tType: String,
    terms: Seq[String])

/** Three-class sentiment label. uint contract (by-name, normative per
  * arelight/arekit/sample_service.py:17-24): 0=neutral, 1=positive, 2=negative. */
object Sentiment {
  val Neutral: Int = 0
  val Positive: Int = 1
  val Negative: Int = 2

  /** Display names, CLI default `p:pos,n:neg,u:neu`
    * (arelight/run/infer.py:86, labels/formatter.py:7-19). */
  def name(uint: Int): String = uint match {
    case Positive => "pos"
    case Negative => "neg"
    case _        => "neu"
  }

  /** Reference LLM-response decode (arelight/run/infer.py:193-198): substring match
    * yields int {1, -1, 0}; int -1 wraps (Python negative indexing,
    * arelight/predict/provider.py:20-21) to the last one-hot column = col_2 = negative. */
  def decodeResponse(text: String): Int = {
    val t = text.toLowerCase
    if (t.contains("positive")) Positive
    else if (t.contains("negative")) Negative
    else Neutral
  }
}

final case class Prediction(id: String, label: Int)

/** The engine's canonical output record (reference read API:
  * arelight/arekit/sample_service.py:27-68). */
final case class Triple(
    subj: String,
    subjType: String,
    pred: String, // pos | neg | neu
    obj: String,
    objType: String,
    docId: String,
    sentInd: Int,
    sampleId: String)

/** d3js force-graph model (arelight/backend/d3js/relations_graph_builder.py:91). */
final case class GraphNode(id: String, c: Double)
final case class GraphLink(source: String, target: String, c: Double, sent: String)
final case class Graph(basis: Seq[String], equation: String, nodes: Seq[GraphNode], links: Seq[GraphLink])
