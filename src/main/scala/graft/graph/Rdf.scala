package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** RDF N-Triples export of the constructed KG — the interchange format a
  * downstream triple store / SPARQL engine ingests. Engine extension: the
  * reference stops at its d3 force JSON (`arelight/run/operations.py`
  * serializes graphs only as JSON); a KG meant for 10^12-document corpora
  * needs the standard line-oriented dump that bulk loaders stream.
  *
  * One output row per aggregated edge; formatting is pure per-row string
  * work (map-side, codegen'd `concat`/`replace` chains — no UDF, no shuffle
  * beyond whatever produced the edge relation). The IRI encoder is a fixed
  * literal-replace chain ('%' first), deterministic and mirrored verbatim in
  * the DuckDB oracle.
  */
object Rdf {

  /** Characters N-Triples forbids raw inside an IRIREF (plus '%', escaped
    * first so encoded bytes stay unambiguous). Literal replaces — no regex. */
  private val unsafe: Seq[(String, String)] = Seq(
    " " -> "%20", "<" -> "%3C", ">" -> "%3E", "\"" -> "%22", "\\" -> "%5C",
    "{" -> "%7B", "}" -> "%7D", "|" -> "%7C", "^" -> "%5E", "`" -> "%60",
    "\n" -> "%0A", "\t" -> "%09")

  /** Percent-encode the IRI-unsafe set. Non-ASCII passes through (N-Triples
    * IRIs are UTF-8). */
  def iriEncode(c: Column): Column =
    unsafe.foldLeft(replace(c, lit("%"), lit("%25"))) { case (acc, (from, to)) =>
      replace(acc, lit(from), lit(to))
    }

  /** N-Triples statements from an aggregated edge relation
    * (source, target, sent[, c]): subject/object are node IRIs under
    * `base/node/`, the predicate is the sentiment relation under
    * `base/rel/`. Output: (s, p, o, line) where `line` is the full
    * dot-terminated statement. */
  def ntriples(edges: DataFrame, base: String = "urn:graft"): DataFrame =
    edges
      .select(
        concat(lit(s"<$base/node/"), iriEncode(col("source")), lit(">")).as("s"),
        concat(lit(s"<$base/rel/"), iriEncode(col("sent")), lit(">")).as("p"),
        concat(lit(s"<$base/node/"), iriEncode(col("target")), lit(">")).as("o"))
      .select(col("s"), col("p"), col("o"),
        concat_ws(" ", col("s"), col("p"), col("o"), lit(".")).as("line"))
}
