package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SHACL-style shape validation and schema profiling over a constructed KG —
  * the QA gate a production pipeline runs between construction and publish:
  * "every ORDER carries 2..5 `contains` edges", "`pos` attitudes point at
  * ORG/PERSON objects only", "which relation slots have heterogeneous
  * domains". Engine extension; reference anchor: none (ARElight emits the
  * d3js graph unvalidated — `arelight/run/infer.py` ends at the sink).
  *
  * Input convention: a TYPED triple relation with columns
  * `(s, s_type, p, o, o_type)` where `s`/`o` are node keys and the `_type`
  * columns the node classes. All operators take the relation under SET
  * semantics (they deduplicate internally), so evidence multiplicity never
  * inflates a cardinality count.
  *
  * Plan shapes (the 100 TB story): shape tables are caller-literal and tiny —
  * always broadcast. Cardinality needs ONE distinct over node occurrences and
  * ONE (s, p) count restricted to the shaped predicates (an IN predicate
  * pushed to the scan); range validation is a map-side broadcast-join filter;
  * the slot profile is one grouped count whose result is predicate-sized.
  * Nothing here scales with anything but the violation set itself.
  */
object Shapes {

  /** Cardinality shape: focus nodes of class `focusType` must carry outgoing
    * predicate `pred` between `minCount` and `maxCount` times (inclusive),
    * counted over DISTINCT (s, p, o) triples. */
  final case class CardShape(focusType: String, pred: String, minCount: Long, maxCount: Long)

  /** Range shape: objects of `pred` must be of one of the `allowed` classes. */
  final case class RangeShape(pred: String, allowed: Seq[String])

  private def distinctTriples(rel: DataFrame): DataFrame =
    rel.select("s", "s_type", "p", "o", "o_type").distinct()

  /** All typed node occurrences (both slots), deduplicated — the focus-node
    * universe for cardinality shapes (a node with ZERO edges of the shaped
    * predicate still violates a minCount, so the universe must come from
    * every slot, not just the subject position). */
  private def nodes(rel: DataFrame): DataFrame =
    rel.select(col("s").as("focus"), col("s_type").as("ftype"))
      .union(rel.select(col("o").as("focus"), col("o_type").as("ftype")))
      .distinct()

  /** Cardinality violations: one row per (focus node, shape) whose distinct
    * outgoing `pred` count falls outside [minCount, maxCount]. Output
    * `(focus, pred, kind, observed, bound)` with kind in
    * {min_count, max_count} and bound the limit that was crossed. */
  def cardinalityViolations(rel: DataFrame, shapes: Seq[CardShape],
      assumeDistinct: Boolean = false): DataFrame = {
    require(shapes.nonEmpty, "no cardinality shapes")
    val spark = rel.sparkSession
    import spark.implicits._
    // the deduplicated relation feeds THREE consumers (the per-predicate
    // counts and both slots of the node universe); truncate it once so a
    // derived input — e.g. the typed supply KG extraction — is evaluated
    // once, not per consumer (the repo-wide multi-consumer discipline).
    // assumeDistinct elides the dedup itself when the caller's relation is
    // already duplicate-free (identical result: the dedup is a no-op then).
    val t0 = rel.select("s", "s_type", "p", "o", "o_type")
    val t = (if (assumeDistinct) t0 else t0.distinct()).localCheckpoint()
    val shapeDf = shapes.toDF("focusType", "pred", "minCount", "maxCount")
    val preds = shapes.map(_.pred).distinct
    val counts = t.filter(col("p").isin(preds: _*))
      .groupBy(col("s").as("cfocus"), col("p").as("cpred"))
      .agg(count(lit(1)).as("cnt"))
    // restrict the node universe to SHAPED focus types before the dedup:
    // the inner join below keeps only those anyway, and the filter sits
    // under the distinct so its exchange carries shaped-type slots only
    // (guide §2.3 — on the supply KG this drops the PART/NATION slots,
    // ~45% of the occurrence rows)
    val focusTypes = shapes.map(_.focusType).distinct
    nodes(t.filter(col("s_type").isin(focusTypes: _*) ||
        col("o_type").isin(focusTypes: _*)))
      .filter(col("ftype").isin(focusTypes: _*))
      .join(broadcast(shapeDf), col("ftype") === col("focusType"))
      .join(counts, col("focus") === col("cfocus") && col("pred") === col("cpred"),
        "left_outer")
      .select(col("focus"), col("pred"),
        coalesce(col("cnt"), lit(0L)).as("observed"),
        col("minCount"), col("maxCount"))
      .filter(col("observed") < col("minCount") || col("observed") > col("maxCount"))
      .select(col("focus"), col("pred"),
        when(col("observed") < col("minCount"), lit("min_count"))
          .otherwise(lit("max_count")).as("kind"),
        col("observed"),
        when(col("observed") < col("minCount"), col("minCount"))
          .otherwise(col("maxCount")).as("bound"))
  }

  /** Closed shape: subjects of class `focusType` may use ONLY the `allowed`
    * outgoing predicates (SHACL `sh:closed true` with
    * `sh:ignoredProperties` = the complement). */
  final case class ClosedShape(focusType: String, allowed: Seq[String])

  /** Closed-shape violations: one row per distinct (subject, predicate)
    * where the subject's class is shaped and the predicate is outside its
    * allowed set. The shape table is broadcast; the check is map-side after
    * one distinct over (s, s_type, p) — predicate-profile-sized input, and
    * the output scales with the violation set only. Output
    * `(focus, ftype, pred)`. */
  def closedViolations(rel: DataFrame, shapes: Seq[ClosedShape]): DataFrame = {
    require(shapes.nonEmpty, "no closed shapes")
    val spark = rel.sparkSession
    import spark.implicits._
    val shapeDf = shapes.map(sh => (sh.focusType, sh.allowed)).toDF("cftype", "allowed")
    rel.select(col("s").as("focus"), col("s_type").as("ftype"), col("p").as("pred"))
      .distinct()
      .join(broadcast(shapeDf), col("ftype") === col("cftype"))
      .filter(!array_contains(col("allowed"), col("pred")))
      .select(col("focus"), col("ftype"), col("pred"))
  }

  /** Range violations: one row per DISTINCT triple whose predicate is shaped
    * and whose object class is not in the allowed set. Map-side after the
    * broadcast join — scales with the violation count only. */
  def rangeViolations(rel: DataFrame, shapes: Seq[RangeShape]): DataFrame = {
    require(shapes.nonEmpty, "no range shapes")
    val spark = rel.sparkSession
    import spark.implicits._
    val shapeDf = shapes.map(sh => (sh.pred, sh.allowed)).toDF("rpred", "allowed")
    distinctTriples(rel)
      .join(broadcast(shapeDf), col("p") === col("rpred"))
      .filter(!array_contains(col("allowed"), col("o_type")))
      .select(col("s").as("focus"), col("p").as("pred"),
        col("o").as("obj"), col("o_type").as("obj_type"))
  }

  /** Property-pair shape (SHACL sh:equals / sh:disjoint): per focus node,
    * the object sets of `p1` and `p2` must be equal, or must not overlap. */
  final case class PairShape(p1: String, p2: String, kind: String) {
    require(kind == "equals" || kind == "disjoint", s"unknown pair-shape kind $kind")
  }

  /** Property-pair violations. For a `disjoint` shape, one row per (focus,
    * value) asserted under BOTH predicates (an inner join of the two object
    * sets); for an `equals` shape, one row per (focus, value) asserted under
    * exactly ONE (the symmetric difference, via a full outer join). Works on
    * a plain (s, p, o) relation — no type columns needed. Output
    * `(focus, value, p1, p2, kind)`.
    *
    * Plan shape: each shape touches two predicate-filtered scans (pushdown)
    * deduplicated per (s, o), joined on the (focus, value) key — violation-
    * set-sized output; the shape list is caller-literal, so the union over
    * shapes is a fixed-width plan, not data-dependent. */
  def propertyPairViolations(rel: DataFrame, shapes: Seq[PairShape]): DataFrame = {
    require(shapes.nonEmpty, "no property-pair shapes")
    val t = rel.select("s", "p", "o").distinct()
    def objects(p: String) =
      t.filter(col("p") === p).select(col("s").as("focus"), col("o").as("value"))
    shapes.map { sh =>
      val (a, b) = (objects(sh.p1), objects(sh.p2))
      val joined = sh.kind match {
        case "disjoint" => a.join(b, Seq("focus", "value"))
        case "equals" =>
          a.withColumn("in1", lit(1))
            .join(b.withColumn("in2", lit(1)), Seq("focus", "value"), "full_outer")
            .filter(col("in1").isNull || col("in2").isNull)
      }
      joined.select(col("focus"), col("value"),
        lit(sh.p1).as("p1"), lit(sh.p2).as("p2"), lit(sh.kind).as("kind"))
    }.reduce(_ unionByName _)
  }

  /** Domain/range heterogeneity profile: for every (predicate, slot, class)
    * observed over the distinct triple set, the occurrence count, the slot's
    * MODAL class (count-desc, class-asc tie-break — deterministic in any
    * engine), and an is_modal flag. Minority rows (is_modal = 0) are the
    * schema-QA signal: a relation slot whose domain mixes classes. Output
    * `(pred, slot, tpe, cnt, modal_type, is_modal)`; slot is 's' or 'o'. */
  def slotProfile(rel: DataFrame, assumeDistinct: Boolean = false): DataFrame = {
    // two grouped consumers (s-slot and o-slot rollups) — truncate the
    // deduplicated relation once; assumeDistinct elides the no-op dedup for
    // already-duplicate-free callers (cardinalityViolations' discipline)
    val t0 = rel.select("s", "s_type", "p", "o", "o_type")
    val t = (if (assumeDistinct) t0 else t0.distinct()).localCheckpoint()
    val occ = t.groupBy(col("p").as("pred"), lit("s").as("slot"), col("s_type").as("tpe"))
      .agg(count(lit(1)).as("cnt"))
      .union(t.groupBy(col("p").as("pred"), lit("o").as("slot"), col("o_type").as("tpe"))
        .agg(count(lit(1)).as("cnt")))
    val w = Window.partitionBy(col("pred"), col("slot"))
      .orderBy(col("cnt").desc, col("tpe").asc)
    occ.withColumn("modal_type", first(col("tpe")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("is_modal",
        when(col("tpe") === col("modal_type"), 1L).otherwise(0L))
  }
}
