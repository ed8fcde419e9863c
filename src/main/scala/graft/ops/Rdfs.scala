package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RDFS forward-chaining type inference over an (s, p, o) triple relation —
  * the schema-entailment step a KG-construction pipeline runs right after
  * triple extraction: materialize every `rdf:type` fact the RDFS rules
  * derive (rdfs2 domain, rdfs3 range, rdfs9/rdfs11 subclass closure) so
  * downstream queries never re-derive them. Engine extension; reference
  * anchor: none (ARElight's graph carries node types syntactically in the
  * node key, `arelight/backend_d3js.py` — it has no schema layer).
  *
  * Scale shape (the 100 TB story): the SCHEMA (subclass axioms, domain/range
  * assignments) is kilobyte-sized even for encyclopedic KGs, so its
  * transitive closure is computed DRIVER-SIDE once and enters the plan as
  * broadcast literal relations. The INSTANCE side — the 10^12-triple scan —
  * is touched exactly once: one pass derives the base types (explicit +
  * domain + range, each a projection), and one broadcast join lifts them
  * up the closed hierarchy. No iteration ever runs over instance data;
  * the fixpoint lives entirely in the driver-side schema closure.
  */
object Rdfs {

  /** Transitive closure of the subclass axioms, driver-side (the schema is
    * axiom-count-sized, never data-sized). Input: direct (sub, sup) pairs.
    * Output: every derived strict (sub, sup) pair, the direct ones included;
    * reflexive pairs are NOT emitted (rdfs considers C ⊑ C trivially true —
    * materializing it would only duplicate the base types). A cycle in the
    * axioms (classes mutually subclassing) is an authoring bug and fails
    * fast rather than silently equating the classes. */
  def subClassClosure(direct: Seq[(String, String)]): Seq[(String, String)] = {
    val adj = direct.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    def reach(c: String): Set[String] = {
      var seen = Set.empty[String]
      var frontier = adj.getOrElse(c, Set.empty)
      while (frontier.nonEmpty) {
        require(!frontier.contains(c), s"subclass cycle through $c")
        seen ++= frontier
        frontier = frontier.flatMap(adj.getOrElse(_, Set.empty)) -- seen
      }
      seen
    }
    adj.keys.toSeq.sorted.flatMap(c => reach(c).toSeq.sorted.map(c -> _))
  }

  /** Materialized `rdf:type` facts entailed by the RDFS rules. Base facts:
    * explicit `(x, typePred, C)` triples in `rel`; rdfs2 — `(x, p, y)` with
    * `domain(p) = C` entails `(x, type, C)`; rdfs3 — the same with
    * `range(p) = C` entails `(y, type, C)`. Then rdfs9 lifts every base fact
    * along [[subClassClosure]] of `subClass`. Output: distinct
    * `(s, 'type', o)` rows covering base AND inherited types.
    *
    * Plan: ONE pass over the instance scan — base facts and the rdfs9
    * subclass lift are per-row literal-map lookups (no join of any
    * strategy), then two dedup aggregations (base facts, lifted output). */
  def inferTypes(rel: DataFrame, subClass: Seq[(String, String)],
      domain: Seq[(String, String)], range: Seq[(String, String)],
      typePred: String = "type"): DataFrame = {
    // ONE pass over the instance relation: the explicit/domain/range base
    // facts are emitted per row from driver-side literal MAPS (no joins —
    // the old three-consumer shape re-evaluated a derived `rel` once per
    // branch because the differing pushed filters broke exchange reuse),
    // and the rdfs9 subclass lift rides the same generate via a
    // cls → ancestor-array literal map. Same fact multiset into the one
    // distinct, so the result set is unchanged (RdfsSpec + oracle row).
    def litMap(rows: Seq[(String, String)]) =
      if (rows.isEmpty) typedLit(Map.empty[String, String])
      else map(rows.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    val domCls = element_at(litMap(domain), col("p"))
    val rngCls = element_at(litMap(range), col("p"))
    val baseFacts = array(
      when(col("p") === typePred, struct(col("s").as("n"), col("o").as("cls"))),
      when(domCls.isNotNull, struct(col("s").as("n"), domCls.as("cls"))),
      when(rngCls.isNotNull, struct(col("o").as("n"), rngCls.as("cls"))))
    // dedupe the base facts BEFORE the subclass lift: the lift is a per-row
    // map, so distinct∘lift∘distinct == distinct∘lift, and the final
    // distinct's exchange then carries the node-type-sized relation times
    // (1 + ancestors) instead of the raw fact multiset (guide §2.3
    // aggregate-before-shuffle applied to set semantics)
    val base = rel
      .select(explode(filter(baseFacts, f => f.isNotNull)).as("f"))
      .select(col("f.n").as("s"), col("f.cls").as("cls"))
      .distinct()
    val up = subClassClosure(subClass)
    val lifted =
      if (up.isEmpty) base
      else {
        val upArr = up.groupBy(_._1).toSeq.sortBy(_._1).map { case (c, sups) =>
          (lit(c), array(sups.map(_._2).sorted.map(lit): _*))
        }
        val upM = map(upArr.flatMap { case (k, v) => Seq(k, v) }: _*)
        base.select(col("s"),
          explode(concat(array(col("cls")),
            coalesce(element_at(upM, col("cls")),
              array().cast("array<string>")))).as("cls"))
      }
    lifted.select(col("s"), lit(typePred).as("p"), col("cls").as("o")).distinct()
  }

  /** OWL property-axiom materialization: the base triples plus everything
    * `owl:inverseOf` and `owl:SymmetricProperty` axioms entail —
    * p(x,y) ⇒ q(y,x) for each (p, q) inverse pair (BOTH directions, as the
    * OWL axiom is itself symmetric) and p(x,y) ⇒ p(y,x) for each symmetric
    * property. Like [[inferTypes]], the axiom set is schema-sized: each
    * axiom is one map-side projection of the predicate-filtered scan, the
    * union is shuffle-free, and the single distinct is the only exchange.
    * Transitive properties are deliberately NOT handled here — that is a
    * closure, served by [[Bgp.reachability]] / [[Bgp.boundedPath]]. */
  def materializeProperties(rel: DataFrame, inverseOf: Seq[(String, String)] = Nil,
      symmetric: Seq[String] = Nil, assumeDisjoint: Boolean = false): DataFrame = {
    val base = rel.select("s", "p", "o")
    val inv = inverseOf.flatMap { case (p, q) =>
      Seq(
        base.filter(col("p") === p).select(col("o").as("s"), lit(q).as("p"), col("s").as("o")),
        base.filter(col("p") === q).select(col("o").as("s"), lit(p).as("p"), col("s").as("o")))
    }
    val sym = symmetric.map(p =>
      base.filter(col("p") === p).select(col("o").as("s"), col("p"), col("s").as("o")))
    val all = (base +: (inv ++ sym)).reduce(_ unionByName _)
    // assumeDisjoint: caller asserts the base relation is duplicate-free, no
    // derived predicate name occurs in the base, and no axiom produces a
    // triple another branch also produces (e.g. plain inverseOf over a
    // distinct KG whose q-predicates are absent, no symmetric axioms) — then
    // every branch is internally distinct (injective projections of a
    // distinct relation) and pairwise disjoint by predicate, so the global
    // dedup is a no-op and its full-output exchange is elided (guide §2.4).
    if (assumeDisjoint) all else all.distinct()
  }
}
