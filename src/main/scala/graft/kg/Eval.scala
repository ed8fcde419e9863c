package graft.kg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triple-set evaluation — the north rule's own acceptance metric
  * (BASELINE.json: "matching the reference's emitted (subj, pred, obj)
  * triples (P/R ≥ 0.95 vs reference)") as a first-class distributed
  * operator rather than a test-side loop. RuFixtureSpec pins the engine at
  * P/R = 1.0 against the reference-derived fixture oracle; this operator is
  * how the same check runs over a full corpus: both triple relations stay
  * distributed, the comparison is ONE full-outer join on the distinct triple
  * identity (co-partitioned on the join keys, no collect), and the output is
  * a single confusion-count row.
  *
  * precision/recall/f1 are each one IEEE division of exact BIGINT counts —
  * bit-stable cross-engine (f1 via its 2tp/(2tp+fp+fn) closed form: one
  * division, no nested rounding). Zero-denominator cases yield NaN
  * explicitly rather than erroring under ANSI mode.
  */
object Eval {

  /** Compare two triple relations on the distinct identity `keys`.
    * Output: one row (tp, fp, fn, precision, recall, f1) — fp counts
    * identities only in `got`, fn only in `ref`. */
  def triplePR(got: DataFrame, ref: DataFrame,
      keys: Seq[String] = Seq("subj", "pred", "obj")): DataFrame = {
    val g = got.select(keys.map(col): _*).distinct().withColumn("__g", lit(1))
    val r = ref.select(keys.map(col): _*).distinct().withColumn("__r", lit(1))
    g.join(r, keys, "full_outer")
      .agg(
        sum(when(col("__g").isNotNull && col("__r").isNotNull, 1L).otherwise(0L)).as("tp"),
        sum(when(col("__g").isNotNull && col("__r").isNull, 1L).otherwise(0L)).as("fp"),
        sum(when(col("__g").isNull && col("__r").isNotNull, 1L).otherwise(0L)).as("fn"))
      .select(
        col("tp").cast("long").as("tp"),
        col("fp").cast("long").as("fp"),
        col("fn").cast("long").as("fn"),
        when(col("tp") + col("fp") === 0, lit(Double.NaN))
          .otherwise(col("tp").cast("double") / (col("tp") + col("fp")).cast("double"))
          .as("precision"),
        when(col("tp") + col("fn") === 0, lit(Double.NaN))
          .otherwise(col("tp").cast("double") / (col("tp") + col("fn")).cast("double"))
          .as("recall"),
        when(lit(2L) * col("tp") + col("fp") + col("fn") === 0, lit(Double.NaN))
          .otherwise((lit(2L) * col("tp")).cast("double") /
            (lit(2L) * col("tp") + col("fp") + col("fn")).cast("double"))
          .as("f1"))
  }
}
