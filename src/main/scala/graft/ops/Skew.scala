package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew handling for hot keys (north_star: high-degree entities — countries,
  * politicians — dominate the graph aggregation keys at web scale).
  *
  * Notes on WHERE salting is needed in this engine:
  *  - groupBy + count/sum (A1, A3): NOT here — Spark's hash aggregate already
  *    does map-side partial aggregation, so a hot key ships one partial row
  *    per task, not its raw multiplicity.
  *  - groupBy + collect_list (A7 radial rollup) has NO map-side reduction —
  *    a hot target's entire edge list lands on one reducer: [[saltedCollect]]
  *    splits it into `salt` partial lists and flattens after.
  *  - non-broadcastable joins on skewed keys: [[saltedJoin]] replicates the
  *    (smaller) right side `salt` times; AQE skew-join splitting
  *    (spark.sql.adaptive.skewJoin.enabled) covers the sort-merge case at
  *    runtime — both are enabled in the engine's session defaults.
  */
object Skew {

  /** Deterministic salt in [0, n) derived from arbitrary discriminator columns
    * (NOT rand() — resume-stable per north_rule). */
  def saltCol(n: Int, discriminators: Column*): Column =
    pmod(xxhash64(discriminators: _*), lit(n))

  /** Two-phase collect_list: groupBy(keys :+ salt) partials, then flatten.
    * Result lists are sorted for determinism (collect_list order is not). */
  def saltedCollect(df: DataFrame, keys: Seq[String], valueCol: Column,
      salt: Int, discriminator: Column): DataFrame = {
    val partial = df
      .withColumn("__salt", saltCol(salt, discriminator))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(collect_list(valueCol).as("__part"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(array_sort(flatten(collect_list(col("__part")))).as("values"))
  }

  /** Salted equi-join for a skewed LEFT side: left rows get a deterministic
    * salt, right rows are replicated across all salts; the join key becomes
    * (key, salt) so one hot key spreads over `salt` reducers.
    *
    * Only inner/left_outer/left_semi/left_anti are sound: right-preserving
    * joins would emit every unmatched right row once PER SALT REPLICA. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, salt: Int,
      joinType: String = "inner"): DataFrame = {
    val allowed = Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti")
    require(allowed.contains(joinType.toLowerCase.replace(" ", "_")),
      s"saltedJoin supports left-preserving join types only (got '$joinType'): " +
        "the right side is replicated across salts, so right/full outer joins " +
        "would duplicate unmatched right rows once per salt")
    val l = left.withColumn("__salt", saltCol(salt, scala.collection.immutable.ArraySeq.unsafeWrapArray(left.columns.map(col)): _*))
    val r = right.withColumn("__salt", explode(sequence(lit(0L), lit(salt - 1L))))
    l.join(r, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
