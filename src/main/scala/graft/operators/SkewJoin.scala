package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys. AQE's skew-join split handles
  * most cases at runtime; salting is the explicit tool when one key
  * dominates so heavily that even split partitions of it must spread
  * across the cluster (the classic null-key / celebrity-entity case
  * at 100 TB).
  *
  * Fact rows get a deterministic salt in [0, nSalts); the (small-ish)
  * build side is exploded nSalts×, so each (key, salt) partition holds
  * 1/nSalts of the hot key's rows. Cost: build side inflates nSalts× —
  * use only when skew, not breadth, is the problem.
  */
object SkewJoin {

  def saltedJoin(fact: DataFrame, build: DataFrame, factKey: String,
      buildKey: String, nSalts: Int, joinType: String = "inner"): DataFrame = {
    // the build side is replicated nSalts× — safe only for join types
    // that never emit unmatched/duplicated BUILD rows
    require(Set("inner", "left", "left_outer", "left_semi", "left_anti")
      .contains(joinType.toLowerCase),
      s"saltedJoin cannot preserve build-side semantics for $joinType")
    // salt from the whole fact row hash: rows of the SAME key spread
    // across salts, and the choice is deterministic (re-runnable)
    val salted = fact.withColumn("__salt_f",
      pmod(xxhash64(struct(fact.columns.map(col): _*)), lit(nSalts)).cast("int"))
    val exploded = build.withColumn("__salt_b",
      explode(sequence(lit(0), lit(nSalts - 1))))
    salted.join(exploded,
        salted("__salt_f") === exploded("__salt_b")
          && salted(factKey) === exploded(buildKey), joinType)
      .drop("__salt_f", "__salt_b")
  }
}
