package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation equi-join by key salting.
  *
  * A shuffled join on a skewed key sends every row of a hot key to one
  * task; at 100 TB that task is the job. Salting splits each hot key
  * into `factor` sub-buckets: the big side gets a deterministic salt
  * from a high-cardinality column, the small side is replicated across
  * all salts, and the join key becomes (key, salt) — same result, hot
  * keys spread over `factor` tasks. AQE's skew-join handles the
  * sort-merge case at runtime; explicit salting is the plan-level tool
  * when the skew is known (or the join is broadcast-ineligible).
  *
  * Measured (SkewJoinAqeSpec, q24 shape at sf0.01, broadcast off):
  * AQE skew-join with tuned thresholds beat 8-way salting ~2x, and both
  * beat the unsalted SMJ (~0.5s vs ~1.0s vs ~1.8s) — prefer AQE where
  * its size thresholds can see the skew; salt when they can't (many
  * moderately-hot keys under the partition threshold) or when the
  * runtime doesn't re-plan.
  */
object SkewJoin {

  /** Inner equi-join of `big` and (small) `dim` on `key`, salted
    * `factor` ways. `saltBy` must be a high-cardinality big-side column
    * (e.g. a row id); the salt is `pmod(hash(saltBy), factor)` —
    * deterministic, so the result is reproducible and exactly equal to
    * `big.join(dim, key)`.
    */
  def salted(big: DataFrame, dim: DataFrame, key: String, factor: Int,
      saltBy: Column): DataFrame = {
    val saltedBig = big.withColumn("__salt", pmod(hash(saltBy), lit(factor)))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    saltedBig.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }
}
