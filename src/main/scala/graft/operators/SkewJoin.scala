package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join — the explicit skew weapon for when AQE can't help.
  *
  * A shuffle join keyed on a skewed column sends the hot key's every row to
  * ONE reducer; at 100 TB that reducer runs for hours while the rest idle.
  * AQE's skew-join split repairs this ONLY when the join's children are
  * bare Sort+ShuffleStage pairs: `OptimizeSkewedJoin` pattern-matches
  * SMJ(Sort(shuffle), Sort(shuffle)), so ANY operator between the shuffle
  * and the join — in particular the aggregation that BUILDS a dimension
  * side, exactly the j4 shape — blocks the split and the hot partition
  * stays whole (pinned both ways by PlanSpec's "AQE skew split" test).
  * AQE is also disabled outright in stateful streaming, and mis-estimated
  * stats can leave real skew under its thresholds. Salting fixes the
  * distribution structurally, in the PLAN, with no runtime-stats
  * dependency: the probe side scatters each row into one of `salts`
  * sub-keys (deterministically — task retries must re-salt identically, so
  * no rand()), the build side replicates ×salts, and the join runs on
  * (key, salt) — the hot key now spreads over `salts` reducers at the cost
  * of a `salts`× inflation of the SMALL side only.
  *
  * Result-identical to `big.join(small, key)`: each probe row carries
  * exactly one salt value, and exactly one of the `salts` replicated copies
  * of each matching build row has that salt. Pinned by SkewJoinSpec
  * (equality under heavy skew) and by the j4 registry row (DuckDB replays
  * the PLAIN join — hash-green proves the salted plan changes nothing but
  * the distribution).
  */
object SkewJoin {

  /** Deterministic salt in [0, salts): xxhash64 over `saltBy` (default: all
    * of the probe side's non-key columns). Rows that are bit-identical in
    * `saltBy` share a salt — salting spreads a hot key's DISTINCT rows, so
    * include a high-cardinality column (a sequence number, an id) for full
    * spread.
    */
  private def saltOf(df: DataFrame, key: String, salts: Int, saltBy: Seq[String]): Column = {
    val cols = (if (saltBy.nonEmpty) saltBy else df.columns.filterNot(_ == key).toSeq)
      .map(c => col(s"`$c`"))
    require(cols.nonEmpty, "salted join needs at least one non-key column to salt by")
    pmod(xxhash64(cols: _*), lit(salts.toLong)).cast("int")
  }

  /** Inner equi-join of a skewed `big` side with a `small` side on `key`,
    * spread over `salts` sub-keys. `small` must be modest (it inflates
    * ×salts before the shuffle) — that is the regime where salting beats
    * waiting: too big to broadcast, small enough to replicate.
    */
  def saltedInner(big: DataFrame, small: DataFrame, key: String, salts: Int = 16,
                  saltBy: Seq[String] = Nil): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    require(!big.columns.contains("__salt") && !small.columns.contains("__salt"),
      "saltedInner reserves the __salt column name; rename it on the inputs")
    val saltedBig = big.withColumn("__salt", saltOf(big, key, salts, saltBy))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
