package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Explicit skew handling (north rule): hot cells — the capital-city
 * problem at web scale, reproduced in the fixtures by the customer
 * hot cluster — make single reducers the bottleneck of any
 * groupBy(cell). The standard fix layered UNDER AQE's runtime skew
 * split is salted two-phase aggregation: shuffle once on
 * (key, salt) so a hot key fans out over `salts` reducers, then a
 * cheap second aggregation merges the partials per key.
 */
object Skew {

  /**
   * Two-phase salted count + long-sum aggregation.
   * Produces identical results to `df.groupBy(keys).agg(count, sum)`
   * with the hot-key reduce load spread over `salts` partitions.
   */
  def saltedCountSum(df: DataFrame, keys: Seq[Column],
                     sumCol: Column, salts: Int): DataFrame = {
    // Deterministic salt (hash of the row's values plus its stable
    // position id, not rand()): a task retry over a deterministic
    // source re-derives the same salt per row, so stage retries yield
    // identical partials even for non-commutative extensions. The
    // position id matters for spread — value-only hashing would
    // collapse a hot key whose rows share one sumCol value (duplicate-
    // heavy data, exactly the case salting targets) into a single
    // salt bucket.
    val salted = df.withColumn("__salt",
      pmod(hash(keys :+ sumCol :+ monotonically_increasing_id(): _*),
        lit(salts)))
    val partial = salted
      .groupBy(keys :+ col("__salt"): _*)
      .agg(count(lit(1)).as("__n"), sum(sumCol).as("__s"))
    partial
      .groupBy(keys: _*)
      .agg(sum(col("__n")).as("n"), sum(col("__s")).as("s"))
  }
}
