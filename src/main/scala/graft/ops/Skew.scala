package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for joins whose key distribution is pathological
  * beyond what AQE's skew-join splitting handles (a handful of keys holding
  * a large share of a 100 TB fact table).
  *
  * Salted join: the skewed (large) side gets a random-ish salt in
  * [0, factor); the small side is replicated `factor`× with every salt
  * value; the join key becomes (key, salt), splitting each hot key's rows
  * across `factor` tasks. Exact same join result, `factor`× the build-side
  * size — the standard trade.
  *
  * The salt is deterministic (hash of the row's whole key tuple + a
  * monotonic id is avoided on purpose — `pmod(hash(rand-free cols))` keeps
  * retries and oracle comparisons reproducible).
  */
object Skew {

  /** Inner equi-join `large ⋈ small` on `key`, salted `factor` ways.
    * `saltBy` columns drive the deterministic salt (pick high-cardinality
    * non-key columns of the large side). */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 factor: Int, saltBy: Seq[String]): DataFrame = {
    require(factor > 0)
    val salted = large.withColumn("__salt",
      pmod(hash(saltBy.map(col): _*), lit(factor)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Top-N heavy-hitter keys with their share — the measurement step that
    * decides whether salting (or a broadcast of the hot subset) is needed. */
  def keySkewProfile(df: DataFrame, key: String, topN: Int = 10): DataFrame = {
    val total = df.count().toDouble
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .withColumn("share", round(col("n") / total, 6))
      .orderBy(col("n").desc, col(key))
      .limit(topN)
  }
}
