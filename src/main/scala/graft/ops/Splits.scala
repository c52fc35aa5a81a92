package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic train/validation/test split assignment for training-data
  * pipelines.
  *
  * The plain variant cuts the per-row id hash against cumulative fraction
  * thresholds — zero shuffles, reproducible across engines and cluster
  * sizes, and stable under re-runs (the same row always lands in the same
  * split, so incremental corpus refreshes never migrate old rows).
  *
  * The cluster-aware variant fixes the leakage hole the plain cut leaves
  * open: near-duplicate documents that land on opposite sides of the cut
  * put an effective copy of eval text into train (the contamination
  * failure mode measured in Lee et al. 2022 §6, public). It keys the
  * hash on the document's near-dup COMPONENT id instead of its own id,
  * so an entire duplicate cluster moves as one unit — the split is
  * leakage-safe by construction, not by post-hoc filtering.
  */
object Splits {

  /** Split label for a [0,1) hash against cumulative fraction bounds.
    * `fractions` must sum to ~1; the last split absorbs the remainder
    * (so float drift can never produce an unlabeled row). */
  def labelFor(hash: Column, fractions: Seq[(String, Double)]): Column = {
    require(fractions.nonEmpty, "at least one split required")
    val cuts = fractions.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
    fractions.init.zip(cuts.init).reverse
      .foldLeft(lit(fractions.last._1)) { case (acc, ((name, _), cut)) =>
        when(hash < cut, lit(name)).otherwise(acc)
      }
  }

  /** Plain per-row hash split: adds a `split` column. */
  def assign(df: DataFrame, idCol: String,
             fractions: Seq[(String, Double)]): DataFrame =
    df.withColumn("split", labelFor(Sampling.hashUnit(col(idCol)), fractions))

  /** Leakage-safe split: rows sharing a connected component in `pairs`
    * (a near-dup edge list: aCol/bCol ids) are assigned as a unit, keyed
    * by the component id's hash; singletons key on their own id, which
    * IS their component id under the min-label contract — one code path,
    * no special case.
    *
    * Scale shape: the pair graph is tiny relative to the corpus (only
    * near-dup members appear in it), so the component map is a
    * fraction-of-corpus join keyed by id; the label fold is map-side. */
  def clusterAwareAssign(df: DataFrame, idCol: String,
                         pairs: DataFrame, aCol: String, bCol: String,
                         fractions: Seq[(String, Double)]): DataFrame = {
    val comp = Dedup.connectedComponents(pairs, aCol, bCol)
      .withColumnRenamed("node", idCol)
    df.join(comp, Seq(idCol), "left")
      .withColumn("split_key", coalesce(col("component"), col(idCol)))
      .withColumn("split", labelFor(Sampling.hashUnit(col("split_key")), fractions))
      .drop("component")
  }
}
