package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data Selection via Importance Resampling — DSIR (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling",
  * public NeurIPS paper): score every raw document by how much more
  * likely its hashed n-gram features are under a TARGET distribution
  * (a trusted high-quality sample) than under the RAW distribution, then
  * keep the top of the ranking. The scalable alternative to training a
  * quality classifier: both "models" are just bucket-count tables.
  *
  * Features are unigrams + word bigrams hashed into `nBuckets` buckets
  * (the paper's hashed n-gram parameterization; 10⁴ buckets suffice).
  * Per bucket b: p̂(b) = (count(b) + α) / (total + α·B), add-α smoothed
  * so unseen buckets stay finite. Per document: the importance log-weight
  * Σ_features [ln p̂_target(b) − ln p̂_raw(b)], plus the per-feature mean
  * (length-normalized — a long doc's sum drifts negative with size, the
  * mean is the rankable signal).
  *
  * Bucket hash is the engine-portable md5-prefix (28 bits, the
  * [[Sampling.hashUnit]] / minhash-shingle family) so an external oracle
  * reproduces the bucketing bit-for-bit.
  *
  * Scale shape: two explode+bucket-count aggregates build the model
  * (output bounded by `nBuckets` — a declared constant, NOT data-sized),
  * the bucket model rides a broadcast (≤ nBuckets rows), and scoring is
  * one explode + broadcast probe + per-doc aggregate: no data-sized
  * shuffle except the doc-keyed partial agg. Docs with zero features
  * score 0 and are never selected. The model tables are reusable
  * artifacts — persist them across a curation run at 100 TB instead of
  * rebuilding per query. */
object Dsir {

  private def featureBuckets(df: DataFrame, idCol: String, textCol: String,
                             nBuckets: Int): DataFrame = {
    val toks = df.select(col(idCol).as("__id"),
      explode(TextAnalysis.tokens(col(textCol))).as("f"))
    val bigs = df.select(col(idCol).as("__id"),
      explode(org.apache.spark.sql.graft.VectorExpressions
        .wordShingles(col(textCol), 2, distinct = false)).as("f"))
    toks.unionAll(bigs).select(col("__id"),
      (conv(substring(md5(col("f")), 1, 7), 16, 10).cast(LongType)
        % nBuckets).as("b"))
  }

  /** Per-raw-document DSIR importance weights against a target sample:
    * (id, n_feats, log_weight, avg_log_weight). Both corpora must share
    * the text column semantics; `target` is typically a small trusted
    * slice. */
  def logWeights(raw: DataFrame, target: DataFrame, idCol: String,
                 textCol: String, nBuckets: Int = 4096,
                 smoothing: Double = 1.0): DataFrame = {
    val rawFeats = featureBuckets(raw, idCol, textCol, nBuckets)
    val targetCounts = featureBuckets(target, idCol, textCol, nBuckets)
      .groupBy("b").agg(count(lit(1)).as("ct"))
    val rawCounts = rawFeats.groupBy("b").agg(count(lit(1)).as("cr"))
    val totalT = targetCounts.agg(
      coalesce(sum("ct"), lit(0L)).cast(DoubleType).as("__total_t"))
    val totalR = rawCounts.agg(
      coalesce(sum("cr"), lit(0L)).cast(DoubleType).as("__total_r"))
    // raw-side buckets drive the model (every scored feature has cr ≥ 1);
    // target-missing buckets smooth to α
    val model = rawCounts
      .join(targetCounts, Seq("b"), "left")
      .crossJoin(broadcast(totalT)).crossJoin(broadcast(totalR))
      .select(col("b"),
        (log((coalesce(col("ct"), lit(0L)) + lit(smoothing)) /
            (col("__total_t") + lit(smoothing * nBuckets))) -
          log((col("cr") + lit(smoothing)) /
            (col("__total_r") + lit(smoothing * nBuckets)))).as("lw"))
    val scored = rawFeats.join(broadcast(model), Seq("b"))
      .groupBy(col("__id")).agg(
        count(lit(1)).cast(LongType).as("n_feats"),
        sum("lw").as("__sum_lw"))
    raw.select(col(idCol))
      .join(scored.withColumnRenamed("__id", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        round(coalesce(col("__sum_lw"), lit(0.0)), 6).as("log_weight"),
        round(when(col("n_feats") > 0, col("__sum_lw") / col("n_feats"))
          .otherwise(lit(0.0)), 6).as("avg_log_weight"))
  }

  /** [[logWeights]] + the selection cut: flags the top `fraction` of
    * scoreable documents by per-feature mean importance weight
    * (`dsir_keep`); zero-feature documents are never selected. The
    * deterministic analog of the paper's Gumbel-noise resampling — at
    * equal fractions the kept set is the highest-importance mass. */
  def select(raw: DataFrame, target: DataFrame, idCol: String,
             textCol: String, fraction: Double, nBuckets: Int = 4096,
             smoothing: Double = 1.0): DataFrame = {
    val weighted = logWeights(raw, target, idCol, textCol, nBuckets, smoothing)
    val scoreable = weighted.filter(col("n_feats") > 0)
    val flagged = Sampling
      .topFractionByScore(scoreable, "avg_log_weight", fraction)
      .withColumnRenamed("top_selected", "dsir_keep")
    flagged.unionByName(
      weighted.filter(col("n_feats") === 0)
        .withColumn("dsir_keep", lit(false)))
  }
}
