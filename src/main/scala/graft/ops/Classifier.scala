package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Model-based quality filtering: a DECLARABLE linear text classifier —
  * the logistic-regression/fastText filter shape the public LLM-corpus
  * pipelines run over every crawled document (Brown et al. 2020
  * appendix A's quality classifier; Joulin et al. 2016 fastText). The
  * model is DATA, not code: a (token, weight) relation plus a bias, so
  * a trained vocabulary drops in without touching the engine.
  *
  * z = bias + (Σ weight(tok) over the doc's tokens) / n_tokens — the
  * mean token weight (OOV tokens weigh 0), length-invariant. `keep` is
  * z ≥ threshold; sigmoid is monotone, so thresholding z IS
  * thresholding the class probability, and the gate compares z (pure
  * +,·,÷ arithmetic, cross-engine exact) instead of exp(), whose last
  * ulp is libm-dependent.
  *
  * Scale shape: tokens join the weight relation on the token key — a
  * 10⁶-row trained vocabulary rides an ordinary join (auto-broadcast
  * when small, shuffle when not), NOT codegen literals; the per-doc
  * aggregate partial-combines map-side before the one doc-key shuffle.
  * Weight mass accumulates in decimal(18,6), so the distributed fold is
  * order-independent bit-exact — no float-sum drift between runs or
  * engines. */
object Classifier {

  /** Per-document linear score over a declarable weight relation.
    * `weights` columns: token (string), weight (numeric). Tokens
    * appearing multiple times in `weights` are summed first — a merged
    * model behaves like the sum of its parts. */
  def linearScore(df: DataFrame, idCol: String, textCol: String,
                  weights: DataFrame, bias: Double,
                  threshold: Double): DataFrame = {
    val w = weights
      .groupBy(col("token").as("tok"))
      .agg(sum(col("weight").cast(DecimalType(18, 6))).as("w"))
    val tokRows = df.select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("tok"))
    val scored = tokRows.join(w, Seq("tok"), "left")
      .groupBy(col(idCol)).agg(
        count(lit(1)).cast(LongType).as("n_tokens"),
        sum(coalesce(col("w"), lit(java.math.BigDecimal.ZERO).cast(DecimalType(18, 6))))
          .as("w_sum"))
    df.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        round(lit(bias) +
          when(col("n_tokens") > 0, col("w_sum").cast(DoubleType) / col("n_tokens"))
            .otherwise(lit(0.0)), 6).as("quality_z"))
      .withColumn("keep", col("quality_z") >= threshold)
  }

  /** Convenience probability view (NOT oracle-compared — exp's last ulp
    * is libm-dependent; threshold on z instead). */
  def sigmoid(z: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    lit(1.0) / (lit(1.0) + exp(-z))
}
