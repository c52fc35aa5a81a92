package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic sampling operators for training-data curation
  * (builder-prompt extension set): corpus downsampling and per-stratum
  * quotas that are reproducible across runs, engines, and cluster sizes —
  * no RNG state, every decision a pure function of the row's id.
  *
  * Scale design: the sampling key is an md5-derived uniform hash (portable
  * to any engine, verified bit-for-bit against DuckDB), so a fraction
  * filter is embarrassingly parallel with zero shuffles, and a per-stratum
  * quota is ONE window shuffle on the stratum key. Changing the fraction /
  * quota yields nested samples (a 1% sample is a subset of a 10% sample) —
  * the property curation pipelines need for progressive scaling runs.
  */
object Sampling {

  /** Uniform [0, 1) hash of a row id: first 7 md5 hex chars (28 bits) over
    * 16^7. Stable across engines; DuckDB reproduces it exactly. */
  def hashUnit(id: Column): Column =
    conv(substring(md5(id.cast(StringType)), 1, 7), 16, 10)
      .cast(DoubleType) / lit((1L << 28).toDouble)

  /** Deterministic fraction sample: keeps rows whose id-hash falls below
    * `fraction`. No shuffle, no RNG, nested across fractions. */
  def deterministicSample(df: DataFrame, idCol: String, fraction: Double): DataFrame =
    df.filter(hashUnit(col(idCol)) < lit(fraction))

  /** Weighted source mixing: per-source deterministic keep fractions —
    * the domain-mixture step of a training-data pipeline (e.g. keep all
    * of a high-quality source, 10% of a crawl). Same id-hash as
    * [[deterministicSample]], so mixes are nested across weight changes
    * (raising a source's weight strictly grows its kept set) and
    * reproducible across engines and cluster sizes. Zero shuffles: the
    * weight lookup folds to a CASE over the source column and the filter
    * is embarrassingly parallel. */
  def weightedMix(df: DataFrame, sourceCol: String, idCol: String,
                  weights: Map[String, Double], defaultWeight: Double): DataFrame = {
    val weightExpr = weights.toSeq.sortBy(_._1).foldLeft(lit(defaultWeight)) {
      case (acc, (src, w)) => when(col(sourceCol) === src, lit(w)).otherwise(acc)
    }
    df.filter(hashUnit(col(idCol)) < weightExpr)
  }

  /** Per-stratum quota: keep at most `quota` rows per value of
    * `strataCol`, chosen by hash rank (deterministic, unbiased within the
    * stratum, stable under re-runs and data reshuffling). Adds
    * `sample_rank` (1-based within the stratum). One window shuffle on the
    * stratum key; skewed strata are bounded by the quota itself on the
    * output side, and salting applies upstream if a single stratum
    * dominates the input. */
  def stratifiedQuota(df: DataFrame, strataCol: String, idCol: String,
                      quota: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(strataCol))
      .orderBy(hashUnit(col(idCol)), col(idCol))
    df.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= quota)
  }
}
