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

  /** Exact-k deterministic sample (r10): the k rows with the smallest
    * id-hash — a reproducible "give me exactly 10k eval docs" cut where
    * a fraction filter's size varies with the corpus. Same md5 ranking
    * key as [[deterministicSample]], so exact-k samples NEST across k
    * (top-1k ⊂ top-10k) and sit inside the fraction sample whose
    * threshold exceeds their max hash. Ties (hash collisions) break on
    * the id, so the cut is total and engine-portable.
    *
    * Scale shape: plans as TakeOrdered (per-partition k-heads + driver
    * merge of k rows) — never a global sort of the corpus. */
  def exactKSample(df: DataFrame, idCol: String, k: Int): DataFrame =
    df.orderBy(hashUnit(col(idCol)), col(idCol)).limit(k)

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

  /** Temperature-scaled source mixing (r9): the multilingual-training
    * rebalance p_i ∝ n_i^α (Lample & Conneau 2019 XLM; Conneau et al.
    * 2020 XLM-R §3): α = 1 keeps natural proportions, α → 0 flattens
    * toward uniform, boosting small sources relative to big ones. The
    * target corpus is `totalFraction` of the input; each source keeps
    * min(1, target_i / n_i) of its rows via the same deterministic
    * id-hash as [[weightedMix]] (so temperature mixes are reproducible
    * and nested in totalFraction). Fractions round to 6 decimals — the
    * engine-wide cross-engine precision — before filtering.
    *
    * Scale shape: one tiny per-source count aggregate (|sources| rows,
    * broadcast back), then the embarrassingly-parallel hash filter —
    * data shuffles zero times. Keep fractions are derived IN THE PLAN,
    * so the op composes lazily; a 100 TB caller with a precomputed
    * source-count table passes it via the explicit-weights
    * [[weightedMix]] instead. */
  def temperatureMix(df: DataFrame, sourceCol: String, idCol: String,
                     alpha: Double, totalFraction: Double): DataFrame =
    temperatureMixImpl(df, sourceCol, idCol, count(lit(1)), alpha, totalFraction)

  /** [[temperatureMix]] over TOKEN mass (r12): p_i ∝ T_i^α with T_i the
    * source's token total — training mixtures budget TOKENS, not
    * documents (XLM-R/Gopher mixture tables are token-denominated; a
    * long-document source is otherwise overweighted doc-wise). The keep
    * decision stays the same per-doc id-hash, so mixes remain nested
    * and reproducible; when every document has equal length this
    * reduces exactly to [[temperatureMix]] (spec-pinned). */
  def temperatureMixByTokens(df: DataFrame, sourceCol: String, idCol: String,
                             tokensCol: String, alpha: Double,
                             totalFraction: Double): DataFrame =
    temperatureMixImpl(df, sourceCol, idCol,
      sum(col(tokensCol).cast(LongType)), alpha, totalFraction)

  private def temperatureMixImpl(df: DataFrame, sourceCol: String, idCol: String,
                                 massAgg: Column, alpha: Double,
                                 totalFraction: Double): DataFrame = {
    val counts = df.groupBy(col(sourceCol)).agg(massAgg.as("__n"))
    val mass = counts.agg(
      sum(pow(col("__n").cast(DoubleType), lit(alpha))).as("__mass"),
      sum("__n").as("__total"))
    val frac = counts.crossJoin(broadcast(mass))
      .select(col(sourceCol),
        // target_i = totalFraction·total·(n_i^α / mass); keep_i = target_i / n_i
        round(least(lit(1.0),
          lit(totalFraction) * col("__total").cast(DoubleType) *
            pow(col("__n").cast(DoubleType), lit(alpha)) / col("__mass") /
            col("__n").cast(DoubleType)), 6).as("__keep"))
    df.join(broadcast(frac), Seq(sourceCol))
      .filter(hashUnit(col(idCol)) < col("__keep"))
      .drop("__keep")
  }

  /** Epoch-based mixing with weights ABOVE 1 (r9): the training-mixture
    * move public LLM recipes use for small high-quality sources (GPT-3's
    * Table 2.2 sees Wikipedia ~3.4 epochs while the crawl sees < 1 —
    * Brown et al. 2020). A weight w emits ⌊w⌋ full copies (epoch
    * 1..⌊w⌋) plus a deterministic (w − ⌊w⌋) fraction at epoch ⌊w⌋+1,
    * chosen by the same id-hash as [[weightedMix]] — so w ≤ 1 degrades
    * to exactly weightedMix's kept set (at epoch 1), and raising a
    * weight strictly grows the multiset. Output rows carry `epoch`, the
    * column a training loader shuffles/schedules on.
    *
    * Scale shape: per-row generate + filter — zero shuffles, the weight
    * table folds into the plan as a CASE; row amplification is exactly
    * the declared oversampling. The `sequence(1, 0)` descending trap is
    * guarded (w = 0 emits nothing). */
  def epochMix(df: DataFrame, sourceCol: String, idCol: String,
               weights: Map[String, Double], defaultWeight: Double): DataFrame = {
    val w = weights.toSeq.sortBy(_._1).foldLeft(lit(defaultWeight)) {
      case (acc, (src, wt)) => when(col(sourceCol) === src, lit(wt)).otherwise(acc)
    }
    df.withColumn("__w", w)
      .filter(col("__w") > 0)
      .withColumn("epoch", explode(sequence(lit(1), ceil(col("__w")).cast(IntegerType))))
      .filter(col("epoch") <= floor(col("__w")) ||
        hashUnit(col(idCol)) < col("__w") - floor(col("__w")))
      .drop("__w")
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

  /** Top-fraction selection by a SCORE column (r12): flags the best
    * `fraction` of rows with `top_selected`, where "best" is highest
    * score (or lowest with `ascending = true`). The selection step
    * importance-weighted data selection (DSIR) and any scorer-then-cut
    * pipeline need.
    *
    * Cutoff semantics mirror [[graft.ops.TextAnalysis.perplexityBuckets]]:
    * the VALUE at rank ⌈n·fraction⌉ of the score sorted in keep-order —
    * rows tied at the cutoff value are all selected, so equal scores
    * always get equal verdicts, and no quantile interpolation arithmetic
    * enters the contract. The DEFAULT cutoff derivation (r14) is
    * `percentile_approx` — one map-side-combining aggregate, no global
    * sort — bit-identical to the exact rank while `accuracy` ≥ 2n (the
    * GK sketch keeps zero rank slack below n ≤ accuracy/2) and within
    * ±n/accuracy ranks beyond. `approx = false` opts into the exact
    * global rank — a single-partition sort of every score, fine to
    * ~10⁸ rows for oracle-exactness debugging but a wall at 100 TB, so
    * it is NOT what a default caller inherits. Assignment is a 1-row
    * broadcast comparison either way, embarrassingly parallel. */
  def topFractionByScore(df: DataFrame, scoreCol: String, fraction: Double,
                         ascending: Boolean = false,
                         approx: Boolean = true,
                         accuracy: Int = 1000000): DataFrame = {
    // the scored frame feeds BOTH the cutoff aggregate and the verdict
    // assignment; Spark dedupes no shared subplans, so an unsevered
    // input lineage (often a whole scorer pipeline) executes twice per
    // action (r18 opt — guide §1.2: don't compute things twice).
    // Materialize it once; streaming inputs pass through (a micro-batch
    // cannot checkpoint, and its scorer runs per-batch anyway).
    // Severing mode (incl. the cluster-safe persist fallback and the
    // eager-execution caveat): graft.ops.Sever.
    val scored = Sever.sever(df)
    selectByCutoff(scored, scoreCol,
      scoreCutoff(scored, scoreCol, fraction, ascending, approx, accuracy),
      ascending)
  }

  /** The top-fraction cutoff VALUE as a one-row PERSISTABLE artifact
    * (r13 — the perplexityCutoffs pattern for ungrouped scores): derive
    * it once from a reference corpus, persist it, and
    * [[selectByCutoff]] any later batch against it — the incremental
    * shape where a nightly ingest never re-ranks history. Returns one
    * row (cut_value); an EMPTY scoreable input yields one row with a
    * NULL cut_value, under which assignment selects nothing.
    *
    * NULL scores carry no rank signal: they are excluded from both the
    * denominator and the cutoff derivation (counting them would shift
    * the cutoff rank, or land it ON a null and null every verdict).
    *
    * Cutoff semantics: the VALUE at rank ⌈n·fraction⌉ of the score in
    * selection order. The exact path (`approx = false`, opt-in as of
    * r14) is a GLOBAL rank window — every score shuffles into ONE
    * partition for a full sort, fine to ~10⁸ rows and a wall at
    * 100 TB; the DEFAULT derives the same value
    * via percentile_approx (one map-side-combining aggregate): value at
    * rank ⌈f·n⌉ ≡ (ascending) percentile_approx(s, f); (descending)
    * −percentile_approx(−s, f) — the negation maps the descending rank
    * onto the same ascending ⌈f·n⌉ convention with no off-by-one at
    * integer f·n. Bit-identical to the rank while accuracy ≥ 2n
    * (GK-sketch delta stays 0 below n ≤ accuracy/2 — ApproxCutoffSpec
    * pins the boundary); rank error ≤ n/accuracy beyond. */
  def scoreCutoff(df: DataFrame, scoreCol: String, fraction: Double,
                  ascending: Boolean = false,
                  approx: Boolean = true,
                  accuracy: Int = 1000000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(fraction > 0.0 && fraction <= 1.0, s"fraction must be in (0,1]: $fraction")
    val scored = df.select(col(scoreCol)).filter(col(scoreCol).isNotNull)
    if (approx) {
      val agg = if (ascending)
        percentile_approx(col(scoreCol), lit(fraction), lit(accuracy))
      else
        -percentile_approx(-col(scoreCol), lit(fraction), lit(accuracy))
      scored.select(agg.cast(DoubleType).as("cut_value"))
    } else {
      val ord = if (ascending) col(scoreCol).asc else col(scoreCol).desc
      val n = scored.select(count(lit(1)).as("__n"))
      // exact path emits zero rows on empty input; normalize to the
      // one-NULL-row artifact contract via a left join from a 1-row seed
      val cut = scored
        .withColumn("__rn", row_number().over(Window.orderBy(ord)))
        .crossJoin(broadcast(n))
        .filter(col("__rn") === ceil(col("__n") * lit(fraction)).cast(LongType))
        .select(col(scoreCol).cast(DoubleType).as("cut_value"))
      df.sparkSession.range(1)
        .join(broadcast(cut), lit(true), "left")
        .select(col("cut_value"))
    }
  }

  /** Assignment against a held cutoff artifact ([[scoreCutoff]] output,
    * possibly read back from a persisted table): flags `top_selected`
    * on every input row with one broadcast comparison — per-row,
    * window-free, embarrassingly parallel on the batch at any scale.
    * NULL scores (and a NULL cut_value) are never selected.
    *
    * The artifact is normalized to ONE row before joining: extra columns
    * are projected away, and a multi-row cutoff table (refreshed via
    * append instead of overwrite) raises at execution instead of
    * silently duplicating every input row with conflicting verdicts —
    * the same appended-artifact guard Dsir's model validation applies,
    * kept LAZY here because this op composes inside larger plans. The
    * comparison runs at double precision (scores are doubles throughout
    * this engine; integral scores past 2⁵³ are outside the contract),
    * and joins under a reserved internal name so an input frame already
    * carrying a `cut_value` audit column never collides. */
  def selectByCutoff(df: DataFrame, scoreCol: String, cutoff: DataFrame,
                     ascending: Boolean = false): DataFrame = {
    require(cutoff.columns.contains("cut_value"),
      "cutoff is not a scoreCutoff artifact: missing the cut_value column")
    val one = cutoff
      .agg(min(col("cut_value").cast(DoubleType)).as("__minc"),
        count(lit(1)).as("__rows"))
      .select(
        when(col("__rows") <= 1, col("__minc"))
          .otherwise(raise_error(concat(
            lit("selectByCutoff: cutoff artifact holds "),
            col("__rows").cast(StringType),
            lit(" rows — refreshed via append instead of overwrite?"))))
          .as("__cut"))
    val cmp = if (ascending) col(scoreCol) <= col("__cut")
              else col(scoreCol) >= col("__cut")
    df.join(broadcast(one), lit(true), "left")
      .withColumn("top_selected", coalesce(cmp, lit(false)))
      .drop("__cut")
  }
}
