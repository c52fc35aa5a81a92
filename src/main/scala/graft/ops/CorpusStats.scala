package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StringType}

/** Corpus profiling: per-stratum token statistics (the dataset-card
  * numbers every training corpus ships with — doc counts, token mass,
  * median / tail document lengths per source or language).
  *
  * Order statistics are EXACT k-th elements (row_number against the
  * group size), not interpolated percentiles: exactness is what makes
  * the result oracle-checkable bit-for-bit across engines, and integer
  * token counts make interpolation noise pure downside. At 100 TB the
  * same API point is where `approx_percentile` (t-digest, one pass, no
  * per-group sort) plugs in when a ±0.1% answer is acceptable — the
  * exact variant costs one sort-shuffle keyed by the stratum.
  */
object CorpusStats {

  /** Per-group: n_docs, total_tokens, median_tokens (lower median: the
    * ⌈n/2⌉-th smallest), p95_tokens (the ⌈0.95·n⌉-th smallest).
    *
    * `approx = true` is the 100 TB knob the header names: both order
    * statistics come from `percentile_approx` in ONE map-side-combining
    * aggregate (no per-group sort shuffle, no hot partition when one
    * stratum dominates). percentile_approx at quantile p returns the
    * value at ascending rank ⌈p·n⌉ — exactly this function's lower-median
    * (⌈n/2⌉ = ⌈0.5·n⌉) and p95 conventions — so with `accuracy` ≥ 2× the
    * largest group it is bit-identical to the exact path
    * (ApproxCutoffSpec pins it); beyond that, rank error ≤ n/accuracy. */
  def tokenStatsBy(df: DataFrame, groupCol: String, textCol: String,
                   approx: Boolean = false, accuracy: Int = 1000000): DataFrame = {
    val toks = df.select(col(groupCol).as("grp"),
      TextAnalysis.tokenCount(col(textCol)).cast(LongType).as("n_tokens"))
    if (approx) {
      return toks.groupBy("grp").agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("total_tokens"),
        percentile_approx(col("n_tokens"), lit(0.5), lit(accuracy))
          .as("median_tokens"),
        percentile_approx(col("n_tokens"), lit(0.95), lit(accuracy))
          .as("p95_tokens"))
        .withColumnRenamed("grp", groupCol)
    }
    val sizes = toks.groupBy("grp").agg(
      count(lit(1)).as("n_docs"),
      sum("n_tokens").as("total_tokens"))
    // deterministic k-th order statistic: ties ordered arbitrarily still
    // yield the same VALUE at rank k (k-th element of the sorted multiset)
    val ranked = toks.withColumn("rn",
      row_number().over(Window.partitionBy("grp").orderBy("n_tokens")))
      .join(sizes, "grp")
    val med = ranked.filter(col("rn") === expr("(n_docs + 1) DIV 2"))
      .select(col("grp"), col("n_tokens").as("median_tokens"))
    val p95 = ranked.filter(col("rn") === ceil(col("n_docs") * 0.95).cast(LongType))
      .select(col("grp"), col("n_tokens").as("p95_tokens"))
    sizes.join(med, "grp").join(p95, "grp")
      .withColumnRenamed("grp", groupCol)
  }

  /** Per-document top-k terms by tf-idf (r10): the dataset-card keyword
    * surface (what is each document about, which terms distinguish it
    * from the corpus). Classic tf·ln(N/df) weighting; scores are rounded
    * to 6 decimals BEFORE ranking and ties break on the term ascending,
    * so the per-doc cut is deterministic and engine-portable. Returns
    * (id, term, tf, df, tfidf) — k rows per non-empty document.
    *
    * Scale shape: one explode + (doc, term) partial-agg for tf; document
    * frequency from a per-doc-distinct pre-pass (never a countDistinct
    * expand); N rides a 1-row count joined by broadcast; the final top-k
    * is a doc-partitioned window — bounded by each document's distinct
    * term count, no global sort. */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String,
                    k: Int): DataFrame = {
    val terms = df.select(col(idCol),
      explode(TextAnalysis.tokens(col(textCol))).as("term"))
    val tf = terms.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val docFreq = terms.distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    val n = df.select(count(lit(1)).as("__n"))
    val scored = tf.join(docFreq, "term")
      .crossJoin(broadcast(n)) // 1-row totals join, the unigramLogProb pattern
      .withColumn("tfidf",
        round(col("tf") * log(col("__n").cast(DoubleType) / col("df")), 6))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("tfidf").desc, col("term"))
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"), col("tfidf"))
  }

  /** Top-k word n-grams by corpus occurrence count (r10): the Zipf-head
    * profile every dataset card and contamination review starts from
    * (which phrases dominate the corpus, how heavy is the template
    * head). Ties break on the n-gram string ascending so the cut at
    * rank k is deterministic and oracle-stable. Returns
    * (ngram, freq, doc_freq) — occurrence count and document frequency.
    *
    * Scale shape: fused per-doc shingling (one WordShingles pass), one
    * partial-agg count keyed by n-gram, then a global top-k that runs as
    * TakeOrdered (per-partition heads + driver merge of k rows), never a
    * full sort of the n-gram vocabulary. doc_freq is computed ONLY for
    * the k winners — the per-doc-distinct explode probes a broadcast of
    * the k-row head, so the second pass aggregates k groups instead of
    * re-counting the whole vocabulary (and never a countDistinct
    * expand). */
  def topNgrams(df: DataFrame, idCol: String, textCol: String,
                n: Int, k: Int): DataFrame = {
    val occ = df.select(
      explode(org.apache.spark.sql.graft.VectorExpressions
        .wordShingles(col(textCol), n, distinct = false)).as("ngram"))
    val top = occ.groupBy("ngram").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("ngram"))
      .limit(k)
    val docFreq = df.select(col(idCol).as("doc"),
        explode(org.apache.spark.sql.graft.VectorExpressions
          .wordShingles(col(textCol), n, distinct = true)).as("ngram"))
      .join(broadcast(top.select("ngram")), Seq("ngram"))
      .groupBy("ngram").agg(count(lit(1)).as("doc_freq"))
    top.join(docFreq, "ngram")
      .orderBy(col("freq").desc, col("ngram"))
      .select("ngram", "freq", "doc_freq")
  }

  /** The n-gram COUNT STORE — the persisted artifact behind
    * [[topNgrams]] under continuous ingest: one row per distinct n-gram
    * with its corpus occurrence count and document frequency. Both
    * columns are ADDITIVE under document batches (new docs never repeat
    * ids, so per-batch doc_freq contributions are disjoint), which makes
    * the fold exact — no sketch, no refresh. Call on a batch to get its
    * contribution rows; [[ngramCountsDelta]] merges them into the store
    * in the O(batch) upsert shape. */
  def ngramCountStore(df: DataFrame, idCol: String, textCol: String,
                      n: Int): DataFrame = {
    val occ = df.select(
      explode(org.apache.spark.sql.graft.VectorExpressions
        .wordShingles(col(textCol), n, distinct = false)).as("ngram"))
      .groupBy("ngram").agg(count(lit(1)).as("freq"))
    val dfq = df.select(col(idCol).as("doc"),
        explode(org.apache.spark.sql.graft.VectorExpressions
          .wordShingles(col(textCol), n, distinct = true)).as("ngram"))
      .groupBy("ngram").agg(count(lit(1)).as("doc_freq"))
    occ.join(dfq, "ngram").select("ngram", "freq", "doc_freq")
  }

  /** Fold a batch's [[ngramCountStore]] rows into the persisted store:
    * returns ONLY the upsert rows (batch n-grams with store counts
    * added) — O(batch-distinct-n-grams) output, the commit-log MERGE
    * shape (unique key = ngram; untouched store rows never move). The
    * store side is probed by one key join; at warehouse scale the MERGE
    * materialization's planning scan prunes it to the touched files. */
  def ngramCountsDelta(store: DataFrame, batchCounts: DataFrame): DataFrame =
    batchCounts
      .join(store.select(col("ngram"), col("freq").as("__f"),
        col("doc_freq").as("__d")), Seq("ngram"), "left")
      .select(col("ngram"),
        (col("freq") + coalesce(col("__f"), lit(0L))).as("freq"),
        (col("doc_freq") + coalesce(col("__d"), lit(0L))).as("doc_freq"))

  /** The DELETION form of every additive count artifact (r17 — the
    * counting-CRDT law the retrieval term-stats store introduced,
    * generalized): negate the departing documents' own artifact and
    * FOLD — the very merge that ingests a batch forgets one, because
    * each store is a pure integer sum over disjoint document batches.
    * Applies to the whole family: n-gram counts (freq, doc_freq), CMS
    * counters (cnt), histogram bins (cnt), term stats (df). A fully
    * departed key folds to zero (harmless to every consumer: top-k cuts
    * it, CMS min reads 0, a zero histogram bin shifts no rank) — drop
    * zero rows opportunistically when compacting the store. */
  def negated(artifact: DataFrame, countCols: String*): DataFrame = {
    require(countCols.nonEmpty, "negated needs at least one count column")
    countCols.foldLeft(artifact)((df, c) => df.withColumn(c, -col(c)))
  }

  /** Top-k view over the count store: TakeOrdered on (freq desc, ngram)
    * — per-partition heads + a driver merge of k rows, never a full
    * vocabulary sort. Folding batches through [[ngramCountsDelta]] and
    * cutting here equals [[topNgrams]] over the concatenated corpus
    * (the incremental gate's oracle law). */
  def topNgramsFromStore(store: DataFrame, k: Int): DataFrame =
    store.orderBy(col("freq").desc, col("ngram")).limit(k)
      .select("ngram", "freq", "doc_freq")

  /** Per-group K-MINIMUM-VALUES distinct-token sketch rows (r12 — the
    * mergeable artifact): the k smallest md5-unit hashes of the group's
    * DISTINCT tokens, via the bounded [[graft.ops.Similarity.rankTopK]]
    * aggregate (O(k) state per group, map-side combine — the same heap
    * that ranks ANN candidates). Returns (group, rank, h, u); union two
    * corpora's rows and re-rank to merge (KMV sets compose under
    * min-k-of-union). */
  def kmvMinHashes(df: DataFrame, groupCol: String, textCol: String,
                   k: Int): DataFrame = {
    val hashed = df.select(col(groupCol).as("query_id"),
        explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .select(col("query_id"),
        conv(substring(md5(col("tok")), 1, 7), 16, 10).cast(LongType)
          .as("neighbor_id"))
      .distinct()
      .withColumn("u",
        col("neighbor_id").cast(DoubleType) / lit((1L << 28).toDouble))
    Similarity.rankTopK(hashed, "u", k, ascending = true)
      .select(col("query_id").as(groupCol), col("rank"),
        col("neighbor_id").as("h"), col("u"),
        // the sketch is self-describing: estimating a k=64 sketch at
        // k=256 would silently hit the exact-count branch and report
        // 128 for a million — kmvEstimate validates against this
        lit(k).as("sketch_k"))
  }

  /** KMV distinct-count estimate per group (Bar-Yossef et al. 2002,
    * "Counting Distinct Elements in a Data Stream" — public): with
    * u₍ₖ₎ the k-th smallest unit hash of the distinct tokens,
    * n̂ = (k−1)/u₍ₖ₎; a group with fewer than k distinct hashes reports
    * the exact count. Engine-portable by construction (md5-prefix unit
    * hashes, no sketch library constants), so the DuckDB oracle replays
    * the estimate EXACTLY — unlike HLL-library sketches whose register
    * layouts differ per engine. Relative error ~1/√(k−2) (~12.5% at
    * k=64, ~3% at k=1024): the dataset-card ndv tier for 100 TB corpora
    * where exact per-group distinct counts need a vocabulary-sized
    * shuffle; the sketch rows are the persistable, UNION-mergeable
    * artifact. */
  def kmvNdvBy(df: DataFrame, groupCol: String, textCol: String,
               k: Int = 64): DataFrame =
    // direct path: the min-k rows are already ranked — aggregate them
    // straight, no second distinct + rank shuffle (that pass exists for
    // the merge case, where unions must re-fold to min-k)
    estimateFromRanked(kmvMinHashes(df, groupCol, textCol, k)
      .select(col(groupCol).as("query_id"), col("rank"), col("u")), groupCol, k)

  /** Estimate from sketch rows (possibly a union of several corpora's
    * [[kmvMinHashes]] — re-ranks, so merged sets fold to min-k first).
    * `k` is the DECLARED sketch size (the [[cmsEstimate]] geometry
    * convention): every consumed row's self-described `sketch_k` must
    * equal it, enforced by a per-row when/raise_error IN the plan —
    * zero jobs at query construction (the old form ran an eager
    * `distinct().collect()` over the sketch lineage just to read k,
    * O(plan) for a lazily-composed sketch — r15 verdict). Mixing sketch
    * sizes, or declaring a k the rows weren't built with, would
    * silently take the exact-count branch with a truncated set — the
    * guard makes it a hard execution error instead. An empty sketch
    * frame estimates nothing (zero groups in, zero rows out). */
  def kmvEstimate(sketch: DataFrame, groupCol: String, k: Int): DataFrame = {
    val guarded = sketch.select(col(groupCol).as("query_id"),
      col("h").as("neighbor_id"),
      when(col("sketch_k") === k, col("u"))
        .otherwise(raise_error(concat(
          lit(s"KMV sketch size mismatch: estimating at k=$k, row built with k="),
          col("sketch_k").cast(StringType)))
          .cast(DoubleType))
        .as("u"))
    val reranked = Similarity.rankTopK(guarded.distinct(), "u", k,
      ascending = true)
    estimateFromRanked(reranked, groupCol, k)
  }

  private def estimateFromRanked(ranked: DataFrame, groupCol: String,
                                 k: Int): DataFrame =
    ranked.groupBy("query_id").agg(
      count(lit(1)).as("__n"),
      max(when(col("rank") === k, col("u"))).as("__uk"))
      .select(col("query_id").as(groupCol),
        round(when(col("__n") < k, col("__n").cast(DoubleType))
          .otherwise(lit((k - 1).toDouble) / col("__uk")), 6).as("ndv_est"))

  /** COUNT-MIN SKETCH rows (Cormode & Muthukrishnan 2005, "An Improved
    * Data Stream Summary: The Count-Min Sketch and its Applications" —
    * public): `depth` hash rows of `width` counters over the corpus's
    * token occurrences, stored SPARSE (only touched buckets) and
    * self-describing (sketch_depth/sketch_width ride every row, the KMV
    * convention). The bounded-memory tier of the frequency family: the
    * exact [[ngramCountStore]] is vocabulary-sized, the CMS is depth ×
    * width rows FOREVER, with one-sided error (estimates never
    * undercount; overcount ≤ εN with ε = e/width at failure prob
    * e^-depth). Counters are ADDITIVE — [[cmsMerge]] folds batch
    * sketches exactly, so the continuous-ingest story is the n-gram
    * store's upsert with a hard memory bound. Hashes are the engine's
    * md5-prefix law (row-salted), so a DuckDB oracle replays estimates
    * EXACTLY — integer arithmetic end to end. */
  def cmsSketch(df: DataFrame, textCol: String,
                depth: Int = 4, width: Int = 2048): DataFrame =
    df.select(explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .select(explode(sequence(lit(0), lit(depth - 1))).as("row_idx"),
        col("tok"))
      .select(col("row_idx"), cmsBucket(col("row_idx"), col("tok"), width))
      .groupBy("row_idx", "bucket").agg(count(lit(1)).as("cnt"))
      .withColumn("sketch_depth", lit(depth))
      .withColumn("sketch_width", lit(width))

  /** Row-salted md5-prefix bucket — mirrored verbatim by the oracle. */
  private def cmsBucket(rowIdx: Column, tok: Column, width: Int): Column =
    pmod(conv(substring(md5(concat(lit("cms_"), rowIdx.cast(StringType),
      lit("_"), tok)), 1, 7), 16, 10).cast(LongType), lit(width.toLong))
      .as("bucket")

  /** Guard a sketch's counter column with an IN-PLAN geometry check:
    * every row's self-described (depth, width) must equal the declared
    * one, enforced by raise_error at EXECUTION (the selectByCutoff /
    * from-index discipline — zero jobs at plan construction, every row
    * checked, strictly stronger than an eager distinct().collect()
    * that re-ran the whole sketch plan just to read two values —
    * r15 s3 review catch). */
  private def cmsGuarded(sketch: DataFrame, depth: Int, width: Int): DataFrame =
    sketch.select(col("row_idx"), col("bucket"),
      when(col("sketch_depth") === depth && col("sketch_width") === width,
        col("cnt"))
        .otherwise(raise_error(concat(
          lit(s"CMS geometry mismatch: expected ${depth}x$width, row has "),
          col("sketch_depth").cast(StringType), lit("x"),
          col("sketch_width").cast(StringType)))
          .cast(LongType))
        .as("cnt"))

  /** Fold sketches built with the SAME declared geometry: counters add.
    * A row from a differently-shaped sketch is a hard error at
    * execution (in-plan, per row — a bucket id only means something
    * within its own depth × width grid). */
  def cmsMerge(depth: Int, width: Int, sketches: DataFrame*): DataFrame =
    sketches.map(cmsGuarded(_, depth, width)).reduce(_ unionByName _)
      .groupBy("row_idx", "bucket").agg(sum("cnt").as("cnt"))
      .withColumn("sketch_depth", lit(depth))
      .withColumn("sketch_width", lit(width))
      .select("row_idx", "bucket", "cnt", "sketch_depth", "sketch_width")

  /** Point-estimate token frequencies from the sketch: for each probe
    * token, min over the depth rows of its bucket counter (absent
    * bucket = 0). The declared geometry shapes the probe plan and is
    * verified in-plan against every sketch row consumed. The sketch
    * side is depth × width rows AT MOST — broadcast by construction,
    * so probing never shuffles the batch. Returns (tok, est_freq);
    * est_freq ≥ the true count always. */
  def cmsEstimate(sketch: DataFrame, probes: DataFrame, tokCol: String,
                  depth: Int = 4, width: Int = 2048): DataFrame =
    probes.select(col(tokCol).as("tok")).distinct()
      .select(col("tok"),
        explode(sequence(lit(0), lit(depth - 1))).as("row_idx"))
      .select(col("tok"), col("row_idx"),
        cmsBucket(col("row_idx"), col("tok"), width))
      .join(broadcast(cmsGuarded(sketch, depth, width)),
        Seq("row_idx", "bucket"), "left")
      .groupBy("tok")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_freq"))

  /** DECIMAL LOG-BINNED HISTOGRAM sketch rows (r16) — the QUANTILE tier
    * of the sketch family (KMV answers distinct counts, the CMS answers
    * frequencies; this answers "what is p99 document length" from a
    * bounded-memory artifact maintained under ingest). The bin of a
    * non-negative long x is its decimal shape: (digit count, first
    * `leadDigits` digits) — the HdrHistogram idea (public: Tene's
    * log-bucketed latency histograms) carried out in DECIMAL via string
    * ops, because `length(cast(x as string))` and `substring` are
    * bit-exact in every engine while `floor(log2(x))` flips at exact
    * powers (ln(8)/ln(2) < 3 in IEEE — the boundary an oracle replay
    * dies on). Relative bin resolution 10^-(leadDigits-1) (≤ 10% at the
    * default 2; values under 10^leadDigits are EXACT). Counts are
    * ADDITIVE — [[histogramMerge]] folds batch sketches exactly, and
    * the grid is bounded at 9·10^(leadDigits-1) bins per decade
    * FOREVER, the CMS's continuous-ingest story for order statistics.
    * Negative values are an in-plan hard error (the bin law covers
    * non-negative longs: lengths, token counts, byte sizes). */
  def histogramSketch(df: DataFrame, valueCol: String,
                      leadDigits: Int = 2): DataFrame = {
    val (d, lead) = histBinCols(col(valueCol), leadDigits)
    df.select(d.as("bin_d"), lead.as("bin_lead"))
      .groupBy("bin_d", "bin_lead").agg(count(lit(1)).as("cnt"))
      .withColumn("sketch_lead", lit(leadDigits))
  }

  /** Per-STRATUM histogram rows `(grp, bin_d, bin_lead, cnt,
    * sketch_lead)` — the dataset-card shape ([[tokenStatsBy]] is
    * per-group; so is its sketch tier). Same additivity and bounds per
    * group. */
  def histogramSketchBy(df: DataFrame, groupCol: String, valueCol: String,
                        leadDigits: Int = 2): DataFrame = {
    val (d, lead) = histBinCols(col(valueCol), leadDigits)
    df.select(col(groupCol).as("grp"), d.as("bin_d"), lead.as("bin_lead"))
      .groupBy("grp", "bin_d", "bin_lead").agg(count(lit(1)).as("cnt"))
      .withColumn("sketch_lead", lit(leadDigits))
  }

  private def histBinCols(value: Column, leadDigits: Int): (Column, Column) = {
    require(leadDigits >= 1 && leadDigits <= 4,
      s"leadDigits must lie in [1, 4]: $leadDigits")
    val x = value.cast(LongType)
    // nulls and negatives each fail with their OWN message (a null is a
    // data-quality gap, not a sign error — the bare x >= 0 guard would
    // route nulls to "negative value null", r16 review)
    val guarded = when(x.isNull,
        raise_error(lit("histogramSketch: null value — filter or " +
          "coalesce missing values before sketching")).cast(LongType))
      .when(x >= 0, x)
      .otherwise(raise_error(concat(
        lit("histogramSketch: negative value "), x.cast(StringType),
        lit(" — the decimal bin law covers non-negative longs only")))
        .cast(LongType))
    val s = guarded.cast(StringType)
    (length(s), substring(s, 1, leadDigits).cast(LongType))
  }

  /** In-plan geometry guard for histogram rows (the [[cmsGuarded]]
    * discipline: per row, at execution, zero jobs at construction).
    * `keyCols` carries any stratum columns through (the By-form). */
  private def histGuarded(sketch: DataFrame, leadDigits: Int,
                          keyCols: Seq[String] = Nil): DataFrame =
    sketch.select((keyCols.map(col) ++ Seq(col("bin_d"), col("bin_lead"),
      when(col("sketch_lead") === leadDigits, col("cnt"))
        .otherwise(raise_error(concat(
          lit(s"histogram lead-digit mismatch: expected $leadDigits, row has "),
          col("sketch_lead").cast(StringType)))
          .cast(LongType))
        .as("cnt"))): _*)

  /** Fold histogram sketches built with the same declared `leadDigits`:
    * counts add (bins are disjoint decimal shapes, so the fold is exact
    * — not an approximation like merged quantile digests). */
  def histogramMerge(leadDigits: Int, sketches: DataFrame*): DataFrame = {
    require(sketches.nonEmpty, "histogramMerge needs at least one sketch")
    sketches.map(histGuarded(_, leadDigits)).reduce(_ unionByName _)
      .groupBy("bin_d", "bin_lead").agg(sum("cnt").as("cnt"))
      .withColumn("sketch_lead", lit(leadDigits))
      .select("bin_d", "bin_lead", "cnt", "sketch_lead")
  }

  /** Quantile estimates from the sketch: for each q ∈ (0, 1], the LOWER
    * BOUND of the bin holding the ascending rank-⌈q·N⌉ value (returning
    * the bin's lower bound, not an interpolation, keeps the answer a
    * deterministic integer any engine reproduces; true quantile ∈
    * [est, est·(1 + 10^-(leadDigits-1))) by the bin law). Accepts
    * unaggregated per-batch rows (sums per bin first — the additive
    * law). The cum window runs over the BIN GRID — hundreds of rows by
    * the boundedness argument above — so the single-partition window is
    * driver noise, never a corpus-sized sort. */
  def histogramQuantiles(sketch: DataFrame, qs: Seq[Double],
                         leadDigits: Int = 2): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantiles must lie in (0, 1]: $qs")
    val spark = sketch.sparkSession
    import spark.implicits._
    val bins = histGuarded(sketch, leadDigits)
      .groupBy("bin_d", "bin_lead").agg(sum("cnt").as("cnt"))
    val cum = bins.withColumn("cum",
      sum("cnt").over(Window.orderBy("bin_d", "bin_lead")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(bins.agg(sum(col("cnt")).as("__n"))))
    // rank = ceil(q·N) as DOUBLE arithmetic on both engines (an oracle
    // replaying this in DECIMAL diverges at products like 0.9·500,
    // which are > the decimal value in IEEE — the VALUES cast matters)
    cum.crossJoin(broadcast(qs.toDF("q")))
      .filter(col("cum") >=
        greatest(ceil(col("q") * col("__n").cast(DoubleType)), lit(1L)))
      .groupBy("q")
      .agg(min(struct(col("bin_d"), col("bin_lead"))).as("__b"))
      .select(col("q"), histLowerBound.as("est_value"))
  }

  /** Per-stratum quantiles from [[histogramSketchBy]] rows: `(grp, q,
    * est_value)` — the cum window partitions by the stratum, so no
    * single-partition sort ever sees more than one group's bin grid. */
  def histogramQuantilesBy(sketch: DataFrame, qs: Seq[Double],
                           leadDigits: Int = 2): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantiles must lie in (0, 1]: $qs")
    val spark = sketch.sparkSession
    import spark.implicits._
    val bins = histGuarded(sketch, leadDigits, keyCols = Seq("grp"))
      .groupBy("grp", "bin_d", "bin_lead").agg(sum("cnt").as("cnt"))
    val w = Window.partitionBy("grp").orderBy("bin_d", "bin_lead")
    val cum = bins
      .withColumn("cum", sum("cnt").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__n", sum("cnt").over(
        Window.partitionBy("grp")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    cum.crossJoin(broadcast(qs.toDF("q")))
      .filter(col("cum") >=
        greatest(ceil(col("q") * col("__n").cast(DoubleType)), lit(1L)))
      .groupBy("grp", "q")
      .agg(min(struct(col("bin_d"), col("bin_lead"))).as("__b"))
      .select(col("grp"), col("q"), histLowerBound.as("est_value"))
  }

  /** Decode a bin struct `__b = (bin_d, bin_lead)` to its lower bound:
    * lead · 10^(d − digits(lead)) — in EXACT long arithmetic (r17,
    * ADVICE r16): the double form (lead · pow(10.0, e)) deviates by up
    * to ~1024 once the product exceeds 2^53 (17+ digit values), so the
    * scaladoc claim "a deterministic integer any engine reproduces"
    * held only for IEEE-double consumers. The exponent is ≤ 18 for any
    * long-valued bin (19 digits, ≥ 1 lead digit), so a literal power
    * table keeps the whole decode in integer codegen. */
  private def histLowerBound: Column = {
    val e = (col("__b.bin_d") -
      length(col("__b.bin_lead").cast(StringType))).cast(IntegerType)
    val pow10: Column = (1 to 18).foldLeft(when(e === 0, lit(1L))) {
      (acc, i) => acc.when(e === i, lit(BigInt(10).pow(i).toLong))
    }
    col("__b.bin_lead").cast(LongType) * pow10
  }
}
