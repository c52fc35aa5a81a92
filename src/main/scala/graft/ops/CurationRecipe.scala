package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** The v6 curation recipe — the full public pipeline shape
  * (C4/RefinedWeb: langid → Gopher battery → repetition → blocklist →
  * external-LM perplexity tail drop → DSIR cut → fuzzy dedup →
  * decontamination) — factored into ONE stage function per DAG node so
  * the same definition backs three surfaces with zero drift:
  *
  *   - the composed gate query `q_curation_pipeline_v6` (OpsQueries
  *     chains these with localCheckpoint stage boundaries),
  *   - the `examples/curation` PROJECT, where each stage is a DAG model
  *     (native-code nodes resolved through [[graft.core.NativeRegistry]],
  *     SQL nodes for the pure-relational joins) materialized as a table
  *     by the Runner — the engine's own scheduler/materialization layer
  *     running the ops layer (r14, VERDICT task 2),
  *   - the plan-quality specs, which assert the PRE-checkpoint cutoff
  *     stage plans carry no partition-less rank window.
  *
  * Both population-dependent cutoffs ride percentile_approx (the r14
  * default): at gate scale they are bit-identical to the exact rank
  * (accuracy ≥ 2n), at 100 TB they are one map-side-combining aggregate
  * instead of a single-partition sort.
  *
  * The recipe takes its corpus AS-IS: the fixture plants the gates and
  * example projects rely on (template clones mod 105, degenerate loop
  * mod 111, blocklist terms mod 13) live in
  * [[graft.fixtures.CurationPlants]] (r15 — plant arithmetic is gate
  * scaffolding, not product behavior) and compose in front of the
  * recipe where a gate or example needs them.
  */
object CurationRecipe {

  /** Stage 0: dtype NORMALIZATION only (idempotent casts over a raw
    * documents frame — a source parquet scan or Tables.documents
    * output). Fixture planting is [[graft.fixtures.CurationPlants]]'s
    * job, composed by the gates/examples, not by the recipe. */
  def normalize(rawDocs: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.LongType
    rawDocs.select(
      col("doc_id").cast(LongType).as("doc_id"),
      col("text").cast(StringType).as("text"),
      col("lang").cast(StringType).as("lang"))
  }

  /** The held-out eval bench: never a candidate; drives stage 8. */
  def bench(aug: DataFrame): DataFrame = aug.filter(col("doc_id") % 97 === 0)

  /** The candidate population. */
  def pop(aug: DataFrame): DataFrame = aug.filter(col("doc_id") % 97 =!= 0)

  /** Stages 1–4: the per-doc rule battery, computed independently on the
    * full candidate population (cascade ≡ intersection for per-doc
    * flags). Output: (doc_id, lang, lang_ok, gopher_ok, rep_ok,
    * block_ok, rules_pass). */
  def rules(pop: DataFrame): DataFrame = {
    val spark = pop.sparkSession
    import spark.implicits._
    val langOk = pop.select(col("doc_id"),
      (TextAnalysis.languageId(col("text")) === col("lang")).as("lang_ok"))
    val gopherOk = TextAnalysis.gopherQualityFlags(pop, "doc_id", "text",
      minWords = 60, minStopTypes = 1)
      .select(col("doc_id"), col("gopher_keep").as("gopher_ok"))
    val repOk = Repetition.ngramRepetition(pop, "doc_id", "text")
      .select(col("doc_id"), col("repetition_keep").as("rep_ok"))
    val blockOk = TextAnalysis.wordBlocklist(pop, "doc_id", "text",
      Seq("badword1", "badword2", "badword3").toDF("word"), "word")
      .select(col("doc_id"), col("blocklist_keep").as("block_ok"))
    pop.select("doc_id", "lang")
      .join(langOk, "doc_id").join(gopherOk, "doc_id")
      .join(repOk, "doc_id").join(blockOk, "doc_id")
      .withColumn("rules_pass",
        col("lang_ok") && col("gopher_ok") && col("rep_ok") && col("block_ok"))
  }

  /** Population rows surviving the rule battery. */
  def ruleSurvivors(pop: DataFrame, rules: DataFrame): DataFrame =
    pop.join(rules.filter(col("rules_pass")).select("doc_id"), "doc_id")

  /** The held LM reference slice (population ids ≡ 0 mod 3). */
  private def lmSlice(pop: DataFrame): DataFrame =
    pop.filter(col("doc_id") % 3 === 0)

  /** Stage-5 artifacts: the external-LM unigram / bigram logprob tables,
    * held from the population's %3 slice. Exposed separately so each can
    * be its own DAG table; the composed gate path uses [[lmTables]] to
    * derive both from one call. */
  def lmUnigrams(pop: DataFrame): DataFrame = lmTables(pop)._1
  def lmBigrams(pop: DataFrame): DataFrame = lmTables(pop)._2
  def lmTables(pop: DataFrame): (DataFrame, DataFrame) =
    TextAnalysis.lmTables(lmSlice(pop), "text")

  /** Stage 5 scoring: rule survivors scored against the held LM tables,
    * lang carried for the per-language cutoffs. */
  def scoredLm(ruleSurvivors: DataFrame, uni: DataFrame,
               bi: DataFrame): DataFrame =
    TextAnalysis.externalLmLogProb(ruleSurvivors, "doc_id", "text", uni, bi)
      .join(ruleSurvivors.select("doc_id", "lang"), Seq("doc_id"))

  /** Stage 5 cutoff+assignment: per-language perplexity terciles over
    * the scored rule survivors, approx cutoffs (no rank window —
    * PerfSpec pins this plan). Output: (doc_id, ppl_bucket). */
  def pplBuckets(scored: DataFrame): DataFrame =
    TextAnalysis.perplexityBuckets(
      scored.filter(col("n_bigrams") > 0), "doc_id", "lang", "avg_logprob_lm",
      approx = true)
      .select(col("doc_id"), col("ppl_bucket"))

  /** Rule survivors that kept a head/middle bucket. */
  def pplSurvivors(ruleSurvivors: DataFrame, bucketed: DataFrame): DataFrame =
    ruleSurvivors.join(
      bucketed.filter(col("ppl_bucket") =!= "tail").select("doc_id"), "doc_id")

  /** The DSIR trusted target (population ids ≡ 0 mod 7). */
  def dsirTarget(pop: DataFrame): DataFrame =
    pop.filter(col("doc_id") % 7 === 0)

  /** Stage 6: DSIR importance cut over the perplexity survivors, approx
    * cutoff. Output: (doc_id, dsir_keep). */
  def dsirCut(pplSurvivors: DataFrame, target: DataFrame): DataFrame =
    Dsir.select(pplSurvivors, target, "doc_id", "text",
      fraction = 0.5, approx = true)
      .select(col("doc_id"), col("dsir_keep"))

  def dsirSurvivors(pplSurvivors: DataFrame, dsir: DataFrame): DataFrame =
    pplSurvivors.join(
      dsir.filter(col("dsir_keep")).select("doc_id"), "doc_id")

  /** Stage 7: fuzzy dedup (banded candidates → levenshtein verify →
    * connected components → keep-best by quality). ASCII projection for
    * engine-parity levenshtein. Output: (doc_id, dup_survivor). */
  def dedupKept(dsirSurvivors: DataFrame): DataFrame = {
    val ascii = dsirSurvivors.select(col("doc_id"),
      regexp_replace(col("text"), "[^\\x00-\\x7F]", "?").as("text"))
    val pairs = Dedup.editDistancePairs(ascii, "doc_id", "text",
      maxDistance = 16, shingleLen = 5, k = 32, bands = 8)
    val comp = Dedup.connectedComponents(pairs, "doc_a", "doc_b")
    val qual = dsirSurvivors.select(col("doc_id"),
      TextAnalysis.qualityScore(col("text")).as("quality"))
    Dedup.keepBest(qual, "doc_id", "quality", comp)
      .select(col("doc_id"), col("is_survivor").as("dup_survivor"))
  }

  def dupSurvivors(dsirSurvivors: DataFrame, kept: DataFrame): DataFrame =
    dsirSurvivors.join(
      kept.filter(col("dup_survivor")).select("doc_id"), "doc_id")

  /** Stage 8: 4-shingle overlap vs the held bench. Output:
    * (doc_id, contaminated). */
  def decontaminate(dupSurvivors: DataFrame, bench: DataFrame): DataFrame =
    Decontaminate.flagOverlap(dupSurvivors, bench,
      "doc_id", "text", n = 4, minOverlap = 1)
      .select(col("doc_id"), col("contaminated"))

  /** The per-doc audit ledger: every stage verdict, the first failing
    * stage, final_keep. Stage-6..8 verdicts are NULLABLE booleans (NULL
    * = the doc never reached the stage), cast to strings so both
    * engines' pandas conversions agree (None vs NaN on nullable BOOLEAN
    * is a driver-compare mismatch). */
  def audit(rules: DataFrame, bucketed: DataFrame, dsir: DataFrame,
            kept: DataFrame, decon: DataFrame): DataFrame =
    rules
      .join(bucketed, Seq("doc_id"), "left")
      .join(dsir, Seq("doc_id"), "left")
      .join(kept, Seq("doc_id"), "left")
      .join(decon, Seq("doc_id"), "left")
      .withColumn("drop_stage",
        when(!col("lang_ok"), "langid")
          .when(!col("gopher_ok"), "gopher")
          .when(!col("rep_ok"), "repetition")
          .when(!col("block_ok"), "blocklist")
          .when(col("ppl_bucket").isNull || col("ppl_bucket") === "tail",
            "perplexity")
          .when(!col("dsir_keep"), "dsir")
          .when(!col("dup_survivor"), "dedup")
          .when(col("contaminated"), "decontamination")
          .otherwise(lit(null).cast(StringType)))
      .withColumn("final_keep", col("drop_stage").isNull)
      .select(col("doc_id"), col("lang"), col("lang_ok"), col("gopher_ok"),
        col("rep_ok"), col("block_ok"), col("ppl_bucket"),
        col("dsir_keep").cast(StringType).as("dsir_keep"),
        col("dup_survivor").cast(StringType).as("dup_survivor"),
        col("contaminated").cast(StringType).as("contaminated"),
        col("drop_stage"), col("final_keep"))

  /** Register the recipe's stages as named native-model functions (r14,
    * VERDICT task 2): an `examples/curation`-style project declares them
    * in `models/<name>.native.conf` files (`fn: <name here>`) and the
    * Runner schedules/materializes them like any model. Each fn
    * documents the dependency MODEL NAMES it consumes — the contract a
    * project's ref lines must satisfy. Idempotent. */
  def installNatives(): Unit = {
    import graft.core.NativeRegistry.register
    // deps: the source table (corpus_documents by default source naming).
    // The FIXTURE stage: normalization is the recipe's, the plants are
    // CurationPlants' — registered here because the checked-in example
    // projects (gate fixtures themselves) declare it as their stage 0.
    register("curation_augment") { (_, deps) =>
      graft.fixtures.CurationPlants.augment(deps.values.headOption.getOrElse(
        throw new IllegalArgumentException(
          "curation_augment needs one source/ref dependency (the raw documents)")))
    }
    // deps: pop
    register("curation_rules")((_, deps) => rules(deps("pop")))
    register("curation_lm_unigrams")((_, deps) => lmUnigrams(deps("pop")))
    register("curation_lm_bigrams")((_, deps) => lmBigrams(deps("pop")))
    // deps: rule_survivors, lm_uni, lm_bi
    register("curation_lm_score")((_, deps) =>
      scoredLm(deps("rule_survivors"), deps("lm_uni"), deps("lm_bi")))
    // deps: scored
    register("curation_ppl_buckets")((_, deps) => pplBuckets(deps("scored")))
    // deps: ppl_survivors, pop
    register("curation_dsir")((_, deps) =>
      dsirCut(deps("ppl_survivors"), dsirTarget(deps("pop"))))
    // deps: dsir_survivors
    register("curation_dedup")((_, deps) => dedupKept(deps("dsir_survivors")))
    // deps: dup_survivors, bench
    register("curation_decontaminate")((_, deps) =>
      decontaminate(deps("dup_survivors"), deps("bench")))
    // deps: rules, bucketed, dsir, dedup_kept, decon
    register("curation_audit")((_, deps) =>
      audit(deps("rules"), deps("bucketed"), deps("dsir"),
        deps("dedup_kept"), deps("decon")))
  }
}
