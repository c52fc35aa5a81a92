package graft.ops

import java.time.Instant
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** The INCREMENTAL curation recipe (r15 — VERDICT task 1): the nightly-
  * ingest counterpart of [[CurationRecipe]]'s one-shot v6 pipeline,
  * factored into one stage function per DAG node so the
  * `examples/curation_incremental` PROJECT and the
  * q_curation_project_incremental gate share a single definition.
  *
  * The pipeline shape is the 100 TB nightly story every artifact-driven
  * ingest op in this engine exists for:
  *
  *   - ARTIFACTS (LM logprob tables, per-language perplexity cutoffs,
  *     DSIR bucket model + cutoff) are trained ONCE from the BOOTSTRAP
  *     generation's held slices and frozen — materialized_view models
  *     whose refresh fingerprints depend only on the source, so a later
  *     run provably no-ops them ("fresh").
  *   - STAGE MODELS (rule battery → LM-quality ingest → DSIR ingest →
  *     near-dup ledger → audit) are MICROBATCH-materialized on
  *     `event_ts`: the Runner injects each batch's [start, end) window
  *     into every event-time-declaring ref (the reference's microbatch
  *     ref filter, core/dbt/context/providers.py:245-296), so per-batch
  *     work is O(batch); the persisted checkpoint makes the second
  *     nightly run process ONLY the new generation (commit-log file
  *     counts prove it in CurationEngineIntegrationSpec).
  *   - the LEDGER model is self-referencing: it probes its own
  *     accumulated signature store through the `this` dependency the
  *     Runner hands native incremental models (the reference's
  *     `dbt.this` for Python models), exactly like the hand-driven
  *     foreachBatch ingest gates (q_stream_neardup) — but scheduled,
  *     materialized, checkpointed, and tested BY the engine.
  *
  * Replay law (what the DuckDB oracle checks): every stage verdict is a
  * pure function of the frozen artifacts and the doc's own generation
  * prefix, so ingesting generation-by-generation ≡ one two-generation
  * batch replay. For dedup the law is made explicit: a doc is
  * `dup_prior` iff SOME ingested survivor with a lexicographically
  * earlier (event_ts, doc_id) matches it — an ordering on DATA, not on
  * run boundaries, so reprocessing a batch is idempotent.
  *
  * Generations: event_ts = 2025-01-01 + (doc_id % 2) days — generation 0
  * (even ids) is the bootstrap day, generation 1 (odd ids) the nightly
  * increment. The [[graft.fixtures.CurationPlants]] plants thread both
  * generations: the mod-105 template clones alternate parity, so the
  * ledger sees within-batch duplicates on day 1 AND store-probe
  * duplicates on day 2; every even clone id is ≡ 0 (mod 6) and
  * ≡ 0 (mod 7), landing the family in the held LM slice and the DSIR
  * target exactly as in v6. */
object CurationIngest {

  /** Generation-0 day; artifacts train on event_ts < bootstrapEnd. */
  val begin: Instant = Instant.parse("2025-01-01T00:00:00Z")
  val bootstrapEnd: Instant = Instant.parse("2025-01-02T00:00:00Z")

  private def ts(i: Instant) = lit(java.sql.Timestamp.from(i))

  /** Stage 0: normalization + the [[graft.fixtures.CurationPlants]]
    * plants + the generation clock. Ephemeral in the project (inlined
    * into consumers), declaring event_time so the Runner injects each
    * batch's window directly above the source scan. Scale note: the
    * fixture DERIVES event_ts from doc_id, so the injected predicate
    * evaluates just above the projection (every stage still touches
    * only the batch's rows — downstream compute is O(batch)); a real
    * deployment's event_time is a physical/partition column, where the
    * same injected predicate additionally prunes files at the scan. */
  def feed(rawDocs: DataFrame): DataFrame =
    graft.fixtures.CurationPlants.augment(rawDocs)
      .withColumn("event_ts",
        to_timestamp(date_add(to_date(ts(begin)), (col("doc_id") % 2).cast("int"))))

  private def bootstrap(feed: DataFrame): DataFrame =
    feed.filter(col("event_ts") < ts(bootstrapEnd))

  /** Artifact: LM logprob tables held from the bootstrap generation's
    * mod-3 slice ([[TextAnalysis.lmTables]]). */
  def lmUnigrams(feed: DataFrame): DataFrame = lmTables(feed)._1
  def lmBigrams(feed: DataFrame): DataFrame = lmTables(feed)._2
  private def lmTables(feed: DataFrame): (DataFrame, DataFrame) =
    TextAnalysis.lmTables(bootstrap(feed).filter(col("doc_id") % 3 === 0), "text")

  /** Artifact: per-language perplexity cutoffs, calibrated on the
    * bootstrap generation's RULE SURVIVORS scored against the held LM —
    * the rule battery re-derives here (same function as the rules stage,
    * so verdicts agree) rather than ref'ing the moving rules table,
    * keeping the artifact's refresh fingerprint source-only. */
  def pplCutoffs(feed: DataFrame, uni: DataFrame, bi: DataFrame): DataFrame = {
    val boot = bootstrap(feed)
    val surv = boot.join(
      CurationRecipe.rules(boot.select("doc_id", "lang", "text"))
        .filter(col("rules_pass")).select("doc_id"), "doc_id")
    val scored = TextAnalysis.externalLmLogProb(surv, "doc_id", "text", uni, bi)
      .filter(col("n_bigrams") > 0)
      .join(surv.select("doc_id", "lang"), Seq("doc_id"))
    TextAnalysis.perplexityCutoffs(scored, "lang", "avg_logprob_lm")
  }

  /** Artifact: the DSIR bucket model — raw distribution = the bootstrap
    * generation, target = its trusted mod-7 slice. */
  def dsirModel(feed: DataFrame): DataFrame = {
    val boot = bootstrap(feed)
    Dsir.buildModel(boot, boot.filter(col("doc_id") % 7 === 0), "doc_id", "text")
  }

  /** Artifact: the DSIR selection cutoff (top half of the bootstrap
    * generation's scoreable docs by per-feature mean weight). */
  def dsirCutoff(feed: DataFrame, model: DataFrame): DataFrame =
    Sampling.scoreCutoff(
      Dsir.logWeightsFromModel(bootstrap(feed), "doc_id", "text", model)
        .filter(col("n_feats") > 0),
      "avg_log_weight", fraction = 0.5)

  /** Stages 1–4 (microbatch): the per-doc rule battery over the batch —
    * [[CurationRecipe.rules]] with event_ts carried on the spine. */
  def rules(feedBatch: DataFrame): DataFrame =
    CurationRecipe.rules(feedBatch.select("doc_id", "lang", "text"))
      .join(feedBatch.select("doc_id", "event_ts"), Seq("doc_id"))

  /** Stage 5 (microbatch): LM-quality ingest — the batch's rule
    * survivors scored against the HELD artifacts via
    * [[TextAnalysis.lmSelectIngest]]; no corpus re-scoring, no cutoff
    * re-ranking, ever. */
  def scored(feedBatch: DataFrame, rulesBatch: DataFrame,
             uni: DataFrame, bi: DataFrame, cuts: DataFrame): DataFrame = {
    val surv = feedBatch.join(
      rulesBatch.filter(col("rules_pass")).select("doc_id"), "doc_id")
    TextAnalysis.lmSelectIngest(surv, "doc_id", "text", "lang", uni, bi, cuts)
      .withColumnRenamed("selected", "lm_selected")
      .join(surv.select("doc_id", "event_ts"), Seq("doc_id"))
  }

  /** Stage 6 (microbatch): DSIR ingest — the batch's perplexity
    * survivors scored against the HELD model and cutoff via
    * [[Dsir.selectIngest]]. */
  def dsir(feedBatch: DataFrame, scoredBatch: DataFrame,
           model: DataFrame, cut: DataFrame): DataFrame = {
    val surv = feedBatch.join(
      scoredBatch.filter(col("lm_selected")).select("doc_id"), "doc_id")
    Dsir.selectIngest(surv, "doc_id", "text", model, cut)
      .join(surv.select("doc_id", "event_ts"), Seq("doc_id"))
  }

  /** Stage 7 (microbatch, SELF-REFERENCING): the near-dup ingest ledger.
    * The batch = the generation's DSIR survivors; `prior` = the ledger's
    * own accumulated state (the Runner's `this` dep — absent on the
    * first batch). Each batch doc is fingerprinted ONCE
    * ([[Dedup.minhashSignatures]]) and flagged `dup_prior` iff some
    * lexicographically EARLIER (event_ts, doc_id) survivor matches it at
    * est_jaccard ≥ 0.5 — within-batch pairs via the banded self-join
    * ([[Dedup.minhashLshPairs]]), store pairs via the O(batch) probe
    * ([[Dedup.minhashIncremental]]) with the ordering filter applied to
    * the pair DATA, so reprocessing a batch whose rows are already in
    * `this` cannot match a doc against its own prior incarnation. The
    * ledger row persists the signature: it IS the store the next batch
    * probes. */
  def ledger(feedBatch: DataFrame, dsirBatch: DataFrame,
             prior: Option[DataFrame]): DataFrame = {
    val batch = feedBatch.join(
      dsirBatch.filter(col("dsir_keep")).select("doc_id"), "doc_id")
    // fingerprinted ONCE, literally: the batch signatures materialize
    // here (an eager batch-sized job — this fn runs inside a
    // materialization, not a composed query) and feed the within-batch
    // pairs, the store probe, AND the persisted ledger row through the
    // precomputed-signatures seam (r15 review: the first cut shingled
    // and hashed the batch three times)
    val sigs = Dedup.minhashSignatures(batch, "doc_id", "text",
      shingleLen = 5, k = 32).localCheckpoint(true)
    val within = Dedup.minhashLshPairs(batch, "doc_id", "text",
      shingleLen = 5, k = 32, bands = 8, threshold = 0.5,
      precomputedSigs = Some(sigs))
      .select(col("doc_b").as("doc_id")).distinct()
    val fromStore = prior match {
      case None => None
      case Some(st) =>
        val pairs = Dedup.minhashIncremental(batch, "doc_id", "text",
          st.select(col("doc_id").as("doc"), col("sig")), "doc", "sig",
          shingleLen = 5, k = 32, bands = 8, threshold = 0.5,
          precomputedNewSigs = Some(sigs))
        // lexicographic (event_ts, doc_id) ordering on the pair data
        Some(pairs
          .join(batch.select(col("doc_id").as("doc"),
            col("event_ts").as("__ts")), Seq("doc"))
          .join(st.select(col("doc_id").as("corpus_doc"),
            col("event_ts").as("__sts")), Seq("corpus_doc"))
          .filter(col("__sts") < col("__ts") ||
            (col("__sts") === col("__ts") && col("corpus_doc") < col("doc")))
          .select(col("doc").as("doc_id")).distinct())
    }
    val dups = fromStore.map(_.unionByName(within)).getOrElse(within)
      .distinct().withColumn("__dup", lit(true))
    batch.select("doc_id", "event_ts")
      .join(sigs.withColumnRenamed("doc", "doc_id"), Seq("doc_id"))
      .join(dups, Seq("doc_id"), "left")
      .select(col("doc_id"), col("event_ts"), col("sig"),
        coalesce(col("__dup"), lit(false)).as("dup_prior"))
  }

  /** Stage 8 (microbatch): the per-doc audit ledger for the batch —
    * every stage verdict, the first failing stage, final_keep. Stage
    * 5–7 verdicts are NULL where the doc never reached the stage, cast
    * to strings for cross-engine pandas parity (the v6 audit
    * convention). */
  def audit(rulesBatch: DataFrame, scoredBatch: DataFrame,
            dsirBatch: DataFrame, ledgerBatch: DataFrame): DataFrame =
    rulesBatch
      .join(scoredBatch.select("doc_id", "ppl_bucket", "lm_selected"),
        Seq("doc_id"), "left")
      .join(dsirBatch.select("doc_id", "dsir_keep"), Seq("doc_id"), "left")
      .join(ledgerBatch.select("doc_id", "dup_prior"), Seq("doc_id"), "left")
      .withColumn("drop_stage",
        when(!col("lang_ok"), "langid")
          .when(!col("gopher_ok"), "gopher")
          .when(!col("rep_ok"), "repetition")
          .when(!col("block_ok"), "blocklist")
          .when(col("ppl_bucket").isNull || !col("lm_selected"), "perplexity")
          .when(!col("dsir_keep"), "dsir")
          .when(col("dup_prior"), "dedup")
          .otherwise(lit(null).cast(StringType)))
      .withColumn("final_keep", col("drop_stage").isNull)
      .select(col("doc_id"), col("event_ts"), col("lang"), col("lang_ok"),
        col("gopher_ok"), col("rep_ok"), col("block_ok"), col("ppl_bucket"),
        col("dsir_keep").cast(StringType).as("dsir_keep"),
        col("dup_prior").cast(StringType).as("dup_prior"),
        col("drop_stage"), col("final_keep"))

  /** Register the ingest stages as named native-model functions (the
    * [[CurationRecipe.installNatives]] discipline). Dependency MODEL
    * NAMES are the contract the project's ref lines satisfy; `this` is
    * the Runner-provided self-reference. Idempotent. */
  def installNatives(): Unit = {
    import graft.core.NativeRegistry.register
    register("ci_feed") { (_, deps) =>
      feed(deps.values.headOption.getOrElse(
        throw new IllegalArgumentException(
          "ci_feed needs one source dependency (the raw documents)")))
    }
    register("ci_lm_unigrams")((_, deps) => lmUnigrams(deps("feed")))
    register("ci_lm_bigrams")((_, deps) => lmBigrams(deps("feed")))
    register("ci_ppl_cutoffs")((_, deps) =>
      pplCutoffs(deps("feed"), deps("lm_uni"), deps("lm_bi")))
    register("ci_dsir_model")((_, deps) => dsirModel(deps("feed")))
    register("ci_dsir_cutoff")((_, deps) =>
      dsirCutoff(deps("feed"), deps("dsir_model")))
    register("ci_rules")((_, deps) => rules(deps("feed")))
    register("ci_scored")((_, deps) =>
      scored(deps("feed"), deps("rules"),
        deps("lm_uni"), deps("lm_bi"), deps("ppl_cuts")))
    register("ci_dsir")((_, deps) =>
      dsir(deps("feed"), deps("scored"), deps("dsir_model"), deps("dsir_cut")))
    register("ci_ledger")((_, deps) =>
      ledger(deps("feed"), deps("dsir"), deps.get("this")))
    register("ci_audit")((_, deps) =>
      audit(deps("rules"), deps("scored"), deps("dsir"), deps("ledger")))

    // ---- curation_gc natives (r18 — VERDICT r17 task 1): the DEDUP
    // store families under deletion-driven GC, the symmetric completion
    // of examples/retrieval_gc for the LARGEST stores in a real 100 TB
    // curation pipeline. Three deletion disciplines, one per artifact
    // kind: doc-owned store rows (fingerprints / sigs / band_index) →
    // row-level MoR DELETE through the scheduled operation; additive
    // counts (gram_counts) → negated fold (the counting-CRDT law); the
    // order-statistic KMV sketch → REBUILT over survivors every build
    // (non-invertible — a min-k set cannot un-see a deleted doc's
    // hashes). See examples/curation_gc. ----
    register("cgc_fingerprints") { (_, deps) =>
      Dedup.fingerprintStore(deps("feed"), "doc_id", "text")
        .join(deps("feed").select("doc_id", "event_ts"), Seq("doc_id"))
    }
    register("cgc_sigs") { (_, deps) =>
      Dedup.minhashSignatures(deps("feed"), "doc_id", "text",
          shingleLen = 5, k = 32)
        .join(deps("feed").select(col("doc_id").as("doc"), col("event_ts")),
          Seq("doc"))
    }
    // per-batch band slices from the batch's OWN signature rows (the
    // sigs ref is event-time-windowed), so index maintenance is
    // O(batch); the band-bucketed layout (project conf) is what makes
    // doc-keyed copy-on-write GC O(store) — and merge-on-read the
    // production mode (SCALE.md r17, the term-bucket twin)
    register("cgc_band_index") { (_, deps) =>
      Dedup.bandIndex(deps("sigs"), "doc", "sig")
        .join(deps("sigs").select("doc", "event_ts"), Seq("doc"))
    }
    // the HAMMING family's stores (the generalized-fingerprint analog
    // of sigs/band_index): per-batch 60-bit simhashes and their 4×15-bit
    // pigeonhole block index — the store pair every media-fingerprint
    // ingest in this engine probes, here under the same deletion
    // discipline (row-level MoR DELETE through the scheduled operation)
    register("cgc_simhashes") { (_, deps) =>
      Dedup.simhashes(deps("feed"), "doc_id", "text")
        .join(deps("feed").select(col("doc_id").as("doc"), col("event_ts")),
          Seq("doc"))
    }
    register("cgc_simhash_blocks") { (_, deps) =>
      Dedup.hammingBlockIndex(deps("simhash_store"), "doc", "sh",
          nBlocks = 4, blockBits = 15)
        .join(deps("simhash_store").select("doc", "event_ts"), Seq("doc"))
    }
    // additive token-occurrence counts — deliberately NOT distinct (a
    // count artifact, not a df artifact): the GC operation's negative
    // append mirrors this exact law, statement-for-statement
    register("cgc_gram_counts") { (_, deps) =>
      deps("feed").select(col("event_ts"),
          explode(when(trim(col("text")) === "",
              array().cast("array<string>"))
            .otherwise(split(trim(col("text")), "\\s+"))).as("gram"))
        .groupBy("event_ts", "gram").agg(count(lit(1)).as("cnt"))
    }
    // the non-invertibility boundary made executable: the KMV ndv
    // artifact rebuilds over the SURVIVORS the compacted fingerprint
    // store names — O(survivors) per build, the documented cost of
    // order-statistic sketches vs the negated fold's O(deletions)
    register("cgc_kmv") { (_, deps) =>
      CorpusStats.kmvNdvBy(
        deps("feed")
          .join(deps("fingerprints").select("doc_id"), Seq("doc_id"),
            "left_semi")
          .withColumn("corpus", lit("all")),
        "corpus", "text", k = 64)
    }
    // serving over the compacted stores: every 37th document's text
    // re-submitted as a probe — known_exact probes the fingerprint
    // store, the near columns probe band_index + sigs through the
    // library's own from-index ingest op. A deleted document's
    // re-submitted text is UNKNOWN to the store (the gate's forgetting
    // receipt); the whole report must equal a survivor-rebuild oracle.
    register("cgc_dup_report") { (_, deps) =>
      val probes = deps("feed").filter(col("doc_id") % 37 === 0)
        .select(col("doc_id").as("probe_id"), col("text"))
      val pairs = Dedup.minhashIncrementalFromIndex(
        probes, "probe_id", "text",
        deps("band_index").select("band", "doc", "index_bands", "index_k"),
        deps("sigs").select("doc", "sig"), "doc", "sig")
      val near = pairs.filter(col("corpus_doc") =!= col("doc"))
        .groupBy(col("doc").as("probe_id"))
        .agg(count(lit(1)).as("n_near"),
          max(col("est_jaccard")).as("best_jaccard"))
      val hpairs = Dedup.hammingIncrementalFromIndex(
        Dedup.simhashes(probes, "probe_id", "text"), "doc", "sh",
        deps("simhash_blocks")
          .select("block", "doc", "index_blocks", "index_bits"),
        deps("simhash_store").select("doc", "sh"), "doc", "sh",
        maxHamming = 6, nBlocks = 4, blockBits = 15)
      val ham = hpairs.filter(col("store_doc") =!= col("doc"))
        .groupBy(col("doc").as("probe_id"))
        .agg(count(lit(1)).as("n_hamming"))
      probes.withColumn("h", md5(col("text")))
        .join(deps("fingerprints").select("h").distinct()
          .withColumn("__known", lit(true)), Seq("h"), "left")
        .select(col("probe_id"),
          coalesce(col("__known"), lit(false)).as("known_exact"))
        .join(near, Seq("probe_id"), "left")
        .join(ham, Seq("probe_id"), "left")
        .select(col("probe_id"), col("known_exact"),
          coalesce(col("n_near"), lit(0L)).as("n_near"),
          coalesce(col("best_jaccard"), lit(0.0)).as("best_jaccard"),
          coalesce(col("n_hamming"), lit(0L)).as("n_hamming"))
    }
  }
}
