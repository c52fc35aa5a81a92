package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, language ID, quality scoring, fingerprinting.
  *
  * Everything is Catalyst built-ins (split/transform/filter/aggregate),
  * so the whole suite runs inside whole-stage codegen with no UDFs and
  * scales embarrassingly parallel — per-row work, no shuffles until an
  * explicit aggregation/join downstream.
  */
object TextAnalysis {

  /** Whitespace tokens of trimmed text (empty text → empty array). */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast(ArrayType(StringType)))
      .otherwise(split(trim(text), "\\s+"))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Word pre-tokenizer for subword counting: letter runs, single digits,
    * and single other non-space characters. */
  val BpePattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"

  /** Retained regex proxy (one token per pre-token word) — the cheap
    * lower bound; superseded by the real [[bpeTokenCount]] for budgets. */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpePattern), lit(0)))

  /** Default BPE merge table, rank-ordered (dependencies resolve upward:
    * a rule may reference tokens earlier rules created). Hand-curated
    * from common English character pairs — the table's QUALITY is not
    * the operator contract; its deterministic, declarable, cross-engine-
    * replayable application is. A project swaps in trained merges via
    * the `merges` parameter of [[bpeTokenCount]]. */
  val DefaultBpeMerges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "e" -> "r", "a" -> "n",
    "r" -> "e", "o" -> "n", "a" -> "t", "e" -> "n", "o" -> "r",
    "e" -> "s", "s" -> "t", "a" -> "r", "o" -> "u", "an" -> "d",
    "in" -> "g", "a" -> "l", "i" -> "t", "o" -> "f", "e" -> "d",
    "i" -> "s", "i" -> "on", "en" -> "t", "t" -> "o", "c" -> "o",
    "co" -> "m", "l" -> "e", "a" -> "s", "h" -> "a", "w" -> "h",
    "u" -> "r", "m" -> "a", "l" -> "l", "o" -> "w", "c" -> "h",
    "l" -> "y", "s" -> "e", "d" -> "e", "p" -> "a", "e" -> "x",
    "q" -> "u", "qu" -> "e", "u" -> "s", "f" -> "or", "er" -> "s",
    "th" -> "at", "s" -> "h", "w" -> "i")

  /** REAL byte-pair-encoding token count (r9): rank-ordered merge
    * application over the word pre-tokens, as one codegen expression
    * with the merge table as a plan constant. Deterministic and
    * oracle-replayable — see BpeTokenCount's scaladoc for the algorithm
    * and the rank-order ≡ priority-queue argument. */
  def bpeTokenCount(text: Column,
                    merges: Seq[(String, String)] = DefaultBpeMerges): Column =
    graft.expressions.VectorExpressions.bpeTokenCount(text, merges)

  /** Apply ONE merge rule (l, r) → l+r to a symbol-array column as a
    * single left-to-right non-overlapping sweep — the same law
    * [[bpeTokenCount]]'s codegen expression applies per rank (a run
    * `llll` under (l,l) becomes [ll, ll], never [ll, l, l] or a
    * re-merged [llll]). Pure fold, no UDF: the accumulator's last
    * symbol merges with the current one iff the pair matches; the
    * size-0 guard is a SEQUENTIAL CaseWhen branch, so the negative
    * element_at never evaluates under ANSI. */
  private[graft] def applyBpeMerge(syms: Column, l: String, r: String): Column =
    aggregate(syms, array().cast(ArrayType(StringType)), (acc, x) =>
      when(size(acc) === 0, array(x))
        .when(element_at(acc, -1) === lit(l) && x === lit(r),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(x))))

  /** TRAIN a byte-pair-encoding merge table from the corpus (Sennrich
    * et al. 2016, "Neural Machine Translation of Rare Words with
    * Subword Units" — public): iteratively count adjacent symbol pairs
    * over the word-frequency table and merge the most frequent, ties to
    * the lexicographically smaller (lhs, rhs). Every adjacent POSITION
    * counts (overlapping runs included), the standard trainer
    * convention. Returns `(merge_rank, lhs, rhs, pair_freq)` —
    * `nMerges` rows, fewer if the pair space exhausts first. The result
    * feeds [[bpeTokenCount]] directly (collect lhs/rhs in rank order).
    *
    * Scale shape: training runs over the DISTINCT-WORD frequency table
    * (Zipf-small: the 100 TB corpus's word explode collapses map-side
    * into a vocabulary-sized frame), never the corpus text — one
    * corpus-sized tokenize+count up front, then `nMerges` iterations of
    * (pair-count, 1-row argmax collect, fold-apply) over the vocab
    * frame, each localCheckpointed to keep the plan flat. The
    * driver-held loop is the [[graft.ops.Ivf.train]] / Lloyd-iteration
    * pattern: per-iteration state (the argmax) is one row, the heavy
    * lifting stays distributed. */
  def bpeTrainMerges(df: org.apache.spark.sql.DataFrame, textCol: String,
                     nMerges: Int): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // pin each round's vocab as a cached RDD and rebuild the frame from
    // it (the connectedComponents `sever` pattern): keeps every round's
    // plan flat AND releasable — Dataset.unpersist on a
    // localCheckpoint(true) frame does NOT free its block-manager
    // storage (uncacheQuery never tracks RDD-level checkpoint
    // persistence; verified empirically on Spark 4.1.2 in the r16
    // review), so the old checkpoint-per-round form silently pinned
    // nMerges+1 vocab copies until GC
    def pin(d: org.apache.spark.sql.DataFrame)
        : (org.apache.spark.sql.DataFrame, org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]) = {
      val r = d.rdd.cache()
      (spark.createDataFrame(r, d.schema), r)
    }
    // word-frequency table; words split into single-codepoint symbols
    // ((?<=.) splits between chars and drops no content; BMP contract —
    // the same one the oracle's regex char-wrap rides)
    var (vocab, vocabRdd) = pin(df.select(
        explode(regexp_extract_all(col(textCol), lit(BpePattern), lit(0)))
          .as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      // Spark's split passes limit -1, which KEEPS the trailing empty
      // string "(?<=.)" produces after the last char — strip it, or a
      // phantom '' symbol pollutes every word's final pair
      .select(filter(split(col("word"), "(?<=.)"), _ =!= "").as("syms"),
        col("freq")))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 1
    var exhausted = false
    while (rank <= nMerges && !exhausted) {
      // adjacent pairs at every position, weighted by word frequency
      val best = vocab
        .select(col("freq"), explode(arrays_zip(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1))).as("p"))
        .groupBy(col("p.0").as("lhs"), col("p.1").as("rhs"))
        .agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("lhs"), col("rhs"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, c) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((rank, l, r, c))
        val (v2, v2Rdd) = pin(vocab.select(
          applyBpeMerge(col("syms"), l, r).as("syms"), col("freq")))
        // materialize the new cache BEFORE releasing its parent — an
        // empty v2 cache with an unpersisted parent would refill by
        // recomputing the whole round chain from the corpus
        v2Rdd.count()
        vocabRdd.unpersist() // RDD-level: actually releases the blocks
        vocab = v2; vocabRdd = v2Rdd
        rank += 1
      }
    }
    vocabRdd.unpersist() // merges are driver-held; the frame is not returned
    merges.toSeq.toDF("merge_rank", "lhs", "rhs", "pair_freq")
  }

  /** C4-style markup stripping (r9): crawled text arrives with residual
    * HTML — tags removed, the common entities decoded, whitespace
    * squeezed (Raffel et al. 2020 §2.2's cleanup family). Both steps are
    * plain regex/replace chains portable to the oracle; tag counting
    * rides the same pattern so a pipeline can FILTER on markup density
    * as well as clean it. */
  val TagPattern = "<[^>]*>"

  def markupTagCount(text: Column): Column =
    size(regexp_extract_all(text, lit(TagPattern), lit(0)))

  def stripMarkup(text: Column): Column = {
    val noTags = regexp_replace(text, lit(TagPattern), lit(" "))
    val decoded = Seq(
      "&amp;" -> "&", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&nbsp;" -> " ")
      .foldLeft(noTags) { case (c, (ent, ch)) => replace(c, lit(ent), lit(ch)) }
    trim(regexp_replace(decoded, lit("\\s+"), lit(" ")))
  }

  /** Unicode canonicalization (r10): NFC composition + control/no-break
    * characters to spaces + space-run collapse + trim, fused into one
    * codegen pass per row (NormalizeText expression — see its scaladoc
    * for the cross-engine NFC contract). Runs FIRST in a curation chain:
    * hashing decomposed and precomposed spellings of the same text as
    * two distinct documents silently defeats every downstream dedup. */
  def normalizeText(text: Column): Column =
    org.apache.spark.sql.graft.VectorExpressions.normalizeText(text)

  /** C4-style word-blocklist content filter (r10): count tokens whose
    * lowercased form appears in a blocklist and keep documents with
    * zero hits — the "contains any word on the list → drop the page"
    * rule of Raffel et al. 2020 §2.2 (their list is external; the
    * operator contract is the match machinery, so the list arrives as a
    * one-column DataFrame). Companion of [[PiiRedact.urlProfile]]'s
    * domain blocklist, at the token level.
    *
    * Scale shape: one token explode keyed by doc + an equi-join against
    * the blocklist relation — joined as DATA, not a plan literal
    * (production lists run to thousands of terms and get updated
    * without recompiling), small enough that Spark broadcasts it; a
    * doc-keyed partial-agg count, and clean docs report 0 explicitly
    * via the left join back (no silent absence). */
  def wordBlocklist(df: DataFrame, idCol: String, textCol: String,
                    blocklist: DataFrame, wordCol: String): DataFrame = {
    val toksX = df.select(col(idCol), explode(tokens(col(textCol))).as("tok"))
    val words = blocklist.select(lower(col(wordCol)).as("__w")).distinct()
    val hits = toksX.join(words, lower(col("tok")) === col("__w"))
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_blocked"))
    df.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_blocked"), lit(0L)).as("n_blocked"))
      .withColumn("blocklist_keep", col("n_blocked") === 0)
  }

  /** Stopword tables for the n-gram/stopword language-ID heuristic.
    * Tiny on purpose: the operator contract is the scoring machinery,
    * not lexicon quality. */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "für"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "una", "es", "por"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"),
    "zh" -> Seq("的", "是", "不", "了", "在", "人", "有", "我", "他", "这"))

  /** Per-language stopword hit count over the token array — the HOF
    * reference form; [[stopwordScore]] is the fused production path
    * (parity-spec-pinned against this). */
  def langScore(toks: Column, lang: String): Column = {
    val set = stopwords.toMap.apply(lang)
    size(filter(toks, t => t.isInCollection(set)))
  }

  /** Fused per-language hit count: one tokenize+probe pass computes every
    * language's score (StopwordScores expression); this selects one. */
  def stopwordScore(text: Column, lang: String): Column = {
    val idx = stopwords.indexWhere(_._1 == lang)
    require(idx >= 0, s"unknown language $lang")
    element_at(
      org.apache.spark.sql.graft.VectorExpressions.stopwordScores(text), idx + 1)
  }

  /** Predicted language = argmax of stopword hits, ties resolved by the
    * declared language order; zero hits → 'und' (undetermined). One fused
    * pass (LanguageIdExpr) — the composed when-chain over 5 HOF filters
    * evaluated the interpreted lambdas 11× per row. */
  def languageId(text: Column): Column =
    // null text → 'und', matching the composed when-chain's fall-through
    // (the fused UnaryExpression is null-intolerant by default)
    coalesce(org.apache.spark.sql.graft.VectorExpressions.languageId(text), lit("und"))

  /** The composed reference form of [[languageId]], retained for the
    * parity spec. */
  private[graft] def languageIdComposed(text: Column): Column = {
    val toks = tokens(text)
    val scores = stopwords.map { case (lang, _) => lang -> langScore(toks, lang) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val pick = scores.reverse.foldLeft(lit("und")) { case (acc, (lang, sc)) =>
      when(sc === best && best > 0, lit(lang)).otherwise(acc)
    }
    pick
  }

  /** Quality-score feature bundle (length / punctuation ratio / stopword
    * ratio / mean token length) + a composite in [0,1]. Formula mirrored
    * exactly in the DuckDB oracle — the contract is determinism, the
    * weights are illustrative.
    *
    * All raw counts come from ONE fused TextStats pass (chars, tokens,
    * punct codepoints, stopword hits) instead of a per-row
    * regexp_replace + tokenize + stopword probe; within a projection,
    * whole-stage codegen's subexpression elimination evaluates the
    * struct once. QualityParity in MinhashParitySpec pins equality with
    * the composed form. */
  def qualityFeatures(text: Column): Seq[(String, Column)] = {
    val f = org.apache.spark.sql.graft.VectorExpressions.textStats(text)
    val n = f.getField("n_chars")
    val nTok = f.getField("n_tokens")
    val punct = f.getField("punct")
    val stopHits = f.getField("stop_hits")
    Seq(
      "n_chars" -> n,
      "n_tokens" -> nTok,
      "punct_ratio" -> when(n > 0, punct / n).otherwise(lit(0.0)),
      "stopword_ratio" -> when(nTok > 0, stopHits / nTok).otherwise(lit(0.0)),
      "mean_token_len" -> when(nTok > 0, (n - (nTok - 1)) / nTok).otherwise(lit(0.0)))
  }

  /** The composed reference form of [[qualityFeatures]] (regexp + HOF),
    * retained for the parity spec. */
  private[graft] def qualityFeaturesComposed(text: Column): Seq[(String, Column)] = {
    val n = length(text).cast(DoubleType)
    val toks = tokens(text)
    val nTok = size(toks).cast(DoubleType)
    val punct = (n - length(regexp_replace(text, "[^A-Za-z0-9\\s]", ""))).cast(DoubleType)
    val stopHits = langScore(toks, "en").cast(DoubleType)
    Seq(
      "n_chars" -> n,
      "n_tokens" -> nTok,
      "punct_ratio" -> when(n > 0, punct / n).otherwise(lit(0.0)),
      "stopword_ratio" -> when(nTok > 0, stopHits / nTok).otherwise(lit(0.0)),
      "mean_token_len" -> when(nTok > 0, (n - (nTok - 1)) / nTok).otherwise(lit(0.0)))
  }

  def qualityScore(text: Column): Column = {
    val f = qualityFeatures(text).toMap
    val lenScore = least(f("n_chars") / 500.0, lit(1.0))
    val punctPenalty = greatest(lit(0.0), lit(1.0) - f("punct_ratio") * 5.0)
    val stopScore = least(f("stopword_ratio") * 4.0, lit(1.0))
    round((lenScore * 0.4 + punctPenalty * 0.3 + stopScore * 0.3), 6)
  }

  /** CCNet-style language-model quality scoring, degraded to a unigram
    * model (Wenzek et al. 2020 "CCNet" filters by LM perplexity; the
    * unigram mean negative log-probability is the same signal computable
    * as two relational passes, no model artifact). Returns per-document
    * (id, n_tokens, avg_logprob) where avg_logprob = Σ ln p(tok) / n;
    * LOWER (more negative) = rarer tokens = more surprising text. The
    * probability table is the corpus's own unigram distribution, so every
    * token is seen and no smoothing constant enters the contract.
    *
    * Scale shape: one explode + token-keyed count (the vocabulary —
    * partial-agg, Zipf-bounded), a shuffle join of token rows against it,
    * and a doc-keyed mean. The vocabulary is NOT assumed broadcastable:
    * at web scale it runs to billions of types; the join keys on the
    * token so hot words spread by the explode's even partitioning. */
  def unigramLogProb(df: org.apache.spark.sql.DataFrame, idCol: String,
                     textCol: String): org.apache.spark.sql.DataFrame = {
    val tokRows = df.select(col(idCol),
      explode(tokens(col(textCol))).as("tok"))
    // corpus token mass = Σ tf over the vocabulary, riding a 1-row
    // broadcast so the op composes as one lazy plan. HONEST COST: Spark
    // does not CSE across branches, so a single action evaluates the
    // tokenize+explode THREE times (total, vocab, probe) — at gate scale
    // that is cheaper than materializing anything, and a 100 TB caller
    // should persist the (Zipf-small) vocabulary branch and reuse it
    // across the whole curation run rather than per query
    val vocab0 = tokRows.groupBy("tok").agg(count(lit(1)).as("tf"))
    val totalDf = vocab0.agg(sum("tf").cast(DoubleType).as("__total"))
    val vocab = vocab0.crossJoin(broadcast(totalDf))
    val scored = tokRows.join(vocab, "tok")
      .groupBy(col(idCol)).agg(
        count(lit(1)).cast(LongType).as("n_tokens"),
        sum(log(col("tf").cast(DoubleType) / col("__total"))).as("sum_lp"))
    df.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        round(when(col("n_tokens") > 0, col("sum_lp") / col("n_tokens"))
          .otherwise(lit(0.0)), 6).as("avg_logprob"))
  }

  /** Interpolated BIGRAM language-model scoring (r10): the next step
    * from [[unigramLogProb]] toward CCNet's n-gram-LM perplexity filter
    * (Wenzek et al. 2020 use a 5-gram KenLM; Jelinek-Mercer
    * interpolation with the unigram model is the standard relational
    * analog — Chen & Goodman 1999, public). Per bigram position:
    * ln(λ·P(w2|w1) + (1−λ)·P(w2)) with MLE P(w2|w1) = c(w1 w2)/c(w1·)
    * over the corpus's own bigram table (the unigram interpolant keeps
    * every in-corpus bigram finite without a smoothing constant).
    * Returns (id, n_bigrams, avg_logprob2); lower = more surprising.
    *
    * Scale shape (r12 hardening — the r11 verdict's first skew
    * candidate): the bigram explode runs twice (type counts + probe),
    * never three times; prefix counts c(w1·) FOLD from the bigram type
    * table (sum of c2 over w1 — types-sized input, no corpus re-explode);
    * the per-type interpolated logprob is computed once per TYPE in a
    * folded model table; and the position-sized probe joins it ONCE on
    * the composite (w1, w2) key — the bare Zipf-skewed `w1` join is gone
    * from the corpus-sized path entirely (a hot prefix like "the"
    * spreads across its w2 continuations; a single globally-hot TYPE is
    * AQE skew-join territory, probed with a planted 20%-one-word corpus
    * in ScaleProbe). Count tables stay shuffle-joined, never assumed
    * broadcastable: web-scale bigram vocabularies run to 10¹⁰ types.
    * Same honest-cost note as unigramLogProb: persist the model table
    * across a curation run at 100 TB. */
  def bigramLogProb(df: DataFrame, idCol: String, textCol: String,
                    lambda: Double = 0.7): DataFrame = {
    val bigRows = df.select(col(idCol),
        explode(org.apache.spark.sql.graft.VectorExpressions
          .wordShingles(col(textCol), 2, distinct = false)).as("bg"))
      .select(col(idCol),
        substring_index(col("bg"), " ", 1).as("w1"),
        substring_index(col("bg"), " ", -1).as("w2"))
    val cb = bigRows.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val cp = cb.groupBy("w1").agg(sum("c2").as("c1"))
    val uni0 = df.select(explode(tokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("tf"))
    val totalDf = uni0.agg(sum("tf").cast(DoubleType).as("__total"))
    val uni = uni0.crossJoin(broadcast(totalDf))
    val model = cb
      .join(cp, Seq("w1"))
      .join(uni.withColumnRenamed("tok", "w2"), Seq("w2"))
      .select(col("w1"), col("w2"),
        log(
          lit(lambda) * col("c2").cast(DoubleType) / col("c1") +
            lit(1.0 - lambda) * col("tf").cast(DoubleType) / col("__total"))
          .as("__lp"))
    val scored = bigRows
      .join(model, Seq("w1", "w2"))
      .groupBy(col(idCol)).agg(
        count(lit(1)).cast(LongType).as("n_bigrams"),
        sum(col("__lp")).as("sum_lp"))
    df.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        round(when(col("n_bigrams") > 0, col("sum_lp") / col("n_bigrams"))
          .otherwise(lit(0.0)), 6).as("avg_logprob2"))
  }

  /** Build declarable (unigram, bigram) log-probability tables from a
    * training corpus — the model-as-DATA form of [[bigramLogProb]]'s
    * internal counts (the BPE-merges pattern: a trained artifact is a
    * table the pipeline declares, not code). Returns
    * `(unigrams(tok, lp), bigrams(w1, w2, lp2))` with `lp = ln(tf/total)`
    * and `lp2 = ln(c(w1 w2)/c(w1·))` — the ARPA-style MLE logprobs.
    * Persist both at 100 TB: they are Zipf-bounded and reused across the
    * whole curation run. */
  def lmTables(train: DataFrame, textCol: String): (DataFrame, DataFrame) = {
    val uni0 = train.select(explode(tokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("tf"))
    val totalDf = uni0.agg(sum("tf").cast(DoubleType).as("__total"))
    val unigrams = uni0.crossJoin(broadcast(totalDf))
      .select(col("tok"), log(col("tf").cast(DoubleType) / col("__total")).as("lp"))
    val bigRows = train.select(
        explode(org.apache.spark.sql.graft.VectorExpressions
          .wordShingles(col(textCol), 2, distinct = false)).as("bg"))
      .select(substring_index(col("bg"), " ", 1).as("w1"),
        substring_index(col("bg"), " ", -1).as("w2"))
    val cb = bigRows.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    // prefix counts fold from the TYPE table (bigramLogProb's r12
    // discipline): a second groupBy over bigRows would re-run the
    // corpus-sized explode — Spark does no CSE across branches
    val cp = cb.groupBy("w1").agg(sum("c2").as("c1"))
    val bigrams = cb.join(cp, "w1")
      .select(col("w1"), col("w2"),
        log(col("c2").cast(DoubleType) / col("c1")).as("lp2"))
    (unigrams, bigrams)
  }

  /** Resolve a held LM artifact's declared join strategy (r14):
    * "broadcast" hints it outright, "shuffle" leaves the keyed join,
    * "auto" broadcasts iff the optimizer's size estimate fits the
    * declared threshold (plan-time only — no job; an unstatted derived
    * frame estimates large and takes the safe shuffle path). */
  private def lmStrategized(artifact: DataFrame, strategy: String,
                            thresholdBytes: Long): DataFrame =
    strategy match {
      case "broadcast" => broadcast(artifact)
      case "shuffle"   => artifact
      case "auto" =>
        val est = artifact.queryExecution.optimizedPlan.stats.sizeInBytes
        if (est <= BigInt(thresholdBytes)) broadcast(artifact) else artifact
      case other => throw new IllegalArgumentException(
        s"LM artifact join strategy must be auto|broadcast|shuffle: $other")
    }

  /** Score documents against an EXTERNAL (held) language model declared
    * as data: `unigrams(tok, lp)` + `bigrams(w1, w2, lp2)` logprob tables
    * (from [[lmTables]] or any ARPA-style artifact loaded as parquet).
    * Per bigram position: ln(λ·exp(lp2) + (1−λ)·exp(lp)), with an unseen
    * bigram contributing 0 to the λ term and an unseen (OOV) unigram
    * flooring at exp(`oovLogProb`) — held-out scoring must stay finite on
    * vocabulary the model never saw. When the tables ARE the scoring
    * corpus's own counts this reduces to [[bigramLogProb]] (spec-pinned
    * to 1e-6, the output rounding grain).
    *
    * Join-regime DECLARATION (r14, VERDICT task 6 — previously folk
    * knowledge at the call site): `strategy` picks how the LM tables
    * meet the batch's bigram rows. "shuffle" keys the joins on
    * (w1,w2)/w2 — the bigramLogProb discipline, correct at any vocab
    * size (an external LM can run to 10¹⁰ bigram types). "broadcast"
    * ships the tables to every executor — when a trained artifact fits
    * executor memory, ONLY the batch rows ever shuffle (SCALE.md pins a
    * 939× shuffle collapse on the probe leg, and the ~16M-row-vocab
    * cliff where broadcast build time kills it). "auto" (default)
    * decides from the tables' optimizer size estimate against
    * `broadcastThresholdBytes` — persisted artifacts carry real file
    * sizes, derived frames without stats estimate large and safely take
    * the shuffle path. */
  def externalLmLogProb(df: DataFrame, idCol: String, textCol: String,
                        unigrams: DataFrame, bigrams: DataFrame,
                        lambda: Double = 0.7,
                        oovLogProb: Double = -20.0,
                        strategy: String = "auto",
                        broadcastThresholdBytes: Long = 64L << 20): DataFrame = {
    val bigRows = df.select(col(idCol),
        explode(org.apache.spark.sql.graft.VectorExpressions
          .wordShingles(col(textCol), 2, distinct = false)).as("bg"))
      .select(col(idCol),
        substring_index(col("bg"), " ", 1).as("w1"),
        substring_index(col("bg"), " ", -1).as("w2"))
    val scored = bigRows
      .join(lmStrategized(bigrams.select(col("w1"), col("w2"), col("lp2")),
        strategy, broadcastThresholdBytes), Seq("w1", "w2"), "left")
      .join(lmStrategized(unigrams.select(col("tok").as("w2"), col("lp")),
        strategy, broadcastThresholdBytes), Seq("w2"), "left")
      .groupBy(col(idCol)).agg(
        count(lit(1)).cast(LongType).as("n_bigrams"),
        sum(log(
          lit(lambda) * coalesce(exp(col("lp2")), lit(0.0)) +
            lit(1.0 - lambda) * coalesce(exp(col("lp")), exp(lit(oovLogProb)))))
          .as("sum_lp"))
    df.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        round(when(col("n_bigrams") > 0, col("sum_lp") / col("n_bigrams"))
          .otherwise(lit(0.0)), 6).as("avg_logprob_lm"))
  }

  /** Gopher document-quality rule battery (Rae et al. 2021 Table A1 —
    * public): the structural filters that complement [[qualityScore]]'s
    * continuous signal — word-count bounds, mean word length bounds,
    * hash and ellipsis symbol-to-word ratios (tested SEPARATELY, the
    * paper's "either" wording; ellipsis counts both `...` and `…`),
    * bullet-started (> 90% drops) and ellipsis-ended (> 30% drops) line
    * fractions, alphabetic-word fraction, and minimum distinct
    * stop-word types. Emits every feature, one boolean per rule family
    * folded into `gopher_keep`. Thresholds default to the paper's
    * values and are declarable per corpus.
    *
    * Scale shape: pure per-row work over MATERIALIZED token/line arrays
    * (the interpreted-HOF rule — tokenize/split once, then the lambdas
    * walk attributes), zero shuffles; embarrassingly parallel. */
  def gopherQualityFlags(df: DataFrame, idCol: String, textCol: String,
                         minWords: Int = 50, maxWords: Int = 100000,
                         minMeanWordLen: Double = 3.0,
                         maxMeanWordLen: Double = 10.0,
                         maxSymbolRatio: Double = 0.1,
                         maxBulletFrac: Double = 0.9,
                         maxEllipsisFrac: Double = 0.3,
                         minAlphaFrac: Double = 0.8,
                         minStopTypes: Int = 2): DataFrame = {
    val stopSet = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val base = df.select(col(idCol),
      coalesce(col(textCol), lit("")).as("__t"))
      .withColumn("__tk", tokens(col("__t")))
      .withColumn("__lines", split(col("__t"), "\n"))
    val nW = size(col("__tk"))
    val nL = size(col("__lines"))
    def occurrences(of: String): Column =
      (length(col("__t")) - length(replace(col("__t"), lit(of), lit("")))) / lit(of.length)
    val feats = base.select(col(idCol),
      nW.cast(LongType).as("n_words"),
      round(when(nW > 0,
        aggregate(col("__tk"), lit(0L), (acc, x) => acc + length(x))
          .cast(DoubleType) / nW).otherwise(lit(0.0)), 6).as("mean_word_len"),
      round(when(nW > 0,
        occurrences("#").cast(DoubleType) / nW)
        .otherwise(lit(0.0)), 6).as("hash_ratio"),
      round(when(nW > 0,
        (occurrences("...") + occurrences("…")).cast(DoubleType) / nW)
        .otherwise(lit(0.0)), 6).as("ellipsis_ratio"),
      round(when(nL > 0,
        size(filter(col("__lines"), l => trim(l).rlike("^[-*•]")))
          .cast(DoubleType) / nL).otherwise(lit(0.0)), 6).as("bullet_frac"),
      round(when(nL > 0,
        size(filter(col("__lines"), l => trim(l).rlike("(\\.\\.\\.|…)$")))
          .cast(DoubleType) / nL).otherwise(lit(0.0)), 6).as("ellipsis_frac"),
      round(when(nW > 0,
        size(filter(col("__tk"), x => x.rlike("[A-Za-z]")))
          .cast(DoubleType) / nW).otherwise(lit(0.0)), 6).as("alpha_frac"),
      size(array_intersect(
        array_distinct(transform(col("__tk"), x => lower(x))),
        array(stopSet.map(lit): _*))).cast(LongType).as("n_stop_types"))
    feats.withColumn("gopher_keep",
      col("n_words") >= minWords && col("n_words") <= maxWords &&
        col("mean_word_len") >= minMeanWordLen &&
        col("mean_word_len") <= maxMeanWordLen &&
        col("hash_ratio") <= maxSymbolRatio &&
        col("ellipsis_ratio") <= maxSymbolRatio &&
        col("bullet_frac") <= maxBulletFrac &&
        col("ellipsis_frac") <= maxEllipsisFrac &&
        col("alpha_frac") >= minAlphaFrac &&
        col("n_stop_types") >= minStopTypes)
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020 §4.4): split
    * LM-scored documents into head / middle / tail quality terciles PER
    * GROUP (CCNet buckets per language — multilingual corpora have
    * incomparable perplexity scales). Input is any scored frame (e.g.
    * [[externalLmLogProb]] output); `lpCol` is the per-token mean
    * log-probability, so head = highest lp = lowest perplexity. Adds
    * `perplexity` (= exp(−lp), the word-level perplexity) and
    * `ppl_bucket`.
    *
    * Cutoffs are VALUE-BASED rank order statistics, not per-doc ntiles:
    * the value at rank ⌈n·f⌉ of the group's lp sorted descending. Docs
    * tied at a cutoff value all take the better bucket — equal scores
    * always land in equal buckets, which a rank-ntile would not
    * guarantee — and no quantile interpolation arithmetic enters the
    * contract (engine-portable, like CorpusStats' order statistics).
    *
    * Scale shape: the exact (`approx = false`, opt-in as of r14) cutoff
    * derivation ranks
    * within each group — bounded by the largest language, which at web
    * scale is NOT a bound (English is most of a web corpus: one
    * partition sorts most of the data). The DEFAULT swaps the rank
    * window for a per-group `percentile_approx` aggregate — one
    * map-side-combining pass, no per-group sort, no single hot
    * partition — and keeps the assignment unchanged. The quantile maps
    * exactly onto the rank convention (value at descending rank ⌈n·f⌉ ≡
    * −percentile_approx(−lp, f), which at ascending rank ⌈f·n⌉ of the
    * negated scores is the same element — no off-by-one at integer n·f),
    * so with `accuracy` ≥ 2× the largest group the approx path is
    * bit-identical to the exact one (ApproxCutoffSpec pins it; ±n/accuracy
    * ranks beyond); at 100 TB dial accuracy
    * to the t-digest-style memory/error trade. Assignment itself is a
    * broadcast join of the per-group cutoff table (rows = |groups| × 2)
    * against the scored frame — per-row, window-free, embarrassingly
    * parallel on the corpus-sized path.
    *
    * Rows with a NULL group (language ID failed) or a NULL score (no
    * scoreable tokens) carry no rank signal: both pass through with a
    * NULL `ppl_bucket` (and NULL perplexity for NULL lp) instead of
    * shifting the cutoff ranks — a NULL lp landing ON a cutoff rank
    * would null both cutoffs and silently bucket the whole group as
    * 'tail'. */
  def perplexityBuckets(scored: DataFrame, idCol: String, groupCol: String,
                        lpCol: String,
                        headFraction: Double = 1.0 / 3.0,
                        middleFraction: Double = 2.0 / 3.0,
                        approx: Boolean = true,
                        accuracy: Int = 1000000): DataFrame = {
    // the scored frame feeds BOTH the per-group cutoff aggregate and the
    // bucket assignment; Spark dedupes no shared subplans, so an
    // unsevered scorer lineage (the external-LM join pipeline in every
    // ppl gate) executed twice per action (r18 opt, measured 3× wall on
    // q_curation_pipeline_v5 at sf0.1 once severed — guide §1.2).
    // Streaming inputs pass through (per-batch scorer, no checkpoint).
    // Severing mode (incl. the cluster-safe persist fallback and the
    // eager-execution caveat): graft.ops.Sever.
    val sev = Sever.sever(scored)
    assignPplBuckets(sev, groupCol, lpCol,
      perplexityCutoffs(sev, groupCol, lpCol, headFraction, middleFraction,
        approx, accuracy))
  }

  /** The per-group cutoff table (group, cut_head, cut_middle) as a
    * PERSISTABLE artifact (r13): derive it once from a reference corpus
    * and [[assignPplBuckets]] any later batch against it — the
    * incremental-selection shape where a nightly ingest never re-ranks
    * the historical corpus. Same value-at-rank semantics as
    * [[perplexityBuckets]] (which is literally cutoffs + assignment);
    * `approx` swaps the per-group rank window for percentile_approx
    * exactly as documented there. NULL group / NULL score rows carry no
    * rank signal and are excluded here (they pass through assignment
    * with a NULL bucket). */
  def perplexityCutoffs(scored: DataFrame, groupCol: String, lpCol: String,
                        headFraction: Double = 1.0 / 3.0,
                        middleFraction: Double = 2.0 / 3.0,
                        approx: Boolean = true,
                        accuracy: Int = 1000000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grouped = scored.filter(col(groupCol).isNotNull && col(lpCol).isNotNull)
    if (approx) {
      // value at DESCENDING rank ⌈n·f⌉ = −(value at ascending rank
      // ⌈f·n⌉ of the negated scores) = −percentile_approx(−lp, f)
      grouped.groupBy(col(groupCol)).agg(
        (-percentile_approx(-col(lpCol), lit(headFraction), lit(accuracy)))
          .as("cut_head"),
        (-percentile_approx(-col(lpCol), lit(middleFraction), lit(accuracy)))
          .as("cut_middle"))
    } else {
      val sizes = grouped.groupBy(col(groupCol)).agg(count(lit(1)).as("n_docs"))
      val ranked = grouped.select(col(groupCol), col(lpCol))
        .withColumn("rn", row_number()
          .over(Window.partitionBy(col(groupCol)).orderBy(col(lpCol).desc)))
        .join(sizes, Seq(groupCol))
      ranked
        .filter(col("rn") === ceil(col("n_docs") * lit(headFraction)).cast(LongType))
        .select(col(groupCol), col(lpCol).as("cut_head"))
        .join(ranked
          .filter(col("rn") === ceil(col("n_docs") * lit(middleFraction)).cast(LongType))
          .select(col(groupCol), col(lpCol).as("cut_middle")), Seq(groupCol))
    }
  }

  /** Bucket assignment against a held cutoff table ([[perplexityCutoffs]]
    * output, possibly read back from a persisted artifact): adds
    * `perplexity` and `ppl_bucket` to every input row. Per-row,
    * window-free, one broadcast left join — the corpus/batch-sized path
    * is embarrassingly parallel at any scale. Rows with a NULL group, a
    * NULL score, or a group ABSENT from the cutoff table (a language the
    * reference corpus never saw) take a NULL bucket instead of silently
    * vanishing into an inner join. */
  def assignPplBuckets(scored: DataFrame, groupCol: String, lpCol: String,
                       cutoffs: DataFrame): DataFrame = {
    val grouped = scored.filter(col(groupCol).isNotNull && col(lpCol).isNotNull)
    val bucketed = grouped
      .join(broadcast(cutoffs), Seq(groupCol), "left")
      .withColumn("perplexity", round(exp(-col(lpCol)), 6))
      .withColumn("ppl_bucket",
        when(col("cut_head").isNull, lit(null).cast(StringType))
          .when(col(lpCol) >= col("cut_head"), "head")
          .when(col(lpCol) >= col("cut_middle"), "middle")
          .otherwise("tail"))
      .drop("cut_head", "cut_middle")
    bucketed.unionByName(
      scored.filter(col(groupCol).isNull || col(lpCol).isNull)
        .withColumn("perplexity", round(exp(-col(lpCol)), 6))
        .withColumn("ppl_bucket", lit(null).cast(StringType)))
  }

  /** INCREMENTAL LM-quality selection ingest (r13 — VERDICT task 4):
    * score a new batch against HELD artifacts — the [[lmTables]] logprob
    * tables and a [[perplexityCutoffs]] table, both persisted once per
    * curation run — and flag the keepers, touching ONLY the batch. The
    * incremental analog of the batch LM-score → bucket → drop-tail
    * pipeline (v5): no corpus re-scoring, no cutoff re-ranking, ever.
    * Returns batch ids + (lang, n_bigrams, avg_logprob_lm, perplexity,
    * ppl_bucket, selected). Unscoreable docs (zero bigrams) and docs
    * whose language the cutoff artifact doesn't cover take a NULL
    * bucket and are never selected — surfaced, not dropped.
    *
    * Scale shape: one batch-sized bigram explode joined against the
    * vocabulary-sized LM tables, then a broadcast cutoff comparison.
    * `strategy` DECLARES the LM-join regime (r14 — rides through to
    * [[externalLmLogProb]]): "shuffle" is O(batch + vocab) on the
    * shuffle axis (the corpus never moves); "broadcast" is O(batch)
    * when the trained artifact fits executor memory; "auto" (default)
    * picks from the artifact's size estimate against
    * `broadcastThresholdBytes` — both regimes pinned by SCALE.md probe
    * legs, including the ~16M-row-vocab broadcast cliff. */
  def lmSelectIngest(batch: DataFrame, idCol: String, textCol: String,
                     langCol: String, unigrams: DataFrame, bigrams: DataFrame,
                     cutoffs: DataFrame,
                     dropBuckets: Seq[String] = Seq("tail"),
                     strategy: String = "auto",
                     broadcastThresholdBytes: Long = 64L << 20): DataFrame = {
    val scored = externalLmLogProb(batch, idCol, textCol, unigrams, bigrams,
      strategy = strategy, broadcastThresholdBytes = broadcastThresholdBytes)
      .join(batch.select(col(idCol), col(langCol)), Seq(idCol))
    val assigned = assignPplBuckets(
      scored.filter(col("n_bigrams") > 0), langCol, "avg_logprob_lm", cutoffs)
    // zero-bigram docs: avg_logprob_lm 0.0 is a sentinel, not a score —
    // bucketing it would rank unscoreable docs as (usually) head
    val unscoreable = scored.filter(col("n_bigrams") === 0)
      .withColumn("perplexity", lit(null).cast(DoubleType))
      .withColumn("ppl_bucket", lit(null).cast(StringType))
    assigned.unionByName(unscoreable)
      .withColumn("selected",
        coalesce(!col("ppl_bucket").isin(dropBuckets: _*), lit(false)))
  }

  /** Document fingerprint: order-insensitive content hash —
    * md5 over the sorted distinct lowercase token set. Collapses
    * whitespace/ordering variants to one key; pairs with exact dedup. */
  def fingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(tokens(lower(text)))), " "))

  /** Word n-gram shingles (n consecutive tokens joined by single spaces);
    * fewer than n tokens → empty array.
    *
    * IMPORTANT perf contract: `toks` should be a MATERIALIZED attribute
    * (projected via withColumn/select first), not an inline split() —
    * higher-order lambdas are interpreted without common-subexpression
    * elimination, so an inline expression would re-tokenize the document
    * for every element access. */
  /** Word n-grams WITH multiplicity (every window, duplicates kept) —
    * the counting form repetition statistics need. */
  def wordNgramsFromTokens(toks: Column, n: Int): Column =
    // guard: sequence(1, 0) in Spark is the DESCENDING [1, 0], not empty —
    // fewer than n tokens must short-circuit to [] or element_at(_, 0) throws
    when(size(toks) < n, array().cast(ArrayType(StringType))).otherwise {
      val idx = sequence(lit(1), size(toks) - (n - 1))
      transform(idx, i =>
        concat_ws(" ", (0 until n).map(o => element_at(toks, (i + o).cast(IntegerType))): _*))
    }

  def wordShinglesFromTokens(toks: Column, n: Int): Column =
    // the SET form for similarity/overlap ops: one shingling
    // implementation, distinct applied on top
    array_distinct(wordNgramsFromTokens(toks, n))

  def wordShingles(text: Column, n: Int): Column =
    wordShinglesFromTokens(tokens(text), n)

  /** Rolling-hash char shingles of length n as 28-bit ints (md5-derived so
    * the DuckDB oracle can reproduce them byte-for-byte). */
  def charShingleHashes(text: Column, n: Int): Column =
    // same sequence(1,0)-is-[1,0] guard as wordShinglesFromTokens
    when(length(text) < n, array().cast(ArrayType(LongType))).otherwise {
      val idx = sequence(lit(1), length(text) - (n - 1))
      array_distinct(transform(idx, i =>
        conv(substring(md5(text.substr(i.cast(IntegerType), lit(n))), 1, 7), 16, 10)
          .cast(LongType)))
    }
}
