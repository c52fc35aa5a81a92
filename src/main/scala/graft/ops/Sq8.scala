package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VectorExpressions

/** Scalar 8-bit quantization (SQ8) for ANN — the compression tier every
  * public vector library ships between raw floats and [[Pq]]: each
  * dimension quantizes independently into 256 uniform cells over its
  * corpus-wide [min, max] range (8× compression at full dimensional
  * resolution, vs PQ's 32× at subspace resolution; see e.g. the
  * ScalarQuantizer of the public FAISS codebase and Lucene's int8 HNSW
  * vectors — pattern reference only). Search is asymmetric: the raw
  * query scores against cell MIDPOINTS, halving the expected
  * quantization error vs symmetric code-vs-code distance.
  *
  * Determinism mirror of [[Pq]]/[[Ivf]]: bounds are exact per-dim
  * min/max (one aggregate, no iteration, trivially oracle-reproducible);
  * encode and distance arithmetic orders are pinned in the fused
  * expressions; distances round to the engine-wide 1e-6 grid before
  * every rank/tie decision.
  *
  * Scale shape: training is ONE posexplode + per-dim min/max aggregate
  * (dims × 1 rows — driver-tiny); encode is a pure fused map (no join,
  * no shuffle — the bounds ride the expression as a plan constant);
  * search broadcasts the query batch against corpus CODES and ranks
  * through the bounded [[Similarity.rankTopK]] aggregate — raw corpus
  * floats are read once at encode time and never again. */
object Sq8 {

  /** Exact per-dimension bounds: (lo array, span array), span = hi − lo.
    * Driver-held artifact (dims doubles), the PQ-codebook pattern. */
  def trainBounds(corpus: DataFrame, vecCol: String): (Array[Double], Array[Double]) = {
    val rows = corpus
      .select(posexplode(Similarity.asDouble(col(vecCol))).as(Seq("dim", "x")))
      .groupBy("dim").agg(min("x").as("lo"), max("x").as("hi"))
      .collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    require(rows.nonEmpty, "trainBounds: empty corpus")
    (rows.map(_._2), rows.map { case (_, l, h) => h - l })
  }

  /** DRIFT MONITOR (r14): the fraction of a batch's dimension-values
    * falling OUTSIDE the held [lo, lo+span] bounds. Every such value
    * clamps to code 0/255 at encode time, so under distribution drift
    * the store's recall degrades SILENTLY — drifted vectors pile onto
    * the boundary codes and become mutually indistinguishable. A
    * continuous ingest computes this per batch and, past a declared
    * threshold, retrains bounds/centroids and re-encodes the
    * accumulated store (the artifacts are plain tables — the rebuild is
    * [[trainBounds]] + [[encode]] + Ivf.assignCells over the
    * store-of-record; q_stream_ann_retrain gates the full loop and
    * QuantizedRecallSpec pins the recall recovery). One O(batch·dims)
    * map-side-combining aggregate; driver-scalar result — this is an
    * ingest-control decision, not a data output. Empty batch → 0.0. */
  def clampFraction(batch: DataFrame, vecCol: String,
                    lo: Array[Double], span: Array[Double]): Double = {
    val spark = batch.sparkSession
    import spark.implicits._
    val bounds = lo.indices.map(i => (i, lo(i), lo(i) + span(i)))
      .toDF("dim", "__lo", "__hi")
    // LEFT join + loud refusal on uncovered dims (r14 review): an inner
    // join would silently drop batch dimensions the bounds never saw —
    // drift concentrated in NEW dimensions would read as 0.0 and never
    // trigger a retrain, the exact silent degradation this monitor
    // exists to defend against (the Dsir-width/Dedup-index artifact
    // discipline: refuse a mismatched artifact, don't trust it).
    // BOTH directions checked (r14 ADVICE) in ONE batch pass (r15
    // review: the first cut ran a second full scan for the size check):
    // the left-join `uncovered` count catches batch dims the bounds
    // never saw; the per-vector size check catches the mirror image —
    // vectors carrying FEWER dims than the bounds (a truncated-embedding
    // regression), whose drift would otherwise be computed over the
    // present dims only and under-report clamping. posexplode_OUTER
    // keeps empty/null vectors as one null-dim row, so the size check
    // sees them too (plain posexplode would make them invisible); each
    // vector's size check is counted once, on its dim-0 row or its
    // null-dim sentinel row.
    val row = batch
      .select(size(Similarity.asDouble(col(vecCol))).as("__sz"),
        posexplode_outer(Similarity.asDouble(col(vecCol))).as(Seq("dim", "x")))
      .join(broadcast(bounds), Seq("dim"), "left")
      .agg(
        // coalesce: SUM over an EMPTY batch is NULL, and getLong on it
        // would NPE before the documented empty->0.0 return (r14 review)
        coalesce(sum(when(col("dim").isNotNull, 1L).otherwise(0L)), lit(0L))
          .as("n"),
        coalesce(sum(when(col("dim").isNotNull &&
          (col("x") < col("__lo") || col("x") > col("__hi")), 1L)
          .otherwise(0L)), lit(0L)).as("c"),
        coalesce(sum(when(col("dim").isNotNull && col("__lo").isNull, 1L)
          .otherwise(0L)), lit(0L)).as("uncovered"),
        coalesce(sum(when((col("dim").isNull || col("dim") === 0) &&
          coalesce(col("__sz"), lit(-1)) =!= lit(lo.length), 1L)
          .otherwise(0L)), lit(0L)).as("missized"))
      .collect()(0)
    require(row.getLong(2) == 0L,
      s"clampFraction: batch vectors carry ${row.getLong(2)} dimension-values " +
        s"outside the ${lo.length}-dim trained bounds — the artifact does not " +
        "describe this batch's dimensionality; retrain bounds before monitoring")
    require(row.getLong(3) == 0L,
      s"clampFraction: ${row.getLong(3)} batch vectors carry a dimensionality " +
        s"other than the trained bounds' ${lo.length} — truncated embeddings " +
        "would under-report clamping over the missing dims; retrain bounds " +
        "before monitoring")
    if (row.getLong(0) == 0L) 0.0
    else row.getLong(1).toDouble / row.getLong(0)
  }

  /** Encode every corpus vector to per-dim uint8 codes: (id, codes).
    * Pure map — persist the output as the searchable store. */
  def encode(corpus: DataFrame, idCol: String, vecCol: String,
             lo: Array[Double], span: Array[Double]): DataFrame =
    corpus.select(col(idCol),
      VectorExpressions.sq8Encode(
        Similarity.asDouble(col(vecCol)), lo, span).as("codes"))

  /** IVF-SQ8 composed search: [[Ivf]] prunes WHICH vectors to score
    * (cell-restricted candidates, nProbe cells per query), SQ8 decides
    * HOW CHEAPLY each candidate scores (codes vs the raw query through
    * the fused midpoint distance) — the IVF-ADC layout at scalar
    * granularity, ordinary DataFrame piping over the two
    * independently-gated operators. The corpus is touched as (cell,
    * codes) rows only. Returns (query_id, rank, neighbor_id, sq8_dist). */
  def topKWithIvf(queries: DataFrame, corpus: DataFrame, idCol: String,
                  vecCol: String, k: Int,
                  coarse: Seq[(Int, Array[Double])],
                  lo: Array[Double], span: Array[Double],
                  nProbe: Int,
                  precomputedCodes: Option[DataFrame] = None,
                  precomputedCells: Option[DataFrame] = None): DataFrame = {
    val corpusCells = precomputedCells
      .getOrElse(Ivf.assignCells(corpus, idCol, vecCol, coarse))
      .select(col(idCol).as("neighbor_id"), col("cell"))
    val qAssigned = Ivf.assignCells(queries, idCol, vecCol, coarse, nProbe)
    val queryCells =
      if (nProbe == 1) qAssigned.select(col(idCol).as("query_id"), col("cell"))
      else qAssigned.select(col(idCol).as("query_id"), explode(col("cells")).as("cell"))
    val q = queries.select(col(idCol).as("query_id"),
      Similarity.asDouble(col(vecCol)).as("__q"))
    val codes = precomputedCodes
      .getOrElse(encode(corpus, idCol, vecCol, lo, span))
      .select(col(idCol).as("neighbor_id"), col("codes"))
      .join(corpusCells, Seq("neighbor_id"))
    val scored = codes
      .join(broadcast(queryCells), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(VectorExpressions.sq8AdcDistanceSq(
          col("__q"), col("codes"), lo, span), 6).as("sq8_dist"))
    Similarity.rankTopK(scored, "sq8_dist", k, ascending = true)
  }

  /** Asymmetric top-k search over SQ8 codes: (query_id, rank,
    * neighbor_id, sq8_dist) — k rows per query, self-matches excluded,
    * rounded-distance ascending rank with neighbor-ascending ties.
    * Pass `precomputedCodes` (the persisted [[encode]] output) in
    * production — the [[Pq.topK]] raw-floats-read-once contract. */
  def topK(queries: DataFrame, corpus: DataFrame, idCol: String,
           vecCol: String, k: Int,
           lo: Array[Double], span: Array[Double],
           precomputedCodes: Option[DataFrame] = None): DataFrame = {
    val codes = precomputedCodes
      .getOrElse(encode(corpus, idCol, vecCol, lo, span))
      .select(col(idCol).as("neighbor_id"), col("codes"))
    val q = queries.select(col(idCol).as("query_id"),
      Similarity.asDouble(col(vecCol)).as("__q"))
    val scored = broadcast(q).crossJoin(codes)
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(VectorExpressions.sq8AdcDistanceSq(
          col("__q"), col("codes"), lo, span), 6).as("sq8_dist"))
    Similarity.rankTopK(scored, "sq8_dist", k, ascending = true)
  }
}
