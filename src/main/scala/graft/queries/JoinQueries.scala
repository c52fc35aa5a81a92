package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{AsOfJoin, Ivf}

/** Custom join-shaped operators: as-of join (DuckDB's native ASOF JOIN is
  * the oracle) and IVF-style ANN probing.
  */
object JoinQueries {

  // private[queries]: the r13 ANN-ingest stream gate (StreamQueries)
  // replays the same cosine/SQ8 arithmetic in its oracle
  private[queries] def cosineSql(a: String, b: String): String =
    s"""round(
       |  list_sum(list_transform(generate_series(1, 64), i -> $a[i]::DOUBLE * $b[i]::DOUBLE)) /
       |  (sqrt(list_sum(list_transform($a, x -> x::DOUBLE * x::DOUBLE))) *
       |   sqrt(list_sum(list_transform($b, x -> x::DOUBLE * x::DOUBLE)))), 6)""".stripMargin

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // as-of join: each purchase gets the user's latest prior view (≤ 7 days)
    "q_asof_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("value"))
      AsOfJoin.asof(purchases, views,
        key = "user_id", leftTs = "ts", rightTs = "ts",
        rightPayload = Map("value" -> "view_value"),
        toleranceSeconds = Some(7L * 24 * 3600))
        .select(col("event_id"), col("user_id"), col("value"),
          round(col("view_value"), 6).as("view_value"),
          col("matched_ts"))
        .orderBy("event_id")
    }),

    // range join: each event matched to the customer-snapshot version valid
    // at event time (SCD-2 lookup) via bucketized point-in-interval join
    "q_range_join_scd2" -> ((s, d) => {
      import graft.ops.RangeJoin
      import graft.materializations.Snapshot
      import graft.relations.RelationManager
      val rm = new RelationManager(s, java.nio.file.Files.createTempDirectory("graft_rj").toString)
      val rel = graft.core.Relation("graft", "snapshots", "cust_rj_snap")
      val base = Tables.customer(s, d).select(col("c_custkey"), col("c_mktsegment"))
      val at1 = java.time.Instant.parse("2024-01-01T00:00:00Z")
      val at2 = java.time.Instant.parse("2024-01-05T00:00:00Z")
      val v2 = base.withColumn("c_mktsegment",
        when(col("c_custkey") % 5 === 0, lit("MOVED")).otherwise(col("c_mktsegment")))
      Snapshot(rm, rel, base, Seq("c_custkey"), Snapshot.CheckStrategy(at1), checkCols = Seq("all"))
      Snapshot(rm, rel, v2, Seq("c_custkey"), Snapshot.CheckStrategy(at2), checkCols = Seq("all"))
      val snap = rm.read(rel)
        .select(col("c_custkey").as("user_id"), col("c_mktsegment"),
          col("dbt_valid_from"), col("dbt_valid_to"))
      val ev = Tables.events(s, d).select(col("event_id"), col("user_id"), col("ts"))
      RangeJoin.timestampInInterval(ev, snap,
        "ts", "dbt_valid_from", "dbt_valid_to",
        keys = Seq("user_id"), bucketSeconds = 24 * 3600,
        maxTs = java.sql.Timestamp.valueOf("2030-01-01 00:00:00"))
        .select(col("event_id"), col("c_mktsegment").as("segment_at_event"))
        .orderBy("event_id")
    }),

    // IVF ANN: 8 seed centroids, 2-probe search, top-5 per query
    "q_sim_topk_ivf" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Ivf.topK(e.filter(col("vec_id") < 10), e, "vec_id", "embedding",
        k = 5, nCells = 8, nProbe = 2)
        .orderBy("query_id", "rank")
    }),

    // r9: the same search at 400 cells — past the old literal-composed
    // quantizer's documented few-hundred-cell limit; exercises the fused
    // single-plan-constant assignment end-to-end against the oracle
    "q_sim_topk_ivf_bigk" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Ivf.topK(e.filter(col("vec_id") < 10), e, "vec_id", "embedding",
        k = 5, nCells = 400, nProbe = 4)
        .orderBy("query_id", "rank")
    }),

    // r10: product-quantization encode — every vector as 8 subspace
    // codes against the seeded 16-codeword books (codes joined to a
    // string so the compare is scalar)
    "q_sim_pq_encode" -> ((s, d) => {
      import graft.ops.Pq
      val e = Tables.embeddings(s, d)
      val books = Pq.seedCodebooks(e, "vec_id", "embedding", nSub = 8, nCodes = 16)
      Pq.encode(e, "vec_id", "embedding", books)
        .select(col("vec_id"), concat_ws("_", col("codes")).as("codes"))
        .orderBy("vec_id")
    }),

    // r10: ADC search over the PQ codes — approximate squared-L2 via the
    // query's codeword distance table, top-5 per query
    "q_sim_topk_pq" -> ((s, d) => {
      import graft.ops.Pq
      val e = Tables.embeddings(s, d)
      val books = Pq.seedCodebooks(e, "vec_id", "embedding", nSub = 8, nCodes = 16)
      Pq.topK(e.filter(col("vec_id") < 10), e, "vec_id", "embedding",
        k = 5, books)
        .orderBy("query_id", "rank")
    }),

    // r10: the IVFADC composition — IVF prunes (8 cells, 2 probes), ADC
    // scores the cell-restricted candidates from codes alone
    "q_sim_topk_ivf_pq" -> ((s, d) => {
      import graft.ops.{Ivf, Pq}
      val e = Tables.embeddings(s, d)
      val coarse = Ivf.seedCentroids(e, "vec_id", "embedding", 8)
      val books = Pq.seedCodebooks(e, "vec_id", "embedding", nSub = 8, nCodes = 16)
      Pq.topKWithIvf(e.filter(col("vec_id") < 10), e, "vec_id", "embedding",
        k = 5, coarse, books, nProbe = 2)
        .orderBy("query_id", "rank")
    }),

    // r12: scalar 8-bit quantization encode — exact per-dim min/max
    // bounds, 256 uniform cells per dim (codes joined to a string so
    // the compare is scalar)
    "q_sim_sq8_encode" -> ((s, d) => {
      import graft.ops.Sq8
      val e = Tables.embeddings(s, d)
      val (lo, span) = Sq8.trainBounds(e, "embedding")
      Sq8.encode(e, "vec_id", "embedding", lo, span)
        .select(col("vec_id"), concat_ws("_", col("codes")).as("codes"))
        .orderBy("vec_id")
    }),

    // r12: asymmetric SQ8 search — raw query vs cell-midpoint
    // reconstructions, top-5 per query on the rounded squared L2
    "q_sim_topk_sq8" -> ((s, d) => {
      import graft.ops.Sq8
      val e = Tables.embeddings(s, d)
      val (lo, span) = Sq8.trainBounds(e, "embedding")
      Sq8.topK(e.filter(col("vec_id") < 10), e, "vec_id", "embedding",
        k = 5, lo, span)
        .orderBy("query_id", "rank")
    }),

    // r12: the IVF-SQ8 composition — IVF prunes (8 cells, 2 probes),
    // SQ8 scores the cell-restricted candidates from codes alone
    "q_sim_topk_ivf_sq8" -> ((s, d) => {
      import graft.ops.Sq8
      val e = Tables.embeddings(s, d)
      val coarse = Ivf.seedCentroids(e, "vec_id", "embedding", 8)
      val (lo, span) = Sq8.trainBounds(e, "embedding")
      Sq8.topKWithIvf(e.filter(col("vec_id") < 10), e, "vec_id", "embedding",
        k = 5, coarse, lo, span, nProbe = 2)
        .orderBy("query_id", "rank")
    }),

    // r9: the two-level (coarse→fine) quantizer's assignment, oracle-
    // checked — 8 coarse cells route each vector to its cell's slice of
    // the 64 fine centroids; the fine matrix is a joined TABLE, the
    // k ≳ 10⁵ shape where even one plan constant is too big
    "q_sim_assign_twolevel" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val coarse = Ivf.seedCentroids(e, "vec_id", "embedding", 8)
      val fine = Ivf.seedFineCentroids(e, "vec_id", "embedding", coarse, 64)
      Ivf.assignCellsTwoLevel(e, "vec_id", "embedding", coarse, fine)
        .orderBy("vec_id")
    })
  )

  def oracles: Map[String, String] = Map(
    "q_asof_join" ->
      """WITH p AS (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
        |  FROM events WHERE event_type = 'purchase'),
        |v AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
        |  FROM events WHERE event_type = 'view')
        |SELECT p.event_id, p.user_id, p.value,
        |  CASE WHEN v.ts IS NOT NULL AND date_diff('second', v.ts, p.ts) <= 7*24*3600
        |       THEN round(v.value, 6) END AS view_value,
        |  CASE WHEN v.ts IS NOT NULL AND date_diff('second', v.ts, p.ts) <= 7*24*3600
        |       THEN v.ts END AS matched_ts
        |FROM p ASOF LEFT JOIN v
        |  ON p.user_id = v.user_id AND p.ts >= v.ts
        |ORDER BY event_id""".stripMargin,

    "q_range_join_scd2" ->
      """WITH v1 AS (SELECT c_custkey, c_mktsegment FROM customer),
        |v2 AS (SELECT c_custkey,
        |  CASE WHEN c_custkey % 5 = 0 THEN 'MOVED' ELSE c_mktsegment END AS c_mktsegment
        |  FROM customer),
        |snap AS (
        |  SELECT v1.c_custkey, v1.c_mktsegment,
        |    TIMESTAMP '2024-01-01 00:00:00' AS vf,
        |    CASE WHEN v1.c_mktsegment <> v2.c_mktsegment
        |         THEN TIMESTAMP '2024-01-05 00:00:00' END AS vt
        |  FROM v1 JOIN v2 USING (c_custkey)
        |  UNION ALL
        |  SELECT v2.c_custkey, v2.c_mktsegment, TIMESTAMP '2024-01-05 00:00:00', NULL
        |  FROM v1 JOIN v2 USING (c_custkey) WHERE v1.c_mktsegment <> v2.c_mktsegment)
        |SELECT e.event_id, s.c_mktsegment AS segment_at_event
        |FROM events e JOIN snap s
        |  ON e.user_id = s.c_custkey
        | AND CAST(e.ts AS TIMESTAMP) >= s.vf
        | AND CAST(e.ts AS TIMESTAMP) < COALESCE(s.vt, TIMESTAMP '2030-01-01 00:00:00')
        |ORDER BY event_id""".stripMargin,

    "q_sim_topk_ivf" -> ivfTopKSql(nCells = 8, nProbe = 2),
    "q_sim_topk_ivf_bigk" -> ivfTopKSql(nCells = 400, nProbe = 4),

    // PQ: seeded books = subvectors of rows id < 16; encode = rank-1
    // codeword per (vector, subspace) on the rounded squared L2 with
    // code-ascending ties — exactly the engine's min-struct order
    "q_sim_pq_encode" ->
      s"""$pqEncCtes
         |SELECT vec_id, array_to_string(list(code ORDER BY sub), '_') AS codes
         |FROM enc GROUP BY vec_id ORDER BY vec_id""".stripMargin,

    "q_sim_topk_pq" ->
      s"""$pqEncCtes,
         |dtab AS (SELECT q.vec_id AS query_id, b.sub, b.code,
         |    round(list_sum(list_transform(generate_series(1, 8), i ->
         |      (q.embedding[b.sub*8+i]::DOUBLE - b.cent[i]::DOUBLE) *
         |      (q.embedding[b.sub*8+i]::DOUBLE - b.cent[i]::DOUBLE))), 6) AS d
         |  FROM embeddings q CROSS JOIN books b WHERE q.vec_id < 10),
         |scored AS (SELECT dt.query_id, e2.vec_id AS neighbor_id,
         |    round(SUM(dt.d), 6) AS adc_dist
         |  FROM enc e2 JOIN dtab dt USING (sub, code)
         |  WHERE dt.query_id <> e2.vec_id GROUP BY 1, 2)
         |SELECT query_id, rank, neighbor_id, adc_dist FROM (
         |  SELECT *, ROW_NUMBER() OVER (
         |    PARTITION BY query_id ORDER BY adc_dist, neighbor_id) AS rank
         |  FROM scored) t
         |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // two-stage argmax: coarse rank-1 over the 8 seeds, then rank-1 over
    // the routed slice of the 64 fine seeds — both on the rounded cosine
    // with ties to the lower cell id, exactly the engine's order
    // IVFADC: the ivf 'assigned' CTE routes both sides to cells; the pq
    // CTEs score candidates from codes - cosine routing, L2 ADC scoring
    "q_sim_topk_ivf_pq" -> {
      val cosEC = cosineSql("e.embedding", "c.cvec")
      s"""$pqEncCtes,
         |cents AS (
         |  SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < 8),
         |assigned AS (
         |  SELECT e.vec_id, e.embedding, c.cid,
         |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |      ORDER BY $cosEC DESC, c.cid) AS rnk
         |  FROM embeddings e CROSS JOIN cents c),
         |corpus_cells AS (
         |  SELECT vec_id AS neighbor_id, cid AS cell FROM assigned WHERE rnk = 1),
         |query_cells AS (
         |  SELECT vec_id AS query_id, cid AS cell
         |  FROM assigned WHERE vec_id < 10 AND rnk <= 2),
         |dtab AS (SELECT q.vec_id AS query_id, b.sub, b.code,
         |    round(list_sum(list_transform(generate_series(1, 8), i ->
         |      (q.embedding[b.sub*8+i]::DOUBLE - b.cent[i]::DOUBLE) *
         |      (q.embedding[b.sub*8+i]::DOUBLE - b.cent[i]::DOUBLE))), 6) AS d
         |  FROM embeddings q CROSS JOIN books b WHERE q.vec_id < 10),
         |cand AS (
         |  SELECT q.query_id, cc.neighbor_id
         |  FROM query_cells q JOIN corpus_cells cc USING (cell)
         |  WHERE q.query_id <> cc.neighbor_id),
         |scored AS (SELECT c.query_id, c.neighbor_id,
         |    round(SUM(dt.d), 6) AS adc_dist
         |  FROM cand c
         |  JOIN enc e2 ON e2.vec_id = c.neighbor_id
         |  JOIN dtab dt ON dt.query_id = c.query_id
         |              AND dt.sub = e2.sub AND dt.code = e2.code
         |  GROUP BY 1, 2)
         |SELECT query_id, rank, neighbor_id, adc_dist FROM (
         |  SELECT *, ROW_NUMBER() OVER (
         |    PARTITION BY query_id ORDER BY adc_dist, neighbor_id) AS rank
         |  FROM scored) t
         |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
    },

    // SQ8: exact per-dim min/max bounds, floor((x-lo)/span*256) clamped
    // to [0,255] (degenerate dims encode 0) — the engine's pinned
    // arithmetic order, replayed per dimension
    "q_sim_sq8_encode" ->
      s"""$sq8EncCtes
         |SELECT vec_id, array_to_string(codes, '_') AS codes
         |FROM enc ORDER BY vec_id""".stripMargin,

    // asymmetric search: raw query vs cell midpoints lo + (c+0.5)*span/256,
    // list_sum over ascending dims = the fused loop's accumulation order
    "q_sim_topk_sq8" ->
      s"""$sq8EncCtes,
         |scored AS (
         |  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         |    ${sq8DistSql("q.embedding", "e.codes")} AS sq8_dist
         |  FROM embeddings q CROSS JOIN enc e, bv
         |  WHERE q.vec_id < 10 AND q.vec_id <> e.vec_id)
         |SELECT query_id, rank, neighbor_id, sq8_dist FROM (
         |  SELECT *, ROW_NUMBER() OVER (
         |    PARTITION BY query_id ORDER BY sq8_dist, neighbor_id) AS rank
         |  FROM scored) t
         |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // IVF-SQ8: cosine routing CTEs (the ivf_pq 'assigned' shape) +
    // SQ8 midpoint scoring of the cell-restricted candidates
    "q_sim_topk_ivf_sq8" -> {
      val cosEC = cosineSql("e.embedding", "c.cvec")
      s"""$sq8EncCtes,
         |cents AS (
         |  SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < 8),
         |assigned AS (
         |  SELECT e.vec_id, e.embedding, c.cid,
         |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |      ORDER BY $cosEC DESC, c.cid) AS rnk
         |  FROM embeddings e CROSS JOIN cents c),
         |corpus_cells AS (
         |  SELECT vec_id AS neighbor_id, cid AS cell FROM assigned WHERE rnk = 1),
         |query_cells AS (
         |  SELECT vec_id AS query_id, cid AS cell
         |  FROM assigned WHERE vec_id < 10 AND rnk <= 2),
         |cand AS (
         |  SELECT q.query_id, cc.neighbor_id
         |  FROM query_cells q JOIN corpus_cells cc USING (cell)
         |  WHERE q.query_id <> cc.neighbor_id),
         |scored AS (
         |  SELECT c.query_id, c.neighbor_id,
         |    ${sq8DistSql("q.embedding", "e2.codes")} AS sq8_dist
         |  FROM cand c
         |  JOIN enc e2 ON e2.vec_id = c.neighbor_id
         |  JOIN embeddings q ON q.vec_id = c.query_id, bv)
         |SELECT query_id, rank, neighbor_id, sq8_dist FROM (
         |  SELECT *, ROW_NUMBER() OVER (
         |    PARTITION BY query_id ORDER BY sq8_dist, neighbor_id) AS rank
         |  FROM scored) t
         |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
    },

    "q_sim_assign_twolevel" -> {
      val cosC = cosineSql("e.embedding", "c.cv")
      val cosF = cosineSql("v.embedding", "f.fv")
      s"""WITH c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 8),
         |ca AS (
         |  SELECT e.vec_id, e.embedding, c.cid,
         |    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY $cosC DESC, c.cid) AS rn
         |  FROM embeddings e CROSS JOIN c),
         |coarse_of AS (SELECT vec_id, embedding, cid AS coarse_cell FROM ca WHERE rn = 1),
         |fine AS (SELECT vec_id AS cell, embedding AS fv, coarse_cell
         |         FROM coarse_of WHERE vec_id < 64),
         |cand AS (
         |  SELECT v.vec_id, f.cell,
         |    ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY $cosF DESC, f.cell) AS rn
         |  FROM coarse_of v JOIN fine f USING (coarse_cell))
         |SELECT vec_id, CAST(cell AS INTEGER) AS cell
         |FROM cand WHERE rn = 1 ORDER BY vec_id""".stripMargin
    }
  )

  /** PQ encode CTEs shared by both PQ oracles: seeded books + the
    * per-(vector, subspace) rank-1 codeword assignment. One definition,
    * or the two oracles drift apart under edits. */
  /** SQ8 asymmetric midpoint distance — ONE definition shared by both
    * SQ8 oracles (raw query dims vs lo + (code+0.5)·span/256, list_sum
    * over ascending dims = the fused loop's accumulation order). */
  private[queries] def sq8DistSql(q: String, codes: String): String =
    s"""round(list_sum(list_transform(generate_series(1, 64), d ->
       |      ($q[d]::DOUBLE - (bv.lov[d] + ($codes[d] + 0.5) * bv.spanv[d] / 256.0)) *
       |      ($q[d]::DOUBLE - (bv.lov[d] + ($codes[d] + 0.5) * bv.spanv[d] / 256.0)))), 6)""".stripMargin

  /** SQ8 encode CTEs shared by both SQ8 oracles: exact per-dim bounds,
    * bound LISTS (ascending dim — the fused expressions' plan-constant
    * arrays), and per-vector code lists. */
  private val sq8EncCtes: String =
    """WITH vals AS (
      |  SELECT vec_id, d, embedding[d]::DOUBLE AS x
      |  FROM embeddings, LATERAL (SELECT unnest(generate_series(1, 64)) AS d) g),
      |bounds AS (SELECT d, min(x) AS lo, max(x) - min(x) AS span FROM vals GROUP BY 1),
      |bv AS (SELECT list(lo ORDER BY d) AS lov, list(span ORDER BY d) AS spanv FROM bounds),
      |enc AS (
      |  SELECT vec_id, list(CASE WHEN span <= 0 THEN 0
      |    ELSE LEAST(GREATEST(CAST(floor((x - lo) / span * 256.0) AS INTEGER), 0), 255) END
      |    ORDER BY d) AS codes
      |  FROM vals JOIN bounds USING (d) GROUP BY vec_id)""".stripMargin

  private val pqEncCtes: String =
    """WITH cw AS (SELECT vec_id AS code, embedding FROM embeddings WHERE vec_id < 16),
      |books AS (SELECT s.sub, c.code, list_slice(c.embedding, s.sub*8+1, s.sub*8+8) AS cent
      |          FROM (SELECT unnest(generate_series(0, 7)) AS sub) s CROSS JOIN cw c),
      |enc0 AS (SELECT e.vec_id, b.sub, b.code,
      |    round(list_sum(list_transform(generate_series(1, 8), i ->
      |      (e.embedding[b.sub*8+i]::DOUBLE - b.cent[i]::DOUBLE) *
      |      (e.embedding[b.sub*8+i]::DOUBLE - b.cent[i]::DOUBLE))), 6) AS d
      |  FROM embeddings e CROSS JOIN books b),
      |enc AS (SELECT vec_id, sub, code FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY d, code) AS rn
      |  FROM enc0) t WHERE rn = 1)""".stripMargin

  /** The IVF search oracle, parameterized on the quantizer config — one
    * SQL shape for the gate config and the big-k config. */
  private def ivfTopKSql(nCells: Int, nProbe: Int): String = {
    val cosEC = cosineSql("e.embedding", "c.cvec")
    val cosQV = cosineSql("q.qv", "cc.cv")
    s"""WITH cents AS (
       |  SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < $nCells),
       |assigned AS (
       |  SELECT e.vec_id, e.embedding, c.cid,
       |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |      ORDER BY $cosEC DESC, c.cid) AS rnk
       |  FROM embeddings e CROSS JOIN cents c),
       |corpus_cells AS (
       |  SELECT vec_id AS neighbor_id, embedding AS cv, cid AS cell
       |  FROM assigned WHERE rnk = 1),
       |query_cells AS (
       |  SELECT vec_id AS query_id, embedding AS qv, cid AS cell
       |  FROM assigned WHERE vec_id < 10 AND rnk <= $nProbe),
       |scored AS (
       |  SELECT q.query_id, cc.neighbor_id, $cosQV AS cosine
       |  FROM query_cells q JOIN corpus_cells cc USING (cell)
       |  WHERE q.query_id <> cc.neighbor_id)
       |SELECT query_id, rank, neighbor_id, cosine FROM (
       |  SELECT *, ROW_NUMBER() OVER (
       |    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
       |  FROM scored) t
       |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
  }
}
