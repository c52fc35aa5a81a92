package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product quantization for memory-efficient ANN (Jégou, Douze, Schmid
  * 2011, "Product Quantization for Nearest Neighbor Search" — public):
  * split each d-dim vector into `nSub` subvectors, k-means each subspace
  * into `nCodes` codewords, and store each vector as `nSub` small codes
  * instead of d floats. Search runs ADC (asymmetric distance
  * computation): the query precomputes its distance to every codeword
  * once, then each corpus vector's approximate distance is a table-sum
  * over its codes — no raw corpus floats touched at query time.
  *
  * This is the memory tier BELOW [[Ivf]]: IVF prunes which vectors to
  * score, PQ shrinks what scoring costs (64 floats → 8 bytes per vector
  * at the default config, a 32× compression). Production systems compose
  * them (IVF-ADC); here each is an independently oracle-gated operator
  * and the composition is ordinary DataFrame piping.
  *
  * Scale shape: encoding is a subspace-exploded equi-join against the
  * broadcast codebook (nSub·nCodes rows — driver-tiny by construction)
  * with a per-(vector, subspace) min-struct aggregate, never a window
  * over the corpus; ADC joins the corpus CODES (nSub small ints per
  * vector) against a broadcast query×codebook distance table and
  * partial-agg sums — the corpus raw vectors are read once at encode
  * time and never again. All distances are rounded to the engine-wide
  * 1e-6 grid before every rank/tie decision, so the DuckDB oracle
  * reproduces the search verdict exactly.
  *
  * Determinism mirror of [[Ivf]]: `seedCodebooks` (first-nCodes rows,
  * oracle-reproducible bit-for-bit) for gated queries; [[train]] (Lloyd
  * refinement, rounded means) for production quality, spec-tested via
  * its non-increasing quantization error rather than oracle-hashed.
  */
object Pq {

  /** Seeded codebooks: codeword `c` of subspace `m` is the m-th
    * subvector of the corpus row with id == c (ids < nCodes) — the
    * [[Ivf.seedCentroids]] convention, trivially reproducible by the
    * oracle. Returns (subspace, code, centroid) rows; driver-tiny
    * (nSub × nCodes × d/nSub doubles = d × nCodes total). */
  def seedCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
                    nSub: Int, nCodes: Int): Seq[(Int, Int, Array[Double])] = {
    // id read via cast-to-long, not r.getLong: keeps the op agnostic to
    // the source id's integral width (int32 ids fail a raw getLong)
    val rows = corpus.filter(col(idCol) < nCodes)
      .select(col(idCol).cast("long"), Similarity.asDouble(col(vecCol)).as("v"))
      .collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    require(rows.nonEmpty, "seedCodebooks: no rows with id < nCodes")
    val dims = rows.head._2.length
    require(dims % nSub == 0, s"dims=$dims must divide into nSub=$nSub subspaces")
    val subDim = dims / nSub
    for {
      (code, vec) <- rows
      m <- 0 until nSub
    } yield (m, code, vec.slice(m * subDim, (m + 1) * subDim))
  }

  private def booksDf(spark: org.apache.spark.sql.SparkSession,
                      books: Seq[(Int, Int, Array[Double])]): DataFrame = {
    import spark.implicits._
    books.map { case (m, c, cent) => (m, c, cent.toSeq) }
      .toDF("sub", "code", "cent")
  }

  /** Encode every corpus vector as its per-subspace nearest-codeword
    * codes: (id, codes array<int>, ordered by subspace). Nearest = min
    * squared L2 on the 1e-6 grid, ties to the lower code id — the
    * deterministic argmin the oracle replays. One subspace explode, one
    * broadcast codebook join, one min-struct aggregate per (id, sub),
    * one collect_list per id. */
  def encode(corpus: DataFrame, idCol: String, vecCol: String,
             books: Seq[(Int, Int, Array[Double])]): DataFrame =
    encodeSub(corpus, idCol, vecCol, books)
      .groupBy(col("__id"))
      .agg(transform(sort_array(collect_list(struct(col("sub"), col("code")))),
        s => s.getField("code")).as("codes"))
      .select(col("__id").as(idCol), col("codes").cast("array<int>").as("codes"))

  /** Lloyd refinement of the codebooks under squared L2 — every
    * iteration is ONE distributed pass covering all subspaces (encode →
    * per-(sub, code, dim) mean), means rounded to the 1e-6 grid before
    * becoming centroids ([[Ivf.train]]'s determinism note applies).
    * Empty codewords keep their previous centroid. Quantization error
    * is non-increasing per iteration (standard Lloyd argument);
    * PqSpec asserts it empirically. */
  def train(corpus: DataFrame, idCol: String, vecCol: String,
            nSub: Int, nCodes: Int, iters: Int): Seq[(Int, Int, Array[Double])] = {
    var books = seedCodebooks(corpus, idCol, vecCol, nSub, nCodes)
    val subDim = books.head._3.length
    (1 to iters).foreach { _ =>
      val assigned = encodeSub(corpus, idCol, vecCol, books, carrySubvec = true)
      val means = assigned
        .select(col("sub"), col("code"), posexplode(col("__sv")).as(Seq("dim", "x")))
        .groupBy("sub", "code", "dim").agg(round(avg("x"), 6).as("m"))
        .collect()
        .groupBy(r => (r.getInt(0), r.getInt(1)))
        .map { case ((m, c), rs) =>
          val cent = new Array[Double](subDim)
          rs.foreach(r => cent(r.getInt(2)) = r.getDouble(3))
          (m, c) -> cent
        }
      books = books.map { case (m, c, old) =>
        (m, c, means.getOrElse((m, c), old))
      }
    }
    books
  }

  /** Per-(id, sub) argmin assignment rows — encode's inner stage,
    * shared with train so both use the identical argmin. Only train
    * carries the subvector through the aggregate (`carrySubvec`): the
    * encode path must shuffle (distance, code) alone, or the min-struct
    * ships ~d doubles per vector — double the raw float payload — for a
    * stage whose output is nSub small ints (r10 review finding). */
  private def encodeSub(corpus: DataFrame, idCol: String, vecCol: String,
                        books: Seq[(Int, Int, Array[Double])],
                        carrySubvec: Boolean = false): DataFrame = {
    val spark = corpus.sparkSession
    val nSub = books.map(_._1).max + 1
    val subDim = books.head._3.length
    val bdf = broadcast(booksDf(spark, books))
    val subs = corpus.select(col(idCol).as("__id"),
        Similarity.asDouble(col(vecCol)).as("__v"))
      .select(col("__id"), col("__v"),
        explode(array((0 until nSub).map(lit): _*)).as("sub"))
      .select(col("__id"), col("sub"),
        slice(col("__v"), col("sub") * subDim + 1, lit(subDim)).as("__sv"))
    val scored = subs.join(bdf, Seq("sub"))
      .select(col("__id"), col("sub"), col("code"), col("__sv"),
        round(org.apache.spark.sql.graft.VectorExpressions
          .l2DistanceSq(col("__sv"), col("cent")), 6).as("__d"))
    if (carrySubvec)
      scored.groupBy(col("__id"), col("sub"))
        .agg(min(struct(col("__d"), col("code"), col("__sv"))).as("__b"))
        .select(col("__id"), col("sub"), col("__b.code").as("code"),
          col("__b.__sv").as("__sv"))
    else
      scored.groupBy(col("__id"), col("sub"))
        .agg(min(struct(col("__d"), col("code"))).as("__b"))
        .select(col("__id"), col("sub"), col("__b.code").as("code"))
  }

  /** IVF-ADC composed search (r10): [[Ivf]] prunes WHICH vectors to
    * score (cell-restricted candidates, nProbe cells per query), PQ's
    * ADC decides HOW CHEAPLY each candidate scores (codes vs the
    * query's codeword distance table) — the standard IVFADC layout of
    * Jégou et al. 2011 §IV, expressed as ordinary DataFrame piping over
    * the two independently-gated operators. The corpus is touched as
    * (cell, codes) rows only: 8 small ints + a cell id per vector.
    * Returns (query_id, rank, neighbor_id, adc_dist). */
  def topKWithIvf(queries: DataFrame, corpus: DataFrame, idCol: String,
                  vecCol: String, k: Int,
                  coarse: Seq[(Int, Array[Double])],
                  books: Seq[(Int, Int, Array[Double])],
                  nProbe: Int,
                  precomputedCodes: Option[DataFrame] = None,
                  precomputedCells: Option[DataFrame] = None): DataFrame = {
    val spark = corpus.sparkSession
    val subDim = books.head._3.length
    val corpusCells = precomputedCells
      .getOrElse(Ivf.assignCells(corpus, idCol, vecCol, coarse))
      .select(col(idCol).as("neighbor_id"), col("cell"))
    val qAssigned = Ivf.assignCells(queries, idCol, vecCol, coarse, nProbe)
    val queryCells =
      if (nProbe == 1) qAssigned.select(col(idCol).as("query_id"), col("cell"))
      else qAssigned.select(col(idCol).as("query_id"), explode(col("cells")).as("cell"))
    val dtab = queries.select(col(idCol).as("query_id"),
        Similarity.asDouble(col(vecCol)).as("__q"))
      .crossJoin(booksDf(spark, books))
      .select(col("query_id"), col("sub"), col("code"),
        round(org.apache.spark.sql.graft.VectorExpressions.l2DistanceSq(
          slice(col("__q"), col("sub") * subDim + 1, lit(subDim)),
          col("cent")), 6).as("__d"))
    val corpusSide = precomputedCodes
      .getOrElse(encode(corpus, idCol, vecCol, books))
      .select(col(idCol).as("neighbor_id"),
        posexplode(col("codes")).as(Seq("sub", "code")))
      .join(corpusCells, Seq("neighbor_id"))
    val scored = corpusSide
      .join(broadcast(queryCells), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .join(broadcast(dtab), Seq("query_id", "sub", "code"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(round(sum(col("__d")), 6).as("adc_dist"))
    Similarity.rankTopK(scored, "adc_dist", k, ascending = true)
  }

  /** ADC top-k search: every query's approximate squared L2 to every
    * corpus vector is the sum of per-subspace distances to the corpus
    * vector's codewords, looked up in the query's precomputed distance
    * table. Returns (query_id, rank, neighbor_id, adc_dist) — k rows
    * per query, self-matches excluded, rounded-distance ranking with
    * neighbor-ascending ties.
    *
    * The distance table is queries × codebook (|Q|·nSub·nCodes rows) —
    * broadcast by construction since ADC exists precisely because the
    * query batch is small relative to the corpus. The corpus side joins
    * CODES only.
    *
    * Pass `precomputedCodes` (the persisted [[encode]] output) in
    * production: without it every search call re-encodes the raw corpus
    * — fine for the oracle-closed gate queries, not for a 100 TB store
    * whose whole point is that raw floats are read once at encode time
    * (r10 review finding; same for topKWithIvf's `precomputedCells`). */
  def topK(queries: DataFrame, corpus: DataFrame, idCol: String,
           vecCol: String, k: Int,
           books: Seq[(Int, Int, Array[Double])],
           precomputedCodes: Option[DataFrame] = None): DataFrame = {
    val spark = corpus.sparkSession
    val nSub = books.map(_._1).max + 1
    val subDim = books.head._3.length
    val bdf = booksDf(spark, books)
    val dtab = queries.select(col(idCol).as("query_id"),
        Similarity.asDouble(col(vecCol)).as("__q"))
      .crossJoin(bdf)
      .select(col("query_id"), col("sub"), col("code"),
        round(org.apache.spark.sql.graft.VectorExpressions.l2DistanceSq(
          slice(col("__q"), col("sub") * subDim + 1, lit(subDim)),
          col("cent")), 6).as("__d"))
    val codes = precomputedCodes
      .getOrElse(encode(corpus, idCol, vecCol, books))
      .select(col(idCol).as("neighbor_id"),
        posexplode(col("codes")).as(Seq("sub", "code")))
    val scored = codes.join(broadcast(dtab), Seq("sub", "code"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(round(sum(col("__d")), 6).as("adc_dist"))
    Similarity.rankTopK(scored, "adc_dist", k, ascending = true)
  }
}
