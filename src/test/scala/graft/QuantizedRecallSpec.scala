package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{Ivf, Pq, Sq8}

/** r13 (VERDICT task 3): recall@k floors for the quantized ANN tiers.
  * IVF has had one since r11 (IvfParitySpec); PQ/ADC, IVFADC, SQ8 and
  * IVF-SQ8 pinned determinism and tie order but never HOW MUCH of the
  * true neighborhood the quantized distances preserve — quantization
  * quality was an assumption, not a contract.
  *
  * Two tiers of contract, because the fixture embeddings are
  * near-unstructured (synthetic, weak neighborhood signal) and recall
  * on them is noise-dominated for the aggressively lossy PQ family
  * (measured on this fixture: SQ8 1.00 — 8 bits/dim is near-lossless;
  * IVF-SQ8 0.86; PQ 0.22; IVFADC 0.28 — 4 bits per 8 dims cannot
  * recover neighborhoods that barely exist; Lloyd training moves PQ to
  * 0.16, i.e. recall here is not even monotone in quantization error):
  *
  *  1. FIXTURE floors, set well under the measured values — they catch
  *     a gross regression (bounds bug, codebook collapse, cell-routing
  *     bug: all of which drop recall to the ~0.01 random level) while
  *     surviving a fixture regeneration.
  *  2. A PLANTED-cluster dataset at MATCHED codebook capacity (16
  *     clusters, nCodes = 16, seeds covering every cluster): when the
  *     data has recoverable structure and the codebook can represent
  *     it, the PQ tiers must be near-perfect — the actual quality
  *     contract, independent of fixture noise.
  *
  * Exact reference is the driver-side squared-L2 top-k (500 vectors),
  * tie-expanded at the k-th distance so a tie never counts as a miss. */
class QuantizedRecallSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private val K = 5

  /** Exact top-k neighbor ids per query (ids < nQueries), tie-expanded
    * at the k-th distance. */
  private def exactTopK(vecs: Array[(Long, Array[Double])],
                        nQueries: Int): Map[Long, Set[Long]] =
    vecs.filter(_._1 < nQueries).map { case (q, qv) =>
      val dists = vecs.filter(_._1 != q).map { case (n, nv) =>
        var s = 0.0
        var i = 0
        while (i < qv.length) { val d = qv(i) - nv(i); s += d * d; i += 1 }
        n -> s
      }
      val sorted = dists.sortBy { case (n, d) => (d, n) }
      val kth = sorted(K - 1)._2
      q -> sorted.filter(_._2 <= kth + 1e-9).map(_._1).toSet
    }.toMap

  /** recall@K: fraction of the K returned neighbors per query that are
    * true (tie-expanded) top-K members, averaged over the queries. */
  private def recallOf(got: DataFrame, exact: Map[Long, Set[Long]]): Double = {
    val by = got.collect()
      .map(r => r.getLong(0) -> r.getLong(2))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(by.keySet == exact.keySet, s"queries missing: ${by.keySet}")
    val hits = exact.map { case (q, ex) => by(q).count(ex) }.sum
    hits.toDouble / (exact.size * K)
  }

  private lazy val fixtureVecs: Array[(Long, Array[Double])] =
    Tables.embeddings(spark, sf).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
  private lazy val fixtureExact = exactTopK(fixtureVecs, 10)

  test("SQ8 recall@5 vs exact L2 on the fixture (8 bits/dim is near-lossless)") {
    val e = Tables.embeddings(spark, sf)
    val (lo, span) = Sq8.trainBounds(e, "embedding")
    val r = recallOf(Sq8.topK(e.filter(col("vec_id") < 10), e,
      "vec_id", "embedding", k = K, lo, span), fixtureExact)
    info(f"sq8 recall@5 = $r%.3f")
    assert(r >= 0.85, f"SQ8 recall@5 regressed: $r%.3f < 0.85")
  }

  test("IVF-SQ8 recall@5 vs exact L2 on the fixture") {
    val e = Tables.embeddings(spark, sf)
    val coarse = Ivf.seedCentroids(e, "vec_id", "embedding", 8)
    val (lo, span) = Sq8.trainBounds(e, "embedding")
    val r = recallOf(Sq8.topKWithIvf(e.filter(col("vec_id") < 10), e,
      "vec_id", "embedding", k = K, coarse, lo, span, nProbe = 2), fixtureExact)
    info(f"ivf-sq8 recall@5 = $r%.3f")
    assert(r >= 0.6, f"IVF-SQ8 recall@5 regressed: $r%.3f < 0.6")
  }

  test("PQ/ADC and IVFADC recall@5 on the fixture stay above the gross-regression floor") {
    val e = Tables.embeddings(spark, sf)
    val books = Pq.seedCodebooks(e, "vec_id", "embedding", nSub = 8, nCodes = 16)
    val rPq = recallOf(Pq.topK(e.filter(col("vec_id") < 10), e,
      "vec_id", "embedding", k = K, books), fixtureExact)
    info(f"pq recall@5 = $rPq%.3f")
    assert(rPq >= 0.1, f"PQ/ADC recall@5 at random level: $rPq%.3f < 0.1")
    val coarse = Ivf.seedCentroids(e, "vec_id", "embedding", 8)
    val rIvf = recallOf(Pq.topKWithIvf(e.filter(col("vec_id") < 10), e,
      "vec_id", "embedding", k = K, coarse, books, nProbe = 2), fixtureExact)
    info(f"ivfadc recall@5 = $rIvf%.3f")
    assert(rIvf >= 0.1, f"IVFADC recall@5 at random level: $rIvf%.3f < 0.1")
  }

  // ---- planted-structure contract: matched capacity → near-perfect ----

  /** 16 well-separated Gaussian cluster centers × 32 members, 64 dims,
    * jitter two orders below the center separation. Ids INTERLEAVE
    * clusters (id i → cluster i % 16) so the seeded codebooks/centroids
    * (ids < nCodes) cover every cluster — matched capacity by
    * construction. True top-5 of any query = cluster-mates. */
  private lazy val plantedVecs: Array[(Long, Array[Double])] = {
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(16)(Array.fill(64)(rnd.nextGaussian()))
    (0 until 512).map { i =>
      val c = centers(i % 16)
      i.toLong -> c.map(_ + rnd.nextGaussian() * 0.02)
    }.toArray
  }

  private lazy val plantedDf: DataFrame = {
    import spark.implicits._
    plantedVecs.toSeq.map { case (id, v) => (id, v.map(_.toFloat).toSeq) }
      .toDF("vec_id", "embedding")
  }

  /** Cluster-mate precision@K on the planted set: fraction of the K
    * returned neighbors in the query's own cluster. The exact-top-5
    * metric is structurally wrong HERE: all 31 mates share identical
    * codes (same center → same codeword per subspace), so their
    * quantized distances tie exactly and the returned 5 are id-tie-
    * broken mates — exact-member overlap measures tie order (≈5/31),
    * not quality. What a coarse quantizer CAN and MUST preserve is the
    * cluster boundary: a sub-1.0 precision means it confused two
    * planted clusters two orders of magnitude apart. */
  private def matePrecision(got: DataFrame): Double = {
    val rows = got.collect().map(r => (r.getLong(0), r.getLong(2)))
    val byQ = rows.groupBy(_._1)
    assert(byQ.size == 10 && byQ.values.forall(_.length == K),
      s"every query must return $K rows: ${byQ.view.mapValues(_.length).toMap}")
    rows.count { case (q, n) => n % 16 == q % 16 }.toDouble / rows.length
  }

  test("planted clusters at matched capacity: PQ, trained PQ, and IVFADC never confuse clusters") {
    // sanity: the planted truth really is the cluster structure
    exactTopK(plantedVecs, 10).foreach { case (q, ex) =>
      assert(ex.forall(n => n % 16 == q % 16),
        s"planted exact top-5 of $q must be cluster-mates: $ex")
    }
    val seeded = Pq.seedCodebooks(plantedDf, "vec_id", "embedding",
      nSub = 8, nCodes = 16)
    val pSeed = matePrecision(Pq.topK(plantedDf.filter(col("vec_id") < 10),
      plantedDf, "vec_id", "embedding", k = K, seeded))
    info(f"planted pq seeded mate-precision@5 = $pSeed%.3f")
    assert(pSeed >= 0.95, f"PQ confused planted clusters: $pSeed%.3f < 0.95")
    val trained = Pq.train(plantedDf, "vec_id", "embedding",
      nSub = 8, nCodes = 16, iters = 3)
    val pTrain = matePrecision(Pq.topK(plantedDf.filter(col("vec_id") < 10),
      plantedDf, "vec_id", "embedding", k = K, trained))
    info(f"planted pq trained mate-precision@5 = $pTrain%.3f")
    assert(pTrain >= 0.95, f"trained PQ confused planted clusters: $pTrain%.3f < 0.95")
    val coarse = Ivf.seedCentroids(plantedDf, "vec_id", "embedding", 8)
    val pIvf = matePrecision(Pq.topKWithIvf(plantedDf.filter(col("vec_id") < 10),
      plantedDf, "vec_id", "embedding", k = K, coarse, seeded, nProbe = 2))
    info(f"planted ivfadc mate-precision@5 = $pIvf%.3f")
    assert(pIvf >= 0.9, f"IVFADC confused planted clusters: $pIvf%.3f < 0.9")
  }

  test("planted clusters: SQ8 and IVF-SQ8 never confuse clusters") {
    val (lo, span) = Sq8.trainBounds(plantedDf, "embedding")
    val p = matePrecision(Sq8.topK(plantedDf.filter(col("vec_id") < 10),
      plantedDf, "vec_id", "embedding", k = K, lo, span))
    info(f"planted sq8 mate-precision@5 = $p%.3f")
    assert(p >= 0.95, f"SQ8 confused planted clusters: $p%.3f < 0.95")
    val coarse = Ivf.seedCentroids(plantedDf, "vec_id", "embedding", 8)
    val pIvf = matePrecision(Sq8.topKWithIvf(plantedDf.filter(col("vec_id") < 10),
      plantedDf, "vec_id", "embedding", k = K, coarse, lo, span, nProbe = 2))
    info(f"planted ivf-sq8 mate-precision@5 = $pIvf%.3f")
    assert(pIvf >= 0.9, f"IVF-SQ8 confused planted clusters: $pIvf%.3f < 0.9")
  }

  test("drift defense: stale bounds destroy recall, clampFraction detects it, retrain recovers") {
    // r14 (VERDICT task 4). Planted drift: the fixture vectors shifted
    // +2.0f per dim become the drifted generation (ids 0..n-1, the
    // queries); the originals are the store (ids +10000). Under the
    // STORE-trained bounds every drifted dim clamps to code 255 — all
    // drifted vectors encode identically, so their mutual distances
    // vanish and recall collapses to tie-order noise. The clampFraction
    // monitor separates the regimes (≈1.0 vs 0.0 against the declared
    // 0.2 threshold), and retraining bounds on the accumulated union —
    // exactly what q_stream_ann_retrain's ingest does — recovers recall.
    val e = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val store = e.select((col("vec_id") + 10000L).as("vec_id"), col("embedding"))
    val drifted = e.select(col("vec_id"),
      transform(col("embedding"), x => x + lit(2.0f)).as("embedding"))
    val union = store.unionByName(drifted).localCheckpoint(true)
    val unionVecs = union.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    val exact = exactTopK(unionVecs, 10)

    val (loS, spanS) = Sq8.trainBounds(store, "embedding")
    val fracDrift = Sq8.clampFraction(drifted, "embedding", loS, spanS)
    val fracStore = Sq8.clampFraction(store, "embedding", loS, spanS)
    info(f"clampFraction drifted=$fracDrift%.3f in-distribution=$fracStore%.3f")
    assert(fracDrift > 0.2, f"planted drift must trip the threshold: $fracDrift%.3f")
    assert(fracStore == 0.0, f"the store never clamps against its own bounds: $fracStore%.3f")

    // dimensionality coverage is checked in BOTH directions (r14 ADVICE):
    // extra dims the bounds never saw refuse, and TRUNCATED embeddings
    // refuse too — a mixed batch where full vectors would mask the
    // truncated ones, and the empty-vector edge posexplode cannot see
    val truncated = store.limit(8).select(col("vec_id"),
      slice(col("embedding"), 1, 4).as("embedding"))
    val mixed = store.limit(8).unionByName(truncated)
    val eTrunc = intercept[IllegalArgumentException] {
      Sq8.clampFraction(mixed, "embedding", loS, spanS)
    }
    assert(eTrunc.getMessage.contains("truncated"), eTrunc.getMessage)
    val emptyVec = store.limit(2).select(col("vec_id"),
      slice(col("embedding"), 1, 0).as("embedding"))
    val eEmpty = intercept[IllegalArgumentException] {
      Sq8.clampFraction(store.limit(8).unionByName(emptyVec),
        "embedding", loS, spanS)
    }
    assert(eEmpty.getMessage.contains("truncated"), eEmpty.getMessage)

    val stale = recallOf(Sq8.topK(union.filter(col("vec_id") < 10), union,
      "vec_id", "embedding", k = K, loS, spanS), exact)
    val (loR, spanR) = Sq8.trainBounds(union, "embedding")
    val recovered = recallOf(Sq8.topK(union.filter(col("vec_id") < 10), union,
      "vec_id", "embedding", k = K, loR, spanR), exact)
    info(f"recall@5 stale=$stale%.3f retrained=$recovered%.3f")
    assert(stale < 0.5, f"stale bounds should have destroyed recall: $stale%.3f")
    assert(recovered >= 0.8, f"retrain must recover recall: $recovered%.3f < 0.8")
    assert(recovered > stale)
  }
}
