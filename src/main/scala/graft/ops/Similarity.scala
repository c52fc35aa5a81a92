package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.TopKAggregate
import org.apache.spark.sql.types._

/** Similarity search over an embedding column (`Array[Float]`):
  * brute-force cosine top-k as the exactness baseline, and a
  * random-hyperplane LSH-bucketed variant as the scale path.
  *
  * Dot products are computed with `zip_with` + `aggregate` over
  * double-cast arrays — fixed left-to-right accumulation, so results are
  * bit-reproducible across engines (the DuckDB oracle mirrors the same
  * fold). At cluster scale the corpus side is the big table; queries are
  * broadcast, and the LSH variant turns the cross join into a bucket
  * equi-join.
  */
object Similarity {

  /** Deterministic double-cast of a float embedding. */
  def asDouble(v: Column): Column = transform(v, x => x.cast(DoubleType))

  /** Reference (interpreted) forms — kept for the parity spec; the hot
    * path uses the fused codegen expressions below. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
  def normHof(a: Column): Column = sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))
  def cosineHof(a: Column, b: Column): Column =
    round(dotHof(a, b) / (normHof(a) * normHof(b)), 6)

  def dot(a: Column, b: Column): Column =
    graft.expressions.VectorExpressions.dotProduct(a, b)

  /** Cosine similarity via the custom codegen expression (same ascending-
    * index accumulation as the HOF form and the DuckDB oracle → identical
    * bits), rounded to 6 decimals so ranking ties break on the id. */
  def cosine(a: Column, b: Column): Column =
    round(graft.expressions.VectorExpressions.cosineSimilarity(a, b), 6)

  /** Rank scored (query_id, neighbor_id, `scoreName`) candidate rows
    * into per-query top-k via the bounded [[TopKAggregate]] — a
    * partial-aggregatable O(k)-state heap per query, replacing the
    * `row_number()` rank window every search path used through r10.
    * The window was the one flagged 100 TB scale-killer: ranking k≈50
    * of 10⁹ candidates sorted (and spilled) a corpus-sized partition
    * per query; the aggregate streams each candidate once, combines
    * map-side, and shuffles only k pairs per query. Ordering — score
    * ascending (`ascending = true`, distances) or descending
    * (cosines), ties to the lower neighbor id — is byte-identical to
    * the window form (TopKRankParitySpec pins it). */
  def rankTopK(scored: DataFrame, scoreName: String, k: Int,
               ascending: Boolean): DataFrame =
    scored.groupBy(col("query_id"))
      .agg(TopKAggregate.topKByScore(
        col(scoreName), col("neighbor_id"), k, ascending).as("__top"))
      .select(col("query_id"), posexplode(col("__top")).as(Seq("__pos", "__t")))
      .select(col("query_id"),
        (col("__pos") + 1).cast(IntegerType).as("rank"),
        col("__t.id").as("neighbor_id"),
        col("__t.score").as(scoreName))

  /** Brute-force cosine top-k: queries × corpus cross join — exact, and
    * the right choice when queries are few (broadcast the query side).
    * O(|Q|·|C|·d): the baseline the ANN path is judged against. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"))
    val scored = broadcast(q).crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("qv"), col("cv")))
    rankTopK(scored, "cosine", k, ascending = false)
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * md5-derived value in [-1, 1]. Reproducible in any engine with md5. */
  def planeComponent(plane: Int, dim: Int): Column =
    ((conv(substring(md5(lit(s"plane_${plane}_$dim")), 1, 7), 16, 10).cast(LongType)
      % 2001L) - 1000L).cast(DoubleType) / 1000.0

  /** Sign-of-projection LSH bucket id over `planes` hyperplanes for a
    * `dims`-dimensional embedding: bit p = (v · plane_p) > 0. */
  def lshBucket(v: Column, planes: Int, dims: Int): Column = {
    val bits: Seq[Column] = (0 until planes).map { p =>
      val proj = dot(v, array((0 until dims).map(d => planeComponent(p, d)): _*))
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** ANN top-k: bucket both sides with hyperplane LSH, join on the bucket
    * key (the only shuffle), rank within bucket. Recall < 1 by design —
    * the scale path for 10^9-vector corpora where the cross join is
    * impossible; bucket count 2^planes tunes the recall/fan-out trade. */
  def lshTopK(queries: DataFrame, corpus: DataFrame,
              idCol: String, vecCol: String, k: Int,
              planes: Int = 6, dims: Int = 64): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
      .withColumn("bucket", lshBucket(col("qv"), planes, dims))
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"))
      .withColumn("bucket", lshBucket(col("cv"), planes, dims))
    val scored = q.join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("qv"), col("cv")))
    rankTopK(scored, "cosine", k, ascending = false)
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold within LSH buckets
    * (same blocking as lshTopK, symmetric output). */
  def embeddingDupPairs(df: DataFrame, idCol: String, vecCol: String,
                        threshold: Double, planes: Int = 4, dims: Int = 64): DataFrame = {
    val v = df.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("bucket", lshBucket(col("v"), planes, dims))
    val a = v.select(col("bucket"), col("id").as("id_a"), col("v").as("va"))
    val b = v.select(col("bucket"), col("id").as("id_b"), col("v").as("vb"))
    a.join(b, Seq("bucket")).filter(col("id_a") < col("id_b"))
      .withColumn("cosine", cosine(col("va"), col("vb")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine").distinct()
  }
}
