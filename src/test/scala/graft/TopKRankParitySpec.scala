package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{TopKAggregate, TopKState}
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Similarity

/** The bounded [[TopKAggregate]] replaced the per-query rank windows on
  * every similarity search path (r10 verdict item 1: a corpus-sized sort
  * partition per query was the last flagged 100 TB scale-killer). The
  * aggregate must reproduce `row_number() OVER (PARTITION BY query_id
  * ORDER BY score [DESC], neighbor_id) <= k` BYTE-FOR-BYTE — same rows,
  * same ranks, same tie resolution — under partial aggregation, merge,
  * and serialization. Parity is pinned on the fixture embeddings (real
  * rounded-cosine ties) and on adversarial synthetic groups (all-equal
  * scores, k larger than the group, single-row groups). */
class TopKRankParitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** The r10 window form, verbatim. */
  private def windowForm(scored: DataFrame, scoreName: String, k: Int,
                         ascending: Boolean): DataFrame = {
    val ord = if (ascending) col(scoreName).asc else col(scoreName).desc
    val w = Window.partitionBy("query_id").orderBy(ord, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"),
        col("neighbor_id").cast("long").as("neighbor_id"), col(scoreName))
  }

  // scores compare by BIT PATTERN: tuple equality uses primitive == on
  // Double fields, under which NaN != NaN would false-fail the NaN rows
  private def collectKeyed(df: DataFrame, scoreName: String): Set[(Long, Int, Long, Long)] =
    df.select(col("query_id").cast("long"), col("rank").cast("int"),
        col("neighbor_id").cast("long"), col(scoreName).cast("double"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        java.lang.Double.doubleToLongBits(r.getDouble(3))))
      .toSet

  private def assertParity(scored: DataFrame, scoreName: String, k: Int,
                           ascending: Boolean): Unit = {
    val agg = collectKeyed(Similarity.rankTopK(scored, scoreName, k, ascending), scoreName)
    val win = collectKeyed(windowForm(scored, scoreName, k, ascending), scoreName)
    assert(agg == win,
      s"bounded top-k diverged from the rank window (k=$k asc=$ascending): " +
        s"only-agg=${(agg -- win).take(5)} only-win=${(win -- agg).take(5)}")
  }

  test("aggregate == rank window on fixture cosine scores (rounded ties, both orders)") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), Similarity.asDouble(col("embedding")).as("qv"))
    val c = e.select(col("vec_id").as("neighbor_id"),
      Similarity.asDouble(col("embedding")).as("cv"))
    val scored = broadcast(q).crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", Similarity.cosine(col("qv"), col("cv")))
      .select("query_id", "neighbor_id", "cosine")
    for (k <- Seq(1, 5, 20); asc <- Seq(true, false)) {
      assertParity(scored, "cosine", k, asc)
    }
  }

  test("aggregate == rank window on adversarial groups: all-tied scores, k > group, singletons") {
    import spark.implicits._
    val rows =
      // query 1: every score identical → rank is purely the id tiebreak
      (1 to 30).map(i => (1L, i.toLong, 0.5)) ++
        // query 2: two-level ties
        (1 to 20).map(i => (2L, i.toLong, if (i % 2 == 0) 1.0 else 2.0)) ++
        // query 3: singleton
        Seq((3L, 99L, 7.0)) ++
        // query 4: fewer candidates than k
        (1 to 3).map(i => (4L, i.toLong, i.toDouble))
    val scored = rows.toDF("query_id", "neighbor_id", "dist")
      .repartition(7) // force partial buffers + merge + serde across tasks
    for (k <- Seq(1, 5, 30, 100); asc <- Seq(true, false)) {
      assertParity(scored, "dist", k, asc)
    }
  }

  test("NaN scores: aggregate == rank window in BOTH orders (nan-safe compare)") {
    import spark.implicits._
    // NaN is reachable: CosineSimilarity yields 0/0 = NaN on a zero-norm
    // vector. Spark's window ORDER BY sorts NaN above every finite double
    // (last ascending, FIRST descending); raw IEEE comparisons in the heap
    // made NaN unbeatable in both directions — r11 ADVICE item.
    val rows =
      Seq((1L, 1L, 0.3), (1L, 2L, Double.NaN), (1L, 3L, 0.9), (1L, 4L, Double.NaN),
        (1L, 5L, 0.1),
        // query 2: all NaN → rank purely by id in both orders
        (2L, 1L, Double.NaN), (2L, 2L, Double.NaN), (2L, 3L, Double.NaN),
        // query 3: -0.0 vs 0.0 must TIE (id breaks it), not order by sign bit
        (3L, 7L, 0.0), (3L, 8L, -0.0), (3L, 9L, Double.NaN))
    val scored = rows.toDF("query_id", "neighbor_id", "dist").repartition(5)
    for (k <- Seq(1, 2, 3, 10); asc <- Seq(true, false)) {
      assertParity(scored, "dist", k, asc)
    }
  }

  test("null scores/ids are skipped == window over the null-filtered input") {
    import spark.implicits._
    // The search paths never emit null candidate rows (cosine over
    // non-null embeddings); this pins the aggregate's skip-nulls choice
    // as equivalent to ranking the null-free input, rather than leaving
    // it a comment — r11 ADVICE item.
    val rows: Seq[(Long, java.lang.Long, java.lang.Double)] =
      Seq((1L, 1L, 0.5), (1L, 2L, null), (1L, null, 0.25), (1L, 3L, 0.75),
        (2L, null, null), (2L, 4L, 0.125))
    val scored = rows.toDF("query_id", "neighbor_id", "dist")
    val filtered = scored.filter(col("dist").isNotNull && col("neighbor_id").isNotNull)
    for (k <- Seq(1, 5); asc <- Seq(true, false)) {
      val agg = collectKeyed(Similarity.rankTopK(scored, "dist", k, asc), "dist")
      val win = collectKeyed(windowForm(filtered, "dist", k, asc), "dist")
      assert(agg == win, s"null-skip parity broke (k=$k asc=$asc)")
    }
  }

  test("empty input and k=0 produce no rows") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long, Double)].toDF("query_id", "neighbor_id", "dist")
    assert(Similarity.rankTopK(empty, "dist", 5, ascending = true).count() == 0)
    val one = Seq((1L, 2L, 0.5)).toDF("query_id", "neighbor_id", "dist")
    assert(Similarity.rankTopK(one, "dist", 0, ascending = true).count() == 0)
  }

  test("TopKState heap keeps exactly the k best under both orders (exhaustive small-n)") {
    // deterministic pseudo-random insert orders (no Math.random in specs
    // either — reproducibility is the whole point of the parity pin)
    val rng = new scala.util.Random(42)
    for (_ <- 1 to 50; asc <- Seq(true, false)) {
      val n = 1 + rng.nextInt(40)
      val k = 1 + rng.nextInt(12)
      val pairs = Array.fill(n)((rng.nextInt(8).toDouble, rng.nextInt(1000).toLong))
      val distinctPairs = pairs.distinct // ordering is total only on distinct (s, id)
      val st = new TopKState(k, asc)
      distinctPairs.foreach { case (s, i) => st.insert(s, i) }
      val expected = distinctPairs.sortBy { case (s, i) => (if (asc) s else -s, i) }.take(k).toSeq
      assert(st.sortedPairs.toSeq == expected,
        s"heap mismatch n=$n k=$k asc=$asc")
    }
  }

  test("merge of split states == single state over the union") {
    val rng = new scala.util.Random(7)
    val pairs = Array.fill(60)((rng.nextInt(10).toDouble, rng.nextLong().abs)).distinct
    val (a, b) = pairs.splitAt(25)
    for (k <- Seq(1, 7, 100); asc <- Seq(true, false)) {
      val whole = new TopKState(k, asc)
      pairs.foreach { case (s, i) => whole.insert(s, i) }
      val sa = new TopKState(k, asc); a.foreach { case (s, i) => sa.insert(s, i) }
      val sb = new TopKState(k, asc); b.foreach { case (s, i) => sb.insert(s, i) }
      sa.merge(sb)
      assert(sa.sortedPairs.toSeq == whole.sortedPairs.toSeq, s"merge mismatch k=$k asc=$asc")
    }
  }
}
