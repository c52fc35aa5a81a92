package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Dedup

/** VERDICT r6 #3 — connectedComponents under adversarial DIAMETER. The
  * dedup-cluster operator's cost is rounds × (join + agg); rounds must
  * grow like log2(diameter) (path halving), not linearly, or a
  * long-chain near-dup corpus (crawl mirrors, version chains) stalls the
  * pipeline. These properties pin correctness on path graphs where the
  * min id sits at an arbitrary position, plus the round bound itself. */
class ChainComponentsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** Path graph over n nodes with ids permuted by hash rank — the min id
    * lands at an arbitrary chain position, making the label travel the
    * full diameter. */
  private def chain(n: Int): org.apache.spark.sql.DataFrame = {
    val perm = spark.range(n.toLong).toDF("node")
      .withColumn("pos", row_number()
        .over(org.apache.spark.sql.expressions.Window
          .orderBy(xxhash64(col("node"), lit("perm")))) - 1)
    perm.as("a").join(perm.as("b"), col("a.pos") + 1 === col("b.pos"))
      .select(col("a.node").as("a"), col("b.node").as("b"))
  }

  test("a permuted chain collapses to ONE component labeled with the min id") {
    // both dispatch arms (r18 opt): the local union-find (default — these
    // chains are far under the threshold) and the distributed star
    // iteration (forced via localMaxEdges = 0) must agree exactly
    for (localMax <- Seq(Dedup.LocalCcMaxEdgesDefault, 0L); n <- Seq(33, 257, 2048)) {
      val (comp, _) = Dedup.connectedComponentsWithStats(chain(n), "a", "b",
        maxIter = 64, localMaxEdges = localMax)
      val labels = comp.select("component").distinct().collect().map(_.getLong(0))
      assert(labels.toSeq == Seq(0L),
        s"n=$n localMax=$localMax: expected single component 0, got ${labels.toSeq}")
      assert(comp.count() == n)
    }
  }

  test("local union-find path is row-identical to the distributed iteration") {
    // hash-derived random multigraph with self-loops, duplicate edges and
    // isolated-by-self-loop nodes — every edge-canonicalization corner
    import spark.implicits._
    val edges = spark.range(3000).toDF("i")
      .select(pmod(xxhash64(col("i"), lit("pa")), lit(900)).as("a"),
        pmod(xxhash64(col("i"), lit("pb")), lit(900)).as("b"))
    val local = Dedup.connectedComponentsWithStats(edges, "a", "b", 64,
      localMaxEdges = Dedup.LocalCcMaxEdgesDefault)._1
    val dist = Dedup.connectedComponentsWithStats(edges, "a", "b", 64,
      localMaxEdges = 0L)._1
    assert(local.exceptAll(dist).isEmpty && dist.exceptAll(local).isEmpty,
      "local and distributed component labelings diverge")
  }

  test("rounds grow like log2(diameter), not linearly") {
    val measured = Seq(64, 512, 4096).map { n =>
      // localMaxEdges = 0 forces the distributed iteration — the round
      // bound is ITS property (the local path reports 0 rounds)
      val (comp, iters) = Dedup.connectedComponentsWithStats(chain(n), "a", "b",
        maxIter = 64, localMaxEdges = 0L)
      comp.count() // force
      n -> iters
    }
    measured.foreach { case (n, iters) =>
      val bound = 2 * (math.log(n.toDouble) / math.log(2)) + 4
      assert(iters <= bound,
        s"chain n=$n took $iters rounds (log-bound ${bound.toInt}) — halving is not engaging")
    }
    // 64x the diameter must cost only additive extra rounds, never 64x
    val r64 = measured.head._2; val r4096 = measured.last._2
    assert(r4096 <= r64 + 8,
      s"rounds grew $r64 -> $r4096 across 64x diameter — super-logarithmic")
  }

  test("two disjoint chains stay separate components") {
    val c1 = chain(100)
    // shift ids into a disjoint range for the second chain
    val c2 = chain(80).select((col("a") + 1000000).as("a"), (col("b") + 1000000).as("b"))
    val (comp, _) = Dedup.connectedComponentsWithStats(c1.union(c2), "a", "b", maxIter = 64)
    val labels = comp.select("component").distinct().collect().map(_.getLong(0)).sorted
    assert(labels.toSeq == Seq(0L, 1000000L))
  }
}
