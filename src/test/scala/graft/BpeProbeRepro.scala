package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Regression pin for the r16 probe-validity find: the raw ScaleProbe
  * corpus pre-tokenizes into SINGLE characters ("w1234" → "w", "1",
  * "2", "3", "4" — the BPE pre-token pattern's [0-9] alternative
  * matches one digit), so a trainer run over it exhausts on the first
  * empty argmax and learns NOTHING — which the bpe_train4 probe leg
  * silently timed as "training" from r15 until r16 (shuffle 416 was
  * one empty pair-count pass). The letterized projection the fixed leg
  * uses must actually learn its merges. */
class BpeProbeRepro extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("probe corpus: raw form trains zero merges (single-char pre-tokens); letterized form trains") {
    val docs = ScaleProbe.corpus(spark, 2000).cache()
    docs.count()
    try {
      val raw = graft.ops.TextAnalysis.bpeTrainMerges(docs, "text", nMerges = 4)
        .collect()
      assert(raw.isEmpty,
        s"raw probe corpus should have no adjacent pairs, learned ${raw.length}")
      val lettered = docs.select(
        translate(col("text"), "0123456789", "abcdefghij").as("text"))
      val learned = graft.ops.TextAnalysis.bpeTrainMerges(lettered, "text",
        nMerges = 4).collect()
      assert(learned.length == 4,
        s"letterized corpus must train all 4 merges, got ${learned.length}")
      // sanity: every learned merge carries a positive pair frequency
      assert(learned.forall(_.getLong(3) > 0))
    } finally docs.unpersist()
  }
}
