package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Multimodal}

/** Perceptual image dedup (r9): dHash/aHash over the real javax.imageio
  * decode, and hamming near-dup pairs through the generalized block-LSH.
  * The blocked join's exact-recall claim (pigeonhole at maxHamming <
  * nBlocks) is pinned against a brute-force pair scan. */
class ImageHashSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("downscale path: a 2x-scaled image hashes identically to its base pattern") {
    val docs = Tables.documents(spark, sf).limit(40)
    def hashes(scale: Int): Map[Long, (Option[Long], Option[Long])] =
      Multimodal.imageHashesBatched(
        Multimodal.toPatternedImageAssets(docs, "doc_id", scale))
        .collect().map(r => r.getLong(0) ->
          (Option(r.get(1)).map(_.asInstanceOf[Long]),
            Option(r.get(2)).map(_.asInstanceOf[Long]))).toMap
    val base = hashes(1)
    val scaled = hashes(2)
    assert(base.nonEmpty && base.keySet == scaled.keySet)
    base.foreach { case (id, hs) =>
      assert(hs._1.nonEmpty && hs._2.nonEmpty, s"asset $id must decode")
      assert(scaled(id) == hs, s"box-average downscale must be exact for asset $id")
    }
    assert(base.values.map(_._1).toSet.size > 1, "dhashes must vary across assets")
  }

  test("undecodable and non-image payloads degrade to null hashes per row") {
    import spark.implicits._
    val png = Multimodal.toPatternedImageAssets(
      Seq(1L).toDF("id"), "id").collect()(0).getAs[Array[Byte]]("payload")
    val assets = Seq(
      (1L, "image/png", png),
      (2L, "image/png", "garbage".getBytes),
      (3L, "audio/wav", png), // wrong media type: not attempted
      (4L, "image/png", null.asInstanceOf[Array[Byte]]))
      .toDF("asset_id", "media_type", "payload")
    val out = Multimodal.imageHashesBatched(assets)
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(out == Map(1L -> false, 2L -> true, 3L -> true, 4L -> true))
  }

  test("block-LSH hamming pairs == brute force at maxHamming < nBlocks (64-bit)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val baseSigs = (0 until 300).map(i => i.toLong -> rnd.nextLong())
    // planted near-dups: flip 1..3 bits of an existing signature
    val planted = (0 until 30).map { i =>
      val (srcId, sig) = baseSigs(i * 7 % baseSigs.size)
      val flips = 1 + i % 3
      val mutated = (0 until flips).foldLeft(sig)((s, j) =>
        s ^ (1L << rnd.nextInt(64)))
      (1000L + i) -> mutated
    }
    val all = baseSigs ++ planted
    val df = all.toDF("id", "h")
    val blocked = Dedup.hammingPairs(df, "id", "h", maxHamming = 3,
      nBlocks = 4, blockBits = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = (for {
      (ia, ha) <- all; (ib, hb) <- all
      if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb)
      if d <= 3
    } yield (ia, ib, d)).toSet
    assert(brute.nonEmpty, "planted near-dups must produce pairs")
    assert(blocked == brute,
      s"missing: ${brute -- blocked}, extra: ${blocked -- brute}")
  }

  test("end-to-end: near-identical images pair, corrupt rows drop out") {
    import spark.implicits._
    // 2 identical patterns (hamming 0) + 58 distinct ids; patterns repeat
    // with id period 256, so 1L and 257L are exact perceptual duplicates
    val ids = (Seq(1L, 257L) ++ (2L until 60L)).toDF("id")
    val assets = Multimodal.toPatternedImageAssets(ids, "id")
      .withColumn("payload",
        when(col("asset_id") === 5L, lit("junk".getBytes)).otherwise(col("payload")))
    val sigs = Multimodal.imageHashesBatched(assets)
    val pairs = Dedup.hammingPairs(sigs, "asset_id", "dhash", maxHamming = 0,
      nBlocks = 4, blockBits = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 257L)), s"identical patterns must pair: $pairs")
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L), "corrupt row must drop out")
  }
}
