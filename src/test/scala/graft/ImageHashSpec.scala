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

  test("BlockLayoutParity: 6x10 block layout == default 4x15 at maxHamming < nBlocks (60-bit)") {
    // r19 (VERDICT r18 #5): the ScaleProbe simhash_pairs_6x10 leg
    // compares candidate cost of the two layouts; this pin proves the
    // comparison is apples-to-apples — at maxHamming = 3 both layouts
    // are recall-complete, so the exact hamming filter yields identical
    // pair sets over 60-bit simhash-shaped signatures.
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val mask60 = (1L << 60) - 1
    val baseSigs = (0 until 300).map(i => i.toLong -> (rnd.nextLong() & mask60))
    val planted = (0 until 30).map { i =>
      val (_, sig) = baseSigs(i * 11 % baseSigs.size)
      val flips = 1 + i % 3
      val mutated = (0 until flips).foldLeft(sig)((s, _) =>
        s ^ (1L << rnd.nextInt(60)))
      (1000L + i) -> mutated
    }
    val df = (baseSigs ++ planted).toDF("id", "h")
    def pairs(nBlocks: Int, blockBits: Int) =
      Dedup.hammingPairs(df, "id", "h", maxHamming = 3, nBlocks, blockBits)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val p4x15 = pairs(4, 15)
    val p6x10 = pairs(6, 10)
    assert(p4x15.nonEmpty, "planted near-dups must produce pairs")
    assert(p4x15 == p6x10,
      s"missing: ${p4x15 -- p6x10}, extra: ${p6x10 -- p4x15}")
  }

  test("image features: hand-computed descriptor on a known 3x2 color image") {
    import spark.implicits._
    // one pixel per pooled cell (gridW=3, gridH=2) so the luma grid is
    // the per-pixel luma; histogram over 6 pixels is countable by hand
    val img = new java.awt.image.BufferedImage(3, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xFF0000); img.setRGB(1, 0, 0x00FF00); img.setRGB(2, 0, 0x0000FF)
    img.setRGB(0, 1, 0xFFFFFF); img.setRGB(1, 1, 0x000000); img.setRGB(2, 1, 0x808080)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val assets = Seq((1L, "image/png", out.toByteArray))
      .toDF("asset_id", "media_type", "payload")
    val row = Multimodal.imageFeaturesBatched(assets).collect()(0)
    assert(row.getAs[Int]("width") == 3 && row.getAs[Int]("height") == 2)
    val feats = row.getSeq[Double](row.fieldIndex("features")).toSeq
    // luma: red (299*255)/1000=76, green 149, blue 29, white 255, black 0, gray 128
    val expLuma = Seq(76, 149, 29, 255, 0, 128).map(_ / 255.0)
    // each channel sees three 0s (bin 0), one 128 (bin 2), two 255s (bin 3)
    val expHist = Seq(3, 0, 1, 2).map(_ / 6.0)
    assert(feats == expLuma ++ expHist ++ expHist ++ expHist,
      s"got $feats")
  }

  test("image features: 2x-scaled pattern yields the identical vector (exact box average)") {
    val docs = Tables.documents(spark, sf).limit(40)
    def feats(scale: Int): Map[Long, Seq[Double]] =
      Multimodal.imageFeaturesBatched(
        Multimodal.toPatternedImageAssets(docs, "doc_id", scale))
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](r.fieldIndex("features")).toSeq).toMap
    val base = feats(1)
    val scaled = feats(2)
    assert(base.nonEmpty && base.keySet == scaled.keySet)
    base.foreach { case (id, f) =>
      assert(f != null && f.length == 6 + 12, s"asset $id must decode")
      assert(scaled(id) == f, s"scale-invariant descriptor must be exact for asset $id")
      val histSum = f.drop(6).sum
      assert(math.abs(histSum - 3.0) < 1e-9, s"3 channel hists must each sum to 1: $histSum")
    }
    assert(base.values.toSet.size > 1, "features must vary across assets")
  }

  test("image features: undecodable, non-image, and null payloads degrade to null rows") {
    import spark.implicits._
    val png = Multimodal.toPatternedImageAssets(
      Seq(1L).toDF("id"), "id").collect()(0).getAs[Array[Byte]]("payload")
    val assets = Seq(
      (1L, "image/png", png),
      (2L, "image/png", "garbage".getBytes),
      (3L, "audio/wav", png),
      (4L, "image/png", null.asInstanceOf[Array[Byte]]))
      .toDF("asset_id", "media_type", "payload")
    val out = Multimodal.imageFeaturesBatched(assets)
      .collect().map(r => r.getLong(0) -> r.isNullAt(3)).toMap
    assert(out == Map(1L -> false, 2L -> true, 3L -> true, 4L -> true))
  }

  test("bounded decode: header dimensions past the pixel cap reject before allocation") {
    import spark.implicits._
    val png = Multimodal.toPatternedImageAssets(
      Seq(1L).toDF("id"), "id").collect()(0).getAs[Array[Byte]]("payload")
    assert(Multimodal.readImageBounded(png).nonEmpty, "a sane image decodes")
    // the cap is checked against the HEADER's declared size, before any
    // pixel buffer exists — the decompression-bomb guard (a 100000x100000
    // PNG header would otherwise drive a ~40 GB allocation and OOM the
    // task instead of degrading the row)
    assert(Multimodal.readImageBounded(png, maxPixels = 10).isEmpty)
    assert(Multimodal.readImageBounded("garbage".getBytes).isEmpty)
    assert(Multimodal.readImageBounded(Array.empty[Byte]).isEmpty)
  }

  test("image features: batch size does not change results") {
    val docs = Tables.documents(spark, sf).limit(25)
    val assets = Multimodal.toPatternedImageAssets(docs, "doc_id")
    val a = Multimodal.imageFeaturesBatched(assets, batchSize = 7)
      .orderBy("asset_id").collect().map(_.toString).toSeq
    val b = Multimodal.imageFeaturesBatched(assets, batchSize = 64)
      .orderBy("asset_id").collect().map(_.toString).toSeq
    assert(a == b)
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
