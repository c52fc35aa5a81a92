package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Multimodal}

/** r14: the video modality — real YUV4MPEG2 bytes end to end. The
  * generator emits actual Y4M streams (ASCII header + FRAME markers +
  * planar 4:2:0 payloads), the bounded reader parses the actual bytes
  * back, and the frame means / fingerprints are integer-pinned against
  * the generator's luma law, so a drifting parser or a float sneaking
  * into the plane math fails loudly here before the oracle gate. Ids
  * come from a plain range so every planted class — mod-16 envelope
  * groups, mod-80 perturbations, mod-101 corruption — is present at a
  * known density regardless of fixture scale. */
class VideoSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val N = 500L

  private def assets = Multimodal.toY4mAssets(
    spark.range(N).toDF("doc_id"), "doc_id")

  test("generated Y4M streams parse back: header fields, frame count, and plane means match the id arithmetic") {
    val rows = assets.filter(col("asset_id") < 10 && col("asset_id") % 101 =!= 0)
      .collect().map(r => r.getAs[Long]("asset_id") -> r.getAs[Array[Byte]]("payload"))
    assert(rows.nonEmpty)
    rows.foreach { case (id, payload) =>
      val Some((w, h, fn, fd, planes)) = Multimodal.readY4mBounded(payload)
      assert(w == 16 && h == 16 && fd == 1, s"id=$id geometry $w x $h / $fd")
      assert(fn == 24 + (id % 4).toInt * 6, s"id=$id fps=$fn")
      assert(planes.length == 48 + (id % 3).toInt, s"id=$id frames=${planes.length}")
      // the ±4 checkerboard cancels over the 256-pixel plane: the
      // integer mean IS the luma law, exactly
      (0 until 3).foreach { f =>
        val sum = planes(f).map(_ & 0xFF).map(_.toLong).sum
        assert(sum / 256 == Multimodal.videoLuma(id, f),
          s"id=$id frame=$f mean ${sum / 256} != luma law")
        // and the plane is a genuine checkerboard, not a constant fill
        assert(planes(f).toSet.size == 2, s"id=$id frame=$f plane degenerate")
      }
    }
  }

  test("bounded decode: truncation, garbage, geometry bombs, and non-420 colorspaces degrade to None") {
    val good = assets.filter(col("asset_id") === 1).collect()(0)
      .getAs[Array[Byte]]("payload")
    assert(Multimodal.readY4mBounded(good).isDefined)
    assert(Multimodal.readY4mBounded(good.take(10)).isEmpty, "truncated header")
    assert(Multimodal.readY4mBounded("not video at all".getBytes).isEmpty)
    assert(Multimodal.readY4mBounded(null).isEmpty)
    // a header declaring an 8K×8K frame must be rejected BEFORE any
    // plane allocation
    val bomb = ("YUV4MPEG2 W8192 H8192 F25:1 C420jpeg\n" + "FRAME\n")
      .getBytes("US-ASCII")
    assert(Multimodal.readY4mBounded(bomb, maxBytes = 1 << 20).isEmpty, "geometry bomb")
    // truncated mid-frame: the last frame's payload is cut short
    assert(Multimodal.readY4mBounded(good.dropRight(5)).isEmpty, "truncated frame")
    // a 4:2:2 stream is outside the parser's declared support
    val c422 = new String(good.takeWhile(_ != '\n'.toByte), "US-ASCII")
      .replace("C420jpeg", "C422").getBytes("US-ASCII") ++
      good.dropWhile(_ != '\n'.toByte)
    assert(Multimodal.readY4mBounded(c422).isEmpty, "non-420 colorspace")
    // zero frames after a valid header is not a video
    val headerOnly = good.takeWhile(_ != '\n'.toByte) ++ Array('\n'.toByte)
    assert(Multimodal.readY4mBounded(headerOnly).isEmpty, "zero frames")
  }

  test("decode gate shape: id-arithmetic fields, corrupt assets null out") {
    val out = Multimodal.decodeY4mBatched(assets).collect()
      .map(r => r.getAs[Long]("asset_id") ->
        (Option(r.getAs[Any]("n_frames")), Option(r.getAs[Any]("duration_ms")))).toMap
    assert(out.keySet == (0L until N).toSet)
    (0L until N).foreach { id =>
      if (id % 101 == 0) assert(out(id) == ((None, None)), s"corrupt id=$id")
      else {
        val nf = 48 + id % 3
        assert(out(id)._1.contains(nf), s"id=$id frames ${out(id)}")
        assert(out(id)._2.contains(nf * 1000L / (24 + (id % 4) * 6)), s"id=$id duration")
      }
    }
  }

  test("frame sampling: every Nth frame, integer mean luma, corrupt as one null row") {
    val out = Multimodal.frameSampleBatched(assets, everyNth = 3).collect()
    val byId = out.groupBy(_.getAs[Long]("asset_id"))
    (0L until N).foreach { id =>
      val rows = byId(id)
      if (id % 101 == 0) {
        assert(rows.length == 1 && rows(0).isNullAt(1) && rows(0).isNullAt(2),
          s"corrupt id=$id must surface exactly one null row")
      } else {
        val nf = (48 + id % 3).toInt
        val idxs = rows.map(_.getAs[Long]("frame_idx")).sorted
        assert(idxs.toSeq == (0 until nf by 3).map(_.toLong), s"id=$id idxs")
        rows.foreach { r =>
          val f = r.getAs[Long]("frame_idx").toInt
          assert(r.getAs[Long]("mean_luma") == Multimodal.videoLuma(id, f),
            s"id=$id frame=$f mean drifted from the luma law")
        }
      }
    }
    intercept[IllegalArgumentException](
      Multimodal.frameSampleBatched(assets, everyNth = 0))
    // everyNth = 1 is the dense decode: one row per frame
    val dense = Multimodal.frameSampleBatched(
      assets.filter(col("asset_id") === 1), everyNth = 1).count()
    assert(dense == 49L)
  }

  test("fingerprints match the luma law bit for bit; envelope mates pair at hamming 0") {
    val fps = Multimodal.videoFingerprintsBatched(assets)
      .collect().map(r => r.getAs[Long]("asset_id") ->
        (Option(r.getAs[Any]("n_frames")), Option(r.getAs[Any]("vfp")))).toMap
    (0L until N).foreach { id =>
      if (id % 101 == 0) assert(fps(id) == ((None, None)), s"corrupt id=$id")
      else {
        var expected = 0L
        (1 to 47).foreach { f =>
          if (Multimodal.videoLuma(id, f) > Multimodal.videoLuma(id, f - 1))
            expected |= 1L << f
        }
        assert(fps(id)._2.contains(expected), s"id=$id fingerprint drifted")
      }
    }
    val sigs = Multimodal.videoFingerprintsBatched(assets).localCheckpoint(true)
    val pairs = Dedup.hammingPairs(sigs, "asset_id", "vfp",
      maxHamming = 2, nBlocks = 3, blockBits = 16)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Int]("hamming")))
    assert(pairs.nonEmpty)
    val g1 = (0L until N).filter(i => i % 16 == 1 && i % 80 != 0 && i % 101 != 0).take(2)
    assert(pairs.exists(p => p._1 == g1(0) && p._2 == g1(1) && p._3 == 0),
      s"envelope mates ${g1.toList} must pair at hamming 0")
    assert(pairs.forall(_._3 <= 2))
    assert(pairs.forall(p => p._1 % 101 != 0 && p._2 % 101 != 0))
  }

  test("trimmed clips: the envelope provably misses them; frame-level overlap catches them at 1.0") {
    // r15 (VERDICT task 3). The planted trims (first 9 frames cut,
    // id + 1000000, corruption following the base id) shift the 47-bit
    // delta code, so the whole-asset envelope lands OUTSIDE the banded
    // join's maxHamming=2 radius for every planted pair — the blindness
    // the frame-level operator exists to close.
    val baseIds = (0L until N).filter(i => i % 100 == 5 && i % 101 != 0)
    val bases = assets.filter(col("asset_id") % 100 === 5)
    val trims = Multimodal.toY4mTrimmedAssets(
      spark.range(N).toDF("doc_id").filter(col("doc_id") % 100 === 5),
      "doc_id", dropFrames = 9, idOffset = 1000000L)
    // 1) trimmed bytes are REAL Y4M: parse back, frame f = base frame f+9
    val Some((w, h, _, _, planes)) = Multimodal.readY4mBounded(
      trims.filter(col("asset_id") === 1000005L)
        .collect()(0).getAs[Array[Byte]]("payload"))
    assert(w == 16 && h == 16 && planes.length == 48 + (5 % 3) - 9)
    (0 until 3).foreach { f =>
      val mean = planes(f).map(_ & 0xFF).map(_.toLong).sum / 256
      assert(mean == Multimodal.videoLuma(5L, f + 9),
        s"trim frame $f must play base frame ${f + 9}")
    }
    // 2) the envelope MISSES: every (base, trim) fingerprint pair is
    //    beyond the gate's maxHamming=2
    val fp = Multimodal.videoFingerprintsBatched(bases.unionByName(trims))
      .collect().flatMap(r => Option(r.getAs[Any]("vfp"))
        .map(v => r.getAs[Long]("asset_id") -> v.asInstanceOf[Long])).toMap
    baseIds.foreach { b =>
      val d = java.lang.Long.bitCount(fp(b) ^ fp(b + 1000000L))
      assert(d > 2, s"envelope must miss the planted trim of $b (hamming $d)")
    }
    // 3) the frame-level operator CATCHES: containment 1.0 per plant
    val frames = Multimodal.frameSampleBatched(bases.unionByName(trims))
      .filter(col("frame_idx").isNotNull)
    val dupPlan = Dedup.setOverlapPairs(
      frames.select(col("asset_id"), col("mean_luma")),
      "asset_id", "mean_luma", minOverlap = 0.9)
    val dup = dupPlan.collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Long]("n_shared"), r.getAs[Double]("overlap")))
    baseIds.foreach { b =>
      assert(dup.exists(p => p._1 == b && p._2 == b + 1000000L && p._4 == 1.0),
        s"frame-level overlap must pair $b with its trim at 1.0")
    }
    // 4) no-cartesian plan assert — on the PRE-checkpoint frame (the
    //    public entry point eagerly checkpoints, so its executedPlan is
    //    a scan and any assert on it would be vacuous — r15 review):
    //    candidates must come from the frame-key equi-join, never an
    //    all-pairs join
    val inv = frames.select(col("asset_id").as("doc"),
      col("mean_luma").as("k")).distinct()
    val plan = Dedup.setOverlapPairsFrame(inv, 0.9, None)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Join") && !plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"frame-dup candidate generation must be an equi-join:\n$plan")
    // 5) hot-key cap wired: capping at 1 kills every shared key — the
    //    capped run is a strict subset (here: empty)
    val capped = Dedup.setOverlapPairs(
      frames.select(col("asset_id"), col("mean_luma")),
      "asset_id", "mean_luma", minOverlap = 0.9, maxKeyFrequency = Some(1))
      .collect()
    assert(capped.isEmpty, s"cap=1 must prune every multi-owner key")
  }

  test("frame-dup ingest: batch vs store == one-shot restricted; size artifact identical; GC applies") {
    // r15: the containment family's O(batch) ingest form. Law: probing
    // the trims (batch) against the base corpus's frame-key store gives
    // EXACTLY the one-shot matcher's verdicts restricted to batch×store
    // pairs; a persisted (doc, n_keys) size artifact changes nothing;
    // the store is owner-carrying so compactStore GC applies.
    def keysOf(a: org.apache.spark.sql.DataFrame) =
      Multimodal.frameSampleBatched(a).filter(col("frame_idx").isNotNull)
        .select(col("asset_id"), col("mean_luma"))
    val trims = Multimodal.toY4mTrimmedAssets(
      spark.range(N).toDF("doc_id").filter(col("doc_id") % 100 === 5),
      "doc_id", dropFrames = 9, idOffset = 1000000L)
    val storeKeys = keysOf(assets).localCheckpoint(true)
    val batchKeys = keysOf(trims).localCheckpoint(true)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Long]("n_shared"), r.getAs[Double]("overlap"))).toSet
    val inc = rows(Dedup.setOverlapIncremental(batchKeys, "asset_id", "mean_luma",
      storeKeys, "asset_id", "mean_luma", minOverlap = 0.9)
      .select("doc", "store_doc", "n_shared", "overlap"))
    val oneShot = rows(Dedup.setOverlapPairs(
      storeKeys.unionByName(batchKeys), "asset_id", "mean_luma", minOverlap = 0.9)
      // restrict to batch×store: trims carry the big id offset, so they
      // are always id_b in the one-shot (id_a < id_b) output
      .filter(col("id_b") >= 1000000L && col("id_a") < 1000000L)
      .select(col("id_b"), col("id_a"), col("n_shared"), col("overlap")))
    assert(inc == oneShot && inc.nonEmpty,
      s"ingest must equal the one-shot restriction (${inc.size} vs ${oneShot.size})")
    // every planted trim lands on its base at containment 1.0
    (0L until N).filter(i => i % 100 == 5 && i % 101 != 0).foreach { b =>
      assert(inc.exists(p => p._1 == b + 1000000L && p._2 == b && p._4 == 1.0),
        s"trim of $b must hit its base at 1.0")
    }
    // the persisted size artifact (distinct keys per owner) is
    // output-identical — the O(batch) production shape
    val sizes = storeKeys.groupBy("asset_id")
      .agg(countDistinct(col("mean_luma")).as("n_keys"))
    val viaSizes = rows(Dedup.setOverlapIncremental(batchKeys, "asset_id", "mean_luma",
      storeKeys, "asset_id", "mean_luma", minOverlap = 0.9,
      storeSizes = Some(sizes))
      .select("doc", "store_doc", "n_shared", "overlap"))
    assert(viaSizes == inc, "persisted size artifact must change nothing")
    // a store already holding DISTINCT keys may skip the defensive dedup
    // (the last O(store) shuffle term) — output-identical by contract
    val viaDistinct = rows(Dedup.setOverlapIncremental(batchKeys, "asset_id", "mean_luma",
      storeKeys.distinct(), "asset_id", "mean_luma", minOverlap = 0.9,
      storeSizes = Some(sizes), storeKeysDistinct = true)
      .select("doc", "store_doc", "n_shared", "overlap"))
    assert(viaDistinct == inc, "pre-distincted store must change nothing")
    // owner-carrying store: GC == rebuild from the survivors
    val live = spark.range(N).toDF("doc_id").filter(col("doc_id") % 4 =!= 1)
    val compacted = Dedup.compactStore(storeKeys, "asset_id",
      live, "doc_id")
    val rebuilt = keysOf(Multimodal.toY4mAssets(live, "doc_id"))
    assert(compacted.exceptAll(rebuilt).isEmpty && rebuilt.exceptAll(compacted).isEmpty,
      "compacted frame-key store must equal the survivor rebuild")
  }
}
