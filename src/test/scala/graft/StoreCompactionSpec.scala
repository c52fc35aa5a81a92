package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Relation
import graft.ops.Dedup
import graft.relations.RelationManager

/** Store maintenance (r12 — VERDICT task 10): the persisted stores the
  * incremental dedup ops accumulate (window-hash store, fingerprint
  * store, signature store) grow forever while the corpus they index
  * loses documents. `compactStore` drops a departed owner's rows with
  * one semi-join; the contract pinned here is store-after-deletes+
  * compact ≡ store-rebuilt-from-scratch, plus the shared-hash case that
  * makes owner-carrying stores necessary in the first place. */
class StoreCompactionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def sameRows(a: org.apache.spark.sql.DataFrame,
                       b: org.apache.spark.sql.DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  test("compacted window store == store rebuilt from the surviving corpus") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val full = Dedup.windowHashStore(docs, "doc_id", "text", n = 8)
    val live = docs.filter(col("doc_id") % 4 =!= 1)
    val compacted = Dedup.compactStore(full, "doc_id", live.select("doc_id"), "doc_id")
    val rebuilt = Dedup.windowHashStore(live, "doc_id", "text", n = 8)
    assert(sameRows(compacted, rebuilt),
      "compaction must equal a from-scratch rebuild of the live slice")
    assert(compacted.count() < full.count(), "deletes must actually shrink the store")
    // the change-feed form agrees: anti-join on the departed ids
    val deleted = docs.filter(col("doc_id") % 4 === 1).select("doc_id")
    assert(sameRows(
      Dedup.compactStoreByDeleted(full, "doc_id", deleted, "doc_id"), rebuilt))
  }

  test("shared window survives its co-owner's deletion; naive hash subtraction over-deletes") {
    import spark.implicits._
    val run = "w1 w2 w3 w4 w5 w6 w7 w8"
    val docs = Seq(
      (1L, s"intro $run tail1"),
      (2L, s"other lead $run tail2")).toDF("doc_id", "text")
    val batch = Seq((10L, s"fresh $run suffix")).toDF("doc_id", "text")
    val store = Dedup.windowHashStore(docs, "doc_id", "text", n = 8)
    // doc 1 leaves the corpus; doc 2 still owns the shared window
    val live = Seq(2L).toDF("doc_id")
    val compacted = Dedup.compactStore(store, "doc_id", live, "doc_id")
    val out = Dedup.substringExciseIncremental(batch, "doc_id", "text", n = 8,
      compacted, "h").collect()(0)
    assert(out.getAs[Long]("n_removed") == 8L,
      s"the surviving owner must keep the shared window live in the store: $out")
    // the bare distinct-hash store has no owners: subtracting the deleted
    // doc's hashes drops the SHARED window and the batch keeps duplicate
    // text — the over-delete that motivates the owner-carrying form
    val naive = Dedup.windowHashes(docs, "doc_id", "text", n = 8)
      .join(Dedup.windowHashes(docs.filter(col("doc_id") === 1L), "doc_id", "text", n = 8),
        Seq("h"), "left_anti")
    val naiveOut = Dedup.substringExciseIncremental(batch, "doc_id", "text", n = 8,
      naive, "h").collect()(0)
    assert(naiveOut.getAs[Long]("n_removed") == 0L,
      s"hash subtraction must demonstrably over-delete here: $naiveOut")
  }

  test("fingerprint and signature stores compact to their rebuilt forms; ops accept them unchanged") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val live = docs.filter(col("doc_id") % 3 =!= 1)
    // fingerprint store: exactIncremental classifies identically against
    // the compacted owned store and a store built fresh from live docs
    val fullFp = Dedup.fingerprintStore(docs, "doc_id", "text")
    val compactFp = Dedup.compactStore(fullFp, "doc_id", live.select("doc_id"), "doc_id")
    assert(sameRows(compactFp, Dedup.fingerprintStore(live, "doc_id", "text")))
    val batch = docs.filter(col("doc_id") % 3 === 1)
    val viaCompacted = Dedup.exactIncremental(batch, "doc_id", "text", compactFp, "h")
      .orderBy("doc_id").collect().map(_.toString).toSeq
    val viaRebuilt = Dedup.exactIncremental(batch, "doc_id", "text",
      Dedup.fingerprintStore(live, "doc_id", "text"), "h")
      .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(viaCompacted == viaRebuilt && viaCompacted.nonEmpty)
    // signature store (already owner-keyed as (doc, sig)): same equivalence
    val fullSig = Dedup.minhashSignatures(docs, "doc_id", "text", shingleLen = 5, k = 32)
    val compactSig = Dedup.compactStore(fullSig, "doc", live.select("doc_id"), "doc_id")
    assert(sameRows(compactSig,
      Dedup.minhashSignatures(live, "doc_id", "text", shingleLen = 5, k = 32)))
  }

  test("retrieval stores forget deleted docs: compaction ≡ rebuild, serving agrees through the df/N shift") {
    import graft.ops.Retrieval
    val docs = Tables.documents(spark, sf)
    val live = docs.filter(col("doc_id") % 4 =!= 1)
    val deleted = docs.filter(col("doc_id") % 4 === 1).select("doc_id")
    // frame-level: postings / doc-lengths / positional rows are per-doc
    // independent, so the anti-join GC is EXACTLY the survivor rebuild
    val cPost = Dedup.compactStoreByDeleted(
      Retrieval.postingIndex(docs, "doc_id", "text"), "doc_id", deleted, "doc_id")
    val rPost = Retrieval.postingIndex(live, "doc_id", "text")
    assert(sameRows(cPost, rPost))
    assert(cPost.count() < Retrieval.postingIndex(docs, "doc_id", "text").count(),
      "deletes must actually shrink the posting store")
    val cLens = Dedup.compactStoreByDeleted(
      Retrieval.docLengths(docs, "doc_id", "text"), "doc_id", deleted, "doc_id")
    val rLens = Retrieval.docLengths(live, "doc_id", "text")
    assert(sameRows(cLens, rLens))
    val cPos = Dedup.compactStoreByDeleted(
      Retrieval.positionalIndex(docs, "doc_id", "text"), "doc_id", deleted, "doc_id")
    assert(sameRows(cPos, Retrieval.positionalIndex(live, "doc_id", "text")))
    // serving-level: df, N, and avgdl all SHIFT when docs leave — BM25
    // from the compacted stores must equal serving from the rebuild
    // (scores move vs the pre-delete corpus; a GC that left phantom
    // rows would keep the old df/N and diverge here)
    val qs = Retrieval.prefixQueries(live, "doc_id", "text",
      modulo = 37, prefixTokens = 6)
    def run(p: org.apache.spark.sql.DataFrame, l: org.apache.spark.sql.DataFrame) =
      Retrieval.bm25TopK(p, l, qs, "query_id", "qtext", k = 10)
        .orderBy("query_id", "rank").collect().map(_.toString).toSeq
    val viaCompacted = run(cPost, cLens)
    assert(viaCompacted == run(rPost, rLens) && viaCompacted.nonEmpty)
    // phrase serving from the compacted positional store agrees too
    val pq = live.filter(col("doc_id") % 53 === 0)
      .select(col("doc_id").as("query_id"),
        array_join(slice(graft.ops.TextAnalysis.tokens(col("text")), 1, 3), " ")
          .as("qtext"))
    def phr(ix: org.apache.spark.sql.DataFrame) =
      Retrieval.phraseMatch(ix, pq, "query_id", "qtext")
        .orderBy("query_id", "doc_id").collect().map(_.toString).toSeq
    assert(phr(cPos) == phr(Retrieval.positionalIndex(live, "doc_id", "text")))
  }

  test("persisted band index: ingest from index == direct incremental; compaction applies") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val corpus = docs.filter(col("doc_id") % 3 === 0)
    val batch = docs.filter(col("doc_id") % 3 =!= 0)
    val sigs = Dedup.minhashSignatures(corpus, "doc_id", "text", shingleLen = 5, k = 32)
    val idx = Dedup.bandIndex(sigs, "doc", "sig")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc", "corpus_doc").collect().map(_.toString).toSeq
    val direct = rows(Dedup.minhashIncremental(batch, "doc_id", "text",
      sigs, "doc", "sig"))
    val viaIdx = rows(Dedup.minhashIncrementalFromIndex(batch, "doc_id", "text",
      idx, sigs, "doc", "sig"))
    assert(direct == viaIdx && direct.nonEmpty,
      s"index-probed ingest must match the direct form (${direct.size} vs ${viaIdx.size})")
    // hot-band cap: same recall contract through either path
    val directCap = rows(Dedup.minhashIncremental(batch, "doc_id", "text",
      sigs, "doc", "sig", maxBandFrequency = Some(5)))
    val viaIdxCap = rows(Dedup.minhashIncrementalFromIndex(batch, "doc_id", "text",
      idx, sigs, "doc", "sig", maxBandFrequency = Some(5)))
    assert(directCap == viaIdxCap)
    // the index carries its owner → GC equals a rebuild from survivors
    val liveCorpus = corpus.filter(col("doc_id") % 2 === 0)
    val ca = Dedup.compactStore(idx, "doc", liveCorpus.select("doc_id"), "doc_id")
    val cb = Dedup.bandIndex(Dedup.minhashSignatures(liveCorpus, "doc_id", "text",
      shingleLen = 5, k = 32), "doc", "sig")
    // plain-string clue only: ScalaTest clues evaluate BY VALUE, so an
    // exceptAll/count diagnostic here would run four extra Spark jobs on
    // every PASSING run too
    assert(sameRows(ca, cb), "compacted band index must equal the live rebuild")
  }

  /** From-index ingest construction must not run eager probe/validation
    * jobs (r15 — VERDICT task 2); shared impl in
    * [[ConstructionJobProbe]] since CurationOpsSpec pins the KMV
    * estimate path the same way (r16). */
  private def assertNoConstructionJobs[A](what: String)(build: => A): A =
    ConstructionJobProbe.assertNoConstructionJobs(spark, what)(build)

  test("band index is self-describing: (bands, k) mismatch and bare relations fail loud — lazily") {
    // r12 ADVICE: an index built with different (bands, k) produces band
    // keys no batch can hit — zero candidates, every near-dup silently
    // admitted. The index rows carry their build parameters and the
    // from-index ingest validates them — IN-PLAN as of r15: construction
    // fires zero jobs (the r14 shape ran an eager O(index)
    // distinct().collect() per ingest batch), and the violation raises
    // at execution from the first offending row.
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val corpus = docs.filter(col("doc_id") % 3 === 0)
    val batch = docs.filter(col("doc_id") % 3 =!= 0)
    val sigs = Dedup.minhashSignatures(corpus, "doc_id", "text", shingleLen = 5, k = 32)
      .localCheckpoint(true)
    val idx4 = Dedup.bandIndex(sigs, "doc", "sig", bands = 4, k = 32)
      .localCheckpoint(true)
    val badBands = assertNoConstructionJobs("minhash-from-index") {
      Dedup.minhashIncrementalFromIndex(batch, "doc_id", "text",
        idx4, sigs, "doc", "sig", bands = 8, k = 32)
    }
    val eBands = intercept[Exception] { badBands.collect() }
    assert(eBands.getMessage.contains("bands=4") &&
      eBands.getMessage.contains("bands=8"), eBands.getMessage)
    // structural violation (not a bandIndex artifact at all) is a schema
    // check — free at construction, still loud there
    val eBare = intercept[IllegalArgumentException] {
      Dedup.minhashIncrementalFromIndex(batch, "doc_id", "text",
        idx4.select("band", "doc"), sigs, "doc", "sig", bands = 4, k = 32).collect()
    }
    assert(eBare.getMessage.contains("index_bands"), eBare.getMessage)
    // a HETEROGENEOUS index (appended slice built with different
    // parameters) must reject even when its FIRST row matches this
    // call's (bands, k) — head(1) validation would wave it through while
    // the mismatched slice silently matches nothing (r13 review). The
    // per-row form covers it by construction: every slice row is checked.
    val idx8 = Dedup.bandIndex(sigs, "doc", "sig", bands = 8, k = 32)
    val eMixed = intercept[Exception] {
      Dedup.minhashIncrementalFromIndex(batch, "doc_id", "text",
        idx8.unionByName(idx4), sigs, "doc", "sig", bands = 8, k = 32).collect()
    }
    assert(eMixed.getMessage.contains("bands=4"), eMixed.getMessage)
    // the store-side signature-length check is per-candidate-row too: a
    // store built with a different k fails loud at execution, not via an
    // eager one-row probe job at construction
    val sigs16 = Dedup.minhashSignatures(corpus, "doc_id", "text",
      shingleLen = 5, k = 16).localCheckpoint(true)
    val badStore = assertNoConstructionJobs("minhash-from-index-store") {
      Dedup.minhashIncrementalFromIndex(batch, "doc_id", "text",
        idx8, sigs16, "doc", "sig", bands = 8, k = 32)
    }
    val eStore = intercept[Exception] { badStore.collect() }
    assert(eStore.getMessage.contains("signature length 16") &&
      eStore.getMessage.contains("k=32"), eStore.getMessage)
  }

  test("bloom pre-filtered exact ingest == unfiltered; corpus membership never missed") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val corpus = docs.filter(col("doc_id") % 3 === 0)
    val hist = corpus.select(md5(col("text")).as("h"))
    val bloom = Dedup.fingerprintBloom(hist, "h", expectedItems = 10000L)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect().map(_.toString).toSeq
    val batch = docs.filter(col("doc_id") % 3 =!= 0)
    val plain = rows(Dedup.exactIncremental(batch, "doc_id", "text", hist, "h"))
    val pre = rows(Dedup.exactIncrementalBloom(batch, "doc_id", "text", hist, "h", bloom))
    assert(plain == pre && plain.nonEmpty,
      "bloom has no false negatives, so the pre-filtered form must be identical")
    // planted case: exact corpus copy, batch-internal dup pair, fresh doc,
    // and a null-text row — every status class through the bloom path
    val c2 = Seq((1L, "alpha beta"), (2L, "gamma delta")).toDF("doc_id", "text")
    val h2 = c2.select(md5(col("text")).as("h"))
    val b2 = Dedup.fingerprintBloom(h2, "h", expectedItems = 100L)
    val batch2: Seq[(Long, String)] = Seq((10L, "alpha beta"), (11L, "fresh one"),
      (12L, "fresh one"), (13L, null))
    val out = Dedup.exactIncrementalBloom(batch2.toDF("doc_id", "text"),
      "doc_id", "text", h2, "h", b2)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out == Map(10L -> "dup_of_corpus", 11L -> "new",
      12L -> "dup_in_batch", 13L -> "new"), out.toString)
    // first-ingest bootstrap: an EMPTY store must yield a valid all-zero
    // filter (stat.bloomFilter over zero rows returns one whose probe
    // NPEs) and classify everything new/dup_in_batch
    val bEmpty = Dedup.fingerprintBloom(h2.limit(0), "h", expectedItems = 100L)
    val boot = Dedup.exactIncrementalBloom(batch2.toDF("doc_id", "text"),
      "doc_id", "text", h2.limit(0), "h", bEmpty)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(boot == Map(10L -> "new", 11L -> "new",
      12L -> "dup_in_batch", 13L -> "new"), boot.toString)
  }

  test("change-feed-driven compaction: CDC delete rows drive the anti-join") {
    import spark.implicits._
    val rm = new RelationManager(spark, Files.createTempDirectory("graft_gc").toString)
    val rel = Relation("graft", "main", "gc_corpus")
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    rm.writeTable(docs, rel, statsCols = Seq("doc_id"))
    val store = Dedup.windowHashStore(rm.read(rel), "doc_id", "text", n = 8)
      .localCheckpoint(true) // freeze the store BEFORE the corpus mutates
    val v0 = rm.currentVersion(rel).get
    spark.sql(s"DELETE FROM ${rm.catalogName}.main.gc_corpus WHERE doc_id % 5 = 2")
    val v1 = rm.currentVersion(rel).get
    // the feed's delete side IS the departed id set
    val deleted = rm.readRowChanges(rel, v0, v1)
      .filter(col("_change_type") === "delete").select("doc_id")
    val compacted = Dedup.compactStoreByDeleted(store, "doc_id", deleted, "doc_id")
    val rebuilt = Dedup.windowHashStore(rm.read(rel), "doc_id", "text", n = 8)
    assert(sameRows(compacted, rebuilt),
      "CDC-driven compaction must equal a rebuild from the current snapshot")
  }

  test("hamming block index GC: CDC delete feed drives compaction to the survivor rebuild") {
    // r15 (VERDICT task 4): the minhash-band-index GC law for the
    // modality fingerprint family, driven by a REAL change feed — a
    // commit-log asset table takes a DELETE, the feed's delete side
    // names the departed owners, and compactStoreByDeleted leaves
    // exactly the index a from-scratch rebuild over the surviving
    // assets produces.
    import spark.implicits._
    import graft.ops.Multimodal
    val rm = new RelationManager(spark,
      Files.createTempDirectory("graft_hamming_gc").toString)
    val rel = Relation("graft", "main", "video_assets")
    rm.writeTable(spark.range(240).toDF("doc_id"), rel, statsCols = Seq("doc_id"))
    def indexOf(assets: org.apache.spark.sql.DataFrame) =
      Dedup.hammingBlockIndex(
        Multimodal.videoFingerprintsBatched(
          Multimodal.toY4mAssets(assets, "doc_id")),
        "asset_id", "vfp", nBlocks = 3, blockBits = 16)
    // freeze the index BEFORE the corpus mutates (the windowHashStore
    // CDC test's discipline)
    val idx = indexOf(rm.read(rel)).localCheckpoint(true)
    val v0 = rm.currentVersion(rel).get
    spark.sql(s"DELETE FROM ${rm.catalogName}.main.video_assets WHERE doc_id % 5 = 2")
    val v1 = rm.currentVersion(rel).get
    val deleted = rm.readRowChanges(rel, v0, v1)
      .filter(col("_change_type") === "delete").select("doc_id")
    val compacted = Dedup.compactStoreByDeleted(idx, "doc", deleted, "doc_id")
    val rebuilt = indexOf(rm.read(rel))
    assert(sameRows(compacted, rebuilt),
      "CDC-driven index compaction must equal a rebuild from the current snapshot")
    assert(compacted.count() < idx.count(), "deletes must actually shrink the index")
    // the compacted index still serves from-index ingest byte-identically
    // to one built fresh over the survivors
    val batch = Multimodal.videoFingerprintsBatched(
      Multimodal.toY4mAssets(spark.range(240, 300).toDF("doc_id"), "doc_id"))
      .localCheckpoint(true)
    val store = Multimodal.videoFingerprintsBatched(
      Multimodal.toY4mAssets(rm.read(rel), "doc_id")).localCheckpoint(true)
    val viaCompacted = Dedup.hammingIncrementalFromIndex(batch, "asset_id", "vfp",
      compacted, store, "asset_id", "vfp", maxHamming = 2, nBlocks = 3, blockBits = 16)
    val viaRebuilt = Dedup.hammingIncrementalFromIndex(batch, "asset_id", "vfp",
      rebuilt, store, "asset_id", "vfp", maxHamming = 2, nBlocks = 3, blockBits = 16)
    assert(sameRows(viaCompacted, viaRebuilt) && viaCompacted.count() > 0)
  }

  test("hamming ingest: direct == from-index == brute force; geometry validated; caps wired") {
    import spark.implicits._
    import graft.ops.Multimodal
    // real video fingerprints: store = ids % 3 == 0, batch = the rest
    val sigs = Multimodal.videoFingerprintsBatched(
      Multimodal.toY4mAssets(spark.range(300).toDF("doc_id"), "doc_id"))
      .localCheckpoint(true)
    val store = sigs.filter(col("asset_id") % 3 === 0)
    val batch = sigs.filter(col("asset_id") % 3 =!= 0)
    val direct = Dedup.hammingIncremental(batch, "asset_id", "vfp",
      store, "asset_id", "vfp", maxHamming = 2, nBlocks = 3, blockBits = 16)
    val idx = Dedup.hammingBlockIndex(store, "asset_id", "vfp",
      nBlocks = 3, blockBits = 16).localCheckpoint(true)
    val viaIndex = Dedup.hammingIncrementalFromIndex(batch, "asset_id", "vfp",
      idx, store, "asset_id", "vfp", maxHamming = 2, nBlocks = 3, blockBits = 16)
    assert(sameRows(direct, viaIndex),
      "persisted-index ingest must equal the direct incremental")
    // pigeonhole exactness vs driver-side brute force (maxHamming 2 < 3 blocks)
    val bs = batch.collect().flatMap(r =>
      Option(r.getAs[Any]("vfp")).map(v => r.getLong(0) -> v.asInstanceOf[Long]))
    val ss = store.collect().flatMap(r =>
      Option(r.getAs[Any]("vfp")).map(v => r.getLong(0) -> v.asInstanceOf[Long]))
    val brute = (for {
      (b, bv) <- bs; (st, sv) <- ss
      h = java.lang.Long.bitCount(bv ^ sv) if h <= 2
    } yield (b, st, h)).toSet
    val got = direct.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Int]("hamming"))).toSet
    assert(got == brute, s"ingest pairs != brute force: ${got.size} vs ${brute.size}")
    // corrupt (null-fingerprint) assets appear on NEITHER side
    assert(got.forall { case (a, b, _) => a % 101 != 0 && b % 101 != 0 })
    // self-description: mismatched geometry fails loud — lazily (r15:
    // construction fires zero jobs; the per-row in-plan check raises at
    // execution); a bare relation is a schema check, loud at construction
    val badGeom = assertNoConstructionJobs("hamming-from-index") {
      Dedup.hammingIncrementalFromIndex(batch, "asset_id", "vfp",
        idx, store, "asset_id", "vfp", maxHamming = 2, nBlocks = 4, blockBits = 16)
    }
    val eGeom = intercept[Exception] { badGeom.collect() }
    assert(eGeom.getMessage.contains("nBlocks=3") &&
      eGeom.getMessage.contains("nBlocks=4"), eGeom.getMessage)
    val eBare = intercept[IllegalArgumentException] {
      Dedup.hammingIncrementalFromIndex(batch, "asset_id", "vfp",
        idx.select("block", "doc"), store, "asset_id", "vfp",
        maxHamming = 2, nBlocks = 3, blockBits = 16)
    }
    assert(eBare.getMessage.contains("index_blocks"), eBare.getMessage)
    // blockBits=64 would collapse every block key to 0 under JVM shift
    // masking — a full cross-product candidate join (r14 ADVICE): refused
    val eBits = intercept[IllegalArgumentException] {
      Dedup.hammingPairs(store, "asset_id", "vfp",
        maxHamming = 2, nBlocks = 1, blockBits = 64)
    }
    assert(eBits.getMessage.contains("[1, 63]"), eBits.getMessage)
    val eBitsIdx = intercept[IllegalArgumentException] {
      Dedup.hammingBlockIndex(store, "asset_id", "vfp", nBlocks = 1, blockBits = 64)
    }
    assert(eBitsIdx.getMessage.contains("[1, 63]"), eBitsIdx.getMessage)
    // hot-block cap wired: capping at 1 kills every multi-member block,
    // so the capped run returns a subset (fewer or equal pairs)
    val capped = Dedup.hammingIncremental(batch, "asset_id", "vfp",
      store, "asset_id", "vfp", maxHamming = 2, nBlocks = 3, blockBits = 16,
      maxBlockFrequency = Some(1)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Int]("hamming"))).toSet
    assert(capped.subsetOf(got) && capped.size < got.size,
      s"cap must prune hot-block candidates: ${capped.size} vs ${got.size}")
  }
}
