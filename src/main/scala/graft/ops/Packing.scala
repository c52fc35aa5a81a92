package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Sequence packing for training pipelines: assign documents, in
  * deterministic id order, to fixed token-budget training sequences.
  *
  * Semantics are budget-ALIGNED block packing: sequence `k` owns the
  * global token-offset window `[k·budget, (k+1)·budget)` and a document
  * belongs to the window its FIRST token falls in. Documents are never
  * split, so a sequence can overflow its budget by at most
  * (longest-doc − 1) tokens — the downstream loader truncates the tail or
  * the corpus pre-filters documents longer than the budget. This is the
  * deterministic, order-preserving packing a reproducible data pipeline
  * wants (greedy first-fit would need stateful bins and an
  * order-dependent oracle).
  *
  * Scale: the global running token offset is computed as a TWO-LEVEL
  * prefix sum — a per-bucket cumulative window (buckets = contiguous id
  * ranges, each bucket's rows co-partitioned) plus one tiny window over
  * the per-bucket totals (thousands of rows at any corpus size) — so no
  * single-partition window ever sees document-sized data. The bucket
  * offsets broadcast back. One shuffle by bucket, one broadcast join.
  */
object Packing {

  /** Sliding-window token chunking (r9): split long documents into
    * fixed-size token windows with overlap — the context-length
    * preparation step that runs BEFORE packing when documents exceed the
    * training sequence length (the standard public recipe: concat or
    * chunk to context size, overlap preserves cross-boundary spans).
    * Chunk `i` covers tokens [i·step, i·step + chunkTokens) with
    * step = chunkTokens − overlapTokens; starts advance while < n, so
    * the trailing chunk may be short. Token-less documents emit nothing.
    *
    * Scale shape: pure per-row work — tokenize once into a materialized
    * column (the interpreted-HOF rule), one explode bounded by
    * ⌈n/step⌉ per document, no shuffles. */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
                    chunkTokens: Int, overlapTokens: Int): DataFrame = {
    require(chunkTokens > overlapTokens && overlapTokens >= 0,
      s"need chunkTokens > overlapTokens >= 0, got $chunkTokens/$overlapTokens")
    val step = chunkTokens - overlapTokens
    df.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .filter(col("__n") > 0)
      .withColumn("chunk_id",
        explode(sequence(lit(0), ceil(col("__n") / lit(step.toDouble)).cast("int") - 1)))
      .select(col(idCol), col("chunk_id"),
        array_join(slice(col("__toks"), col("chunk_id") * step + 1, lit(chunkTokens)), " ")
          .as("chunk_text"),
        least(lit(chunkTokens), col("__n") - col("chunk_id") * step)
          .cast("int").as("n_chunk_tokens"))
  }

  /** @param idCol     numeric document ordinal (packing order)
    * @param tokensCol per-document token count
    * @param budget    tokens per training sequence
    * @return input columns + `seq_id` (the sequence the doc packs into)
    *         and `seq_offset` (the doc's first-token offset within it)
    */
  def packSequences(df: DataFrame, idCol: String, tokensCol: String,
                    budget: Long, bucketWidth: Long = 65536L): DataFrame = {
    require(budget > 0, s"packSequences: budget must be positive, got $budget")
    require(bucketWidth > 0, s"packSequences: bucketWidth must be positive")
    val bucketed = df
      .withColumn("__t", col(tokensCol).cast(LongType))
      .withColumn("__bucket", expr(s"CAST($idCol AS BIGINT) div $bucketWidth"))
    // level 1: running sum within each contiguous id-range bucket
    val w1 = Window.partitionBy("__bucket").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = bucketed.withColumn("__local_cum", sum("__t").over(w1))
    // level 2: bucket totals → exclusive prefix offsets (bucket-count rows)
    val w2 = Window.orderBy("__bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy("__bucket").agg(sum("__t").as("__bt"))
      .withColumn("__off", coalesce(sum("__bt").over(w2), lit(0L)))
      .select("__bucket", "__off")
    local.join(broadcast(offsets), "__bucket")
      .withColumn("__start", col("__local_cum") + col("__off") - col("__t"))
      // integer div, not `/` (long / long is DOUBLE division in Spark SQL)
      .withColumn("seq_id", expr(s"__start div $budget"))
      .withColumn("seq_offset", col("__start") - col("seq_id") * budget)
      .drop("__t", "__bucket", "__local_cum", "__off", "__start")
  }

  /** Token total packed into each sequence — the loader-facing view
    * (`n_docs`, `n_tokens`; overflow = n_tokens > budget means the last
    * document runs past the boundary and truncates downstream). */
  def sequenceStats(packed: DataFrame, tokensCol: String): DataFrame =
    packed.groupBy("seq_id").agg(
      count(lit(1)).as("n_docs"),
      sum(col(tokensCol).cast(LongType)).as("n_tokens"))

  /** Token-balanced OUTPUT SHARDING (r12): assign every document to one
    * of `nShards` output shards so that (a) the corpus is deterministically
    * shuffled — shard order is the md5 id-hash order, decorrelating any
    * source/time locality in ids, the standard pre-training global
    * shuffle — and (b) every shard carries the same token mass to within
    * one document (shard k owns the token-offset window
    * [k·size, (k+1)·size), size = ⌈total/nShards⌉, a doc belongs where
    * its first token falls). The step that turns a curated corpus into
    * balanced training files; a writer partitions by `shard_id` and
    * orders by `shard_offset`. Rows with a NULL token count have no
    * token mass to place: they pass through with NULL
    * shard_id/shard_offset (the [[bucketedBatches]] contract) rather
    * than silently poisoning the prefix sums.
    *
    * Scale: same two-level prefix sum as [[packSequences]], but ordered
    * and bucketed by the HASH key (buckets = contiguous hash ranges, so
    * bucket order is sort order): one shuffle by hash bucket, a window
    * per bucket, one tiny window over bucket totals, and the offsets +
    * 1-row total broadcast back. No single-partition pass ever sees
    * document-sized data. */
  def shardAssign(df: DataFrame, idCol: String, tokensCol: String,
                  nShards: Int, hashBuckets: Int = 4096): DataFrame = {
    require(nShards > 0, s"shardAssign: nShards must be positive, got $nShards")
    // split on the CAST result, not the raw column: a non-null value
    // that casts to NULL (a string "n/a" token count) would otherwise
    // take the placed path, where least() skips its NULL division and
    // parks it in the last shard with a NULL offset
    val castTokens = col(tokensCol).cast(LongType)
    val keyed = df.filter(castTokens.isNotNull)
      .withColumn("__t", castTokens)
    val local = hashOrderedPrefix(keyed, idCol, Nil, col("__t"), hashBuckets)
    val total = keyed.agg(coalesce(sum("__t"), lit(0L)).as("__total"))
    val sharded = local.crossJoin(broadcast(total))
      .withColumn("__ssz",
        greatest(expr(s"(__total + ${nShards - 1}) div $nShards"), lit(1L)))
      .withColumn("__start", col("__prefix") - col("__t"))
      .withColumn("shard_id",
        least(expr("__start div __ssz"), lit((nShards - 1).toLong)))
      .withColumn("shard_offset", col("__start") - col("shard_id") * col("__ssz"))
      .drop("__t", "__prefix", "__total", "__ssz", "__start")
    sharded.unionByName(
      df.filter(castTokens.isNull)
        .withColumn("shard_id", lit(null).cast(LongType))
        .withColumn("shard_offset", lit(null).cast(LongType)))
  }

  /** LENGTH-BUCKETED BATCHING (r12): group documents of similar token
    * length into fixed-size training batches — the sorted-batching /
    * bucketed-batching padding-efficiency move every public seq2seq
    * recipe ships: a batch's padding waste is bounded by its length
    * spread, which bucketing bounds by `bucketWidth − 1`. Within each
    * length bucket documents order by the md5 id-hash (deterministic
    * shuffle — no correlation between batch membership and corpus
    * position), and consecutive `batchSize` docs form a batch. Returns
    * input + (length_bucket, batch_id, batch_pos); batch_id is dense
    * within its bucket. Rows with a NULL token count pass through with
    * NULL batch columns rather than silently vanishing into the offsets
    * join.
    *
    * Scale: per-bucket dense positions via [[hashOrderedPrefix]] keyed
    * on (length_bucket, hash-sub-bucket): windows only ever see one
    * sub-bucket's rows (~n/4096), the per-(bucket, sub) totals fold
    * through a tiny window, and offsets broadcast back — no window over
    * a whole length bucket, which at 100 TB can hold billions of
    * documents. */
  def bucketedBatches(df: DataFrame, idCol: String, tokensCol: String,
                      bucketWidth: Long, batchSize: Int,
                      hashBuckets: Int = 4096): DataFrame = {
    require(bucketWidth > 0 && batchSize > 0,
      s"bucketedBatches: need positive bucketWidth/batchSize, got $bucketWidth/$batchSize")
    // same cast-split as shardAssign: an uncastable token count would
    // otherwise form a NULL length bucket and take batch positions there
    val castTokens = col(tokensCol).cast(LongType)
    val bucketed = df.filter(castTokens.isNotNull)
      .withColumn("length_bucket", expr(s"CAST($tokensCol AS BIGINT) div $bucketWidth"))
    val batched = hashOrderedPrefix(bucketed, idCol, Seq("length_bucket"),
      lit(1L), hashBuckets)
      .withColumn("__pos", col("__prefix") - 1)
      .withColumn("batch_id", expr(s"__pos div $batchSize"))
      .withColumn("batch_pos", col("__pos") - col("batch_id") * batchSize)
      .drop("__prefix", "__pos")
    batched.unionByName(
      df.filter(castTokens.isNull)
        .withColumn("length_bucket", lit(null).cast(LongType))
        .withColumn("batch_id", lit(null).cast(LongType))
        .withColumn("batch_pos", lit(null).cast(LongType)))
  }

  /** The hash-ordered two-level prefix machinery shared by
    * [[shardAssign]] (running token sums, global) and
    * [[bucketedBatches]] (dense positions per length bucket): order rows
    * by (md5 id-hash, id) within each `partitionCols` group, and return
    * the INCLUSIVE running sum of `measure` as `__prefix` — computed as
    * a per-(partition, hash-sub-bucket) window plus a tiny window over
    * the sub-bucket totals, with the offsets broadcast back, so no
    * window ever sees more than ~n/hashBuckets rows. One definition so
    * an ordering or edge fix cannot drift between the two callers.
    * ([[packSequences]] keeps its own copy deliberately: its contract is
    * id-ORDER packing with id-range buckets, not hash order.) */
  private def hashOrderedPrefix(df: DataFrame, idCol: String,
                                partitionCols: Seq[String], measure: Column,
                                hashBuckets: Int): DataFrame = {
    val parts = partitionCols.map(col)
    val keyed = df
      .withColumn("__m", measure.cast(LongType))
      .withColumn("__hk", Sampling.hashUnit(col(idCol)))
      .withColumn("__sub", floor(col("__hk") * hashBuckets).cast(LongType))
    val w1 = Window.partitionBy(parts :+ col("__sub"): _*)
      .orderBy(col("__hk"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = keyed.withColumn("__local_cum", sum("__m").over(w1))
    val w2 = (if (parts.isEmpty) Window.orderBy("__sub")
              else Window.partitionBy(parts: _*).orderBy("__sub"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = keyed.groupBy(parts :+ col("__sub"): _*)
      .agg(sum("__m").as("__bt"))
      .withColumn("__off", coalesce(sum("__bt").over(w2), lit(0L)))
      .select((partitionCols :+ "__sub" :+ "__off").map(col): _*)
    local.join(broadcast(offsets), partitionCols :+ "__sub")
      .withColumn("__prefix", col("__local_cum") + col("__off"))
      .drop("__m", "__hk", "__sub", "__local_cum", "__off")
  }
}
