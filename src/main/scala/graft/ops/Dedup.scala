package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash, and n-gram Jaccard.
  *
  * Scale design: every near-dup variant goes through a *blocking* stage
  * (LSH band bucket / simhash block / shared shingle) so candidate
  * generation is an equi-join on a bucket key — a plain shuffle join that
  * scales linearly — never an all-pairs cross join. Exact similarity is
  * then computed only within candidate pairs.
  */
object Dedup {

  /** Exact dedup: group by content hash, survivor = min(id). Returns
    * (id, content_hash, n_copies, is_survivor) per row. One hash-shuffle. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val hashed = df.withColumn("content_hash", md5(col(textCol)))
    val groups = hashed.groupBy("content_hash")
      .agg(min(col(idCol)).as("survivor_id"), count(lit(1)).as("n_copies"))
    hashed.join(groups, "content_hash")
      .withColumn("is_survivor", col(idCol) === col("survivor_id"))
      .select(col(idCol), col("content_hash"), col("n_copies"), col("is_survivor"))
  }

  // ------------------------------------------------------------- MinHash

  /** Large Mersenne-ish modulus that keeps a*h+b inside 63 bits for
    * h < 2^28, a < 2^21 — overflow-free in both Spark and DuckDB. */
  val MinhashPrime = 2147483647L // 2^31 - 1

  def minhashCoefA(i: Int): Long = 2L * i + 1
  def minhashCoefB(i: Int): Long = 1000003L * (i + 1)

  /** k-permutation MinHash signature over a column of 28-bit shingle
    * hashes: sig[i] = min((a_i*h + b_i) mod p). Pure array math → codegen. */
  def minhashSignature(shingleHashes: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)), i => {
      val a = element_at(array((0 until k).map(j => lit(minhashCoefA(j))): _*), i + 1)
      val b = element_at(array((0 until k).map(j => lit(minhashCoefB(j))): _*), i + 1)
      when(size(shingleHashes) === 0, lit(MinhashPrime))
        .otherwise(array_min(transform(shingleHashes, h => (a * h + b) % MinhashPrime)))
    })

  /** LSH band keys: signature split into `bands` rows of `rowsPerBand`,
    * each band hashed to one bucket key. Docs sharing any band key become
    * candidates. */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      md5(concat_ws("_", lit(b),
        array_join(slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)), "_"))))

  /** MinHash+LSH near-dup pairs: shingle → signature → band-bucket join →
    * estimated Jaccard = fraction of agreeing signature positions.
    *
    * The only shuffle is the self-join on band key; bucket sizes are
    * bounded by band specificity, so this is the 100 TB-safe path (vs the
    * quadratic brute force). */
  def minhashLshPairs(
      df: DataFrame, idCol: String, textCol: String,
      shingleLen: Int = 5, k: Int = 16, bands: Int = 4,
      threshold: Double = 0.5): DataFrame = {
    val sigs = df.select(
      col(idCol).as("doc"),
      minhashSignature(TextAnalysis.charShingleHashes(col(textCol), shingleLen), k).as("sig"))
    val banded = sigs.select(col("doc"), col("sig"),
      explode(bandKeys(col("sig"), bands, k / bands)).as("band"))
    val a = banded.select(col("band"), col("doc").as("doc_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("doc").as("doc_b"), col("sig").as("sig_b"))
    val cand = a.join(b, Seq("band")).filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "sig_a", "sig_b").distinct()
    cand.withColumn("est_jaccard",
      size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), b => b))
        .cast(DoubleType) / k)
      .filter(col("est_jaccard") >= threshold)
      .select("doc_a", "doc_b", "est_jaccard")
  }

  // ------------------------------------------------------------- SimHash

  /** 32-bit SimHash over distinct whitespace tokens: bit k set iff more
    * than half the token hashes have bit k set (tie → 0). */
  def simhash(text: Column): Column = {
    val toks = array_distinct(TextAnalysis.tokens(text))
    val hashes = transform(toks, t =>
      conv(substring(md5(t), 1, 8), 16, 10).cast(LongType))
    val n = size(hashes)
    val bits = transform(sequence(lit(0), lit(31)), k =>
      when(size(filter(hashes, h => h.bitwiseAND(call_function("shiftleft", lit(1L), k)) > 0)) * 2 > n,
        call_function("shiftleft", lit(1L), k)).otherwise(lit(0L)))
    aggregate(bits, lit(0L), (acc, x) => acc + x)
  }

  /** SimHash near-dup pairs with ≤ maxHamming distance, blocked on 8-bit
    * blocks (pigeonhole: distance ≤ 3 ⟹ some block of 4 is equal; we use
    * 4 blocks of 8 bits so distance ≤ 6 pairs are all found when any block
    * matches — candidates outside that are filtered exactly). */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 6): DataFrame = {
    val sh = df.select(col(idCol).as("doc"), simhash(col(textCol)).as("sh"))
    val blocked = sh.select(col("doc"), col("sh"),
      explode(transform(sequence(lit(0), lit(3)), b =>
        concat_ws(":", b, call_function("shiftright", col("sh"), b * 8).bitwiseAND(lit(255L)))))
        .as("block"))
    val a = blocked.select(col("block"), col("doc").as("doc_a"), col("sh").as("sh_a"))
    val b = blocked.select(col("block"), col("doc").as("doc_b"), col("sh").as("sh_b"))
    a.join(b, Seq("block")).filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "sh_a", "sh_b").distinct()
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }

  // ------------------------------------------------------ n-gram Jaccard

  /** Exact n-gram Jaccard pairs via inverted-index join: explode distinct
    * word n-grams, equi-join on the shingle (the blocking key), count
    * co-occurrences, Jaccard = |∩| / (|A| + |B| - |∩|).
    *
    * The shingle join IS the candidate filter — only docs sharing at least
    * one shingle ever meet, and hot shingles can be capped (df filter) at
    * scale without changing high-similarity results. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, threshold: Double = 0.4): DataFrame = {
    val sh = df.select(col(idCol).as("doc"),
      TextAnalysis.wordShingles(col(textCol), n).as("shingles"))
    val sizes = sh.select(col("doc"), size(col("shingles")).as("n_sh"))
    val inv = sh.select(col("doc"), explode(col("shingles")).as("shingle"))
    val common = inv.select(col("shingle"), col("doc").as("doc_a"))
      .join(inv.select(col("shingle"), col("doc").as("doc_b")), Seq("shingle"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.withColumnRenamed("doc", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
      .withColumn("jaccard",
        round(col("n_common").cast(DoubleType) /
          (col("n_a") + col("n_b") - col("n_common")), 6))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }
}
