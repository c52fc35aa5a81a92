package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{TextAnalysis => TA}

/** The real BPE token count (r9): rank-ordered merge application over
  * word pre-tokens. Hand-derived encodings pin the algorithm (merge
  * order, left-to-right non-overlap, whole-token matching); edge texts
  * pin the pre-tokenizer boundary behavior the DuckDB oracle must share
  * (q_text_tokens / q_pack_sequences replay the same merge table via a
  * recursive CTE). */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def counts(texts: (Long, String)*): Map[Long, Int] = {
    import spark.implicits._
    texts.toSeq.toDF("id", "text")
      .select(col("id"), TA.bpeTokenCount(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
  }

  test("hand-derived encodings: merge order and non-overlap") {
    val c = counts(
      1L -> "the", // t h e -> th e (r1) -> the (r2): 1 token
      2L -> "and", // a n d -> an d (r5) -> and (r15): 1
      3L -> "that", // t h a t -> th a t (r1) -> th at (r8) -> that (r46): 1
      4L -> "queue", // q u e u e -> qu e u e (r41) -> que u e (r42): 3
      5L -> "llll", // l l l l -> ll ll (r33, left-to-right non-overlap): 2
      6L -> "6502", // digits pre-tokenize singly: 4
      7L -> "don't stop", // don=d,o,n->d,on(r7) =2; ' =1; t=1; stop=st,o,p->st,o,p? (s t o p -> st(r12) o p): 3 => 7
      8L -> "the the the") // three words, 1 each
    assert(c(1L) == 1, s"'the' -> ${c(1L)}")
    assert(c(2L) == 1)
    assert(c(3L) == 1)
    assert(c(4L) == 3)
    assert(c(5L) == 2, "left-to-right non-overlapping pass must merge (ll)(ll)")
    assert(c(6L) == 4)
    assert(c(7L) == 7)
    assert(c(8L) == 3)
  }

  test("edges: empty, whitespace, multibyte, null") {
    import spark.implicits._
    val c = counts(
      1L -> "",
      2L -> "   \t\n ",
      3L -> "héllo", // h + é + llo(l,l,o -> ll,o) = 1+1+2
      4L -> "日本語", // three single-char non-alnum words
      5L -> "a") // single letter
    assert(c(1L) == 0 && c(2L) == 0)
    assert(c(3L) == 4)
    assert(c(4L) == 3)
    assert(c(5L) == 1)
    // null text -> null count (nullSafeEval)
    val n = Seq((9L, null.asInstanceOf[String])).toDF("id", "text")
      .select(TA.bpeTokenCount(col("text"))).collect()(0)
    assert(n.isNullAt(0))
  }

  test("invariants on the fixture corpus: 1 <= word tokens <= word chars; memoization is pure") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val rows = docs.select(
      TA.bpeTokenCount(col("text")).as("bpe"),
      TA.bpeishTokenCount(col("text")).as("pre"),
      length(col("text")).as("chars"))
      .collect()
    rows.foreach { r =>
      val (bpe, pre, chars) = (r.getInt(0), r.getInt(1), r.getInt(2))
      assert(bpe >= pre, "BPE can never merge across word pre-tokens")
      assert(bpe <= chars + 1, s"BPE count bounded by character count: $bpe vs $chars")
    }
    // memoized second pass returns identical counts (cache purity)
    val again = docs.select(TA.bpeTokenCount(col("text"))).collect().map(_.getInt(0))
    assert(rows.map(_.getInt(0)).toSeq == again.toSeq)
    assert(rows.map(_.getInt(0)).distinct.length > 1, "counts must vary")
  }

  test("declarable merges: a different table changes the segmentation deterministically") {
    val c1 = {
      import spark.implicits._
      Seq((1L, "abab")).toDF("id", "text")
        .select(TA.bpeTokenCount(col("text"), Seq("a" -> "b", "ab" -> "ab")))
        .collect()(0).getInt(0)
    }
    assert(c1 == 1, "a b a b -> ab ab -> abab")
    val c2 = {
      import spark.implicits._
      Seq((1L, "abab")).toDF("id", "text")
        .select(TA.bpeTokenCount(col("text"), Seq("b" -> "a")))
        .collect()(0).getInt(0)
    }
    assert(c2 == 3, "a (ba) b under the alternate table")
  }

  // ---- trainer (r15 s3): learn the merge table from the corpus ----

  test("bpeTrainMerges learns the hand-derivable sequence with counts") {
    import spark.implicits._
    // words: aaab ×2, ab ×1
    // iter1: (a,a) 4 (two positions per aaab) vs (a,b) 3 → aa
    // iter2: over [aa,a,b]×2 + [a,b]: (a,b) 3 beats (aa,a) 2 → ab
    // iter3: over [aa,ab]×2 + [ab]: (aa,ab) 2
    val docs = Seq((1L, "aaab ab"), (2L, "aaab")).toDF("id", "text")
    val out = TA.bpeTrainMerges(docs, "text", nMerges = 5)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out.toSeq == Seq((1, "a", "a", 4L), (2, "a", "b", 3L), (3, "aa", "ab", 2L)),
      s"got ${out.toSeq}")
  }

  test("applyBpeMerge is the single left-to-right non-overlapping sweep") {
    import spark.implicits._
    def apply1(word: String, l: String, r: String): Seq[String] =
      Seq(word).toDF("w")
        .select(TA.applyBpeMerge(
          filter(split(col("w"), "(?<=.)"), _ =!= ""), l, r).as("s"))
        .collect()(0).getSeq[String](0)
    assert(apply1("llll", "l", "l") == Seq("ll", "ll"))
    assert(apply1("lll", "l", "l") == Seq("ll", "l"))
    // odd run ≥ 5: the greedy sweep leaves the SINGLE at the end —
    // [ll, ll, l], never [ll, l, ll] (the arrangement a replace-all
    // fixpoint oracle produces; adjacency feeds the next iteration's
    // pair counts, so arrangement is part of the law)
    assert(apply1("lllll", "l", "l") == Seq("ll", "ll", "l"))
    assert(apply1("abab", "a", "b") == Seq("ab", "ab"))
    assert(apply1("x", "a", "b") == Seq("x"))
  }

  test("trainer stops when the pair space exhausts; ties break on the smaller pair") {
    import spark.implicits._
    // single-char words only → zero adjacent pairs → empty merge table
    val singles = Seq((1L, "a b c d")).toDF("id", "text")
    assert(TA.bpeTrainMerges(singles, "text", nMerges = 4).count() == 0)
    // xy and ab both appear twice → tie; (a,b) < (x,y) lexicographically
    val tied = Seq((1L, "xy ab xy ab")).toDF("id", "text")
    val first = TA.bpeTrainMerges(tied, "text", nMerges = 1)
      .collect()(0)
    assert((first.getString(1), first.getString(2)) == ("a", "b"))
  }

  test("trained merges feed bpeTokenCount (trainer apply law ≡ tokenizer law)") {
    import spark.implicits._
    val docs = Seq((1L, "aaab ab"), (2L, "aaab")).toDF("id", "text")
    val merges = TA.bpeTrainMerges(docs, "text", nMerges = 3)
      .orderBy("merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    // encoding "aaab" under [(a,a),(a,b),(aa,ab)] → [aaab]: 1 token;
    // "ab" → [ab]: 1; "aab" → [aa, b]: 2 (ab can't form — a is consumed)
    val c = counts0(merges, "aaab ab aab")
    assert(c == 1 + 1 + 2, s"got $c")
  }

  private def counts0(merges: Seq[(String, String)], text: String): Int = {
    import spark.implicits._
    Seq(text).toDF("text")
      .select(TA.bpeTokenCount(col("text"), merges).as("n"))
      .collect()(0).getInt(0)
  }
}
