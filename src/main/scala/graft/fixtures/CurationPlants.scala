package graft.fixtures

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** GATE/EXAMPLE fixture plants for the curation pipelines (r15 — moved
  * out of `ops/`: plant arithmetic is test scaffolding shared by the
  * correctness gates, the DuckDB oracles, and the checked-in example
  * projects, not product behavior; [[graft.ops.CurationRecipe]] now
  * takes its corpus as-is). The fixture corpus has no near-duplicates
  * and no degenerate repetition, so two drop classes could never fire
  * without these (mirrored CASE-for-CASE in the oracles):
  *
  *   - ids ≡ 21 (mod 105 = 3·5·7): five TEMPLATE CLONES differing only
  *     in a trailing id token — pairwise levenshtein ≤ 4, one dedup
  *     cluster. 105's factors thread them through the population-
  *     dependent stages: ≡ 0 (mod 3) puts their bigrams in the held LM
  *     (scoreable, head bucket), ≡ 0 (mod 7) puts them in the DSIR
  *     target — they reach the dedup stage and all but the best drop
  *     there. In the incremental project's mod-2 generation split the
  *     clones alternate parity, planting both within-batch and
  *     store-probe duplicates.
  *   - ids ≡ 36 (mod 111): a degenerate two-word loop — passes langid
  *     (stopword-heavy), gopher (80 words, clean structure), then fails
  *     the repetition battery (top-bigram fraction 1.0).
  *   - ids ≡ 0 (mod 13): blocklist terms (the q_text_blocklist plant).
  */
object CurationPlants {

  val cloneTemplate: String =
    "the archive that holds these records spans decades with careful " +
      "notes about weather crops prices travel letters maps sketches " +
      "recipes songs stories games tools fabrics metals spices powders " +
      "liquids engines wheels bridges towers markets harbors vessels " +
      "journeys seasons harvest winter spring summer autumn morning " +
      "evening midday twilight shadows colors sounds voices whispers " +
      "echoes signals beacons lanterns candles mirrors windows doorways " +
      "gardens meadows forests rivers copy "
  val loopText: String = Seq.fill(40)("the data").mkString(" ")

  /** Plant the fixture rows over an already-normalized (doc_id, lang,
    * text, …) frame — [[graft.ops.CurationRecipe.normalize]] output. */
  def plant(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      when(col("doc_id") % 105 === 21 || col("doc_id") % 111 === 36, lit("en"))
        .otherwise(col("lang")).as("lang"),
      when(col("doc_id") % 105 === 21,
        concat(lit(cloneTemplate), col("doc_id").cast(StringType)))
        .when(col("doc_id") % 111 === 36, lit(loopText))
        .otherwise(concat(col("text"),
          when(col("doc_id") % 13 === 0, lit(" badword1 normal badword2"))
            .otherwise(lit("")))).as("text"))

  /** normalize + plant — the stage-0 frame every curation gate and
    * example project starts from. */
  def augment(rawDocs: DataFrame): DataFrame =
    plant(graft.ops.CurationRecipe.normalize(rawDocs))
}
