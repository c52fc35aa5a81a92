package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-style approximate nearest neighbor: a coarse quantizer (a small set
  * of centroid vectors) partitions the corpus into cells; queries probe
  * only their `nProbe` closest cells.
  *
  * The centroid set here is seeded deterministically (the first `nCells`
  * corpus vectors) — in production the quantizer comes from an offline
  * k-means, but the *engine* shape is identical: centroids are a tiny
  * broadcast table, cell assignment is an argmax over `nCells` fused dot
  * products (codegen), and the search is an equi-join on cell id — the
  * only data-sized shuffle. Complements the hyperplane-LSH path: IVF gives
  * controllable probe cost, LSH gives hash-only assignment.
  */
object Ivf {

  /** Assign each vector its best cell among the centroid list (argmax of
    * cosine, ties → lower centroid id). `rank` ≤ nProbe cells per row. */
  private def cellRanks(v: Column, centroids: Seq[(Int, Array[Double])], nProbe: Int): Column = {
    val scored = centroids.map { case (cid, cvec) =>
      struct(
        Similarity.cosine(v, array(cvec.map(lit): _*)).as("score"),
        lit(-cid).as("neg_id")) // descending sort: highest score, then lowest id
    }
    // sort descending by (score, -id), take nProbe cell ids
    transform(
      slice(reverse(array_sort(array(scored: _*))), 1, nProbe),
      s => -s.getField("neg_id"))
  }

  def topK(queries: DataFrame, corpus: DataFrame,
           idCol: String, vecCol: String, k: Int,
           nCells: Int = 8, nProbe: Int = 2): DataFrame = {
    val spark = corpus.sparkSession
    // coarse quantizer: tiny, driver-side by design (k-means seeds)
    val centroids: Seq[(Int, Array[Double])] = corpus
      .filter(col(idCol) < nCells)
      .select(col(idCol), Similarity.asDouble(col(vecCol)).as("v"))
      .collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Double](1).toArray))
      .sortBy(_._1).toSeq

    val c = corpus.select(col(idCol).as("neighbor_id"), Similarity.asDouble(col(vecCol)).as("cv"))
      .withColumn("cell", element_at(cellRanks(col("cv"), centroids, 1), 1))
    val q = queries.select(col(idCol).as("query_id"), Similarity.asDouble(col(vecCol)).as("qv"))
      .withColumn("cell", explode(cellRanks(col("qv"), centroids, nProbe)))

    val scored = q.join(c, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", Similarity.cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }
}
