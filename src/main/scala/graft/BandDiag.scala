package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic for the 150k-doc minhash stall ScaleProbe exposed: prints
  * the LSH band-bucket size distribution, the self-join row volume it
  * implies, and the distinct-signature count. */
object BandDiag {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 150000
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").appName("band-diag").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = ScaleProbe.corpus(spark, n)
    val sigs = ops.Dedup.minhashSignatures(docs, "doc_id", "text", 5, 32)
    val banded = sigs.select(col("doc"),
      explode(ops.Dedup.bandKeys(col("sig"), 8, 4)).as("band"))
    val dist = banded.groupBy("band").count()
    println("== top band buckets ==")
    dist.orderBy(desc("count")).limit(8).collect().foreach(println)
    val stats = dist.agg(count(lit(1)), max("count"),
      expr("percentile(count, 0.999)")).collect()(0)
    println(s"== buckets=${stats.get(0)} max=${stats.get(1)} p999=${stats.get(2)}")
    val vol = dist.agg(sum(col("count") * col("count"))).collect()(0).getLong(0)
    println(s"== self-join row volume = $vol")
    println(s"== distinct sigs = ${sigs.select("sig").distinct().count()} of $n")
    spark.stop()
  }
}
