package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.extensions", "org.apache.spark.sql.graft.GraftSparkSessionExtension")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // the S3-semantics mock scheme (no rename, conditional PUT) — lets any
    // spec use a URI-shaped warehouse root (UriWarehouseSpec)
    .config("spark.hadoop.fs.s3mock.impl", "graft.S3SemanticsFileSystem")
    .getOrCreate()
}

class CoreQueriesSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.spark

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs and is non-degenerate at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, s"$name has no columns")
      withClue(s"query $name: ") { assert(df.count() >= 0) }
    }
  }

  test("every query has an oracle or is explicitly exempt") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- SparkEntry.rowsOnlyChecked
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }

  test("q1 aggregates are stable across repartition (order-insensitive sums)") {
    val base = SparkEntry.queries("q1_pricing_summary")(spark, sf).collect()
    val re = Tables.lineitem(spark, sf).repartition(7)
    re.createOrReplaceTempView("___ignore") // force a different physical layout on a rerun
    val again = SparkEntry.queries("q1_pricing_summary")(spark, sf).collect()
    assert(base.sameElements(again))
  }
}
