package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The events-fixture drift lesson (EventsSchemaDriftSpec) generalized to
  * the other driver-regenerated tables: `Tables.documents` /
  * `Tables.embeddings` must absorb the integer-width and string-encoding
  * drift a fixture regeneration can legally introduce, while leaving the
  * embedding element type AS STORED (narrowing a float64 fixture to
  * float32 would diverge from the DuckDB oracle, which reads stored
  * values). */
class DocumentsSchemaDriftSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("documents: int32 ids and widths normalize to the contracted longs") {
    val dir = Files.createTempDirectory("graft_docs_drift").toString
    spark.range(3).select(
      col("id").cast(IntegerType).as("doc_id"),
      concat(lit("text "), col("id")).as("text"),
      lit("en").as("lang"), lit("src0").as("source"),
      lit(6).cast(IntegerType).as("n_chars"))
      .write.parquet(s"$dir/documents.parquet")
    val df = Tables.documents(spark, dir)
    assert(df.schema("doc_id").dataType == LongType)
    assert(df.schema("n_chars").dataType == LongType)
    assert(df.count() == 3)
    // every doc-keyed op downstream reads ids as Long — the spec-level
    // contract the normalization exists for
    assert(df.select("doc_id").collect().map(_.getLong(0)).toSet == Set(0L, 1L, 2L))
  }

  test("embeddings: vec_id width normalizes; element type stays as stored") {
    val dir = Files.createTempDirectory("graft_emb_drift").toString
    spark.range(2).select(
      col("id").cast(IntegerType).as("vec_id"),
      array(lit(1.0d), lit(2.0d)).as("embedding"), // a DOUBLE fixture
      lit(0).as("label"))
      .write.parquet(s"$dir/embeddings.parquet")
    val df = Tables.embeddings(spark, dir)
    assert(df.schema("vec_id").dataType == LongType)
    assert(df.schema("embedding").dataType == ArrayType(DoubleType, containsNull = true),
      "stored float64 must NOT be narrowed — the oracle reads stored values")
  }
}
