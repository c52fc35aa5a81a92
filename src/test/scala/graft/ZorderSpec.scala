package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Relation
import graft.relations.RelationManager

/** OPTIMIZE ZORDER: multi-column file-stat locality. A lexicographic
  * (x, y) rewrite makes per-file min/max tight on x only — a y-point
  * predicate still straddles every file; the Morton rewrite makes BOTH
  * columns prunable at once (~√F candidate files per point predicate at
  * two columns). The straddle counts below read the same manifest stats
  * the connector's mayMatch pruning consumes. */
class ZorderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def candidateFiles(rm: RelationManager, rel: Relation,
                             c: String, v: Long): Int = {
    val st = rm.currentState(rel).get
    st.files.count { f =>
      st.stats.get(f).flatMap(_.get(c)) match {
        case Some(s) => (s.min, s.max) match {
          case (Some(mn), Some(mx)) => mn.toLong <= v && v <= mx.toLong
          case _ => true
        }
        case None => true
      }
    }
  }

  test("z-order makes BOTH columns file-prunable; linear clustering only the first") {
    import spark.implicits._
    val rm = new RelationManager(spark,
      Files.createTempDirectory("graft_zorder").toString)
    // 256×256 grid in hash-shuffled order: the raw layout carries no
    // locality on either column; 256 distinct values per axis populate
    // the quantile-bin space densely (the regime Morton locality is for)
    val rows = spark.range(65536)
      .select((col("id") % 256).as("x"), (col("id") / 256).cast("long").as("y"),
        md5(col("id").cast("string")).as("payload"))
      .orderBy(md5(concat(lit("shuffle"), col("id").cast("string"))))
    def freshTable(name: String): Relation = {
      val rel = Relation("graft", "zorder", name)
      rm.writeTable(rows, rel, statsCols = Seq("x", "y"))
      rel
    }
    // ~16 files either way (same targetFileBytes → same N)
    val target = 160L * 1024

    val lin = freshTable("linear")
    rm.optimize(lin, clusterBy = Seq("x", "y"), targetFileBytes = target)
    val stLin = rm.currentState(lin).get
    val linFiles = stLin.files.size
    assert(linFiles >= 8, s"need a real multi-file layout, got $linFiles")

    val zo = freshTable("morton")
    rm.optimize(zo, clusterBy = Seq("x", "y"), targetFileBytes = target,
      zorder = true)
    val zFiles = rm.currentState(zo).get.files.size
    assert(zFiles >= 8, s"need a real multi-file layout, got $zFiles")

    // leading column: both layouts prune sharply
    assert(candidateFiles(rm, lin, "x", 50) <= math.max(2, linFiles / 4))
    assert(candidateFiles(rm, zo, "x", 50) <= math.max(2, zFiles / 2))
    // second column: the lexicographic layout can't prune (every file
    // spans ~all y), the Morton layout must
    val linY = candidateFiles(rm, lin, "y", 50)
    val zY = candidateFiles(rm, zo, "y", 50)
    assert(linY >= linFiles - 1,
      s"precondition: linear layout must NOT prune y ($linY of $linFiles)")
    assert(zY <= zFiles / 2,
      s"z-order must prune y: $zY of $zFiles candidate files")

    // the rewrite moved bytes, not rows: multiset equality
    val before = rows.groupBy("x", "y").count()
    val after = rm.read(zo).groupBy("x", "y").count()
    assert(before.exceptAll(after).isEmpty && after.exceptAll(before).isEmpty,
      "z-order rewrite must preserve the row multiset")
  }

  test("ZInterleave hand-check and QuantileBin boundary semantics") {
    import org.apache.spark.sql.graft.VectorExpressions
    import spark.implicits._
    // bins (3, 5) at 3 bits: x=011, y=101 → interleaved (x first/more
    // significant per bit): b2: x=0,y=1 → 01; b1: x=1,y=0 → 10; b0:
    // x=1,y=1 → 11 → 011011₂ = 27
    val z = Seq((3, 5)).toDF("a", "b")
      .select(VectorExpressions.zInterleave(array(col("a"), col("b")), 3))
      .collect()(0).getLong(0)
    assert(z == 27L, s"expected 27, got $z")
    // cuts [10, 20]: v<10 → 0, 10 ≤ v < 20 → 1 (boundary joins the upper
    // bin), v ≥ 20 → 2; null → null (callers coalesce to 0)
    val bins = Seq(9.0, 10.0, 19.9, 20.0, 25.0).toDF("v")
      .select(VectorExpressions.quantileBin(col("v"), Array(10.0, 20.0)))
      .collect().map(_.getInt(0)).toSeq
    assert(bins == Seq(0, 1, 1, 2, 2), bins.toString)
  }

  test("z-order fails loud on string columns and on > 64 interleaved bits") {
    import spark.implicits._
    val rm = new RelationManager(spark,
      Files.createTempDirectory("graft_zorder_guard").toString)
    val rel = Relation("graft", "zorder", "strings")
    rm.writeTable(Seq((1L, "a"), (2L, "b")).toDF("x", "s"), rel,
      statsCols = Seq("x", "s"))
    // a string column would cast("double") to NULL row-by-row → bin 0
    // everywhere → silently unclustered; must reject instead
    val e = intercept[IllegalArgumentException](
      rm.optimize(rel, clusterBy = Seq("x", "s"), zorder = true))
    assert(e.getMessage.contains("numeric"), e.getMessage)
    // 9 columns × 8 bits > 64: the Morton key cannot hold it
    import org.apache.spark.sql.graft.VectorExpressions
    val wide = Seq(1).toDF("v")
      .select(VectorExpressions.zInterleave(
        array((0 until 9).map(_ => col("v")): _*), 8))
    val err = intercept[Exception](wide.collect())
    assert(err.toString.contains("64") || err.getCause != null)
  }
}
