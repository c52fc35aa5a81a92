package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Relation
import graft.relations.RelationManager

/** The catalog's stored-procedure surface (r17): `CALL
  * <cat>.system.{vacuum,optimize,history}` — table-format lifecycle
  * commands as plain SQL any Spark job can issue (the Iceberg
  * convention over Spark's procedure SPIP). */
class ProcedureSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("CALL system.history / vacuum / optimize run the lifecycle ops and return result rows") {
    import spark.implicits._
    val rm = new RelationManager(spark,
      java.nio.file.Files.createTempDirectory("graft_proc").toString)
    val rel = Relation("graft", "main", "proc_t")
    rm.writeTable(spark.range(100).toDF("id").repartition(4), rel,
      statsCols = Seq("id"))
    rm.appendTable(spark.range(100, 150).toDF("id").repartition(2), rel)
    rm.appendTable(spark.range(150, 160).toDF("id"), rel)
    val cat = rm.catalogName

    // history: queryable commit log — newest first, add/remove deltas
    val hist = spark.sql(
      s"CALL $cat.system.history(table => 'main.proc_t', num_versions => 10)")
      .collect().map(r => (r.getInt(0), r.getInt(2), r.getInt(3), r.getInt(4)))
    assert(hist.map(_._1).toSeq == Seq(3, 2, 1), hist.mkString(";"))
    assert(hist.last == ((1, 4, 4, 0)), s"first commit: ${hist.last}")

    // positional arguments + default num_versions work too
    assert(spark.sql(s"CALL $cat.system.history('main.proc_t')").count() == 3)

    // vacuum keeps 1 version: older manifests truncate, result reports
    // the live file count; current data intact
    val vac = spark.sql(
      s"CALL $cat.system.vacuum(table => 'main.proc_t', keep_versions => 1)")
      .collect()(0)
    assert(vac.getString(0) == "main.proc_t" && vac.getInt(1) == 1)
    assert(vac.getInt(2) == rm.currentState(rel).get.files.size)
    assert(spark.sql(s"CALL $cat.system.history('main.proc_t')").count() == 1)
    assert(rm.read(rel).count() == 160)

    // optimize bin-packs the small files into fewer, data intact
    val opt = spark.sql(
      s"CALL $cat.system.optimize(table => 'main.proc_t')").collect()(0)
    assert(opt.getInt(2) <= opt.getInt(1), s"files ${opt.getInt(1)} -> ${opt.getInt(2)}")
    assert(opt.getString(3) == "bin-packed")
    assert(rm.read(rel).count() == 160 &&
      rm.read(rel).agg(sum("id")).collect()(0).getLong(0) == (0L until 160L).sum)

    // unknown procedure fails loud with the known list (Spark wraps the
    // catalog's error in FAILED_TO_LOAD_ROUTINE; ours rides the cause)
    val e = intercept[Exception](
      spark.sql(s"CALL $cat.system.nope('main.proc_t')").collect())
    val chain = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString(" | ")
    assert(chain.contains("no such procedure") &&
      chain.contains("system.vacuum"), chain)

    // bad table-name shape is a loud argument error
    val e2 = intercept[Exception](
      spark.sql(s"CALL $cat.system.history('proc_t')").collect())
    assert(e2.getMessage.contains("<schema>.<table>"), e2.getMessage)
  }
}
