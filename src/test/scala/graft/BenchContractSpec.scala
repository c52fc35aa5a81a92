package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Bench failure contract (VERDICT r7 "what's wrong" #2): a query that
  * throws must never be timed — it is excluded from headline_total,
  * surfaced under "errors", and the artifact carries "partial":true so
  * a bench over broken queries is machine-detectably invalid. */
class BenchContractSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.spark

  private def goodQ: (SparkSession, String) => DataFrame =
    (s, d) => Tables.nation(s, d).select("n_nationkey", "n_name")

  private def brokenQ: (SparkSession, String) => DataFrame =
    (s, d) => Tables.nation(s, d).selectExpr("no_such_column + 1")

  test("GatePhases.build rejects a key that is not a registered query (r17 — silent-attribution-drop guard)") {
    // a registered gate records fine...
    assert(graft.queries.GatePhases.build("q_dsir_from_model")(42) == 42)
    assert(graft.queries.GatePhases.drain("q_dsir_from_model") >= 0.0)
    // ...a renamed/typo'd key fails loud instead of silently zeroing the
    // gate's build/fold sidecar split
    val e = intercept[IllegalArgumentException](
      graft.queries.GatePhases.build("q_renamed_gate_typo")(42))
    assert(e.getMessage.contains("not a registered SparkEntry query"), e.getMessage)
  }

  test("clean run: no partial flag, all queries timed, rc-equivalent empty errs") {
    val (json, _, errs) = Bench.run(spark, sf, Seq("good"), Map("good" -> goodQ), passCount = 1)
    assert(errs.isEmpty)
    assert(!json.contains("\"partial\""))
    assert(json.contains("\"good\":"))
    assert(json.contains("\"metric\":\"headline_total\""))
  }

  test("broken query: excluded from timings/total, err recorded, partial flag set") {
    val (json, _, errs) = Bench.run(spark, sf,
      Seq("good", "dead"), Map("good" -> goodQ, "dead" -> brokenQ), passCount = 1)
    assert(errs.keySet == Set("dead"))
    assert(json.contains("\"partial\":true"))
    // dead appears only inside the errors object, never as a timing
    assert(json.contains("\"errors\":{\"dead\":"))
    val queriesObj = json.substring(json.indexOf("\"queries\":"), json.indexOf(",\"sf\""))
    assert(!queriesObj.contains("dead"))
    assert(queriesObj.contains("\"good\":"))
    // the artifact line must still be parseable JSON with escaped message
    assert(!errs("dead").contains("\n"))
  }

  test("extra metric: own total + query block, never counted in headline_total") {
    val (json, _, errs) = Bench.run(spark, sf, Seq("good"),
      Map("good" -> goodQ, "cur1" -> goodQ, "cur2" -> goodQ), passCount = 1,
      extraMetrics = Seq("curation_total" -> Seq("cur1", "cur2")))
    assert(errs.isEmpty)
    assert(json.contains("\"curation_total\":"))
    assert(json.contains("\"curation_total_queries\":{\"cur1\":"))
    // headline block carries ONLY the headline query
    val headObj = json.substring(json.indexOf("\"queries\":"), json.indexOf(",\"sf\""))
    assert(headObj.contains("\"good\":") && !headObj.contains("cur1"))
    // a broken curation query flags the run partial but leaves headline timed
    val (json2, _, errs2) = Bench.run(spark, sf, Seq("good"),
      Map("good" -> goodQ, "dead" -> brokenQ), passCount = 1,
      extraMetrics = Seq("curation_total" -> Seq("dead")))
    assert(errs2.keySet == Set("dead"))
    assert(json2.contains("\"partial\":true") && json2.contains("\"good\":"))
    assert(json2.contains("\"curation_total\":0.000"))
    // r10: two extra metrics serialize side by side, each with its own
    // total + query block, still none of them in headline_total
    val (json3, _, errs3) = Bench.run(spark, sf, Seq("good"),
      Map("good" -> goodQ, "cur1" -> goodQ, "exc1" -> goodQ), passCount = 1,
      extraMetrics = Seq("curation_total" -> Seq("cur1"),
        "excision_total" -> Seq("exc1")))
    assert(errs3.isEmpty)
    assert(json3.contains("\"curation_total\":") &&
      json3.contains("\"excision_total\":") &&
      json3.contains("\"excision_total_queries\":{\"exc1\":"))
    val headObj3 = json3.substring(json3.indexOf("\"queries\":"), json3.indexOf(",\"sf\""))
    assert(!headObj3.contains("exc1") && !headObj3.contains("cur1"))
  }

  test("cpu axis: headline_cpu_total + cpu_queries present, broken queries excluded") {
    val (json, _, errs) = Bench.run(spark, sf, Seq("good", "dead"),
      Map("good" -> goodQ, "dead" -> brokenQ, "cur1" -> goodQ), passCount = 1,
      extraMetrics = Seq("curation_total" -> Seq("cur1")))
    assert(errs.keySet == Set("dead"))
    assert(json.contains("\"headline_cpu_total\":"))
    assert(json.contains("\"curation_total_cpu\":"))
    val cpuStart = json.indexOf("\"cpu_queries\":")
    val cpuObj = json.substring(cpuStart, json.indexOf("}", cpuStart) + 1)
    assert(cpuObj.contains("\"good\":") && cpuObj.contains("\"cur1\":"))
    assert(!cpuObj.contains("dead"))
    // cpu fields sit AFTER "sf": the wall "queries".."sf" slice used by
    // trend tooling must never contain cpu entries
    assert(json.indexOf("\"headline_cpu_total\"") > json.indexOf(",\"sf\""))
    // values are parseable non-negative numbers
    val cpuTotal = "\"headline_cpu_total\":([0-9.]+)".r
      .findFirstMatchIn(json).get.group(1).toDouble
    assert(cpuTotal >= 0.0)
  }

  test("compact artifact: complete contract, totals only, bounded size, failures as names") {
    // r14: the driver stores only the last ~2000 chars of stdout, so the
    // FINAL printed line is the compact twin — full contract fields,
    // extra-metric + cpu TOTALS, no per-query breakdowns beyond the
    // headline block, failures as a name list (messages live in the
    // full artifact + sidecar)
    val (full, compact, errs) = Bench.run(spark, sf, Seq("good", "dead"),
      Map("good" -> goodQ, "dead" -> brokenQ, "cur1" -> goodQ), passCount = 1,
      extraMetrics = Seq("curation_total" -> Seq("cur1")))
    assert(errs.keySet == Set("dead"))
    assert(compact.contains("\"metric\":\"headline_total\"") &&
      compact.contains("\"unit\":\"sec\"") &&
      compact.contains("\"queries\":{") && compact.contains("\"good\":") &&
      compact.contains(",\"sf\":"))
    assert(compact.contains("\"curation_total\":") &&
      compact.contains("\"headline_cpu_total\":") &&
      compact.contains("\"curation_total_cpu\":"))
    assert(!compact.contains("curation_total_queries") &&
      !compact.contains("cpu_queries"),
      s"compact must drop the secondary breakdowns: $compact")
    assert(compact.contains("\"partial\":true") &&
      compact.contains("\"failed\":[\"dead\"]"))
    assert(compact.length < full.length)
    // both lines must be self-delimiting JSON objects
    Seq(full, compact).foreach { j =>
      assert(j.startsWith("{") && j.endsWith("}"), j)
    }
  }

  test("all queries broken: zero total, every name in errors") {
    val (json, _, errs) = Bench.run(spark, sf, Seq("d1", "d2"),
      Map("d1" -> brokenQ, "d2" -> brokenQ), passCount = 1)
    assert(errs.keySet == Set("d1", "d2"))
    assert(json.contains("\"value\":0.000"))
    assert(json.contains("\"partial\":true"))
  }
}
