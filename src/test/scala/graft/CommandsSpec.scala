package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.compile.TemplateResolver
import graft.relations.RelationManager
import graft.runner.{Commands, Runner}

class CommandsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def project() = {
    val rm = new RelationManager(spark, Files.createTempDirectory("graft_cmd").toString)
    val nodes = Seq(
      TemplateResolver.parseModel("pkg", "base",
        "{{ config(materialized='table') }}\nselect 1 as id, 'x' as v union all select 2, 'y'"),
      TemplateResolver.parseModel("pkg", "child",
        "{{ config(materialized='table') }}\nselect * from {{ ref('base') }} where id > 99"))
    val manifest = Manifest(nodes).processRefs()
    (rm, manifest, new Runner(spark, rm, manifest))
  }

  test("show previews limited rows; compile renders refs") {
    val (_, manifest, runner) = project()
    runner.run(select = Seq("base"))
    val preview = Commands.show(runner, manifest("model.pkg.child"), limit = 1)
    assert(preview.columns.toSeq == Seq("id", "v"))
    val sql = Commands.compile(runner, manifest("model.pkg.child"))
    assert(sql.contains("from main__base"))
  }

  test("list applies selector algebra") {
    val (_, manifest, _) = project()
    assert(Commands.list(manifest, Seq("base+")) ==
      Seq("model.pkg.base", "model.pkg.child"))
  }

  test("retry reruns only failed/skipped nodes") {
    val rm = new RelationManager(spark, Files.createTempDirectory("graft_retry").toString)
    val bad = TemplateResolver.parseModel("pkg", "bad",
      "{{ config(materialized='table') }}\nselect * from this_table_does_not_exist_xyz")
    val down = TemplateResolver.parseModel("pkg", "down",
      "{{ config(materialized='table') }}\nselect * from {{ ref('bad') }}")
    val ok = TemplateResolver.parseModel("pkg", "ok",
      "{{ config(materialized='table') }}\nselect 42 as answer")
    val manifest = Manifest(Seq(bad, down, ok)).processRefs()
    val runner = new Runner(spark, rm, manifest)
    val r1 = runner.run()
    val byId = r1.map(r => r.uniqueId -> r.status).toMap
    assert(byId("model.pkg.bad") == "error")
    assert(byId("model.pkg.down") == "skipped")
    assert(byId("model.pkg.ok") == "success")
    val r2 = Commands.retry(runner, r1)
    assert(r2.map(_.uniqueId).toSet == Set("model.pkg.bad", "model.pkg.down"))
  }

  test("manifest artifact round-trips checksums for state:modified") {
    val (_, manifest, _) = project()
    val path = Files.createTempFile("manifest", ".json").toString
    Commands.writeManifest(manifest, path)
    val sums = Commands.loadManifestChecksums(path)
    assert(sums("model.pkg.base") == manifest("model.pkg.base").checksum)
    // simulate an edit → state:modified picks it up
    val edited = Manifest(manifest.nodes.map { case (id, n) =>
      id -> (if (n.name == "base") n.copy(checksum = "deadbeef") else n)
    })
    val prev = Manifest(manifest.nodes.map { case (id, n) =>
      id -> n.copy(checksum = sums.getOrElse(id, n.checksum))
    })
    assert(Selector.select(edited, Seq("state:modified"), previousState = Some(prev)) ==
      Set("model.pkg.base"))
  }

  test("unit test executor diffs fixture runs both ways") {
    import graft.quality.UnitTests
    val model = TemplateResolver.parseModel("pkg", "m",
      "select a + b as c from {{ ref('in1') }}")
    val fx = Seq(UnitTests.Fixture("in1", Seq(Map("a" -> 1, "b" -> 2))))
    assert(UnitTests.run(spark, UnitTests.UnitTest("t1", model, fx,
      Seq(Map("c" -> 3)))).passed)
    assert(!UnitTests.run(spark, UnitTests.UnitTest("t2", model, fx,
      Seq(Map("c" -> 4)))).passed)
  }
}

class MetaFunctionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import graft.functions.SqlFunctions

  test("validate_sql: analysis-only error detection") {
    assert(SqlFunctions.validateSql(spark, "select 1 as x").isEmpty)
    assert(SqlFunctions.validateSql(spark, "select nope from missing_table_xyz").isDefined)
  }

  test("get_columns_in_query probes schema without executing") {
    val schema = SqlFunctions.columnsInQuery(spark, "select 1 as a, 'x' as b")
    assert(schema.fieldNames.toSeq == Seq("a", "b"))
  }

  test("intervals_between and powers_of_two compile-time math") {
    import java.time.LocalDate
    assert(SqlFunctions.intervalsBetween(LocalDate.of(2024, 1, 1), LocalDate.of(2024, 3, 1), "month") == 2)
    assert(SqlFunctions.intervalsBetween(LocalDate.of(2024, 1, 1), LocalDate.of(2024, 1, 15), "week") == 2)
    assert(SqlFunctions.powersOfTwo(1) == 0)
    assert(SqlFunctions.powersOfTwo(2) == 1)
    assert(SqlFunctions.powersOfTwo(1000) == 10)
  }

  test("catalog artifact lists built relations with schemas and row counts") {
    val rm = new RelationManager(spark, java.nio.file.Files.createTempDirectory("graft_cat").toString)
    val nodes = Seq(graft.compile.TemplateResolver.parseModel("pkg", "t1",
      "{{ config(materialized='table') }}\nselect 1 as id, 'a' as name"))
    val manifest = Manifest(nodes).processRefs()
    val runner = new Runner(spark, rm, manifest)
    runner.run()
    val path = java.nio.file.Files.createTempFile("catalog", ".json").toString
    Commands.writeCatalog(rm, manifest, runner, path)
    val txt = java.nio.file.Files.readString(java.nio.file.Paths.get(path))
    assert(txt.contains("\"model.pkg.t1\""))
    assert(txt.contains("\"id\":\"row_count\",\"label\":\"Row Count\",\"value\":1"))
    assert(txt.contains("\"id\""))
  }
}

class DeferSampleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import graft.compile.TemplateResolver

  test("defer: unbuilt upstream refs resolve to the state warehouse") {
    import spark.implicits._
    val state = new RelationManager(spark, java.nio.file.Files.createTempDirectory("graft_state").toString)
    val dev = new RelationManager(spark, java.nio.file.Files.createTempDirectory("graft_dev").toString)
    val nodes = Seq(
      TemplateResolver.parseModel("pkg", "upstream",
        "{{ config(materialized='table') }}\nselect 1 as id union all select 2 as id"),
      TemplateResolver.parseModel("pkg", "downstream",
        "{{ config(materialized='table') }}\nselect count(*) as n from {{ ref('upstream') }}"))
    val manifest = Manifest(nodes).processRefs()
    // state warehouse has upstream built (a previous prod run)
    new Runner(spark, state, manifest).run(select = Seq("upstream"))
    // wipe the session view so the dev runner must go through the defer path
    spark.catalog.dropTempView(Relation("graft", "main", "upstream").viewName)
    // dev run selects ONLY downstream, deferring upstream to state
    val results = new Runner(spark, dev, manifest, defer = Some(state))
      .run(select = Seq("downstream"))
    assert(results.map(_.status).toSet == Set("success"), results.mkString(";"))
    assert(dev.read(Relation("graft", "main", "downstream")).collect()(0).getLong(0) == 2L)
    assert(!dev.exists(Relation("graft", "main", "upstream")))
  }

  test("sample mode: event-time refs get the window filter injected") {
    import spark.implicits._
    val rm = new RelationManager(spark, java.nio.file.Files.createTempDirectory("graft_smp").toString)
    val t = (s: String) => java.sql.Timestamp.valueOf(s)
    val nodes = Seq(
      TemplateResolver.parseModel("pkg", "events_model",
        "{{ config(materialized='table', event_time='ts') }}\nselect * from raw_events_sample"),
      TemplateResolver.parseModel("pkg", "daily",
        "{{ config(materialized='table') }}\nselect count(*) as n from {{ ref('events_model') }}"))
    Seq((t("2024-01-01 10:00:00"), 1.0), (t("2024-01-05 10:00:00"), 2.0), (t("2024-01-09 10:00:00"), 3.0))
      .toDF("ts", "v").createOrReplaceTempView("raw_events_sample")
    val manifest = Manifest(nodes).processRefs()
    val window = (java.time.Instant.parse("2024-01-04T00:00:00Z"),
      java.time.Instant.parse("2024-01-08T00:00:00Z"))
    val results = new Runner(spark, rm, manifest, sampleWindow = Some(window)).run()
    assert(results.forall(_.status == "success"), results.mkString(";"))
    // only the 2024-01-05 event falls inside the sample window
    assert(rm.read(Relation("graft", "main", "daily")).collect()(0).getLong(0) == 1L)
  }
}

class HooksSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import graft.compile.TemplateResolver

  test("pre/post hooks run in node context; on-run-start/end run once") {
    val rm = new RelationManager(spark, java.nio.file.Files.createTempDirectory("graft_hooks").toString)
    val node = TemplateResolver.parseModel("pkg", "hooked",
      "{{ config(materialized='table') }}\nselect 1 as id union all select 2 as id")
      .copy(config = TemplateResolver.parseModel("pkg", "hooked",
        "{{ config(materialized='table') }}\nselect 1").config.copy(
        preHooks = Seq("create or replace temp view pre_marker as select 'pre' as phase"),
        postHooks = Seq("create or replace temp view post_audit as select count(*) as n from {{ this }}")))
    val manifest = Manifest(Seq(node.copy(code = Some(SqlCode(
      "select 1 as id union all select 2 as id"))))).processRefs()
    val results = new Runner(spark, rm, manifest).run(
      onRunStart = Seq("create or replace temp view run_started as select 1 as ok"),
      onRunEnd = Seq("create or replace temp view run_ended as select 1 as ok"))
    assert(results.forall(_.status == "success"), results.mkString(";"))
    assert(spark.table("pre_marker").collect()(0).getString(0) == "pre")
    assert(spark.table("post_audit").collect()(0).getLong(0) == 2L)
    assert(spark.table("run_started").count() == 1 && spark.table("run_ended").count() == 1)
  }

  test("post-hook row-level DML on {{ this }} — the reference's canonical self-maintenance pattern (r17)") {
    val rm = new RelationManager(spark, java.nio.file.Files.createTempDirectory("graft_hookdml").toString)
    val base = TemplateResolver.parseModel("pkg", "trimmed",
      "{{ config(materialized='table') }}\n" +
        "select * from (values (1), (2), (3)) as t(id)")
    val hooked = base.copy(config = base.config.copy(
      postHooks = Seq("DELETE FROM {{ this }} WHERE id = 2")))
    // a downstream consumer in the SAME run must see the post-hook state
    val down = TemplateResolver.parseModel("pkg", "downstream",
      "{{ config(materialized='table') }}\nselect count(*) as n from {{ ref('trimmed') }}")
    val manifest = Manifest(Seq(hooked, down)).processRefs()
    val results = new Runner(spark, rm, manifest).run()
    assert(results.forall(_.status == "success"), results.mkString(";"))
    assert(rm.read(Relation("graft", "main", "trimmed")).count() == 2)
    assert(rm.read(Relation("graft", "main", "downstream"))
      .collect()(0).getLong(0) == 2L,
      "downstream must read the post-hook (post-DML) state")
  }
}
