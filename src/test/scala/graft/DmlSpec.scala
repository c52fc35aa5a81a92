package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Relation
import graft.relations.RelationManager

/** SQL row-level DML on commit-log tables: DELETE / UPDATE / MERGE INTO
  * via group-based copy-on-write — Spark's runtime group filter plus the
  * `_file` metadata column narrow the rewrite to exactly the files holding
  * matching rows; one commit swaps them. */
class DmlSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ranged(rm: RelationManager, rel: Relation, n: Int, files: Int) = {
    import spark.implicits._
    rm.writeTable((0 until n).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartitionByRange(files, $"id"), rel, statsCols = Seq("id"))
  }

  test("the _file metadata column serves table-relative paths") {
    import spark.implicits._
    val rm = new RelationManager(spark, Files.createTempDirectory("graft_dml").toString)
    val rel = Relation("graft", "main", "dml_file")
    ranged(rm, rel, 100, 4)
    val t = s"${rm.catalogName}.main.dml_file"
    val files = spark.sql(s"SELECT DISTINCT _file FROM $t").as[String].collect().toSet
    assert(files == rm.currentState(rel).get.files.toSet)
  }

  test("SQL DELETE with an unprovable predicate rewrites only affected files") {
    import spark.implicits._
    val rm = new RelationManager(spark, Files.createTempDirectory("graft_dml").toString)
    val rel = Relation("graft", "main", "dml_del")
    ranged(rm, rel, 1000, 10)
    val t = s"${rm.catalogName}.main.dml_del"
    val before = rm.currentState(rel).get

    // matches only id=3 → the runtime group filter must narrow the
    // rewrite to the single file holding it
    spark.sql(s"DELETE FROM $t WHERE id % 97 = 3 AND id < 100")
    val after = rm.currentState(rel).get
    assert(spark.sql(s"SELECT count(*) FROM $t").as[Long].head() == 999L)
    assert(spark.sql(s"SELECT count(*) FROM $t WHERE id = 3").as[Long].head() == 0L)
    val kept = before.files.toSet intersect after.files.toSet
    assert(kept.size >= before.files.size - 1,
      s"copy-on-write DELETE must rewrite only the affected file: " +
        s"kept ${kept.size}/${before.files.size}")
    // rewritten files carry stats like any engine write
    assert(after.files.forall(f => after.stats.get(f).exists(_.contains("id"))))
  }

  test("SQL UPDATE rewrites only the file holding the row") {
    import spark.implicits._
    val rm = new RelationManager(spark, Files.createTempDirectory("graft_dml").toString)
    val rel = Relation("graft", "main", "dml_upd")
    ranged(rm, rel, 1000, 10)
    val t = s"${rm.catalogName}.main.dml_upd"
    val before = rm.currentState(rel).get

    spark.sql(s"UPDATE $t SET v = 'updated' WHERE id = 500")
    val after = rm.currentState(rel).get
    assert(spark.sql(s"SELECT v FROM $t WHERE id = 500").as[String].head() == "updated")
    assert(spark.sql(s"SELECT count(*) FROM $t").as[Long].head() == 1000L)
    assert(spark.sql(s"SELECT count(*) FROM $t WHERE v = 'updated'").as[Long].head() == 1L)
    val kept = before.files.toSet intersect after.files.toSet
    assert(kept.size >= before.files.size - 1,
      s"one-row UPDATE must rewrite one file: kept ${kept.size}/${before.files.size}")
    // time travel still sees the pre-update row
    assert(rm.readAt(rel, before.version).filter($"id" === 500L)
      .as[(Long, String)].head()._2 == "v500")
  }

  test("SQL MERGE INTO updates matches and inserts new keys, file-pruned") {
    import spark.implicits._
    val rm = new RelationManager(spark, Files.createTempDirectory("graft_dml").toString)
    val rel = Relation("graft", "main", "dml_merge")
    ranged(rm, rel, 1000, 10)
    val t = s"${rm.catalogName}.main.dml_merge"
    val before = rm.currentState(rel).get

    Seq((10L, "merged"), (11L, "merged"), (5000L, "inserted"))
      .toDF("id", "v").createOrReplaceTempView("dml_merge_src")
    spark.sql(
      s"""MERGE INTO $t tgt USING dml_merge_src src ON tgt.id = src.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)

    assert(spark.sql(s"SELECT count(*) FROM $t").as[Long].head() == 1001L)
    assert(spark.sql(s"SELECT v FROM $t WHERE id = 10").as[String].head() == "merged")
    assert(spark.sql(s"SELECT v FROM $t WHERE id = 5000").as[String].head() == "inserted")
    assert(spark.sql(s"SELECT count(*) FROM $t WHERE v = 'v10'").as[Long].head() == 0L)
    val after = rm.currentState(rel).get
    val kept = before.files.toSet intersect after.files.toSet
    assert(kept.size >= before.files.size - 1,
      s"two adjacent keys live in one range file; MERGE must keep the rest: " +
        s"kept ${kept.size}/${before.files.size}")
  }

  test("ALTER TABLE ADD/DROP COLUMNS is metadata-only; old files null-fill") {
    import spark.implicits._
    val rm = new RelationManager(spark, Files.createTempDirectory("graft_dml").toString)
    val rel = Relation("graft", "main", "dml_alter")
    ranged(rm, rel, 100, 2)
    val t = s"${rm.catalogName}.main.dml_alter"
    val before = rm.currentState(rel).get

    spark.sql(s"ALTER TABLE $t ADD COLUMNS (score DOUBLE)")
    val st1 = rm.currentState(rel).get
    assert(st1.files == before.files, "ADD COLUMNS must not touch data files")
    assert(st1.schema.fieldNames.toSeq == Seq("id", "v", "score"))
    // pre-evolution files null-fill the new column, via catalog AND engine reads
    assert(spark.sql(s"SELECT count(*) FROM $t WHERE score IS NULL").as[Long].head() == 100L)
    assert(rm.read(rel).filter($"score".isNull).count() == 100L)

    // new writes carry the column; old rows still null
    spark.sql(s"INSERT INTO $t VALUES (1000, 'n', 2.5)")
    assert(spark.sql(s"SELECT score FROM $t WHERE id = 1000").as[Double].head() == 2.5)
    assert(spark.sql(s"SELECT count(*) FROM $t WHERE score IS NULL").as[Long].head() == 100L)

    spark.sql(s"ALTER TABLE $t DROP COLUMN v")
    assert(rm.read(rel).columns.toSeq == Seq("id", "score"))
    assert(spark.sql(s"SELECT * FROM $t WHERE id = 1000").columns.toSeq == Seq("id", "score"))

    // layout columns are protected
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE $t DROP COLUMN id")
    }
    assert(e.getMessage.contains("layout column"), e.getMessage)
  }

  test("concurrent write-write conflict on the same file aborts the DML commit") {
    import spark.implicits._
    val rm = new RelationManager(spark, Files.createTempDirectory("graft_dml").toString)
    val rel = Relation("graft", "main", "dml_conflict")
    ranged(rm, rel, 100, 2)
    val st = rm.currentState(rel).get

    // a DML that scanned file 0, paused between scan and commit…
    val op = new org.apache.spark.sql.graft.source.GraftRowLevelOperation(
      rm.path(rel).toString, st.schema,
      org.apache.spark.sql.connector.write.RowLevelOperation.Command.DELETE)
    op.scannedFiles = Seq(st.files.head)

    // …while an engine merge replaces that same file
    graft.materializations.Materializations.mergeInto(rm, rel,
      Seq((1L, "other-writer")).toDF("id", "v"), Seq("id"), updateColumns = Nil)
    assert(!rm.currentState(rel).get.files.contains(st.files.head))

    // the DML's commit must detect the vanished file and abort, not
    // resurrect the pre-merge rows as duplicates
    val write = new org.apache.spark.sql.graft.source.GraftReplaceWrite(
      rm.path(rel).toString, st.schema, op)
    val e = intercept[IllegalStateException] {
      write.toBatch.commit(Array(
        org.apache.spark.sql.graft.source.GraftCommitMessage(Nil)))
    }
    assert(e.getMessage.contains("concurrent modification"), e.getMessage)
    // table unchanged by the failed DML
    assert(rm.read(rel).count() == 100)
    assert(rm.read(rel).filter($"v" === "other-writer").count() == 1)
  }

  test("DML on a partitioned+bucketed table keeps both layout dimensions") {
    import spark.implicits._
    val rm = new RelationManager(spark, Files.createTempDirectory("graft_dml").toString)
    val rel = Relation("graft", "main", "dml_pbkt")
    rm.writeTable(
      (0L until 200L).map(i => (i, s"v$i", if (i % 2 == 0) "x" else "y")).toDF("k", "v", "p"),
      rel, partitionBy = Seq("p"), statsCols = Seq("k"),
      bucketBy = Seq("k"), buckets = 4)
    val t = s"${rm.catalogName}.main.dml_pbkt"
    val before = rm.currentState(rel).get

    spark.sql(s"UPDATE $t SET v = 'upd' WHERE k = 8") // k=8 → p=x, one bucket
    val after = rm.currentState(rel).get
    assert(spark.sql(s"SELECT v FROM $t WHERE k = 8").as[String].head() == "upd")
    assert(spark.sql(s"SELECT count(*) FROM $t").as[Long].head() == 200L)
    // every rewritten file keeps p=…/_bucket=… routing
    val rewritten = after.files.filterNot(before.files.toSet)
    assert(rewritten.nonEmpty && rewritten.forall(f =>
      f.startsWith("p=") && RelationManager.bucketIdOf(f).isDefined),
      s"rewritten files must keep both layout dims: $rewritten")
    // and only the one affected file was replaced
    assert((before.files.toSet -- after.files.toSet).size == 1,
      "one-row UPDATE must replace exactly one (partition, bucket) file")
  }

  test("DML survives aggressive parquet row filtering (group scan returns whole files)") {
    import spark.implicits._
    // record-level filtering makes the parquet reader drop individual
    // non-matching rows when a filter reaches it — if the group scan ever
    // forwards the pushed DML condition, every surviving row of a touched
    // file vanishes from the rewrite. This guards the parquetFilters=Nil
    // override with the most hostile reader config.
    val prev = spark.conf.getOption("spark.sql.parquet.recordLevelFilter.enabled")
    spark.conf.set("spark.sql.parquet.recordLevelFilter.enabled", "true")
    try {
      val rm = new RelationManager(spark, Files.createTempDirectory("graft_dml").toString)
      val rel = Relation("graft", "main", "dml_rowfilter")
      ranged(rm, rel, 100, 1) // ONE file: every surviving row shares it
      val t = s"${rm.catalogName}.main.dml_rowfilter"
      spark.sql(s"DELETE FROM $t WHERE id % 50 = 7")
      assert(spark.sql(s"SELECT count(*) FROM $t").as[Long].head() == 98L,
        "survivors of the touched file must all be rewritten")
      spark.sql(s"UPDATE $t SET v = 'u' WHERE id = 20")
      assert(spark.sql(s"SELECT count(*) FROM $t").as[Long].head() == 98L)
      assert(spark.sql(s"SELECT count(*) FROM $t WHERE v = 'u'").as[Long].head() == 1L)
    } finally prev match {
      case Some(p) => spark.conf.set("spark.sql.parquet.recordLevelFilter.enabled", p)
      case None    => spark.conf.unset("spark.sql.parquet.recordLevelFilter.enabled")
    }
  }

  test("re-adding a dropped column name is rejected while live files carry it") {
    import spark.implicits._
    val rm = new RelationManager(spark, Files.createTempDirectory("graft_dml").toString)
    val rel = Relation("graft", "main", "dml_readd")
    ranged(rm, rel, 50, 1)
    val t = s"${rm.catalogName}.main.dml_readd"
    spark.sql(s"ALTER TABLE $t DROP COLUMN v")
    val e = intercept[Exception] { spark.sql(s"ALTER TABLE $t ADD COLUMNS (v STRING)") }
    assert(e.getMessage.contains("resurrect"), e.getMessage)
    // after a rewrite purges the physical column, re-adding is legal
    rm.writeTable(rm.read(rel), rel)
    spark.sql(s"ALTER TABLE $t ADD COLUMNS (v STRING)")
    assert(spark.sql(s"SELECT count(*) FROM $t WHERE v IS NULL").as[Long].head() == 50L,
      "post-rewrite re-add must null-fill, not resurrect")
  }

  test("concurrent ALTERs never lose a column (snapshot-derived schema recomputes per retry)") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val rm = new RelationManager(spark, Files.createTempDirectory("graft_dml").toString)
    val rel = Relation("graft", "main", "dml_alter_race")
    ranged(rm, rel, 50, 1)
    val t = s"${rm.catalogName}.main.dml_alter_race"
    // 8 writers race schema commits; before ALTER carried expectedBase the
    // last CAS winner silently dropped the others' columns (the schema was
    // computed once from a snapshot and re-committed verbatim on retry)
    val adds = (0 until 8).map(i => Future {
      spark.sql(s"ALTER TABLE $t ADD COLUMNS (extra_$i DOUBLE)")
    })
    Await.result(Future.sequence(adds), 120.seconds)
    val cols = spark.table(t).columns.toSet
    (0 until 8).foreach(i => assert(cols.contains(s"extra_$i"),
      s"extra_$i lost by a concurrent ALTER; have $cols"))
  }

  test("DML preserves bucket layout and storage-partitioned joins") {
    import spark.implicits._
    val rm = new RelationManager(spark, Files.createTempDirectory("graft_dml").toString)
    val a = Relation("graft", "main", "dml_bkt_a")
    val b = Relation("graft", "main", "dml_bkt_b")
    rm.writeBucketedTable((0L until 200L).map(i => (i, s"a$i")).toDF("k", "va"),
      a, buckets = 4, bucketCols = Seq("k"))
    rm.writeBucketedTable((0L until 200L).map(i => (i, s"b$i")).toDF("k", "vb"),
      b, buckets = 4, bucketCols = Seq("k"))
    val t = s"${rm.catalogName}.main.dml_bkt_a"

    spark.sql(s"UPDATE $t SET va = 'upd' WHERE k = 7")
    val st = rm.currentState(a).get
    assert(st.files.forall(RelationManager.bucketIdOf(_).isDefined),
      s"DML-rewritten files must keep bucket routing: ${st.files}")
    assert(spark.sql(s"SELECT va FROM $t WHERE k = 7").as[String].head() == "upd")

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = rm.read(a).join(rm.read(b), "k")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must stay shuffle-free after DML:\n$plan")
      assert(joined.count() == 200)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
