package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.relations.{ConventionMetastore, InMemoryMetastore, Metastore}

/** VERDICT r6 #2 / r7 "what's missing" #2 — the metastore-backed catalog
  * seam: the full V2 engine flow (DDL, writes, DML, time travel, rename,
  * drop) running with table discovery served by an RPC-shaped registry
  * instead of warehouse-prefix listings. The in-memory backend counts
  * calls and touches no filesystem, so these tests can assert BOTH that
  * the flow works and that discovery truth genuinely lives in the
  * service (unregistered dirs are invisible; renames don't move data). */
class MetastoreSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def newCatalog(tag: String): (String, String, InMemoryMetastore) = {
    val root = Files.createTempDirectory(s"graft_ms_$tag").toString
    val msName = s"ms_$tag"
    val cat = s"graftms_$tag"
    spark.conf.set(s"spark.sql.catalog.$cat",
      "org.apache.spark.sql.graft.source.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.conf.set(s"spark.sql.catalog.$cat.metastore", s"memory:$msName")
    (cat, root, InMemoryMetastore.named(msName))
  }

  test("full engine flow on the in-memory metastore: DDL, insert, DML, time travel, drop") {
    val (cat, root, ms) = newCatalog("flow")
    spark.sql(s"CREATE NAMESPACE $cat.analytics")
    spark.sql(s"CREATE TABLE $cat.analytics.orders (id BIGINT, status STRING, amount DOUBLE)")
    assert(ms.tableLocation("analytics", "orders").isDefined)

    spark.sql(s"INSERT INTO $cat.analytics.orders VALUES (1,'open',10.0),(2,'open',20.0),(3,'done',30.0)")
    assert(spark.sql(s"SELECT * FROM $cat.analytics.orders").count() == 3)

    spark.sql(s"UPDATE $cat.analytics.orders SET status='done' WHERE id=1")
    assert(spark.sql(
      s"SELECT count(*) FROM $cat.analytics.orders WHERE status='done'")
      .head().getLong(0) == 2)

    spark.sql(s"DELETE FROM $cat.analytics.orders WHERE id=2")
    assert(spark.sql(s"SELECT * FROM $cat.analytics.orders").count() == 2)

    // time travel still rides the commit log, unchanged by the seam
    assert(spark.sql(s"SELECT * FROM $cat.analytics.orders VERSION AS OF 2").count() == 3)

    // SHOW TABLES resolves via the registry
    val shown = spark.sql(s"SHOW TABLES IN $cat.analytics").collect().map(_.getString(1))
    assert(shown.toSeq == Seq("orders"))

    assert(spark.sql(s"DROP TABLE $cat.analytics.orders").collect().isEmpty)
    assert(ms.tableLocation("analytics", "orders").isEmpty)
    assert(spark.sql(s"SHOW TABLES IN $cat.analytics").collect().isEmpty)
  }

  test("discovery truth lives in the service, not the directory layout") {
    val (cat, root, ms) = newCatalog("truth")
    spark.sql(s"CREATE NAMESPACE $cat.main")
    spark.sql(s"CREATE TABLE $cat.main.t1 (id BIGINT)")
    spark.sql(s"INSERT INTO $cat.main.t1 VALUES (1),(2)")

    // a commit-log table directory that is NOT registered must be
    // invisible — no listing fallback
    val convention = new ConventionMetastore(root)
    spark.sql(s"CREATE TABLE $cat.main.t2 (id BIGINT)")
    ms.unregisterTable("main", "t2")
    val shown = spark.sql(s"SHOW TABLES IN $cat.main").collect().map(_.getString(1))
    assert(shown.toSeq == Seq("t1"))
    assert(convention.listTables("main").contains("t2"),
      "precondition: t2's directory still exists on disk")
    assertThrows[Exception](spark.sql(s"SELECT * FROM $cat.main.t2").collect())
  }

  test("rename is a registry re-key: location unchanged, data never moves") {
    val (cat, root, ms) = newCatalog("rename")
    spark.sql(s"CREATE NAMESPACE $cat.main")
    spark.sql(s"CREATE TABLE $cat.main.src (id BIGINT)")
    spark.sql(s"INSERT INTO $cat.main.src VALUES (7)")
    val locBefore = ms.tableLocation("main", "src").get

    spark.sql(s"ALTER TABLE $cat.main.src RENAME TO main.dst")
    assert(ms.tableLocation("main", "src").isEmpty)
    assert(ms.tableLocation("main", "dst").contains(locBefore),
      "rename must re-key the registry entry, not move storage")
    assert(spark.sql(s"SELECT * FROM $cat.main.dst").head().getLong(0) == 7L)
  }

  test("listTables is one RPC, not one list plus a stat per table") {
    val (cat, _, ms) = newCatalog("cost")
    spark.sql(s"CREATE NAMESPACE $cat.costs")
    (1 to 5).foreach(i => spark.sql(s"CREATE TABLE $cat.costs.t$i (id BIGINT)"))
    val before = ms.calls.get()
    assert(ms.listTables("costs").size == 5)
    assert(ms.calls.get() - before == 1,
      "listTables must cost exactly one metastore call regardless of table count")
  }

  test("explicit location decouples storage from naming; convention backend rejects it") {
    val (cat, root, ms) = newCatalog("loc")
    val elsewhere = Files.createTempDirectory("graft_ms_elsewhere").toString + "/data"
    spark.sql(s"CREATE NAMESPACE $cat.main")
    spark.sql(s"CREATE TABLE $cat.main.ext (id BIGINT) LOCATION '$elsewhere'")
    // Spark canonicalizes LOCATION to a file: URI; the registry stores it
    // verbatim and the file:-aware local path handling resolves it
    val loc = ms.tableLocation("main", "ext").get
    assert(loc.endsWith(elsewhere))
    spark.sql(s"INSERT INTO $cat.main.ext VALUES (42)")
    assert(spark.sql(s"SELECT * FROM $cat.main.ext").head().getLong(0) == 42L)
    assert(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(elsewhere, "_graft_log")))

    // convention metastore: the filesystem IS the registry, so a foreign
    // location could never be rediscovered — register must refuse it
    val conv = new ConventionMetastore(root)
    assertThrows[IllegalArgumentException](
      conv.registerTable("main", "ext", elsewhere))
  }

  test("convention backend through the same seam stays byte-compatible") {
    val root = Files.createTempDirectory("graft_ms_conv").toString
    val conv: Metastore = new ConventionMetastore(root)
    assert(conv.listSchemas().isEmpty)
    conv.createSchema("s1")
    assert(conv.schemaExists("s1") && conv.listSchemas() == Seq("s1"))
    // a bare directory without a _graft_log is NOT a table
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root, "s1", "junk"))
    assert(conv.listTables("s1").isEmpty)
    assert(conv.tableLocation("s1", "junk").isEmpty)
  }
}
