package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Relation
import graft.materializations.Materializations
import graft.relations._

/** ADVICE r7 medium items: (1) a `file:`-scheme warehouse root must land
  * its writes under the REAL local path, not a literal `./file:` tree
  * (the split-brain at WarehouseIO.localPath); (2) the direct (no-rename)
  * output committer must only replace FileOutputCommitter on schemes
  * WITHOUT atomic rename — on hdfs:// the stock committer is the safe
  * choice under speculative execution (SPARK-10063). */
class FileSchemeSpec extends AnyFunSuite with org.scalatest.BeforeAndAfterAll {
  private lazy val spark = SparkTestSession.spark

  /** Tripwire (r8 verdict hygiene item): any code path that naively
    * `Paths.get`s a `file:`-scheme URI writes a literal `./file:` tree into
    * the project CWD. The per-test assertion above guards the known paths;
    * this suite-end sweep catches a regression from ANY suite that ran
    * before this one in the same JVM. */
  override def afterAll(): Unit = {
    val stray = java.nio.file.Files.list(Paths.get(".")).iterator()
    val hits = scala.collection.mutable.ArrayBuffer[String]()
    while (stray.hasNext) {
      val p = stray.next()
      if (p.getFileName.toString.startsWith("file:")) hits += p.toString
    }
    assert(hits.isEmpty, s"literal file:* debris left in project CWD: ${hits.mkString(", ")}")
  }

  test("localPath normalizes every file:-URI spelling; plain paths pass through") {
    assert(WarehouseIO.localPath("file:///tmp/wh").toString == "/tmp/wh")
    assert(WarehouseIO.localPath("file:/tmp/wh").toString == "/tmp/wh")
    assert(WarehouseIO.localPath("/tmp/wh").toString == "/tmp/wh")
    assert(WarehouseIO.localPath("rel/dir").toString == "rel/dir")
    // the failure mode being guarded: naive Paths.get keeps the scheme
    assert(Paths.get("file:///tmp/wh").toString.startsWith("file:"))
  }

  test("file:// warehouse root round-trips: writes land under the real path, no ./file: tree") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_filescheme")
    val root = "file://" + dir.toString
    val strayBefore = Files.exists(Paths.get("file:"))
    val rm = new RelationManager(spark, root)
    val rel = Relation("graft", "main", "t")

    rm.writeTable(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), rel, statsCols = Seq("id"))
    assert(rm.read(rel).count() == 2)
    // data + log physically under the real local dir
    assert(Files.isDirectory(dir.resolve("main").resolve("t")))
    assert(Files.isDirectory(dir.resolve("main").resolve("t").resolve("_graft_log")))
    // incremental path (merge planning scan + staged publish) too
    Materializations.mergeInto(rm, rel, Seq((2L, "b2"), (3L, "c")).toDF("id", "v"),
      Seq("id"), updateColumns = Nil)
    assert(rm.read(rel).count() == 3)
    // and nothing leaked into a literal ./file: tree in the cwd
    assert(Files.exists(Paths.get("file:")) == strayBefore,
      "writes split-brained into a literal ./file: directory")
    WarehouseIO.deleteDir(root)
    assert(!Files.exists(dir.resolve("main")))
  }

  test("direct committer only on non-atomic-rename schemes") {
    // object-store-style scheme: rename is a copy, direct committer applies
    assert(WarehouseIO.writeOptions("s3a://bucket/wh/main/t").nonEmpty)
    assert(WarehouseIO.writeOptions("s3mock:///tmp/wh/t").nonEmpty)
    // hdfs/viewfs: atomic rename — keep FileOutputCommitter
    assert(WarehouseIO.writeOptions("hdfs://nn:8020/wh/t").isEmpty)
    assert(WarehouseIO.writeOptions("viewfs://cluster/wh/t").isEmpty)
    // local paths and file: URIs: keep FileOutputCommitter
    assert(WarehouseIO.writeOptions("/tmp/wh/t").isEmpty)
    assert(WarehouseIO.writeOptions("file:///tmp/wh/t").isEmpty)
  }
}
