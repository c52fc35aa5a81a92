package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.compile.TemplateResolver

class DagSpec extends AnyFunSuite {
  test("toposort orders parents first and is deterministic") {
    val parents = Map("c" -> Seq("a", "b"), "b" -> Seq("a"), "a" -> Seq.empty[String], "d" -> Seq("c"))
    val order = Dag.topoSort(parents)
    assert(order.indexOf("a") < order.indexOf("b"))
    assert(order.indexOf("b") < order.indexOf("c"))
    assert(order.indexOf("c") < order.indexOf("d"))
    assert(order == Dag.topoSort(parents))
  }

  test("cycle detection throws") {
    val parents = Map("a" -> Seq("b"), "b" -> Seq("a"))
    assertThrows[IllegalStateException](Dag.topoSort(parents))
  }

  test("ancestors/descendants with depth bounds") {
    val parents = Map("d" -> Seq("c"), "c" -> Seq("b"), "b" -> Seq("a"), "a" -> Seq.empty[String])
    assert(Dag.ancestors(parents, "d") == Set("a", "b", "c"))
    assert(Dag.ancestors(parents, "d", 1) == Set("c"))
    assert(Dag.ancestors(parents, "d", 2) == Set("b", "c"))
  }
}

class SelectorSpec extends AnyFunSuite {
  private def model(name: String, deps: Seq[String] = Nil, tags: Set[String] = Set.empty) =
    Node(NodeType.Model, "pkg", name, config = NodeConfig(tags = tags),
      dependsOn = deps.map(d => s"model.pkg.$d"), fqn = Seq("pkg", name))

  private val m = Manifest(Seq(
    model("a"), model("b", Seq("a"), tags = Set("gold")),
    model("c", Seq("b")), model("stg_x"), model("stg_y", Seq("stg_x"))))

  test("bare name selects one node") {
    assert(Selector.select(m, Seq("b")) == Set("model.pkg.b"))
  }
  test("graph operators expand") {
    assert(Selector.select(m, Seq("+b")) == Set("model.pkg.a", "model.pkg.b"))
    assert(Selector.select(m, Seq("b+")) == Set("model.pkg.b", "model.pkg.c"))
    assert(Selector.select(m, Seq("1+c")) == Set("model.pkg.b", "model.pkg.c"))
    assert(Selector.select(m, Seq("@a")) == Set("model.pkg.a", "model.pkg.b", "model.pkg.c"))
  }
  test("methods and globs") {
    assert(Selector.select(m, Seq("tag:gold")) == Set("model.pkg.b"))
    assert(Selector.select(m, Seq("stg_*")) == Set("model.pkg.stg_x", "model.pkg.stg_y"))
    assert(Selector.select(m, Seq("resource_type:model")).size == 5)
  }
  test("union, intersection, exclusion") {
    assert(Selector.select(m, Seq("a b")) == Set("model.pkg.a", "model.pkg.b"))
    assert(Selector.select(m, Seq("+c,tag:gold")) == Set("model.pkg.b"))
    assert(Selector.select(m, Seq("stg_*"), exclude = Seq("stg_y")) == Set("model.pkg.stg_x"))
  }
  test("state:modified vs previous manifest") {
    val prev = Manifest(m.nodes.map { case (id, n) =>
      id -> (if (n.name == "b") n.copy(checksum = "changed") else n)
    })
    assert(Selector.select(m, Seq("state:modified"), previousState = Some(prev)) == Set("model.pkg.b"))
  }
  test("property: expansion is monotone — bare selection subset of +sel+") {
    for (n <- Seq("a", "b", "c", "stg_x", "stg_y")) {
      val base = Selector.select(m, Seq(n))
      val plus = Selector.select(m, Seq(s"+$n+"))
      assert(base.subsetOf(plus), n)
    }
  }
}

class TemplateResolverSpec extends AnyFunSuite {
  private val ctx = TemplateResolver.Context(
    resolveRef = n => s"main__$n",
    resolveSource = (s, t) => s"${s}_$t",
    thisRelation = "main__me",
    vars = Map("cutoff" -> "'1995-01-01'"),
    env = Map("REGION" -> "emea"))

  test("ref/source/this/var/env_var render") {
    val sql = """select * from {{ ref('orders_stg') }}
                | join {{ source('tpch', 'nation') }} using (k)
                | where d > {{ var('cutoff') }} and r = '{{ env_var('REGION') }}'
                | and x not in (select x from {{ this }})""".stripMargin
    val out = TemplateResolver.render(sql, ctx)
    assert(out.contains("from main__orders_stg"))
    assert(out.contains("join tpch_nation"))
    assert(out.contains("> '1995-01-01'"))
    assert(out.contains("r = 'emea'"))
    assert(out.contains("select x from main__me"))
  }

  test("is_incremental block included only when incremental") {
    val sql = "select 1 {% if is_incremental() %} where id > (select max(id) from {{ this }}) {% endif %}"
    assert(!TemplateResolver.render(sql, ctx).contains("where id"))
    assert(TemplateResolver.render(sql, ctx.copy(isIncremental = true)).contains("where id"))
  }

  test("config extraction + removal") {
    val sql = "{{ config(materialized='incremental', unique_key='id', incremental_strategy='merge') }}\nselect 1"
    val node = TemplateResolver.parseModel("pkg", "m", sql)
    assert(node.config.materialized == "incremental")
    assert(node.config.uniqueKey == Seq("id"))
    assert(node.config.incrementalStrategy.contains("merge"))
    assert(TemplateResolver.render(sql, ctx).trim == "select 1")
  }

  test("multiple config() blocks merge (later wins) and all are stripped") {
    val sql = "{{ config(materialized='incremental', unique_key='id') }}\n" +
      "{{ config(incremental_strategy='merge', unique_key='id2') }}\n" +
      "select 1"
    val node = TemplateResolver.parseModel("pkg", "m", sql)
    assert(node.config.materialized == "incremental")
    assert(node.config.incrementalStrategy.contains("merge"))
    assert(node.config.uniqueKey == Seq("id2")) // later block wins
    assert(TemplateResolver.render(sql, ctx).trim == "select 1")
  }

  test("config with nested parens and quoted ;; hooks parses and strips") {
    val sql = "{{ config(materialized='table', " +
      "pre_hook=\"insert into audit values ('a', (1+2)) ;; delete from t where x in (select y from z)\") }}\n" +
      "{{ config(post_hook='select (1)') }}\nselect 2"
    val cfg = TemplateResolver.extractConfig(sql)
    assert(cfg("materialized") == "table")
    assert(TemplateResolver.render(sql, ctx).trim == "select 2")
    val node = TemplateResolver.parseModel("pkg", "m", sql)
    assert(node.config.preHooks == Seq(
      "insert into audit values ('a', (1+2))",
      "delete from t where x in (select y from z)"))
    assert(node.config.postHooks == Seq("select (1)"))
  }

  test("static ref extraction without rendering") {
    val sql = "select * from {{ ref('a') }} union all select * from {{ ref('b') }} -- {{ ref('a') }}"
    assert(TemplateResolver.extractRefs(sql) == Seq("a", "b"))
  }

  test("undefined var throws") {
    assertThrows[IllegalArgumentException](
      TemplateResolver.render("{{ var('nope') }}", ctx))
  }
}

class MicrobatchSpec extends AnyFunSuite {
  import graft.materializations.Microbatch._
  import java.time.Instant

  private val t0 = Instant.parse("2024-03-15T13:47:11Z")

  test("truncate to each period") {
    assert(truncate(t0, Hour) == Instant.parse("2024-03-15T13:00:00Z"))
    assert(truncate(t0, Day) == Instant.parse("2024-03-15T00:00:00Z"))
    assert(truncate(t0, Month) == Instant.parse("2024-03-01T00:00:00Z"))
    assert(truncate(t0, Year) == Instant.parse("2024-01-01T00:00:00Z"))
  }

  test("lookback from a boundary checkpoint reprocesses full periods (microbatch.py:72-79)") {
    val cp = Instant.parse("2024-03-15T00:00:00Z")
    assert(batchStart(Some(cp), cp, Day, 1) == Instant.parse("2024-03-14T00:00:00Z"))
  }

  test("batches tile [start,end) half-open with capped tail") {
    val batches = buildBatches(
      Instant.parse("2024-03-14T07:00:00Z"), Instant.parse("2024-03-16T12:00:00Z"), Day)
    assert(batches.head._1 == Instant.parse("2024-03-14T00:00:00Z"))
    assert(batches.last._2 == Instant.parse("2024-03-16T12:00:00Z"))
    assert(batches.size == 3)
    batches.sliding(2).foreach {
      case Seq((_, e1), (s2, _)) => assert(e1 == s2)
      case _ =>
    }
  }

  test("property: batches cover the range exactly, no overlap, no gap (200 seeded cases)") {
    val rnd = new scala.util.Random(42)
    val sizes = Seq(Hour, Day, Month, Year)
    for (_ <- 1 to 200) {
      val s = Instant.ofEpochSecond(rnd.between(0L, 4102444800L))
      val len = rnd.between(1L, 400L * 24 * 3600)
      val size = sizes(rnd.nextInt(sizes.length))
      val e = s.plusSeconds(len)
      val batches = buildBatches(s, e, size)
      assert(batches.nonEmpty)
      assert(batches.head._1 == truncate(s, size))
      assert(batches.last._2 == e)
      batches.foreach { case (b0, b1) => assert(b0.isBefore(b1)) }
      batches.sliding(2).foreach {
        case Seq((_, e1), (s2, _)) => assert(e1 == s2)
        case _ =>
      }
    }
  }
}

/** Null-propagation goldens for the function surface — the reference's
  * fixture CSVs include null rows for every macro (FIXTURES.md §A.1). */
class NullPropagationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import graft.functions.{SqlFunctions => FN}
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.types._

  test("date/string/hash functions propagate null inputs as null") {
    import spark.implicits._
    val df = Seq((1, Option.empty[java.sql.Timestamp], Option.empty[String]))
      .toDF("id", "ts", "s")
    val row = df.select(
      FN.dateadd("day", 3, col("ts")).as("a"),
      FN.datediff("day", col("ts"), current_timestamp()).as("b"),
      FN.lastDay("quarter", col("ts")).as("c"),
      FN.lengthOf(col("s")).as("d"),
      FN.splitPart(col("s"), " ", 1).as("e"),
      FN.hashMd5(col("s")).as("f"),
      FN.safeCast(col("s"), IntegerType).as("g")).collect()(0)
    for (i <- 0 until 7) assert(row.isNullAt(i), s"field $i should be null")
    // listagg over an all-null group folds to the empty string
    val agg = df.agg(FN.listagg(col("s"), ",", col("s")).as("g")).collect()(0)
    assert(agg.getString(0) == "")
  }

  test("null-safe equals and surrogate key treat null deterministically") {
    import spark.implicits._
    val df = Seq((Option.empty[String], Option("x"))).toDF("a", "b")
    val r = df.select(
      FN.equalsNullSafe(col("a"), col("a")).as("both_null"),
      FN.equalsNullSafe(col("a"), col("b")).as("one_null"),
      FN.hashRow(Seq(col("a"), col("b"))).as("sk")).collect()(0)
    assert(r.getBoolean(0) && !r.getBoolean(1))
    // null sentinel makes the surrogate key total (never null)
    assert(r.getString(2).nonEmpty)
  }
}

class ResultSelectorSpec extends AnyFunSuite {
  test("result:<status> selects nodes by previous run outcome") {
    def model(name: String) =
      Node(NodeType.Model, "pkg", name, fqn = Seq("pkg", name))
    val m = Manifest(Seq(model("a"), model("b"), model("c")))
    val prevResults = Map(
      "model.pkg.a" -> "success", "model.pkg.b" -> "error", "model.pkg.c" -> "skipped")
    assert(Selector.select(m, Seq("result:error"), previousResults = prevResults) ==
      Set("model.pkg.b"))
    assert(Selector.select(m, Seq("result:error result:skipped"), previousResults = prevResults) ==
      Set("model.pkg.b", "model.pkg.c"))
  }
}
