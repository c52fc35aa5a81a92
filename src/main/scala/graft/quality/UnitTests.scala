package graft.quality

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import graft.core._
import graft.compile.TemplateResolver

/** Unit-test materialization (SURVEY §2.1 'unit'; reference:
  * core/dbt/parser/unit_tests.py, executor core/dbt/task/test.py:205-281,
  * fixture formats core/dbt/artifacts/resources/v1/unit_test_definition.py:26-70):
  * run a model's SQL against fixture inputs substituted for its refs and
  * diff the result against expected rows.
  *
  * Fixture expansion is schema-aware (SURVEY §7.4 risk 5): when the real
  * dependency relation is resolvable, missing fixture columns are
  * null-filled with the dependency's types (the reference's
  * safe_cast(null) behavior); otherwise types are inferred from values.
  */
object UnitTests {

  /** One input fixture: rows given as column→value maps (dict/csv
    * format; values may be Int/Long/Double/String/Boolean/null), OR a
    * SQL SELECT (`sql` set, rows ignored) — the reference's
    * `format: sql` fixture (unit_test_definition.py:26-29), the form
    * that lets a fixture express casts, intervals, and generated rows
    * the CSV grammar can't. */
  final case class Fixture(ref: String, rows: Seq[Map[String, Any]],
                           sql: Option[String] = None)

  final case class UnitTest(
      name: String,
      model: Node,
      given: Seq[Fixture],
      expect: Seq[Map[String, Any]],
      expectSql: Option[String] = None)

  final case class UnitResult(name: String, passed: Boolean,
                              actualOnly: Seq[Row], expectedOnly: Seq[Row]) {
    def status: String = if (passed) "pass" else "fail"
  }

  private def inferType(v: Any): DataType = v match {
    case _: Int | _: Integer   => IntegerType
    case _: Long               => LongType
    case _: Double             => DoubleType
    case _: Boolean            => BooleanType
    case _: java.sql.Timestamp => TimestampType
    case _                     => StringType
  }

  /** Build a DataFrame from dict-format rows, optionally conforming to a
    * known schema (missing columns null-filled, extra columns rejected). */
  def fixtureDf(spark: SparkSession, rows: Seq[Map[String, Any]],
                knownSchema: Option[StructType] = None): DataFrame = {
    val cols: Seq[StructField] = knownSchema match {
      case Some(schema) => schema.fields.toSeq
      case None =>
        val names = rows.flatMap(_.keys).distinct
        names.map { n =>
          val sample = rows.flatMap(_.get(n)).find(_ != null)
          StructField(n, sample.map(inferType).getOrElse(StringType), nullable = true)
        }
    }
    val data = rows.map { r =>
      Row.fromSeq(cols.map { f =>
        r.get(f.name).map {
          case null => null
          case v: Int if f.dataType == LongType    => v.toLong
          case v: Int if f.dataType == DoubleType  => v.toDouble
          case v: Long if f.dataType == DoubleType => v.toDouble
          case v: Long if f.dataType == IntegerType => v.toInt
          case v: Long if f.dataType.isInstanceOf[DecimalType] => BigDecimal(v)
          case v: Double if f.dataType.isInstanceOf[DecimalType] => BigDecimal(v)
          // project-file fixtures arrive as text: the reference safe_casts
          // fixture values to the column's type (unit_tests.py fixtures)
          case v: String if f.dataType != StringType => coerce(v, f.dataType)
          case v => v
        }.orNull
      })
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(data.toList, 1), StructType(cols))
  }

  private def coerce(v: String, dt: DataType): Any = dt match {
    case IntegerType => v.toInt
    case LongType    => v.toLong
    case DoubleType  => v.toDouble
    case FloatType   => v.toFloat
    case BooleanType => v.toBoolean
    case _: DecimalType => BigDecimal(v)
    case DateType    => java.sql.Date.valueOf(v)
    case TimestampType =>
      if (v.matches("\\d{4}-\\d{2}-\\d{2}")) java.sql.Timestamp.valueOf(s"$v 00:00:00")
      else java.sql.Timestamp.valueOf(v.replace("T", " "))
    case _ => v
  }

  /** Parse a fixture CSV block (header + rows, naive commas) into
    * dict-format rows. Values type-sniff to Long/Double/Boolean so
    * schema-less fixtures still aggregate numerically; empty cells and
    * `null` are nulls. Real-schema conformance happens in fixtureDf. */
  def csvRows(csv: String): Seq[Map[String, Any]] = {
    val lines = csv.split("\n").map(_.trim).filter(_.nonEmpty).toSeq
    if (lines.isEmpty) return Nil
    val header = lines.head.split(",").map(_.trim).toSeq
    lines.tail.map { l =>
      val cells = l.split(",", -1).map(_.trim).toSeq
      header.zipAll(cells, "", "").map { case (h, c) =>
        h -> (c match {
          case "" | "null"                      => null
          case v if v.matches("-?\\d+")         => v.toLong
          case v if v.matches("-?\\d+\\.\\d*")  => v.toDouble
          case "true"                           => true
          case "false"                          => false
          case v                                => v
        })
      }.toMap
    }
  }

  /** Execute one unit test: fixtures become temp views substituted for the
    * model's refs; the diff is exceptAll both ways (order-insensitive,
    * multiplicity-sensitive — same contract as the reference's daff diff). */
  def run(spark: SparkSession, test: UnitTest,
          realSchemas: Map[String, StructType] = Map.empty,
          vars: Map[String, String] = Map.empty): UnitResult = {
    val viewPrefix = s"__graft_unit_${test.name.replaceAll("[^A-Za-z0-9_]", "_")}"
    val fixtureViews = test.given.map { f =>
      val df = f.sql match {
        case Some(q) =>
          // SQL-format fixture: run the SELECT, then conform to the real
          // dependency schema when known (same safe_cast(null) fill as
          // the dict path — a fixture may give only the columns it cares
          // about in either format)
          val raw = spark.sql(q)
          realSchemas.get(f.ref).map(conformDf(raw, _)).getOrElse(raw)
        case None => fixtureDf(spark, f.rows, realSchemas.get(f.ref))
      }
      val view = s"${viewPrefix}_${f.ref}"
      df.createOrReplaceTempView(view)
      f.ref -> view
    }.toMap

    val sql = test.model.code match {
      case Some(SqlCode(raw)) =>
        TemplateResolver.render(raw, TemplateResolver.Context(
          resolveRef = name => fixtureViews.getOrElse(name,
            throw new IllegalArgumentException(s"unit test '${test.name}' missing fixture for ref '$name'")),
          resolveSource = (s, t) => fixtureViews.getOrElse(s"${s}.$t",
            throw new IllegalArgumentException(s"unit test '${test.name}' missing fixture for source '$s.$t'")),
          thisRelation = s"${viewPrefix}_this",
          vars = vars))
      case _ => throw new IllegalArgumentException("unit tests require a SQL model")
    }
    val actual = spark.sql(sql)
    val expected = test.expectSql match {
      case Some(q) => conformDf(spark.sql(q), actual.schema)
      case None    => fixtureDf(spark, test.expect, Some(actual.schema))
    }
    val actualOnly = actual.exceptAll(expected).collect().toSeq
    val expectedOnly = expected.exceptAll(actual).collect().toSeq
    UnitResult(test.name, actualOnly.isEmpty && expectedOnly.isEmpty, actualOnly, expectedOnly)
  }

  /** Conform a SQL-fixture frame to a known schema: present columns cast
    * to the target type, missing columns null-filled — the same
    * safe_cast behavior [[fixtureDf]] applies to dict rows. Extra
    * columns are dropped (the dict path ignores them the same way). */
  private def conformDf(df: DataFrame, schema: StructType): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val present = df.columns.toSet
    df.select(schema.fields.toSeq.map { f =>
      if (present(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
  }
}
