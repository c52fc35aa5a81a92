package graft.semantic

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Semantic-layer metric compiler (SURVEY §2.7). The reference only
  * *declares* semantic models and metrics (core/dbt/artifacts/resources/
  * v1/semantic_model.py:111-201, v1/metric.py:14-111) and delegates query
  * generation to the external MetricFlow service; here Spark is both
  * planner and executor, so metrics compile directly to DataFrame plans:
  * simple → groupBy/agg, cumulative → running window, ratio/derived →
  * column algebra over sibling measures, conversion → windowed semi-join.
  */
object Metrics {

  /** Measure aggregations (reference: AggregationType — sum, min, max,
    * count_distinct, sum_boolean, average, percentile, median, count). */
  sealed trait Agg { def apply(c: Column): Column }
  case object Sum extends Agg { def apply(c: Column) = sum(c.cast(DecimalType(18, 4))).cast(DoubleType) }
  case object Min extends Agg { def apply(c: Column) = min(c) }
  case object Max extends Agg { def apply(c: Column) = max(c) }
  case object Count extends Agg { def apply(c: Column) = count(c) }
  case object CountDistinct extends Agg { def apply(c: Column) = count_distinct(c) }
  case object SumBoolean extends Agg { def apply(c: Column) = sum(c.cast(IntegerType)).cast(LongType) }
  case object Average extends Agg {
    def apply(c: Column) = sum(c.cast(DecimalType(18, 4))).cast(DoubleType) / count(c)
  }
  case object Median extends Agg { def apply(c: Column) = median(c) }
  final case class Percentile(p: Double) extends Agg {
    def apply(c: Column) = percentile_approx(c, lit(p), lit(10000))
  }

  final case class Measure(name: String, expr: Column, agg: Agg)

  /** A semantic model: a base frame with declared time/categorical
    * dimensions and measures. */
  final case class SemanticModel(
      base: DataFrame,
      timeDimension: Option[(String, Column)],
      dimensions: Map[String, Column],
      measures: Seq[Measure])

  sealed trait Metric { def name: String }
  final case class Simple(name: String, measure: String) extends Metric
  final case class Ratio(name: String, numerator: String, denominator: String) extends Metric
  final case class Derived(name: String, inputs: Seq[String], f: Seq[Column] => Column) extends Metric

  /** Declarable derived metric (reference: v1/metric.py:14-20
    * DerivedTypeParams — the reference's expr is a MetricFlow expression
    * over input metrics; here the minimal arithmetic form is a Spark SQL
    * expression whose identifiers resolve to sibling MEASURE aggregates,
    * e.g. `revenue / n_pay + 1`). Identifiers that name a measure rewrite
    * to its aggregate column; everything else (literals, operators,
    * functions like round/abs) passes through to Spark SQL untouched. */
  def derived(name: String, expression: String, measureNames: Set[String]): Derived = {
    val Ident = "[A-Za-z_][A-Za-z0-9_]*".r
    val inputs = Ident.findAllIn(expression).toSeq.distinct.filter(measureNames.contains)
    require(inputs.nonEmpty,
      s"derived metric $name: no measure referenced in '$expression'")
    val rewritten = Ident.replaceAllIn(expression, m =>
      if (measureNames.contains(m.matched)) s"`__m_${m.matched}`" else m.matched)
    Derived(name, inputs, _ => expr(rewritten))
  }
  /** Running total of a measure over the time dimension (optionally a
    * trailing window of n periods). */
  final case class Cumulative(name: String, measure: String, trailing: Option[Int] = None) extends Metric

  /** Compile metrics at a grain: group by the requested dimensions
    * (+ time dimension), aggregate every needed measure once, then derive
    * metric columns. One shuffle for the whole metric set. */
  def query(model: SemanticModel, metrics: Seq[Metric], grain: Seq[String]): DataFrame = {
    val dims: Seq[(String, Column)] =
      model.timeDimension.toSeq.map { case (n, c) => n -> c } ++
        grain.map(g => g -> model.dimensions(g))
    val needed: Set[String] = metrics.flatMap {
      case Simple(_, m)      => Seq(m)
      case Ratio(_, n, d)    => Seq(n, d)
      case Derived(_, in, _) => in
      case Cumulative(_, m, _) => Seq(m)
    }.toSet
    val aggs = model.measures.filter(m => needed(m.name))
      .map(m => m.agg(m.expr).as(s"__m_${m.name}"))
    require(aggs.nonEmpty, "no measures needed")
    val grouped = model.base
      .groupBy(dims.map { case (n, c) => c.as(n) }: _*)
      .agg(aggs.head, aggs.tail: _*)

    val withMetrics = metrics.foldLeft(grouped) { (df, metric) =>
      metric match {
        case Simple(n, m) => df.withColumn(n, col(s"__m_$m"))
        case Ratio(n, num, den) =>
          df.withColumn(n, col(s"__m_$num").cast(DoubleType) / col(s"__m_$den"))
        case Derived(n, in, f) => df.withColumn(n, f(in.map(i => col(s"__m_$i"))))
        case Cumulative(n, m, trailing) =>
          val timeName = model.timeDimension.map(_._1).getOrElse(
            throw new IllegalArgumentException("cumulative metric needs a time dimension"))
          val w0 = Window.partitionBy(grain.map(col): _*).orderBy(col(timeName))
          val w = trailing match {
            case Some(k) => w0.rowsBetween(-(k - 1L), Window.currentRow)
            case None    => w0.rowsBetween(Window.unboundedPreceding, Window.currentRow)
          }
          df.withColumn(n, sum(col(s"__m_$m").cast(DecimalType(18, 4))).over(w).cast(DoubleType))
      }
    }
    withMetrics.drop(withMetrics.columns.filter(_.startsWith("__m_")): _*)
  }

  /** Conversion metric (reference: metric.py ConversionTypeParams): share
    * of base-event entities that produce a conversion event within
    * `windowDays` after the base event. Range-joined per entity — the
    * as-of-style join compiles to one shuffle on the entity key. */
  def conversion(base: DataFrame, conv: DataFrame, entity: String,
                 baseTime: String, convTime: String, windowDays: Int): DataFrame = {
    val b = base.select(col(entity).as("e"), col(baseTime).as("bt"))
    val c = conv.select(col(entity).as("e"), col(convTime).as("ct"))
    val joined = b.join(c, Seq("e"), "left_outer")
      .withColumn("converted",
        col("ct").isNotNull && col("ct") >= col("bt") &&
          col("ct") <= col("bt") + expr(s"interval $windowDays days"))
    joined.groupBy(col("e"))
      .agg(max(col("converted").cast(IntegerType)).as("any_conversion"))
      .agg(
        count(lit(1)).as("n_entities"),
        sum(col("any_conversion")).cast(LongType).as("n_converted"),
        (sum(col("any_conversion")) / count(lit(1))).cast(DoubleType).as("conversion_rate"))
  }
}
