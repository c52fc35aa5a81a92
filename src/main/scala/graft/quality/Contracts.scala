package graft.quality

import org.apache.spark.sql.types.{DataType, StructType}

/** Model contracts (SURVEY §1.2 layer 3; reference:
  * ColumnInfo/ModelLevelConstraint core/dbt/artifacts/resources/v1/
  * components.py:73-108, v1/model.py:55-62): a declared column set +
  * data_types asserted against the built frame's schema BEFORE anything is
  * written — the Spark translation of §get_assert_columns_equivalent's
  * empty-schema probe (`select ... limit 0`): `df.schema` is exactly that
  * probe, analysis without execution.
  *
  * Constraints (not_null / unique / primary_key) cannot be enforced by a
  * parquet store, so the project loader expands them into schema-declared
  * generic tests — the post-write validation the survey prescribes.
  */
object Contracts {

  final case class Mismatch(
      column: String,
      definitionType: Option[String],
      contractType: Option[String],
      reason: String)

  /** Compare the model's inferred schema against the declared contract;
    * any name / type / column-count difference is a mismatch (reference:
    * §assert_columns_equivalent). Types compare canonically via Spark's
    * DDL parser, so `bigint` == `BIGINT` == `long`. */
  def check(actual: StructType, declared: Seq[(String, String)]): Seq[Mismatch] = {
    val actualMap = actual.fields.map(f => f.name -> f.dataType).toMap
    val declaredMap = declared.toMap
    val missing = declared.collect {
      case (c, t) if !actualMap.contains(c) =>
        Mismatch(c, None, Some(t), "missing in definition")
    }
    val unexpected = actual.fields.collect {
      case f if !declaredMap.contains(f.name) =>
        Mismatch(f.name, Some(f.dataType.simpleString), None, "missing in contract")
    }
    val wrongType = declared.flatMap { case (c, t) =>
      actualMap.get(c).flatMap { at =>
        val dt = DataType.fromDDL(t)
        if (at.simpleString == dt.simpleString) None
        else Some(Mismatch(c, Some(at.simpleString), Some(dt.simpleString),
          "data type mismatch"))
      }
    }
    missing ++ unexpected.toSeq ++ wrongType
  }

  /** Throw the reference's column-mismatch error shape on any difference
    * (the table format dbt prints from get_assert_columns_equivalent). */
  def assertEquivalent(what: String, actual: StructType,
                       declared: Seq[(String, String)]): Unit = {
    val ms = check(actual, declared)
    if (ms.nonEmpty) throw new IllegalStateException(
      s"$what has an enforced contract that failed.\n" +
        "Please ensure the name, data_type, and number of columns in your " +
        "contract match the columns in your model's definition.\n\n" +
        "| column_name | definition_type | contract_type | mismatch_reason |\n" +
        ms.map(m => s"| ${m.column} | ${m.definitionType.getOrElse("")} | " +
          s"${m.contractType.getOrElse("")} | ${m.reason} |").mkString("\n"))
  }
}
