package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the single latest right row with
  * `rightTs <= leftTs` (optionally within a tolerance window), per key.
  * The operator warehouses/kdb/pandas call ASOF JOIN and Spark lacks.
  *
  * Implementation is the UNION + ordered-window form (builder preference
  * (a): compose existing ops): tag both sides, sort each key's timeline
  * once, and let `last(_, ignoreNulls)` carry the most recent right ROW
  * forward onto left rows. The whole right row travels as ONE struct so a
  * NULL payload value inside the matched row can never desynchronize from
  * its matched_ts (an older row's payload must not leak forward).
  *
  * One shuffle on the key, linear in |L|+|R| — no range-condition join,
  * which Catalyst would execute as a broadcast-nested-loop/cartesian
  * blowup at scale.
  */
object AsOfJoin {

  /** @param rightPayload right columns to carry (renamed as given)
    * @param toleranceSeconds match only if leftTs - rightTs <= tolerance */
  def asof(
      left: DataFrame, right: DataFrame,
      key: String, leftTs: String, rightTs: String,
      rightPayload: Map[String, String],
      toleranceSeconds: Option[Long] = None): DataFrame = {

    val leftCols = left.columns.toSeq
    val payloadOut = rightPayload.values.toSeq

    // the carried right row: matched_ts + renamed payload, as one struct
    val rStructCol = struct(
      (col(rightTs).as("matched_ts") +:
        rightPayload.toSeq.map { case (from, to) => col(from).as(to) }): _*)
    val rStructType = right.select(rStructCol.as("__r")).schema("__r").dataType

    val taggedLeft = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__r", lit(null).cast(rStructType))
      .select((Seq(col(key), col("__ts"), col("__side"), col("__r")) ++
        leftCols.filterNot(c => c == key || c == leftTs).map(col)): _*)

    val taggedRight = leftCols.filterNot(c => c == key || c == leftTs)
      .foldLeft(right.select(
        col(key), col(rightTs).as("__ts"), lit(0).as("__side"), rStructCol.as("__r"))) {
        case (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }
      .select(taggedLeft.columns.map(col): _*)

    // __side orders right rows BEFORE a left row at the identical timestamp
    // (a right event at exactly leftTs matches)
    val w = Window.partitionBy(col(key)).orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = taggedLeft.unionByName(taggedRight)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val matchOk = toleranceSeconds match {
      case Some(tol) => col("__match").isNotNull &&
        unix_timestamp(col("__ts")) - unix_timestamp(col("__match.matched_ts")) <= tol
      case None => col("__match").isNotNull
    }
    filled
      .withColumn("__ok", matchOk)
      .select((leftCols.filterNot(_ == leftTs).map(col) :+ col("__ts").as(leftTs)) ++
        payloadOut.map(c => when(col("__ok"), col(s"__match.$c")).as(c)) :+
        when(col("__ok"), col("__match.matched_ts")).as("matched_ts"): _*)
      .select((leftCols ++ payloadOut :+ "matched_ts").map(col): _*)
  }
}
