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
  * once, and let `last(_, ignoreNulls)` carry the most recent right
  * payload forward onto left rows. One shuffle on the key, linear in
  * |L|+|R| — no range-condition join, which Catalyst would execute as a
  * broadcast-nested-loop/cartesian blowup at scale.
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

    // align schemas: left rows carry null right-payload; right rows carry
    // null left-payload. __side orders right rows BEFORE a left row with
    // the identical timestamp (ties: a right event at exactly leftTs matches).
    val taggedLeft = payloadOut.foldLeft(
      left.withColumn("__ts", col(leftTs)).withColumn("__side", lit(1))
        .withColumn("__matched_ts", lit(null).cast("timestamp"))) {
      case (df, c) => df.withColumn(c, lit(null).cast(
        right.schema(rightPayload.find(_._2 == c).get._1).dataType))
    }
    val taggedRight = leftCols.foldLeft(
      right.select(
        (col(key) +: col(rightTs).as("__ts") +: lit(0).as("__side") +:
          col(rightTs).as("__matched_ts") +:
          rightPayload.toSeq.map { case (from, to) => col(from).as(to) }): _*)) {
      case (df, c) if c == key => df
      case (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select(taggedLeft.columns.map(col): _*)

    val w = Window.partitionBy(col(key)).orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = taggedLeft.unionByName(taggedRight)
      .select(
        (Seq(col(key), col("__ts"), col("__side")) ++
          leftCols.filterNot(c => c == key || c == leftTs).map(col) ++
          (payloadOut :+ "__matched_ts").map(c => last(col(c), ignoreNulls = true).over(w).as(c))): _*)
      .filter(col("__side") === 1)

    val withTolerance = toleranceSeconds match {
      case Some(tol) =>
        val inWindow = col("__matched_ts").isNotNull &&
          unix_timestamp(col("__ts")) - unix_timestamp(col("__matched_ts")) <= tol
        payloadOut.foldLeft(filled) { (df, c) =>
          df.withColumn(c, when(inWindow, col(c))) }
          .withColumn("__matched_ts", when(inWindow, col("__matched_ts")))
      case None => filled
    }
    withTolerance
      .withColumnRenamed("__matched_ts", "matched_ts")
      .drop("__side").withColumnRenamed("__ts", leftTs)
      .select((leftCols ++ payloadOut :+ "matched_ts").map(col): _*)
  }
}
