package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (latest right row with rightTime <= leftTime per key) —
  * composed from existing operators, per the compose-first rule for
  * operators Spark lacks: tag both inputs, union, one window pass
  * carrying the last-seen right payload forward in event-time order.
  *
  * Scale: ONE shuffle (hash by key) + one in-partition sort — never the
  * O(left × right-per-key) blowup of the naive range-join formulation,
  * and no per-key driver state. This is how production event pipelines
  * do point-in-time correctness (feature stores, trade/quote matching).
  *
  * Right rows sort before left rows at equal timestamps, so the match
  * is inclusive (rightTime == leftTime matches), same as DuckDB's
  * `ASOF JOIN ... ON l.ts >= r.ts` which oracles it.
  */
object AsofJoin {

  /** @param left      rows to enrich
    * @param right     rows providing the as-of payload
    * @param key       equality key column (both sides)
    * @param leftTime  event-time column in `left`
    * @param rightTime event-time column in `right`
    * @param payload   columns of `right` to carry (null when no match)
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left.withColumn("__t", col(leftTime)).withColumn("__side", lit(1))
    val r = right.select(
      (col(key) +: col(rightTime).as("__t") +: lit(0).as("__side") +:
        payload.map(col)): _*)
    // align schemas: left gets null payload slots, right gets null left cols
    val lAligned = payload.foldLeft(l)((df, p) =>
      df.withColumn(p, lit(null).cast(right.schema(p).dataType)))
    val rAligned = leftCols.filterNot(c => c == key).foldLeft(r)((df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val unioned = lAligned.select((leftCols ++ Seq("__t", "__side") ++ payload).map(col): _*)
      .unionByName(rAligned.select((leftCols ++ Seq("__t", "__side") ++ payload).map(col): _*))
    val w = Window.partitionBy(key)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(unioned)((df, p) =>
      df.withColumn(p, last(col(p), ignoreNulls = true).over(w)))
    carried.where(col("__side") === 1).drop("__t", "__side")
  }
}
