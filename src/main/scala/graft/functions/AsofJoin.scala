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
    * @param payload   columns of `right` to carry (null when no match);
    *                  names must not collide with `left`'s columns
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(payload.nonEmpty, "asof: payload must name at least one right column")
    val collisions = payload.filter(leftCols.contains)
    require(collisions.isEmpty,
      s"asof: payload column(s) ${collisions.mkString(", ")} already exist in the left " +
        "relation and would be silently overwritten — rename one side first")
    // Carry the whole payload as ONE struct that is non-null for every
    // right row: last(ignoreNulls) then keys on "was there a right row",
    // not on each field's value, so a newer right row whose payload
    // value is legitimately NULL still wins over a stale older one.
    val pStructType = org.apache.spark.sql.types.StructType(payload.map(p => right.schema(p)))
    val l = left.withColumn("__t", col(leftTime)).withColumn("__side", lit(1))
      .withColumn("__p", lit(null).cast(pStructType))
    // SQL equi-key semantics: a NULL key matches NOTHING (DuckDB's
    // `ASOF ... ON l.k = r.k AND ...` — the oracle form). The window
    // below would instead put all null-key rows in ONE partition and
    // leak a null-key right row into null-key left rows. Dropping
    // null-key RIGHT rows restores the contract: they can match no
    // left row, and null-key left rows then ride a partition with no
    // right row ever preceding them → null payload, exactly the
    // unmatched-left outcome. (r13 null-user axis catch.)
    val r = right.where(col(key).isNotNull).select(
      col(key), col(rightTime).as("__t"), lit(0).as("__side"),
      struct(payload.map(col): _*).as("__p"))
    val rAligned = leftCols.filterNot(c => c == key).foldLeft(r)((df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val projection = (leftCols ++ Seq("__t", "__side", "__p")).map(col)
    val unioned = l.select(projection: _*).unionByName(rAligned.select(projection: _*))
    val w = Window.partitionBy(key)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("__p", last(col("__p"), ignoreNulls = true).over(w))
    val withPayload = payload.foldLeft(carried)((df, p) =>
      df.withColumn(p, col("__p").getField(p)))
    withPayload.where(col("__side") === 1).drop("__t", "__side", "__p")
  }
}
