package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal lookup) join, merge-style.
  *
  * For each left row: the latest right row with the same key and
  * `rightTime` STRICTLY before `leftTime` (ties among rights broken by
  * the `ord` column, largest wins). The classic naive plan — theta join
  * on (key, time <) then arg-max — explodes to O(left x matching
  * rights) before aggregating; this implementation instead interleaves
  * both sides in ONE shuffle by key, sorts by (time, side, ord), and
  * takes a running `last(payload)` over the preceding rows — linear in
  * the partition after the sort, the same shape a sort-merge as-of join
  * executes in purpose-built engines. Left rows sort before right rows
  * at equal times, so strictness falls out of the window frame.
  */
object AsOfJoin {

  /** @param payload right-side value(s) to attach (e.g. a struct column)
    * @param ord     right-side tie-break within equal times (max wins)
    * @return left rows + `asof` column (null when no prior right row)
    */
  def latestBefore(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, payload: Column, ord: Column): DataFrame = {
    val leftCols = left.columns
    // typed nulls for the columns each side lacks (schemas must align
    // for unionByName); the payload travels inside a struct wrapper so
    // a legitimately-NULL payload value is still distinguishable from
    // the left-row sentinel (__p itself null)
    val wrapped = struct(payload.as("v"))
    val payloadType = right.select(wrapped).schema.head.dataType
    val rowType = left.select(struct(leftCols.map(col): _*)).schema.head.dataType
    val l = left.select(
      col(key).as("__k"), col(leftTime).as("__t"), lit(0).as("__side"),
      lit(null).cast("long").as("__ord"),
      lit(null).cast(payloadType).as("__p"),
      struct(leftCols.map(col): _*).as("__row"))
    // equi-join semantics: null keys never match; null times are never
    // "before" anything — both would otherwise sort NULLS FIRST into
    // every window
    val r = right
      .filter(col(key).isNotNull && col(rightTime).isNotNull)
      .select(
        col(key).as("__k"), col(rightTime).as("__t"), lit(1).as("__side"),
        ord.cast("long").as("__ord"),
        wrapped.as("__p"),
        lit(null).cast(rowType).as("__row"))
    val w = Window.partitionBy("__k")
      .orderBy(col("__t"), col("__side"), col("__ord"))
      .rowsBetween(Window.unboundedPreceding, -1)
    l.unionByName(r)
      .withColumn("__asof", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
      .select(col("__row.*"), col("__asof.v").as("asof"))
  }
}
