package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** J3 — as-of join (each left row picks the latest right row with
  * rightTime <= leftTime, per key). The reference's anchored-VWAP
  * cross-product is the embryo of this shape (SURVEY §2.3).
  *
  * Implemented as the scalable union-window form: tag both sides, union,
  * one window over (key, time) carrying the right side's payload forward
  * with last_value(ignoreNulls). ONE shuffle on the key — no range-join
  * explosion, no per-key driver loops; ties at equal timestamps resolve
  * right-before-left so "at or before" includes the simultaneous row.
  */
object AsOfJoin {

  /** @param left      probe side (keeps all rows)
    * @param right     reference side (its `payload` columns are attached)
    * @param keyCol    equality key (e.g. symbol)
    * @param timeCol   event-time column name present on both sides
    * @param payload   right-side columns to carry (renamed as-is onto left)
    */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String, timeCol: String,
           payload: Seq[String]): DataFrame = {
    val leftCols = left.columns
    val l = left
      .withColumn("__side", lit(1))
      .select(leftCols.map(col) ++ Seq(col("__side")) ++
        payload.map(p => lit(null).cast(right.schema(p).dataType).as(s"__p_$p")): _*)
    val r = right
      .withColumn("__side", lit(0))
      .select(leftCols.map(c =>
        if (c == keyCol || c == timeCol) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col("__side")) ++ payload.map(p => col(p).as(s"__p_$p")): _*)
    val w = Window.partitionBy(keyCol).orderBy(col(timeCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = payload.foldLeft(l.unionByName(r)) { (df, p) =>
      df.withColumn(p, last(col(s"__p_$p"), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1)
      .select(leftCols.map(col) ++ payload.map(col): _*)
  }

  /** Convenience: plain range filter join (J3's range form) for small right
    * sides — broadcast + filter; used where the window form's union cost
    * exceeds the broadcast.
    */
  def rangeJoin(left: DataFrame, right: DataFrame, keys: Column, range: Column): DataFrame =
    left.join(broadcast(right), keys && range)
}
