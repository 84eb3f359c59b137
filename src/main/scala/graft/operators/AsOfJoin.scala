package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: attach to every left row the single right row with the
  * greatest `rightTime <= leftTime` for the same key — "which fee schedule
  * was effective when this claim happened". Spark has no built-in; the
  * naive rewrite (left join on key + time range, then window max) shuffles
  * the JOIN OUTPUT, which explodes when a key has many right versions.
  *
  * This formulation unions the two inputs and runs ONE window pass:
  * sort each key's timeline, carry the last-seen right-side values forward
  * (`last(_, ignoreNulls = true)` over rows unbounded-preceding..current),
  * keep left rows. One shuffle on the key, no join blowup, linear in
  * |left| + |right| — the classic scalable as-of.
  */
object AsOfJoin {

  /** @param rightVals right-side value columns to carry onto left rows
    *                  (null when no right row is effective yet). */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTime: String, rightTime: String,
           rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // Tag sides; right rows sort BEFORE left rows at the same instant so
    // a right row effective exactly at leftTime matches (inclusive <=).
    val l = rightVals.foldLeft(
        left.withColumn("_t", col(leftTime)).withColumn("_side", lit(1)))(
        (df, c) => df.withColumn(s"_rv_$c", lit(null).cast(right.schema(c).dataType)))
    val r = leftCols.filterNot(keys.contains).foldLeft(
        right.withColumn("_t", col(rightTime)).withColumn("_side", lit(0)))(
        (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
      .withColumns(rightVals.map(c => s"_rv_$c" -> col(c)).toMap)
    val unioned = l.select((keys ++ leftCols.filterNot(keys.contains))
        .map(col) ++ Seq(col("_t"), col("_side")) ++ rightVals.map(c => col(s"_rv_$c")): _*)
      .unionByName(
        r.select((keys ++ leftCols.filterNot(keys.contains))
          .map(col) ++ Seq(col("_t"), col("_side")) ++ rightVals.map(c => col(s"_rv_$c")): _*))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightVals.foldLeft(unioned)((df, c) =>
      df.withColumn(c, last(col(s"_rv_$c"), ignoreNulls = true).over(w)))
    carried.filter(col("_side") === 1)
      .select((leftCols ++ rightVals).map(col): _*)
  }
}
