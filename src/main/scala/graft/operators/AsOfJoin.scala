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
    requireDisjoint(leftCols, keys, rightVals)
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

  /** A right value column sharing its name with a left non-key column
    * would be nulled out by the union's column alignment BEFORE the
    * `_rv_*` park — a silent all-null carry. Fail loudly instead. */
  private def requireDisjoint(leftCols: Seq[String], keys: Seq[String],
                              rightVals: Seq[String]): Unit = {
    val clash = rightVals.toSet.intersect(
      leftCols.filterNot(keys.contains).toSet)
    require(clash.isEmpty,
      s"as-of join: right value column(s) ${clash.mkString(", ")} collide " +
        "with left non-key columns - rename the right side before joining")
  }

  /** Shared union builder: left and right stacked on one timeline per
    * key, right-side values parked in `_rv_*` columns. `rightFirst`
    * controls the same-instant tie: right rows sort BEFORE left rows
    * when true (inclusive backward `<=`), AFTER when false (inclusive
    * forward `>=`). */
  private def stack(left: DataFrame, right: DataFrame, keys: Seq[String],
                    leftTime: String, rightTime: String,
                    rightVals: Seq[String],
                    rightFirst: Boolean): (DataFrame, Seq[String]) = {
    val leftCols = left.columns.toSeq
    requireDisjoint(leftCols, keys, rightVals)
    val (lSide, rSide) = if (rightFirst) (1, 0) else (0, 1)
    val l = rightVals.foldLeft(
        left.withColumn("_t", col(leftTime)).withColumn("_side", lit(lSide))
          .withColumn("_isleft", lit(true)))(
        (df, c) => df.withColumn(s"_rv_$c",
          lit(null).cast(right.schema(c).dataType)))
    val r = leftCols.filterNot(keys.contains).foldLeft(
        right.withColumn("_t", col(rightTime)).withColumn("_side", lit(rSide))
          .withColumn("_isleft", lit(false)))(
        (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
      .withColumns(rightVals.map(c => s"_rv_$c" -> col(c)).toMap)
    val cols = (keys ++ leftCols.filterNot(keys.contains)).map(col) ++
      Seq(col("_t"), col("_side"), col("_isleft")) ++
      rightVals.map(c => col(s"_rv_$c"))
    (l.select(cols: _*).unionByName(r.select(cols: _*)), leftCols)
  }

  /** Forward as-of: the single right row with the SMALLEST
    * `rightTime >= leftTime` per key — "the next schedule that will
    * take effect". Same one-shuffle union + window shape as [[asOf]],
    * mirrored: right rows sort after left rows at the same instant (so
    * an exactly-coincident right row matches, inclusive `>=`) and the
    * carry runs over current-row..unbounded-following. */
  def asOfForward(left: DataFrame, right: DataFrame, keys: Seq[String],
                  leftTime: String, rightTime: String,
                  rightVals: Seq[String]): DataFrame = {
    val (unioned, leftCols) =
      stack(left, right, keys, leftTime, rightTime, rightVals,
        rightFirst = false)
    // "First non-null from here forward" is computed as "last non-null
    // up to here" over the REVERSED ordering: Spark executes a
    // current-row..unbounded-following frame by re-scanning to the
    // partition end for EVERY row (UnboundedFollowingWindowFunctionFrame,
    // O(n²) per partition — the r16 sf1 sweep measured the cliff), while
    // the unbounded-preceding..current-row frame is incremental O(n).
    // The reversed (desc, desc) sort replays the exact tie order, so the
    // result is bit-identical; the partitioning (and its exchange) is
    // shared with any sibling window — only the sort differs.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t").desc, col("_side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightVals.foldLeft(unioned)((df, c) =>
      df.withColumn(c, last(col(s"_rv_$c"), ignoreNulls = true).over(w)))
    carried.filter(col("_isleft"))
      .select((leftCols ++ rightVals).map(col): _*)
  }

  /** Nearest as-of: whichever of the backward / forward matches is
    * closer in time, ties to the EARLIER (backward) row — the sensor /
    * telemetry alignment join. One union pass, ONE shuffle and sort:
    * both carries share the same partitioning and ordering (right rows
    * first at equal instants, so a coincident right row wins backward
    * at distance 0), differing only in frame. The time column must be
    * date, timestamp, or numeric (distance needs arithmetic).
    *
    * Output: left columns, then for each right value `c` and `c_dir`
    * ("backward"/"forward"/null = no match on either side). */
  def asOfNearest(left: DataFrame, right: DataFrame, keys: Seq[String],
                  leftTime: String, rightTime: String,
                  rightVals: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types.{DateType, TimestampNTZType, TimestampType}
    val (unioned, leftCols) =
      stack(left, right, keys, leftTime, rightTime, rightVals,
        rightFirst = true)
    // `_t` may be widened by the union (e.g. a DATE right side against a
    // TIMESTAMP_NTZ left side), so map whatever the UNION carries, not
    // the left column's original type. Session TZ is pinned UTC, so the
    // NTZ wall-clock reads as the same instant.
    def asNum(c: Column): Column = unioned.schema("_t").dataType match {
      case DateType => unix_date(c)
      case TimestampType | TimestampNTZType =>
        unix_micros(c.cast(TimestampType))
      case _ => c.cast("long")
    }
    val ord = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t"), col("_side"))
    val wB = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Forward carry via the reversed ordering (see asOfForward): a
    // current-row..unbounded-following frame is O(n²) per partition in
    // Spark's window exec — at sf1 the 5-bucket fixture turned this
    // query from seconds into tens of minutes. "Last non-null up to
    // current" over (desc, desc) is the same value, incrementally.
    val wF = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t").desc, col("_side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Carry ONE struct(t, vals) per right row through each direction's
    // ignoreNulls window, so the timestamp that decides the tie and the
    // values reported always come from the SAME right row — independent
    // per-column carries would pull a value from an OLDER row whenever
    // the nearest right row holds a NULL in that column (arg_max
    // semantics, not last-non-null-per-column).
    val rrow = when(!col("_isleft"), struct(
      col("_t").as("t") +: rightVals.map(c => col(s"_rv_$c").as(c)): _*))
    val withRows = unioned
      .withColumn("_brow", last(rrow, ignoreNulls = true).over(wB))
      .withColumn("_frow", last(rrow, ignoreNulls = true).over(wF))
    val carried = rightVals.foldLeft(
        withRows.withColumn("_bt", col("_brow.t"))
          .withColumn("_ft", col("_frow.t")))((df, c) =>
      df.withColumn(s"_bv_$c", col(s"_brow.$c"))
        .withColumn(s"_fv_$c", col(s"_frow.$c")))
    val useBwd = col("_ft").isNull ||
      (col("_bt").isNotNull &&
        asNum(col("_t")) - asNum(col("_bt")) <=
          asNum(col("_ft")) - asNum(col("_t")))
    val out = rightVals.foldLeft(carried)((df, c) =>
      df.withColumn(c, when(useBwd, col(s"_bv_$c")).otherwise(col(s"_fv_$c")))
        .withColumn(s"${c}_dir",
          when(col("_bt").isNull && col("_ft").isNull, lit(null).cast("string"))
            .when(useBwd, lit("backward")).otherwise(lit("forward"))))
    out.filter(col("_isleft"))
      .select((leftCols ++ rightVals.flatMap(c =>
        Seq(c, s"${c}_dir"))).map(col): _*)
  }
}
