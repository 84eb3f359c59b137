package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan 2005, J. Algorithms 55) in
  * RELATIONAL form: the counter matrix is a (row, pos, cnt) relation of
  * at most depth·width rows, built with one partial-aggregated groupBy —
  * and every hash position is md5-derived (`md5("j:item")`, the
  * engine-portable family used across this repo), so an external SQL
  * engine rebuilds the identical counters and reproduces every ESTIMATE,
  * collisions included. Spark's own `count_min_sketch` function exists
  * but hashes with Murmur, which no oracle can replay — same trade as
  * [[graft.expressions.MdBloom]] vs `util.sketch.BloomFilter`.
  *
  * Properties the relational form keeps: counters merge by UNION ALL +
  * re-aggregation (the sketch is a linear projection of the frequency
  * vector), the estimate min-over-rows only ever OVERestimates, and the
  * whole sketch is depth·width longs regardless of stream size — the
  * reason a 100 TB frequency dashboard costs KBs. */
object CountMinSketch {

  private def pos(j: Int, item: Column, width: Int): Column =
    conv(substring(md5(concat(lit(s"$j:"), item)), 1, 13), 16, 10)
      .cast("long") % width

  /** (row, pos, cnt) counters over a token column. */
  def buildCounters(df: DataFrame, itemCol: String,
                    depth: Int = 4, width: Int = 1024): DataFrame = {
    require(depth >= 1 && width >= 1)
    val rows = array((0 until depth).map(j =>
      struct(lit(j).cast("long").as("row"),
        pos(j, col(itemCol), width).as("pos"))): _*)
    df.select(explode(rows).as("rp"))
      .select(col("rp.row").as("row"), col("rp.pos").as("pos"))
      .groupBy("row", "pos")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for a set of query items: min over rows of the
    * counter at the item's position (missing bucket = 0). */
  def estimates(counters: DataFrame, queries: DataFrame, itemCol: String,
                depth: Int = 4, width: Int = 1024): DataFrame = {
    val probes = queries.select(col(itemCol).as("item"),
      explode(array((0 until depth).map(j =>
        struct(lit(j).cast("long").as("row"),
          pos(j, col(itemCol), width).as("pos"))): _*)).as("rp"))
      .select(col("item"), col("rp.row").as("row"), col("rp.pos").as("pos"))
    probes.join(broadcast(counters), Seq("row", "pos"), "left")
      .groupBy("item")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cm_estimate"))
  }
}
