package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog in RELATIONAL form (Flajolet, Fusy, Gandouet & Meunier,
  * AofA 2007): the register file is a (grp, reg, rho) relation of at most
  * m rows per group, built with one partial-aggregated groupBy — and the
  * register index / rank are md5-derived (the engine-portable hash family
  * used across this repo: Count-Min positions, Bloom bits, MinHash perms),
  * so an external SQL engine rebuilds the IDENTICAL registers and replays
  * the estimate to the last bit. Spark's own `approx_count_distinct` is
  * the production HLL++ (q_agg_approx_distinct); this relational twin is
  * the one whose internals an oracle can check.
  *
  * Properties the relational form keeps:
  *  - registers merge by UNION ALL + max re-aggregation (sketch union IS
  *    elementwise max — the law that makes per-partition/per-day sketches
  *    composable without rescanning history);
  *  - the sketch is ≤ m rows per group regardless of stream size — a
  *    100 TB distinct-count dashboard costs KBs per group;
  *  - rho is capped by the 32-bit hash tail (≤ 33), so the scaled
  *    harmonic sum Σ 2^(33−rho) stays an exact BIGINT and the only float
  *    op is the final α·m²·2³³ / Z division, one correctly-rounded IEEE
  *    op on exactly-representable operands — deterministic everywhere. */
object HllSketch {

  /** Register index: first 2 hex chars of md5 (m = 256, rsd ≈ 6.5%). */
  private def reg(item: Column): Column =
    conv(substring(md5(item.cast("string")), 1, 2), 16, 10).cast("long")

  /** Rank rho = leading zeros of the 32-bit hash tail + 1, via binary
    * string length (bin() has no leading zeros in Spark and DuckDB both):
    * rho = 33 − bitlength(v); the all-zero tail (p = 2⁻³²) defines 33. */
  private def rho(item: Column): Column = {
    val v = conv(substring(md5(item.cast("string")), 3, 8), 16, 10).cast("long")
    when(v === 0, lit(33L)).otherwise(lit(33L) - length(bin(v)))
  }

  /** Per-ITEM (grp, reg, rho) projection — the scan-side half of the
    * sketch, shared by the batch aggregate below and the streaming state
    * fold ([[graft.streaming.EventStream.streamingHllRegisters]]). */
  def project(df: DataFrame, grpCol: String, itemCol: String): DataFrame =
    df.select(col(grpCol).as("grp"), reg(col(itemCol)).as("reg"),
      rho(col(itemCol)).as("rho"))

  /** (grp, reg, rho) register file over an item column: one groupBy with
    * map-side partial max — the shuffle carries at most m rows per
    * partition per group. */
  def registers(df: DataFrame, grpCol: String, itemCol: String): DataFrame =
    project(df, grpCol, itemCol)
      .groupBy("grp", "reg").agg(max("rho").as("rho"))

  /** Sketch union: elementwise register max across groups, surfaced under
    * a new group name. This is the merge a 1000-executor fleet does with
    * per-partition sketches — no data rescan. */
  def merged(registers: DataFrame, as: String): DataFrame =
    registers.groupBy("reg").agg(max("rho").as("rho"))
      .select(lit(as).as("grp"), col("reg"), col("rho"))

  /** Per-group raw HLL estimate from the register file, m = 256.
    * Z_scaled = (m − n_nonzero)·2³³ + Σ 2^(33−rho) is exact integer
    * arithmetic; the estimate is one IEEE division then floor. */
  def estimate(registers: DataFrame): DataFrame = {
    val m = 256.0
    val pow2 = expr("CAST(power(2.0, 33 - rho) AS BIGINT)")
    registers.groupBy("grp")
      .agg(count(lit(1)).as("n_nonzero"),
        sum(col("rho")).as("reg_sum"),
        sum(pow2).as("z_tail"))
      .select(col("grp"), col("n_nonzero"), col("reg_sum"),
        floor((lit(0.7213 / (1.0 + 1.079 / m) * m * m) * lit(8589934592.0))
          / ((lit(256L) - col("n_nonzero")) * lit(8589934592.0) + col("z_tail")))
          .cast("long").as("hll_estimate"))
  }
}
