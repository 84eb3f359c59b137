package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.transform.Transformers

/** Read-side query surface: the reference's dashboard/lookup/fee queries
  * re-expressed as composable DataFrame builders. */
object ReadQueries {

  /** J1 lateral-top-1 rewrite: the reference's
    * `LEFT JOIN LATERAL (SELECT … ORDER BY ord DESC LIMIT 1) ON TRUE`
    * (dashboard.py:23-50) de-correlated into a window: rank right-side rows
    * per key, keep rank 1, left-join. Scales as one shuffle on the join key
    * instead of a per-row correlated probe. `orderCols` are descending-
    * priority (already wrapped asc/desc by the caller). */
  def lateralTop1(left: DataFrame, right: DataFrame, key: Seq[String],
                  orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(key.map(right(_)): _*).orderBy(orderCols: _*)
    val top1 = right.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
    left.join(top1, key, "left")
  }

  /** §3.3 dashboard assembly: active sources left-joined with their latest
    * completed version (lateral-top-1 rewrite), grouped into per-category
    * source lists in presentation order (reference: dashboard.py:16-67). */
  def dashboard(sources: DataFrame, versions: DataFrame): DataFrame = {
    val latest = lateralTop1(
      sources.filter(col("is_active")),
      versions.filter(col("status") === "completed"),
      Seq("source_code"),
      Seq(col("imported_at").desc, col("data_version_id").desc))
    latest
      .groupBy(col("category"))
      .agg(sort_array(collect_list(struct(
        // display_order leads the struct so sort_array gives the
        // presentation order deterministically (collect_list order through
        // a hash aggregate is NOT guaranteed).
        col("display_order"), col("source_code"), col("source_name"),
        col("version_label"), col("record_count")))).as("sources"))
      .orderBy("category")
  }

  /** Flattened dashboard rows (category, presentation order, latest
    * version) — same join, row-per-source shape. */
  def dashboardRows(sources: DataFrame, versions: DataFrame): DataFrame =
    lateralTop1(
      sources.filter(col("is_active")),
      versions.filter(col("status") === "completed"),
      Seq("source_code"),
      Seq(col("imported_at").desc, col("data_version_id").desc))
      .select("category", "display_order", "source_code", "source_name",
        "version_label", "record_count")
      .orderBy("category", "display_order", "source_name")

  /** O1-style latest row: TakeOrderedAndProject, never a full sort. */
  def latest(df: DataFrame, order: Column*): DataFrame =
    df.orderBy(order: _*).limit(1)

  /** F15/J5 flagship fee computation: rvu row × gpci row (both pre-filtered
    * to singletons) → round(Σ rvu·gpci × cf, 2), OPPS-capped when a cap row
    * matches (reference: SCHEMA.md:248-265, 131-134). */
  def feeFor(rvuCurrent: DataFrame, gpciCurrent: DataFrame,
             hcpcs: String, macLocality: String,
             conversionFactor: Option[Double] = None,
             modifier: Option[String] = None): DataFrame = {
    // Note a reference quirk we reproduce faithfully: PFS_RVU's unique keys
    // include `modifier`, and the TEXT transform nulls empty strings
    // (transformers.py:154-158), so blank-modifier rows are REJECTED at
    // validation (ingestor.py:358-375) — the SCHEMA.md:250 `modifier IS
    // NULL` filter only matches directly-seeded rows, never ingested ones.
    // Callers querying ingested data must pass the explicit modifier.
    val modFilter = modifier match {
      case Some(m) => col("modifier") === m
      case None => col("modifier").isNull || col("modifier") === ""
    }
    val rvu = rvuCurrent.filter(col("hcpcs_code") === hcpcs && modFilter)
    val gpci = gpciCurrent.filter(col("mac_locality") === macLocality)
    val cf = conversionFactor.map(lit).getOrElse(col("conversion_factor"))
    rvu.crossJoin(broadcast(gpci))
      .select(
        col("hcpcs_code"), col("mac_locality"),
        Transformers.fee(
          col("work_rvu"), col("work_gpci"),
          col("non_fac_pe_rvu"), col("pe_gpci"),
          col("mp_rvu"), col("mp_gpci"), cf).as("non_facility_fee"),
        Transformers.fee(
          col("work_rvu"), col("work_gpci"),
          col("facility_pe_rvu"), col("pe_gpci"),
          col("mp_rvu"), col("mp_gpci"), cf).as("facility_fee"))
  }

  /** Anesthesia fee: (base units + time units) × locality conversion factor
    * (reference: SCHEMA.md:113-116). */
  def anesthesiaFee(anesCfCurrent: DataFrame, macLocality: String,
                    baseUnits: Double, timeUnits: Double): DataFrame =
    anesCfCurrent.filter(col("mac_locality") === macLocality)
      .select(col("mac_locality"),
        round((lit(baseUnits) + lit(timeUnits)).cast(org.apache.spark.sql.types.DecimalType(20, 6))
          * col("anes_conversion_factor").cast(org.apache.spark.sql.types.DecimalType(20, 6)), 2)
          .cast("double").as("anesthesia_fee"))

  /** OPPS imaging cap: fee is capped at the OPPS amount when a cap row
    * exists (reference: SCHEMA.md:131-134, seed_data.py:260-263). */
  def cappedFeeFor(feeRow: DataFrame, oppsCapCurrent: DataFrame): DataFrame =
    feeRow.join(broadcast(oppsCapCurrent.select(col("hcpcs_code"), col("opps_cap_amount"))),
        Seq("hcpcs_code"), "left")
      .withColumn("capped_fee",
        when(col("opps_cap_amount").isNotNull,
          least(col("non_facility_fee"), col("opps_cap_amount")))
          .otherwise(col("non_facility_fee")))
}
