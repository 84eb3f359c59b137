package graft.config

import org.apache.spark.sql.types._

/** The engine's 5-type logical type system.
  *
  * Mirrors the reference's type dispatch (reference
  * `app/services/transformers.py:143-172`): TEXT, NUMERIC, INTEGER, DATE,
  * BOOLEAN; unknown type names fall back to TEXT behavior. Logical NUMERIC is
  * carried as `DoubleType` end-to-end (the reference parses to Python float,
  * `transformers.py:46-75`) for oracle-friendly semantics; fixed-point
  * storage is a sink concern, not a pipeline one.
  */
sealed abstract class LogicalType(val name: String) {
  def sparkType: DataType
}
object LogicalType {
  case object Text    extends LogicalType("TEXT")    { val sparkType = StringType  }
  case object Numeric extends LogicalType("NUMERIC") { val sparkType = DoubleType  }
  // Long, not Int: the reference's parse_integer returns unbounded Python
  // ints; a sink may narrow, the pipeline must not.
  case object Integer extends LogicalType("INTEGER") { val sparkType = LongType }
  case object Date    extends LogicalType("DATE")    { val sparkType = DateType    }
  case object Bool    extends LogicalType("BOOLEAN") { val sparkType = BooleanType }

  val all: Seq[LogicalType] = Seq(Text, Numeric, Integer, Date, Bool)

  /** Unknown type names behave as TEXT (reference `transformers.py:167-172`). */
  def fromName(name: String): LogicalType =
    all.find(_.name == name).getOrElse(Text)
}

/** One canonical column of a source's fixed schema.
  *
  * @param internalName engine-facing column name
  * @param dataType logical type driving value transformation
  * @param isRequired required for header detection (reference
  *   `header_detector.py:78-84`); note required-for-detection is distinct
  *   from key-ness at validation time (`ingestor.py:358-375`, driven by
  *   [[SourceConfig.uniqueKeys]])
  * @param acceptedHeaders raw-file header spellings that resolve to this
  *   column, matched case-insensitively (reference `seed_data.py:413-509`)
  *
  * The reference's `is_nullable` attribute is intentionally omitted: it is
  * display-only there (schema.py:80) with no pipeline effect; nullability
  * enforcement happens via unique-key validation, not per-column flags.
  */
final case class CanonicalColumn(
    internalName: String,
    dataType: LogicalType,
    isRequired: Boolean,
    acceptedHeaders: Seq[String],
)

/** Per-source ingest configuration: the union of the reference's
  * `meta.data_sources` + `meta.canonical_columns` + `meta.column_mappings`
  * seed config (`scripts/seed_data.py`) and `TABLE_CONFIG`
  * (`app/services/ingestor.py:27-93`).
  *
  * Column order is semantically significant: header detection matches
  * canonical columns greedily in declaration order with first-match-wins
  * cell exclusion (reference `header_detector.py:47-75`). The reference
  * fetches mappings with no ORDER BY, so its cross-column match priority is
  * unspecified DB row order; this engine's declaration order is a
  * deterministic pinning of that behavior, not a reproduced guarantee.
  */
final case class SourceConfig(
    sourceCode: String,
    sourceName: String,
    category: String,
    targetTable: String,
    uniqueKeys: Seq[String],
    columns: Seq[CanonicalColumn],
    updateFrequency: String,
    displayOrder: Int,
    /** Sources whose versions carry a variant dimension (NCCI_PTP:
      * HOSPITAL / PRACTITIONER, reference `app/routers/upload.py:147-152`). */
    variants: Seq[String] = Nil,
    /** Multi-part append allowed (NCCI_PTP only, `ingestor.py:691-783`). */
    multiPart: Boolean = false,
) {
  def columnNames: Seq[String] = columns.map(_.internalName)
  def typeMap: Map[String, LogicalType] =
    columns.map(c => c.internalName -> c.dataType).toMap

  /** Canonical typed schema for this source's data relation. */
  def schema: StructType = StructType(columns.map { c =>
    StructField(c.internalName, c.dataType.sparkType, nullable = true)
  })
}

/** The in-engine metadata catalog seeded with the reference's ten sources.
  *
  * Reference: `scripts/seed_data.py:24-119` (sources), `128-404` (canonical
  * columns incl. types/required flags), `413-509` (accepted headers),
  * `app/services/ingestor.py:27-93` (target tables + unique keys).
  */
object Catalog {
  import LogicalType._

  private def col(
      name: String, t: LogicalType, required: Boolean, headers: String*
  ): CanonicalColumn = CanonicalColumn(name, t, required, headers)

  val PFS_RVU: SourceConfig = SourceConfig(
    sourceCode = "PFS_RVU",
    sourceName = "PFS - Relative Value Units",
    category = "Physician Fee Schedule",
    targetTable = "cms.pfs_rvu",
    uniqueKeys = Seq("hcpcs_code", "modifier"),
    updateFrequency = "QUARTERLY",
    displayOrder = 10,
    columns = Seq(
      col("hcpcs_code", Text, required = true,
        "HCPCS", "HCPC", "CPT", "HCPCS CODE", "PROCEDURE CODE"),
      col("modifier", Text, required = false, "MOD", "MODIFIER", "MOD."),
      col("description", Text, required = false,
        "DESCRIPTION", "DESC", "DESCRIPTOR", "SHORT DESCRIPTION"),
      col("status_code", Text, required = false,
        "STATUS CODE", "STATUS", "STAT", "STS"),
      col("work_rvu", Numeric, required = false,
        "WORK RVU", "WORK_RVU", "WRVU", "PHYSICIAN WORK"),
      col("non_fac_pe_rvu", Numeric, required = false,
        "NON-FAC PE RVU", "NON-FACILITY PE RVU", "NFPE RVU", "NON FAC PE RVU",
        "FULLY IMPL NON-FAC PE RVUS"),
      col("facility_pe_rvu", Numeric, required = false,
        "FAC PE RVU", "FACILITY PE RVU", "FPE RVU", "FAC_PE_RVU",
        "FULLY IMPL FAC PE RVUS"),
      col("mp_rvu", Numeric, required = false,
        "MP RVU", "MALPRACTICE RVU", "MAL PRAC RVU", "MPRVU", "MALPRACTICE"),
      col("non_fac_total", Numeric, required = false,
        "NON-FAC TOTAL", "NON-FACILITY TOTAL", "NF TOTAL"),
      col("facility_total", Numeric, required = false,
        "FAC TOTAL", "FACILITY TOTAL", "FAC_TOTAL"),
      col("pctc_indicator", Text, required = false,
        "PCTC IND", "PC/TC IND", "PCTC INDICATOR", "PC/TC INDICATOR"),
      col("global_days", Text, required = false,
        "GLOB DAYS", "GLOBAL DAYS", "GLOBAL PERIOD", "GLOB"),
      col("conversion_factor", Numeric, required = false,
        "CONV FACTOR", "CF", "CONVERSION FACTOR", "GPCI CF"),
    ),
  )

  val PFS_GPCI: SourceConfig = SourceConfig(
    sourceCode = "PFS_GPCI",
    sourceName = "PFS - Geographic Practice Cost Index",
    category = "Physician Fee Schedule",
    targetTable = "cms.pfs_gpci",
    uniqueKeys = Seq("mac_locality"),
    updateFrequency = "ANNUAL",
    displayOrder = 20,
    columns = Seq(
      col("mac_locality", Text, required = true,
        "MAC LOCALITY", "LOCALITY", "CARRIER LOCALITY", "MAC/LOCALITY"),
      col("locality_name", Text, required = false,
        "LOCALITY NAME", "NAME", "LOCALITY DESCRIPTION"),
      col("work_gpci", Numeric, required = true,
        "WORK GPCI", "PW GPCI", "WORK", "PHYSICIAN WORK GPCI"),
      col("pe_gpci", Numeric, required = true,
        "PE GPCI", "PRACTICE EXPENSE GPCI", "PE", "PRACTICE EXPENSE"),
      col("mp_gpci", Numeric, required = true,
        "MP GPCI", "MALPRACTICE GPCI", "MP", "PLI GPCI"),
    ),
  )

  val PFS_LOCALITY: SourceConfig = SourceConfig(
    sourceCode = "PFS_LOCALITY",
    sourceName = "PFS - Locality Mapping",
    category = "Physician Fee Schedule",
    targetTable = "cms.pfs_locality",
    uniqueKeys = Seq("state_code", "county_code", "carrier_number", "locality_code"),
    updateFrequency = "ANNUAL",
    displayOrder = 30,
    columns = Seq(
      col("state_code", Text, required = true, "STATE", "STATE CODE", "ST"),
      col("county_code", Text, required = false, "COUNTY CODE", "FIPS", "FIPS CODE"),
      col("county_name", Text, required = false, "COUNTY", "COUNTY NAME"),
      col("carrier_number", Text, required = true,
        "CARRIER", "CARRIER NUMBER", "MAC", "MAC NUMBER"),
      col("locality_code", Text, required = true, "LOCALITY", "LOCALITY CODE", "LOC"),
      // Derived when absent: carrier_number || locality_code
      // (reference seed_data.py:232-235 semantic_context).
      col("mac_locality", Text, required = false, "MAC LOCALITY", "CARRIER LOCALITY"),
    ),
  )

  val PFS_ANES_CF: SourceConfig = SourceConfig(
    sourceCode = "PFS_ANES_CF",
    sourceName = "PFS - Anesthesia Conversion Factor",
    category = "Physician Fee Schedule",
    targetTable = "cms.pfs_anes_cf",
    uniqueKeys = Seq("mac_locality"),
    updateFrequency = "ANNUAL",
    displayOrder = 40,
    columns = Seq(
      col("mac_locality", Text, required = true,
        "MAC LOCALITY", "LOCALITY", "CARRIER LOCALITY"),
      col("locality_name", Text, required = false, "LOCALITY NAME", "NAME"),
      col("anes_conversion_factor", Numeric, required = true,
        "ANESTHESIA CF", "ANES CF", "CONVERSION FACTOR", "CF"),
    ),
  )

  val PFS_OPPS_CAP: SourceConfig = SourceConfig(
    sourceCode = "PFS_OPPS_CAP",
    sourceName = "PFS - OPPS Imaging Cap",
    category = "Physician Fee Schedule",
    targetTable = "cms.pfs_opps_cap",
    uniqueKeys = Seq("hcpcs_code"),
    updateFrequency = "QUARTERLY",
    displayOrder = 50,
    columns = Seq(
      col("hcpcs_code", Text, required = true, "HCPCS", "HCPC", "HCPCS CODE", "CODE"),
      col("opps_cap_amount", Numeric, required = true,
        "OPPS CAP", "CAP AMOUNT", "OPPS CAP AMOUNT", "CAP"),
    ),
  )

  val HCPCS: SourceConfig = SourceConfig(
    sourceCode = "HCPCS",
    sourceName = "HCPCS Level II Codes",
    category = "HCPCS",
    targetTable = "cms.hcpcs_codes",
    uniqueKeys = Seq("hcpcs_code"),
    updateFrequency = "QUARTERLY",
    displayOrder = 60,
    columns = Seq(
      col("hcpcs_code", Text, required = true, "HCPC", "HCPCS", "HCPCS CODE", "CODE"),
      col("short_description", Text, required = false,
        "SHORT DESCRIPTION", "SHORT DESC", "SHORTDESCRIPTION"),
      col("long_description", Text, required = false,
        "LONG DESCRIPTION", "LONG DESC", "LONGDESCRIPTION", "DESCRIPTION"),
      col("add_date", Date, required = false, "ADD DT", "ADD DATE", "ADDED DATE"),
      col("effective_date", Date, required = false,
        "ACT EFF DT", "EFFECTIVE DATE", "EFF DATE", "ACTION EFFECTIVE DATE"),
      col("termination_date", Date, required = false,
        "TERM DT", "TERMINATION DATE", "TERM DATE", "END DATE"),
      col("betos_code", Text, required = false, "BETOS", "BETOS CODE", "TOS"),
      col("coverage_code", Text, required = false,
        "COV", "COVERAGE", "COV CODE", "COVERAGE CODE"),
    ),
  )

  val NCCI_PTP: SourceConfig = SourceConfig(
    sourceCode = "NCCI_PTP",
    sourceName = "NCCI PTP Edits",
    category = "NCCI Edits",
    targetTable = "cms.ncci_ptp",
    uniqueKeys = Seq("comprehensive_code", "component_code"),
    updateFrequency = "QUARTERLY",
    displayOrder = 70,
    variants = Seq("HOSPITAL", "PRACTITIONER"),
    multiPart = true,
    columns = Seq(
      col("comprehensive_code", Text, required = true,
        "Column 1", "Column1", "COLUMN 1", "CODE 1", "COMPREHENSIVE CODE"),
      col("component_code", Text, required = true,
        "Column 2", "Column2", "COLUMN 2", "CODE 2", "COMPONENT CODE"),
      col("modifier_indicator", Integer, required = true,
        "Modifier", "MODIFIER", "MOD IND", "MODIFIER INDICATOR",
        "Modifier 0=not allowed"),
      col("effective_date", Date, required = true,
        "Effective Date", "EffectiveDate", "EFFECTIVE DATE", "EFF DATE", "EFF_DATE"),
      col("deletion_date", Date, required = false,
        "Deletion Date", "DeletionDate", "DELETION DATE", "DEL DATE", "DEL_DATE",
        "END DATE"),
      col("rationale", Text, required = false,
        "PTP Edit Rationale", "Rationale", "RATIONALE", "PTP RATIONALE",
        "EDIT RATIONALE"),
      col("prior_1996_flag", Bool, required = false,
        "*=in existence prior to 1996", "*=IN EXISTENCE", "PRIOR 1996", "PRE-1996"),
    ),
  )

  private def mueColumns(mueHeaders: Seq[String]): Seq[CanonicalColumn] = Seq(
    col("hcpcs_code", Text, required = true,
      "HCPCS/CPT Code", "HCPCS Code", "CPT/HCPCS Code", "HCPCS", "CPT Code"),
    CanonicalColumn("mue_value", Integer, isRequired = true, mueHeaders),
    // mai_id has no file column of its own: it is regex-extracted from the
    // mai_description column's raw value (reference ingestor.py:326-333).
    CanonicalColumn("mai_id", Integer, isRequired = false, Nil),
    col("mai_description", Text, required = true,
      "MUE Adjudication Indicator", "MAI", "Adjudication Indicator"),
    col("mue_rationale", Text, required = false,
      "MUE Rationale", "Rationale", "MUE Rationale Code"),
  )

  val NCCI_MUE_DME: SourceConfig = SourceConfig(
    sourceCode = "NCCI_MUE_DME",
    sourceName = "NCCI MUE - DME Supplier",
    category = "NCCI Edits",
    targetTable = "cms.ncci_mue",
    uniqueKeys = Seq("hcpcs_code"),
    updateFrequency = "QUARTERLY",
    displayOrder = 81,
    columns = mueColumns(Seq(
      "DME Supplier Services MUE Values", "DME MUE Values", "MUE Values",
      "DME Supplier MUE")),
  )

  val NCCI_MUE_PRAC: SourceConfig = NCCI_MUE_DME.copy(
    sourceCode = "NCCI_MUE_PRAC",
    sourceName = "NCCI MUE - Practitioner",
    displayOrder = 82,
    columns = mueColumns(Seq(
      "Practitioner Services MUE Values", "Practitioner MUE Values", "MUE Values",
      "Practitioner MUE")),
  )

  val NCCI_MUE_OPH: SourceConfig = NCCI_MUE_DME.copy(
    sourceCode = "NCCI_MUE_OPH",
    sourceName = "NCCI MUE - Outpatient Hospital",
    displayOrder = 83,
    columns = mueColumns(Seq(
      "Outpatient Hospital Services MUE Values", "Outpatient Hospital MUE Values",
      "Hospital MUE Values", "MUE Values")),
  )

  /** All sources in display order. NCCI_MUE_* deliberately share a target
    * table (reference `ingestor.py:78-93`): "current" resolution is
    * per-(source, variant), not per-table. */
  val sources: Seq[SourceConfig] = Seq(
    PFS_RVU, PFS_GPCI, PFS_LOCALITY, PFS_ANES_CF, PFS_OPPS_CAP, HCPCS,
    NCCI_PTP, NCCI_MUE_DME, NCCI_MUE_PRAC, NCCI_MUE_OPH)

  /** Case-insensitive: the reference upper-cases codes before lookup
    * (app/routers/upload.py get_source_info). */
  def apply(sourceCode: String): SourceConfig =
    sources.find(_.sourceCode.equalsIgnoreCase(sourceCode)).getOrElse(
      throw new IllegalArgumentException(s"Unknown source code: $sourceCode"))

  /** Operating-envelope constants (reference `app/config.py:22-30`). */
  object Limits {
    val maxFileSizeBytes: Long = 100L * 1024 * 1024
    val maxHeaderScanRows: Int = 15
    val typeValidationSampleRows: Int = 100
    val emptyRowThreshold: Double = 0.8
    val insertBatchSize: Int = 1000
    // Engine-side bound (no reference analogue — the reference collects all
    // error strings in Python lists): cap on error strings brought to the
    // driver per ingest; the exact invalid count stays distributed.
    val maxCollectedErrors: Int = 10000
  }
}
