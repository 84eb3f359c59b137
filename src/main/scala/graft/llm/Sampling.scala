package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus sampling/splitting operators for training-data pipelines.
  *
  * Both are deterministic by construction: a document lands in the same
  * split on every run, every cluster layout, and every engine — the
  * property that keeps train/val membership stable as a 100 TB corpus is
  * re-processed incrementally.
  */
object Sampling {

  /** Hex-digit expansion of a fraction in [0,1): the md5-space threshold
    * below which a row is "in". 8 digits ≈ 2^-32 resolution. */
  private[graft] def hexThreshold(frac: Double, digits: Int = 8): String = {
    val hex = "0123456789abcdef"
    var f = frac
    val sb = new StringBuilder
    (0 until digits).foreach { _ =>
      f *= 16
      val d = math.min(15, f.toInt)
      sb.append(hex(d))
      f -= d
    }
    sb.toString
  }

  /** Deterministic hash split via md5 of the stringified id compared
    * LEXICOGRAPHICALLY against the fraction's hex expansion. md5 hex is
    * uniform and identical in every engine (unlike xxhash64/rand seeds), so
    * the split is reproducible AND oracle-checkable. trainFrac ≥ 1.0 uses
    * the keep-everything sentinel ("g" sorts above every hex digit) instead
    * of hexThreshold's [0,1) expansion, which at exactly 1.0 would emit
    * "ffffffff" and silently send ~2^-32 of rows to "val". */
  def splitLabel(id: Column, trainFrac: Double): Column = {
    val threshold = if (trainFrac >= 1.0) "g" else hexThreshold(trainFrac)
    when(md5(id.cast("string")) < lit(threshold), "train").otherwise("val")
  }

  /** Deterministic Bernoulli membership at a per-row hex threshold (built
    * with [[hexThreshold]], or "g" for keep-everything since every md5 hex
    * digit sorts below it): `md5(id) < threshold` keeps ≈ that fraction of
    * rows, identically in any engine — the primitive under domain-mix
    * resampling, where each source gets its own target rate. */
  def inSample(id: Column, thresholdHex: Column): Column =
    md5(id.cast("string")) < thresholdHex

  /** Epoch upsampling: repeat each row `factor` times where factor may be
    * FRACTIONAL — 2.3 epochs = 2 guaranteed copies plus membership in a
    * deterministic 0.3-rate sample for the third (the standard way
    * pretraining mixtures over-weight small high-quality sources). The
    * fractional copy reuses the md5-threshold primitive, salted with the
    * integer epoch count so different factors draw independent samples.
    * Output adds an `epoch` column (1-based).
    *
    * Scale shape: `explode(sequence(...))` is row-local — zero shuffle,
    * output size = Σ factor·|source| by construction. Factors arrive as a
    * tiny (source → factor) map inlined as a when-chain, not a join. */
  def upsampleEpochs(df: DataFrame, idCol: String, groupCol: String,
                     factors: Map[String, Double],
                     defaultFactor: Double = 1.0): DataFrame = {
    require(factors.values.forall(_ >= 0.0), "factors must be >= 0")
    def whole(f: Double) = math.floor(f).toLong
    def fracThreshold(f: Double): String = {
      val frac = f - math.floor(f)
      if (frac <= 0.0) "" else hexThreshold(frac)
    }
    val wholeCol = factors.foldLeft(lit(whole(defaultFactor))) {
      case (acc, (g, f)) => when(col(groupCol) === g, lit(whole(f))).otherwise(acc)
    }
    val fracCol = factors.foldLeft(lit(fracThreshold(defaultFactor))) {
      case (acc, (g, f)) => when(col(groupCol) === g, lit(fracThreshold(f))).otherwise(acc)
    }
    val extra = when(
      md5(concat(col(idCol).cast("string"), lit(":"), wholeCol.cast("string")))
        < fracCol, 1L).otherwise(0L)
    df.withColumn("_copies", wholeCol + extra)
      .filter(col("_copies") > 0)
      .withColumn("epoch", explode(sequence(lit(1L), col("_copies"))))
      .drop("_copies")
  }

  /** Group-aware split: EVERY row of a group (source, domain, near-dup
    * cluster id, …) lands in the same split, because the md5 is taken over
    * the GROUP key instead of the row id. This is the leakage-safe
    * variant of [[splitLabel]]: with near-duplicates or same-source
    * documents scattered across train and validation, validation loss
    * measures memorization, not generalization — standard practice is to
    * split on the dedup-cluster or source key. Same engine-portable
    * md5-threshold primitive, so equally oracle-checkable; the trainFrac
    * is the expected fraction of GROUPS (not rows) in train. */
  def splitLabelByGroup(group: Column, trainFrac: Double): Column =
    splitLabel(group, trainFrac)

  /** Per-group quota: keep at most `quota` rows per group, chosen
    * deterministically by `orderCol` — the standard domain-balancing step
    * (cap any one source/domain's share of the corpus). One shuffle on the
    * group key; Spark's WindowGroupLimit prunes rows past the quota before
    * the shuffle. */
  def quotaPerGroup(df: DataFrame, groupCol: String, orderCol: String,
                    quota: Int): DataFrame =
    df.withColumn("_rn", row_number().over(
        Window.partitionBy(groupCol).orderBy(col(orderCol))))
      .filter(col("_rn") <= quota)
      .drop("_rn")

  /** Weighted sampling WITHOUT replacement via the exponential-race form
    * of Efraimidis & Spirakis 2006 ("Weighted random sampling with a
    * reservoir"): each row draws u ∈ (0, 1] and races with key
    * -ln(u) / w — the k smallest keys win, and inclusion probability is
    * proportional to weight. This is the quality-weighted corpus
    * subsampling step (downsample a crawl to a token budget, biased
    * toward high-quality documents) in its scale-correct shape: the key
    * is a per-row projection and the top-k a TakeOrderedAndProject — no
    * shuffle beyond the final k rows.
    *
    * Determinism: u derives from md5(id) (first 13 hex chars + 1, scaled
    * by 2⁻⁵², so u is never 0 and ln is finite) — reproducible run to run
    * AND replayable by an external SQL engine, which is what puts the
    * query on the oracle gate. Rows with non-positive or null weight are
    * excluded (their race key would be infinite or flip sign). */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     k: Int): DataFrame = {
    val u = (conv(substring(md5(col(idCol).cast("string")), 1, 13), 16, 10)
      .cast("double") + 1.0) / 4503599627370496.0
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("race_key", -log(u) / col(weightCol).cast("double"))
      .orderBy(col("race_key"), col(idCol))
      .limit(k)
  }
}
