package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bounded edit-distance self-join via q-gram prefix filtering — the
  * Ed-Join family (Xiao, Wang & Lin, PVLDB 1(1) 2008; Gravano et al.,
  * VLDB 2001 count filtering): find all pairs of strings within
  * Levenshtein distance ≤ k without comparing all pairs.
  *
  * Filter theory: one edit destroys at most q of a string's character
  * q-grams, so two strings within distance k share all but ≤ k·q grams —
  * hence any (k·q+1)-subset of either string's grams must contain a
  * shared gram. Taking each string's k·q+1 RAREST grams under one global
  * frequency order (ties broken by gram text, so both engines and every
  * run agree) makes the candidate join land on the rarest buckets:
  * common grams ("Cus", "ust" in a customer-name column) never index
  * anything, so no bucket degenerates toward all-pairs. Candidates are
  * then verified with the exact codegen'd `levenshtein`, after a free
  * |length difference| ≤ k cut.
  *
  * Shuffle profile at scale: one gram explode (≤ |s| rows per string),
  * one gram-frequency aggregation, one per-string window over ≤ |s|
  * rows, one equi-join on prefix grams. Every stage is key-partitioned;
  * nothing is quadratic except inside a rare-gram bucket, which the
  * prefix choice keeps small by construction. */
object EditDistanceJoin {

  /** All pairs (id_a < id_b) with levenshtein(str_a, str_b) ≤ maxDist.
    * Output: id_a, id_b, str_a, str_b, dist. */
  def selfJoin(df: DataFrame, idCol: String, strCol: String,
               maxDist: Int = 1, q: Int = 3): DataFrame = {
    require(maxDist >= 1 && q >= 2, s"need maxDist >= 1, q >= 2; got $maxDist, $q")
    val prefixLen = maxDist * q + 1
    val s = df.select(col(idCol).as("id"), col(strCol).as("str"))
    // Distinct q-grams; strings shorter than q contribute themselves as
    // their single gram so they still participate in the filter.
    val grams = s.select(col("id"), col("str"),
      explode(array_distinct(
        when(length(col("str")) < q, array(col("str")))
          .otherwise(transform(sequence(lit(1), length(col("str")) - (q - 1)),
            i => col("str").substr(i, lit(q)))))).as("gram"))
    val freq = grams.groupBy("gram").agg(count(lit(1)).as("df"))
    val ranked = grams.join(freq, "gram")
      .withColumn("rn", row_number().over(
        Window.partitionBy("id").orderBy(col("df"), col("gram"))))
      .filter(col("rn") <= prefixLen)
      .select(col("id"), col("str"), col("gram"))
    val prefixCand = ranked.as("a").join(ranked.as("b"),
        col("a.gram") === col("b.gram") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("a.str").as("str_a"),
        col("b.id").as("id_b"), col("b.str").as("str_b"))
    // The pigeonhole guarantee needs > k·q grams, i.e. length ≥ q·(k+1):
    // below that, k edits can destroy EVERY gram and a true pair shares
    // nothing. Short strings are a bounded sliver of realistic data, so
    // they broadcast and pair against the length-±k band directly (at a
    // scale where the short side itself is huge, length-blocking replaces
    // the broadcast — the verify stage is unchanged).
    val shortSide = s.filter(length(col("str")) < q * (maxDist + 1))
    val shortCand = broadcast(shortSide.as("a")).join(s.as("b"),
        col("a.id") =!= col("b.id") &&
        abs(length(col("a.str")) - length(col("b.str"))) <= maxDist)
      .select(
        least(col("a.id"), col("b.id")).as("id_a"),
        when(col("a.id") < col("b.id"), col("a.str"))
          .otherwise(col("b.str")).as("str_a"),
        greatest(col("a.id"), col("b.id")).as("id_b"),
        when(col("a.id") < col("b.id"), col("b.str"))
          .otherwise(col("a.str")).as("str_b"))
    val candidates = prefixCand.unionByName(shortCand).distinct()
    candidates
      .filter(abs(length(col("str_a")) - length(col("str_b"))) <= maxDist)
      .withColumn("dist", levenshtein(col("str_a"), col("str_b")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select("id_a", "id_b", "str_a", "str_b", "dist")
  }
}
