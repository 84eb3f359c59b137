package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hashing-trick text features (Weinberger et al., ICML 2009 — the
  * fastText/Vowpal-Wabbit input representation): each word n-gram hashes
  * to one of k buckets with a ±1 sign from an independent hash bit, and a
  * document's feature vector is the signed count per bucket. No
  * vocabulary, no fitting, no driver state — the property that makes it
  * THE feature extractor for a 100 TB corpus: a fixed-width k-vector per
  * document from one scan, trivially joinable to any downstream learner
  * (e.g. [[CentroidClassifier]] over hashed features instead of
  * embeddings). The signed variant keeps E[collision noise] = 0.
  *
  * Hashes are md5-derived (index: 13 hex chars mod k; sign: hex char 14
  * parity), so an external SQL engine rebuilds the exact same features —
  * collisions included. The dense vector forms in ONE aggregation with k
  * sum buffers (the CentroidClassifier/DetKMeans shape): the shuffle
  * carries k longs per doc partition, never the gram stream. */
object FeatureHash {

  private def gramIdx(gram: Column, k: Int): Column =
    conv(substring(md5(gram), 1, 13), 16, 10).cast("long") % k

  private def gramSign(gram: Column): Column =
    when(conv(substring(md5(gram), 14, 1), 16, 10).cast("long") % 2 === 0,
      lit(1L)).otherwise(lit(-1L))

  /** (id, feat[k]) signed-count hashed n-gram features. */
  def features(df: DataFrame, idCol: String, textCol: String,
               n: Int = 2, k: Int = 64): DataFrame = {
    val grams = df.select(col(idCol),
      explode(TextAnalysis.wordGrams(col(textCol), n)).as("gram"))
    val contrib = grams.select(col(idCol),
      gramIdx(col("gram"), k).as("idx"), gramSign(col("gram")).as("s"))
    contrib.groupBy(col(idCol))
      .agg(array((0 until k).map(j =>
        sum(when(col("idx") === j, col("s")).otherwise(0L)).as(s"f$j")): _*)
        .as("feat"))
  }
}
