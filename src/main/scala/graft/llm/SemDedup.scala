package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantic deduplication (SemDeDup, Abbas et al. 2023,
  * arXiv:2303.09540): k-means-cluster the embedding space, compare
  * embeddings PAIRWISE ONLY WITHIN EACH CLUSTER, and drop all but one
  * document from every group whose cosine similarity exceeds the
  * threshold. Near-duplicate *meaning* (paraphrases, boilerplate variants,
  * translations of the same page) clusters together even when the bytes
  * share no n-grams — the gap MinHash/SimHash can't see.
  *
  * Scale shape: the quadratic step is confined to single clusters — cost
  * is Σ|cluster|², so k is chosen to bound |cluster| (SemDeDup used 11k
  * clusters for LAION-440M; k grows with the corpus and average cluster
  * size stays ~constant). The cluster self-join shuffles BOTH sides by
  * `_cluster` (co-partitioned equi-join, no broadcast of the corpus), the
  * per-pair cosine is the codegen'd unrolled kernel, and everything
  * downstream (connected components → min-id representative) reuses the
  * byte-level dedup machinery. Training cost is the seeded Spark-ML
  * k-means fit, the same coarse quantizer as [[Ivf.build]]. */
object SemDedup {

  /** Within-cluster pairs with cosine ≥ threshold: (id_a, id_b, cos),
    * id_a < id_b. */
  def semanticPairs(corpus: DataFrame, embCol: String, idCol: String,
                    k: Int, threshold: Double, dim: Int = 64,
                    seed: Long = 42L, maxIter: Int = 5): DataFrame = {
    // 5 Lloyd's iterations, but KEEP the k-means|| init: random init can
    // seed one tight blob twice and split it (SemDedupSpec catches exactly
    // this — a split blob silently loses its cross-split pairs). A gating
    // clusterer tolerates loose convergence, not a broken partition.
    val assigned = Ivf.build(corpus, embCol, idCol, k, seed, maxIter).assigned
    val a = assigned.select(col("_cluster"), col(idCol).as("id_a"),
      col(embCol).as("_ea"))
    val b = assigned.select(col("_cluster"), col(idCol).as("id_b"),
      col(embCol).as("_eb"))
    a.join(b, "_cluster")
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos",
        Similarity.cosineUnrolled(col("_ea"), col("_eb"), dim))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }

  /** Full SemDeDup decision: every document labeled with its semantic
    * component and an `is_representative` keep/drop flag (min-id wins,
    * matching the byte-level dedup contract). */
  def semDedup(corpus: DataFrame, embCol: String, idCol: String,
               k: Int, threshold: Double, dim: Int = 64,
               seed: Long = 42L): DataFrame = {
    val pairs = semanticPairs(corpus, embCol, idCol, k, threshold, dim, seed)
    Dedup.dedupByCluster(corpus.select(col(idCol)), idCol, pairs)
  }
}
