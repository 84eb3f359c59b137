package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IVF-PQ: the FAISS "IVFADC" composition (Jégou et al. 2011, §V) —
  * a coarse k-means quantizer prunes the search to `nprobe` clusters, and
  * within them a product quantizer scores RESIDUALS (x − coarse centroid)
  * with asymmetric-distance lookups. Shifting both the row and the query
  * by the same coarse centroid makes residual ADC an estimate of the TRUE
  * ||x − q||²: ||(x−c) − (q−c)||² ≡ ||x − q||², so per probed cluster the
  * query builds one m×k table against ITS residual and rows score with m
  * lookups.
  *
  * This is the 100 TB ANN shape: the coarse assignment becomes a partition
  * key (a probe reads nprobe/kCoarse of the files — partition pruning, not
  * a filter over a full scan), and what it reads is m bytes per vector
  * (the PQ codes), not the raw embeddings. Search stays the shuffle-free
  * Scan → Filter(probed) → Project(when-chain ADC) →
  * TakeOrderedAndProject; all driver state (coarse centroids, codebooks,
  * per-probe tables) is tiny and rides with the plan. */
object IvfPq {

  final case class Index(encoded: DataFrame, coarse: Array[Array[Double]],
                         pq: Pq.Model, idCol: String, dim: Int,
                         private[llm] val cached: Option[DataFrame] = None) {
    /** Unpersist the residual relation cached during build. Call when the
      * index is no longer searched in this session; repeated builds in a
      * long-lived session otherwise accumulate cached blocks. */
    def release(): Unit = cached.foreach(_.unpersist())
  }

  /** Build: coarse-assign (seeded Spark-ML k-means), subtract each row's
    * coarse centroid via a broadcast join on `_cluster` (the centroid
    * relation is kCoarse tiny rows), then fit + encode a product quantizer
    * on the residuals. The residual relation is persisted across the PQ
    * fit and the encode pass so the ML transform + join run once. */
  def build(corpus: DataFrame, embCol: String, idCol: String,
            kCoarse: Int, m: Int, kSub: Int, dim: Int = 64,
            seed: Long = 42L, coarseIter: Int = 5, pqIter: Int = 5): Index = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val coarse = Ivf.build(corpus, embCol, idCol, kCoarse, seed, coarseIter)
    val centDf = coarse.centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq.toDF("_cluster", "_cent")
    val residual = array((0 until dim).map(i =>
      element_at(col(embCol), i + 1).cast("double") -
        element_at(col("_cent"), i + 1)): _*)
    val resid = coarse.assigned.join(broadcast(centDf), "_cluster")
      .withColumn("_resid", residual)
      .select(col(idCol), col("_cluster"), col("_resid"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pq = Pq.fit(resid, "_resid", dim, m, kSub, seed, maxIter = pqIter)
    val encoded = Pq.encode(resid, "_resid", pq)
      .select(col(idCol), col("_cluster"), col("pq_codes"))
    Index(encoded, coarse.centroids, pq, idCol, dim, cached = Some(resid))
  }

  /** Search: rank coarse centroids driver-side, keep the `nprobe`
    * nearest, build one ADC table per probed cluster from the query's
    * residual THERE, and score with a when-chain on `_cluster` — nprobe
    * branches of m lookups each. Returns (id, approx_dist). */
  def search(index: Index, query: Seq[Double], topK: Int,
             nprobe: Int): DataFrame = {
    require(query.length == index.dim,
      s"query dim ${query.length} != index dim ${index.dim}")
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    val probed = index.coarse.zipWithIndex
      .map { case (c, i) =>
        (i, c.zip(query).map { case (a, b) => (a - b) * (a - b) }.sum)
      }
      .sortBy { case (i, d) => (d, i) }.take(nprobe).map(_._1)
    def adc(cluster: Int): Column = {
      val qResid = query.zip(index.coarse(cluster)).map { case (q, c) => q - c }
      val m = index.pq.m
      val sub = index.pq.subDim
      val table = Array.tabulate(m) { j =>
        Array.tabulate(index.pq.k) { i =>
          val cb = index.pq.codebooks(j)(i)
          var s = 0.0
          var d = 0
          while (d < sub) {
            val x = qResid(j * sub + d) - cb(d); s += x * x; d += 1
          }
          s
        }
      }
      (0 until m).map(j =>
        element_at(lit(table(j)), element_at(col("pq_codes"), j + 1) + 1))
        .reduce(_ + _)
    }
    val dist = probed.tail.foldLeft(
      when(col("_cluster") === probed.head, adc(probed.head))) {
      (acc, c) => acc.when(col("_cluster") === c, adc(c))
    }
    index.encoded
      .filter(col("_cluster").isin(probed.map(Integer.valueOf).toSeq: _*))
      .select(col(index.idCol), round(dist, 6).as("approx_dist"))
      .orderBy(col("approx_dist").asc, col(index.idCol).asc)
      .limit(topK)
  }

  /** Refined search (FAISS `IndexRefine`): ADC-score a shortlist of
    * `refineFactor × topK` candidates through [[search]], then re-rank
    * the shortlist by EXACT squared L2 against the raw embeddings and
    * keep topK. PQ distances are quantized estimates — the refine pass
    * trades one bounded raw-vector fetch (the shortlist is topK·factor
    * rows, broadcast back against the corpus as a semi-join; at cluster
    * scale, a point-lookup) for exact final ordering. ||x−q||² expands to
    * x·x − 2·x·q + q·q so both dots ride the native loop kernel.
    * Returns (id, exact_dist). */
  def searchRefined(index: Index, corpus: DataFrame, embCol: String,
                    query: Seq[Double], topK: Int, nprobe: Int,
                    refineFactor: Int = 4): DataFrame = {
    require(refineFactor >= 1, s"refineFactor must be >= 1, got $refineFactor")
    val shortlist = search(index, query, topK * refineFactor, nprobe)
      .select(col(index.idCol))
    val qLit = lit(query.toArray)
    val qq = query.map(x => x * x).sum
    val exact = Similarity.dot(col(embCol), col(embCol)) -
      lit(2.0) * Similarity.dot(col(embCol), qLit) + lit(qq)
    corpus.join(broadcast(shortlist), index.idCol)
      .select(col(index.idCol), round(exact, 6).as("exact_dist"))
      .orderBy(col("exact_dist").asc, col(index.idCol).asc)
      .limit(topK)
  }
}
