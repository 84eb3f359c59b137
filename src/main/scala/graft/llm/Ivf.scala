package graft.llm

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest-neighbor index: coarse-quantize
  * the corpus with k-means, store cluster assignments as a partition
  * column, search only the `nprobe` clusters nearest to the query.
  *
  * This is the production shape of [[Similarity.ivfTopK]] (which uses a
  * pre-assigned label as the coarse partition): at 100 TB the assignment
  * column becomes a hive partition key and a probe touches only
  * nprobe/k of the corpus files. Deterministic under a fixed seed. */
object Ivf {

  final case class Index(assigned: DataFrame, centroids: Array[Array[Double]],
                         embCol: String, idCol: String)

  /** Build the index: fit k-means on the embedding column (seeded), attach
    * a `_cluster` column. The fitted centroids are tiny driver state.
    * `maxIter` caps the Lloyd's iterations — a COARSE quantizer only
    * needs rough partitions, and each extra iteration is a full
    * distributed pass over the training relation. `initMode` "random"
    * replaces the multi-round k-means|| init sweep with a single seeded
    * sample — the right trade when the clustering only gates candidates
    * (SemDeDup) rather than ranks results. */
  def build(corpus: DataFrame, embCol: String, idCol: String,
            k: Int, seed: Long = 42L, maxIter: Int = 20,
            initMode: String = "k-means||"): Index = {
    val withVec = corpus.withColumn("_features",
      array_to_vector(col(embCol).cast("array<double>")))
      // Cached for the duration of the fit: every k-means|| init pass and
      // Lloyd's iteration is an action over this relation — uncached, each
      // re-runs the scan + array→vector conversion (Spark ML itself warns
      // about exactly this).
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val model = new KMeans().setK(k).setSeed(seed).setMaxIter(maxIter)
      .setInitMode(initMode)
      .setFeaturesCol("_features")
      .fit(withVec)
    val assigned = model.transform(withVec)
      .withColumnRenamed("prediction", "_cluster")
      .drop("_features")
      // Materialize the assignment (KB per row: id, cluster, embedding)
      // then release the feature cache — downstream consumers re-scan the
      // assignment, not the fit input.
      .localCheckpoint()
    withVec.unpersist()
    Index(assigned, model.clusterCenters.map(_.toArray), embCol, idCol)
  }

  /** Search: rank centroids by distance to the query driver-side (k is
    * small), filter the corpus to the nprobe nearest clusters — partition
    * pruning at scale — then exact cosine top-k within. */
  def search(index: Index, query: Seq[Double], topK: Int, nprobe: Int): DataFrame = {
    val nearest = index.centroids.zipWithIndex
      .map { case (c, i) =>
        val d = c.zip(query).map { case (a, b) => (a - b) * (a - b) }.sum
        (i, d)
      }
      .sortBy(_._2).take(nprobe).map(_._1)
    Similarity.bruteForceTopK(
      index.assigned.filter(col("_cluster").isin(nearest.map(Integer.valueOf): _*)),
      index.embCol, index.idCol, query, topK)
  }
}
