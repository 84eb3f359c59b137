package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for approximate nearest-neighbor search
  * (Jégou et al., "Product Quantization for Nearest Neighbor Search",
  * TPAMI 2011): split each D-dim vector into m subvectors, learn a k-entry
  * codebook per subspace, store each vector as m small codes, and answer
  * queries with asymmetric distance computation (ADC) — the query builds an
  * m×k lookup table once, and every corpus row scores with m table lookups
  * instead of D multiplies.
  *
  * Scale story: the encoded corpus is m bytes-per-vector of scan (for
  * D=64 floats and m=8 that is a 32× storage/bandwidth cut, far past the
  * 4× of int8 quantization), the codebooks and query table are tiny driver
  * state broadcast as literals, and the search plan is the same
  * shuffle-free Scan → Project → TakeOrderedAndProject as the brute-force
  * baseline. Training fits on a seeded SAMPLE of the corpus — at 100 TB
  * nobody k-means the whole relation; encoding is one distributed pass
  * with the codebooks inlined into codegen'd expressions (no UDFs, no
  * lambdas, no shuffles). */
object Pq {

  /** codebooks(j)(i) = centroid i of subspace j (length subDim each). */
  final case class Model(m: Int, k: Int, subDim: Int,
                         codebooks: Array[Array[Array[Double]]])

  /** Fit per-subspace codebooks with a seeded Lloyd's loop that trains ALL
    * m subspaces together — one distributed pass per iteration, not one
    * ML-pipeline fit per subspace (m× the scheduler passes for identical
    * math).
    *
    * Shape: the sample explodes once into WEIGHTED DISTINCT (subspace,
    * subvector, count) rows — the minimal sufficient statistic for Lloyd's
    * — and each iteration joins them against the current centroids as a
    * BROADCAST RELATION (not expression literals: a literal codebook would
    * force a fresh whole-stage-codegen compile every iteration; an
    * identical plan over a new tiny LocalRelation reuses the compiled
    * code). Assignment is min_by over the k broadcast candidates with a
    * (dist, code) tie-break, means are weighted averages, centroid state
    * between iterations is tiny driver data. Deterministic init: the k
    * hash-lowest distinct subvectors per subspace, seed folded into the
    * hash. Early stop when no centroid moves more than `tol`. */
  def fit(corpus: DataFrame, embCol: String, dim: Int, m: Int, k: Int,
          seed: Long = 42L, sampleFraction: Double = 1.0,
          maxIter: Int = 10, tol: Double = 1e-6,
          trainPartitions: Int = 8): Model = {
    require(dim % m == 0, s"dim $dim must divide into m=$m subspaces")
    val subDim = dim / m
    val spark = corpus.sparkSession
    val sample = (if (sampleFraction >= 1.0) corpus
                  else corpus.sample(withReplacement = false, sampleFraction, seed))
      .select(col(embCol).cast("array<double>").as("_e"))
    // The weighted-distinct training relation is bounded by design
    // (sampleFraction caps it at scale), so it compacts onto a handful of
    // partitions — each Lloyd's iteration then schedules trainPartitions
    // tasks instead of a full shuffle-width of near-empty ones.
    val subs = sample
      .select(explode(array((0 until m).map(j =>
        struct(lit(j).as("j"), slice(col("_e"), j * subDim + 1, subDim).as("v"))): _*)).as("s"))
      .groupBy(col("s.j").as("j"), col("s.v").as("v"))
      .agg(count(lit(1)).cast("double").as("cnt"))
      .coalesce(trainPartitions)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // Deterministic init: k distinct subvectors per subspace, ordered by a
    // seeded hash (uniform, engine-stable) — one pass for every subspace.
    val vKey = concat_ws(",", col("v").cast("array<string>"))
    val initRows = subs
      .withColumn("_rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("j")
          .orderBy(xxhash64(lit(seed), vKey), vKey)))
      .filter(col("_rn") <= k)
      .select(col("j"), col("_rn"), col("v"))
      .collect()
    var centroids: Array[Array[Array[Double]]] = Array.tabulate(m) { j =>
      val mine = initRows.filter(_.getInt(0) == j).sortBy(_.getInt(1))
      require(mine.length == k,
        s"subspace $j has only ${mine.length} distinct subvectors for k=$k")
      mine.map(_.getSeq[Double](2).toArray)
    }

    import spark.implicits._
    val distExpr = (0 until subDim).map { d =>
      val x = element_at(col("v"), d + 1) - element_at(col("c"), d + 1)
      x * x
    }.reduce(_ + _)
    var it = 0
    var moved = Double.MaxValue
    while (it < maxIter && moved > tol) {
      val centDf = centroids.zipWithIndex.flatMap { case (cb, j) =>
        cb.zipWithIndex.map { case (c, i) => (j, i, c.toSeq) }
      }.toSeq.toDF("j", "code", "c")
      val assigned = subs.join(broadcast(centDf), "j")
        .withColumn("dist", distExpr)
        .groupBy(col("j"), col("v"), col("cnt"))
        .agg(min_by(col("code"), struct(col("dist"), col("code"))).as("code"))
      val aggs = (0 until subDim).map(d =>
        (sum(element_at(col("v"), d + 1) * col("cnt")) / sum(col("cnt"))).as(s"_c$d"))
      val means = assigned.groupBy("j", "code").agg(aggs.head, aggs.tail: _*)
        .collect()
      val next = Array.tabulate(m, k)((j, i) => centroids(j)(i)) // empty cluster → keep
      means.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) =
          (0 until subDim).map(d => r.getDouble(2 + d)).toArray
      }
      moved = (0 until m).flatMap(j => (0 until k).map(i =>
        (0 until subDim).map(d =>
          math.abs(next(j)(i)(d) - centroids(j)(i)(d))).max)).max
      centroids = next
      it += 1
    }
    subs.unpersist()
    Model(m, k, subDim, centroids)
  }

  /** Encode: per subspace, the 0-based index of the nearest centroid
    * (ties → lowest index, first-strict-minimum). Adds `pq_codes`
    * (array<int>, length m). One distributed projection via the native
    * `PqEncode` Expression — the codebook travels as a reference object,
    * so codegen compiles a constant-size loop instead of an
    * m×k×subDim-term unrolled tree (seconds of compile per re-fit at the
    * 8×16×16 defaults; see expressions/PqEncode.scala). */
  def encode(corpus: DataFrame, embCol: String, model: Model): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge
    val flat = new Array[Double](model.m * model.k * model.subDim)
    for (j <- 0 until model.m; i <- 0 until model.k; d <- 0 until model.subDim)
      flat((j * model.k + i) * model.subDim + d) = model.codebooks(j)(i)(d)
    corpus.withColumn("pq_codes", Bridge.column(graft.expressions.PqEncode(
      Bridge.expression(col(embCol)), model.m, model.k, model.subDim, flat)))
  }

  /** ADC search: the query's m×k distance table is computed driver-side
    * (tiny), inlined as array literals, and every row's approximate
    * distance is m element_at lookups indexed by its codes — then the
    * shuffle-free TakeOrdered top-k. Returns (id, approx_dist). */
  def search(encoded: DataFrame, idCol: String, model: Model,
             query: Seq[Double], topK: Int): DataFrame = {
    require(query.length == model.m * model.subDim)
    val table: Array[Array[Double]] = Array.tabulate(model.m) { j =>
      Array.tabulate(model.k) { i =>
        val c = model.codebooks(j)(i)
        var s = 0.0
        var d = 0
        while (d < model.subDim) {
          val x = query(j * model.subDim + d) - c(d)
          s += x * x
          d += 1
        }
        s
      }
    }
    val dist = (0 until model.m).map { j =>
      element_at(lit(table(j)), element_at(col("pq_codes"), j + 1) + 1)
    }.reduce(_ + _)
    encoded
      .select(col(idCol), round(dist, 6).as("approx_dist"))
      .orderBy(col("approx_dist").asc, col(idCol).asc)
      .limit(topK)
  }
}
