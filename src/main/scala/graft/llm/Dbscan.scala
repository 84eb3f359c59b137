package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic DBSCAN (Ester et al. 1996, "A Density-Based Algorithm for
  * Discovering Clusters") over integer-quantized embeddings — the
  * density-based complement to the [[DetKMeans]] family: no k to choose,
  * arbitrary-shaped clusters, and an explicit NOISE verdict (k-means
  * forces every outlier into some centroid; DBSCAN is the kernel a
  * curation pass uses to find "this embedding sits in no dense region").
  *
  * Determinism (classic DBSCAN is scan-order-dependent for border
  * points): border points attach to the cluster of their MINIMUM-id core
  * neighbor, and cluster labels are the minimum core id per component —
  * both order-free. Distances are exact integer squared L2 in
  * [[DetKMeans]] micro-units via the native [[graft.expressions.LongSqDist]]
  * kernel, so core/border boundaries cannot drift between engines.
  *
  * Scale shape: the ε-neighbor graph here is the exact broadcast
  * pair join (the embeddings relation is the curated small side — same
  * contract as `q_llm_ann_brute`); at full-corpus scale the candidate
  * pair generation swaps to the sign-LSH bucketing of
  * [[Similarity.cosineNearDuplicates]] with everything downstream
  * (degree → core → components → border attach) unchanged. Components
  * run on the CORE-core subgraph only, which density filtering keeps
  * far smaller than the corpus.
  */
object Dbscan {

  /** Per-point assignment: (id, role ∈ core|border|noise, cluster_id);
    * noise carries cluster_id = -1. `minPts` counts the point itself,
    * matching the textbook definition (core ⇔ |N_ε(p)| ≥ minPts).
    *
    * Like [[Dedup.connectedComponents]], the graph logic downstream of
    * the (distributed) ε-pair join auto-selects: at or below
    * `maxDriverPairs` ε-pairs the degrees / union-find / border attach
    * run as ONE driver pass over the collected edge list (the ~10-job
    * distributed plan is pure scheduler floor at KB scale); above it,
    * the same logic runs as joins + aggregates. Both paths are
    * output-identical (DbscanSpec pins the fixture through both). */
  def assign(pts: DataFrame, idCol: String, vecCol: String,
             eps2: Long, minPts: Int,
             maxDriverPairs: Long = Dedup.SmallGraphMaxPairs): DataFrame = {
    // minPts = 1 would make EVERY point core in textbook DBSCAN, but the
    // ε-pair relation below carries no self-pairs, so a neighbor-less
    // point would land as noise instead — refuse the degenerate setting
    // rather than silently deviate (minPts = 1 clustering is just
    // connectedComponents anyway).
    require(minPts >= 2, s"minPts must be >= 2 (got $minPts); " +
      "minPts = 1 degenerates to connected components over the ε-graph")
    // The streamed side of the broadcast pair join arrives as one parquet
    // split at sf scale — spread it or the O(n²) distance filter runs on
    // a single thread.
    val a = pts.select(col(idCol).cast("long").as("ia"),
        col(vecCol).as("va"))
      .repartition(pts.sparkSession.sparkContext.defaultParallelism, col("ia"))
    val b = pts.select(col(idCol).cast("long").as("ib"),
      col(vecCol).as("vb"))
    val pairs = a.join(broadcast(b),
        col("ia") < col("ib") &&
          DetKMeans.dist2(col("va"), col("vb")) <= lit(eps2))
      .select(col("ia"), col("ib"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    if (pairs.count() <= maxDriverPairs) {
      // assignDriver collects the pair list eagerly; the returned plan no
      // longer references `pairs`, so release the cache before returning.
      val out = assignDriver(pts, idCol, pairs, minPts)
      pairs.unpersist()
      return out
    }
    val nbrs = pairs.select(col("ia").as("id"), col("ib").as("nb"))
      .union(pairs.select(col("ib").as("id"), col("ia").as("nb")))
    val core = nbrs.groupBy("id")
      .agg(count(lit(1)).as("n_nb"))
      .filter(col("n_nb") >= minPts - 1)
      .select(col("id"))
    // Components over the core-core subgraph; singleton cores (no core
    // neighbor) never reach the edge relation and keep their own id.
    val ccEdges = pairs
      .join(broadcast(core.select(col("id").as("ia"))), Seq("ia"), "left_semi")
      .join(broadcast(core.select(col("id").as("ib"))), Seq("ib"), "left_semi")
    val comp = Dedup.connectedComponents(ccEdges, "ia", "ib")
    // coreAssign feeds four consumers (core rows, border attach twice,
    // the anti-join universe); persist it or each consumer re-runs the
    // degree aggregate + component join chain above.
    val coreAssign = core.join(broadcast(comp), Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("cluster"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Border = non-core with a core neighbor; attach to the min-id core
    // neighbor's cluster (id is unique per (id, nb) group, so min_by is
    // deterministic).
    val borderAssign = nbrs
      .join(broadcast(coreAssign.select(col("id").as("nb"), col("cluster"))),
        "nb")
      .join(broadcast(coreAssign.select(col("id"))), Seq("id"), "left_anti")
      .groupBy("id")
      .agg(min_by(col("cluster"), col("nb")).as("cluster"))
    val assigned =
      coreAssign.select(col("id"), lit("core").as("role"), col("cluster"))
        .union(borderAssign.select(col("id"), lit("border").as("role"),
          col("cluster")))
    val noise = pts.select(col(idCol).cast("long").as("id"))
      .join(broadcast(assigned.select(col("id"))), Seq("id"), "left_anti")
      .select(col("id"), lit("noise").as("role"), lit(-1L).as("cluster"))
    // Materialize (one row per point, lineage truncated) so the two
    // upstream persists can be released before returning — otherwise
    // repeated assign() calls in a long session accumulate cache blocks.
    val result = assigned.union(noise)
      .select(col("id"), col("role"), col("cluster").as("cluster_id"))
      .localCheckpoint(true)
    pairs.unpersist()
    coreAssign.unpersist()
    result
  }

  /** Driver fast path: identical semantics over the collected ε-pair
    * list. The pair join (the only corpus-sized work) has already run
    * distributed; everything here is O(|pairs| α(n)) on KB-scale data.
    * Noise still resolves distributed (pts may be large even when the
    * ε-graph is sparse): one broadcast anti-join. */
  private def assignDriver(pts: DataFrame, idCol: String,
                           pairs: DataFrame, minPts: Int): DataFrame = {
    val spark = pts.sparkSession
    import spark.implicits._
    val es = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    val deg = scala.collection.mutable.HashMap.empty[Long, Int]
    es.foreach { case (x, y) =>
      deg(x) = deg.getOrElse(x, 0) + 1
      deg(y) = deg.getOrElse(y, 0) + 1
    }
    val core = deg.collect {
      case (id, d) if d >= minPts - 1 => id }.toSet
    // Union-find by MIN root over core-core edges (the
    // [[Dedup.connectedComponents]] discipline: every root is its
    // component's minimum member).
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var root = x
      while (parent.getOrElse(root, root) != root) root = parent(root)
      var cur = x
      while (parent.getOrElse(cur, cur) != cur) {
        val nxt = parent(cur); parent(cur) = root; cur = nxt
      }
      root
    }
    es.foreach { case (x, y) =>
      if (core(x) && core(y)) {
        val (rx, ry) = (find(x), find(y))
        if (rx != ry) { if (rx < ry) parent(ry) = rx else parent(rx) = ry }
      }
    }
    // Border: min-id core neighbor per non-core endpoint.
    val minCoreNb = scala.collection.mutable.HashMap.empty[Long, Long]
    def offer(p: Long, coreNb: Long): Unit =
      minCoreNb(p) = math.min(minCoreNb.getOrElse(p, Long.MaxValue), coreNb)
    es.foreach { case (x, y) =>
      if (core(y) && !core(x)) offer(x, y)
      if (core(x) && !core(y)) offer(y, x)
    }
    val rows =
      core.toSeq.sorted.map(id => (id, "core", find(id))) ++
      minCoreNb.toSeq.sortBy(_._1).map { case (id, nb) =>
        (id, "border", find(nb)) }
    val assigned = rows.toDF("id", "role", "cluster")
    val noise = pts.select(col(idCol).cast("long").as("id"))
      .join(broadcast(assigned.select(col("id"))), Seq("id"), "left_anti")
      .select(col("id"), lit("noise").as("role"), lit(-1L).as("cluster"))
    assigned.union(noise)
      .select(col("id"), col("role"), col("cluster").as("cluster_id"))
  }
}
