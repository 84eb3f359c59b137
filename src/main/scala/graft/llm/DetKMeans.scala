package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic distributed k-means in exact integer units — Lloyd's
  * algorithm (Lloyd 1982) made engine-portable the same way PageRank is
  * ([[graft.operators.PageRank]]): every quantity that crosses a shuffle
  * is an integer, so no float summation order can perturb the result,
  * and every seed is md5-derived, so an external SQL engine can replay
  * the ENTIRE training run — init, every assignment, every centroid
  * update — and hash-match the fitted model. This is what converts
  * "trained index" queries from rows-only to oracle-checked: the seeded
  * Spark-ML k-means (`llm/SemDedup`, `llm/IvfPq`) stays for interop, but
  * correctness claims ride on this variant.
  *
  * Determinism contract:
  *  - coordinates quantize once: u_i = floor(x_i · 10⁶ + 0.5) as long;
  *  - init = the k rows with smallest (md5(id), id) — a distributed
  *    TakeOrdered, replayed by `ORDER BY md5(id), id LIMIT k`;
  *  - distance = Σ (u_i − c_i)², an integer fold in index order
  *    (|u| ≤ ~10⁷ units ⇒ Σ over 64 dims < 2⁶³ — no overflow);
  *  - assignment ties break to the smallest centroid id;
  *  - centroid update: per-dim integer sums (64 partial-aggregated sum
  *    buffers, the MinHash-signature shape — no explode), then
  *    floor(sum / n) with the division in double (exact: |sum| < 2⁵³).
  *  Empty clusters drop out of the next round on both engines alike.
  *
  * Scale shape per iteration: one broadcast of k·dim longs, one
  * crossJoin-with-broadcast scored row-locally, one partial/final
  * aggregate pair for the argmin and one for the centroid sums. The
  * shuffle carries k candidate rows per partition, never the points. */
object DetKMeans {

  /** floor(x·10⁶ + 0.5) per coordinate. */
  def toUnits(emb: Column): Column =
    transform(emb, x => floor(x.cast("double") * 1000000 + lit(0.5)).cast("long"))

  /** Integer squared L2 between unit arrays — the native codegen'd loop
    * kernel ([[graft.expressions.LongSqDist]]); bit-identical to the
    * `aggregate(zip_with(...))` fold it replaced (exact Long adds in
    * index order, null/length-mismatch poisoning), but stays inside
    * whole-stage codegen instead of interpreted lambda dispatch —
    * LongSqDistSpec pins the equivalence. */
  def dist2(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(graft.expressions.LongSqDist(
      Bridge.expression(a), Bridge.expression(b)))
  }

  /** The pre-native lambda formulation, kept as the spec's reference
    * semantics ([[dist2]] must stay bit-identical to this). */
  private[graft] def dist2Lambda(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, v) => acc + v)

  /** Points in unit space: (id, u). */
  def unitPoints(df: DataFrame, idCol: String, embCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("id"), toUnits(col(embCol)).as("u"))

  /** md5-seeded initial centroids: the k points with smallest
    * (md5(id), id). TakeOrdered + a k·dim driver read (bounded, same
    * class as the PQ codebooks). */
  def seedCentroids(pts: DataFrame, k: Int): DataFrame = {
    val spark = pts.sparkSession
    val rows = pts.withColumn("h", md5(col("id").cast("string")))
      .orderBy("h", "id").limit(k)
      .select("u").collect()
    val seeds = rows.zipWithIndex.map { case (r, i) =>
      (i.toLong, r.getSeq[Long](0))
    }
    import spark.implicits._
    seeds.toSeq.toDF("cid", "c")
  }

  // ---------------------------------------------------- bounded kernels
  // COST-gated single-task Lloyd (the graft.operators.SmallGraph
  // contract): under the size threshold the whole training loop — or a
  // standalone assignment against a bounded collected codebook (the
  // seedCentroids driver-read precedent) — runs inside ONE executor
  // task with the identical integer-unit arithmetic, instead of
  // iters × (broadcast + 2 aggregate) scheduler jobs over a KB-scale
  // corpus. Distributed paths below are unchanged — the 100 TB shape.

  private val HexChars = "0123456789abcdef".toCharArray

  private[llm] def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val out = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = HexChars((d(i) >> 4) & 0xf)
      out(2 * i + 1) = HexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** In-memory Lloyd: returns (assignments of the FINAL round against
    * its pre-update centroids, post-update centroids), both in the
    * exact fit() arithmetic. Centroid list keeps ascending cid order;
    * empty clusters drop. */
  private[llm] def lloydCore(pts: Array[(Long, Array[Long])], k: Int,
      iters: Int): (Array[(Long, Long)], Seq[(Long, Array[Long])]) = {
    // Key computed ONCE per point: sortBy re-evaluates its key function
    // at every comparison (measured: the md5-per-comparison sort was the
    // whole cost of the 9-lloydCore IVFPQ kernel). Same (md5(id), id)
    // order, same seeds.
    val seeds = pts
      .map(p => ((md5Hex(p._1.toString), p._1), p))
      .sortBy(_._1).take(k).map(_._2)
    var cents: Seq[(Long, Array[Long])] =
      seeds.zipWithIndex.map { case ((_, u), i) => (i.toLong, u.clone()) }
    var assign: Array[(Long, Long)] = null // (cid, d) per pts index
    var it = 1
    while (it <= iters) {
      assign = pts.map { case (_, u) =>
        var bestC = -1L; var bestD = Long.MaxValue
        cents.foreach { case (cid, c) =>
          var d = 0L
          var i = 0
          while (i < u.length) { val x = u(i) - c(i); d += x * x; i += 1 }
          if (d < bestD || (d == bestD && cid < bestC)) { bestD = d; bestC = cid }
        }
        (bestC, bestD)
      }
      // Update: per-cluster per-dim integer mean, floor(sum / n) with
      // the division in double (exact: |sum| < 2^53).
      val dim = if (pts.isEmpty) 0 else pts(0)._2.length
      val sums = scala.collection.mutable.LinkedHashMap
        .empty[Long, (Array[Long], Long)]
      var p = 0
      while (p < pts.length) {
        val (cid, _) = assign(p)
        val e = sums.getOrElseUpdate(cid, (new Array[Long](dim), 0L))
        val s = e._1
        val u = pts(p)._2
        var i = 0
        while (i < dim) { s(i) += u(i); i += 1 }
        sums(cid) = (s, e._2 + 1)
        p += 1
      }
      cents = sums.toSeq.sortBy(_._1).map { case (cid, (s, nC)) =>
        (cid, s.map(v => math.floor(v.toDouble / nC).toLong))
      }
      it += 1
    }
    (assign, cents)
  }

  private def drainPts(it: Iterator[(Long, Seq[Long])]): Array[(Long, Array[Long])] =
    it.map { case (id, u) => (id, u.toArray) }.toArray

  private[graft] def lloydAssignKernel(it: Iterator[(Long, Seq[Long])],
      k: Int, iters: Int): Iterator[(Long, Seq[Long], Long, Long)] = {
    val pts = drainPts(it)
    val (assign, _) = lloydCore(pts, k, iters)
    pts.iterator.zip(assign.iterator).map { case ((id, u), (cid, d)) =>
      (id, u.toSeq, cid, d)
    }
  }

  /** One Lloyd run emitting BOTH outputs (assignment rows kind=0,
    * centroid rows kind=1 with the cid in the id slot) — [[fit]]'s
    * kernel path materializes this once instead of replaying the loop
    * per consumed output (VERDICT r16 item 8). */
  private[graft] def lloydBothKernel(it: Iterator[(Long, Seq[Long])],
      k: Int, iters: Int): Iterator[(Int, Long, Seq[Long], Long, Long)] = {
    val pts = drainPts(it)
    val (assign, cents) = lloydCore(pts, k, iters)
    pts.iterator.zip(assign.iterator).map { case ((id, u), (cid, d)) =>
      (0, id, u.toSeq, cid, d)
    } ++ cents.iterator.map { case (cid, c) => (1, cid, c.toSeq, 0L, 0L) }
  }

  private[graft] def lloydCentroidsKernel(it: Iterator[(Long, Seq[Long])],
      k: Int, iters: Int): Iterator[(Long, Seq[Long])] = {
    val (_, cents) = lloydCore(drainPts(it), k, iters)
    cents.iterator.map { case (cid, c) => (cid, c.toSeq) }
  }

  /** Grouped twin: per-group Lloyd with the shared (md5(id), id) seed
    * order — every group holds the same id set (the PQ subspace
    * explode), so the per-group row_number seeds are the same k ids. */
  private def lloydGrouped(rows: Array[(Long, Long, Array[Long])], k: Int,
      iters: Int): (Array[(Long, Long)], Seq[(Long, Long, Array[Long])]) = {
    // Bucket rows by group in ONE pass (ADVICE r16: the per-group
    // rows.indices.filter rescan was O(groups × rows)); groups still
    // process in ascending g so the centroid row order is unchanged.
    val byG = scala.collection.mutable.HashMap
      .empty[Long, scala.collection.mutable.ArrayBuffer[Int]]
    rows.indices.foreach(i => byG.getOrElseUpdate(rows(i)._1,
      scala.collection.mutable.ArrayBuffer.empty[Int]) += i)
    val assignOut = new Array[(Long, Long)](rows.length)
    val centsOut = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Array[Long])]
    byG.toSeq.sortBy(_._1).foreach { case (g, idxs) =>
      val pts = idxs.map(i => (rows(i)._2, rows(i)._3)).toArray
      val (assign, cents) = lloydCore(pts, k, iters)
      idxs.indices.foreach(j => assignOut(idxs(j)) = assign(j))
      cents.foreach { case (cid, c) => centsOut += ((g, cid, c)) }
    }
    (assignOut, centsOut.toSeq)
  }

  private[graft] def lloydAssignGroupedKernel(
      it: Iterator[(Long, Long, Seq[Long])], k: Int,
      iters: Int): Iterator[(Long, Long, Seq[Long], Long, Long)] = {
    val rows = it.map { case (g, id, u) => (g, id, u.toArray) }.toArray
    val (assign, _) = lloydGrouped(rows, k, iters)
    rows.iterator.zip(assign.iterator).map { case ((g, id, u), (cid, d)) =>
      (g, id, u.toSeq, cid, d)
    }
  }

  private[graft] def lloydCentroidsGroupedKernel(
      it: Iterator[(Long, Long, Seq[Long])], k: Int,
      iters: Int): Iterator[(Long, Long, Seq[Long])] = {
    val rows = it.map { case (g, id, u) => (g, id, u.toArray) }.toArray
    val (_, cents) = lloydGrouped(rows, k, iters)
    cents.iterator.map { case (g, cid, c) => (g, cid, c.toSeq) }
  }

  /** Single-task nearest-centroid assignment against a COLLECTED
    * bounded codebook (k·dim longs — the seedCentroids driver-read
    * class). Tie → smallest cid, identical to the struct-min. */
  private[graft] def assignKernel(it: Iterator[(Long, Seq[Long])],
      cents: Array[(Long, Array[Long])]): Iterator[(Long, Seq[Long], Long, Long)] =
    it.map { case (id, u) =>
      val ua = u.toArray
      var bestC = -1L; var bestD = Long.MaxValue
      cents.foreach { case (cid, c) =>
        var d = 0L
        var i = 0
        while (i < ua.length) { val x = ua(i) - c(i); d += x * x; i += 1 }
        if (d < bestD || (d == bestD && cid < bestC)) { bestD = d; bestC = cid }
      }
      (id, u, bestC, bestD)
    }

  /** Assign each point to its nearest centroid (ties → smallest cid).
    * Returns (id, u, cid, d). Contract (ADVICE r16): point ids must be
    * UNIQUE (the distributed groupBy(id) would collapse duplicates to
    * one row where the kernel emits one per input row) and `centroids`
    * non-empty (an empty codebook yields cid=-1/d=MaxValue rows on the
    * kernel path vs zero rows distributed) — every in-repo caller
    * passes unique ids and a fitted codebook. */
  def assignTo(pts: DataFrame, centroids: DataFrame): DataFrame = {
    if (graft.operators.SmallGraph.smallEnough(pts, "id")) {
      val spark = pts.sparkSession
      import spark.implicits._
      val cents = centroids.select(col("cid"), col("c")).collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
        .sortBy(_._1)
      return pts.select(col("id"), col("u")).as[(Long, Seq[Long])]
        .coalesce(1)
        .mapPartitions(it => assignKernel(it, cents))
        .toDF("id", "u", "cid", "d")
    }
    pts.crossJoin(broadcast(centroids))
      .select(col("id"), col("u"), col("cid"), dist2(col("u"), col("c")).as("d"))
      .groupBy("id")
      .agg(first(col("u")).as("u"), min(struct(col("d"), col("cid"))).as("m"))
      .select(col("id"), col("u"),
        col("m").getField("cid").as("cid"), col("m").getField("d").as("d"))
  }

  /** One Lloyd update: per-cluster per-dim integer mean. */
  def updateCentroids(assign: DataFrame, dim: Int): DataFrame =
    assign.groupBy("cid")
      .agg(count(lit(1)).as("n"),
        array((0 until dim).map(i => sum(element_at(col("u"), i + 1))): _*).as("s"))
      .select(col("cid"),
        transform(col("s"), s => floor(s.cast("double") / col("n")).cast("long"))
          .as("c"))

  /** Run `iters` Lloyd rounds. Returns (last assignment — made against
    * the PRE-update centroids of the final round — and the final updated
    * centroids). */
  def fit(df: DataFrame, idCol: String, embCol: String,
          k: Int, iters: Int, dim: Int): (DataFrame, DataFrame) = {
    require(k >= 1 && iters >= 1)
    // COST gate: the whole Lloyd run in ONE executor task (identical
    // seeds, assignment ties, floor-mean updates); assignment and
    // centroids are two cheap kernel plans over the same scan.
    locally {
      val pts0 = unitPoints(df, idCol, embCol)
      if (graft.operators.SmallGraph.smallEnough(pts0, "id")) {
        val spark = df.sparkSession
        import spark.implicits._
        // ONE kernel run feeds both outputs: the tagged union is
        // localCheckpointed (eager, single tiny partition), so a caller
        // consuming assignment AND centroids no longer replays the
        // whole Lloyd loop twice.
        val both = pts0.select(col("id"), col("u")).as[(Long, Seq[Long])]
          .coalesce(1)
          .mapPartitions(it => lloydBothKernel(it, k, iters))
          .toDF("kind", "a", "u", "cid", "d")
          .localCheckpoint()
        val assign = both.filter(col("kind") === 0)
          .select(col("a").as("id"), col("u"), col("cid"), col("d"))
        val cents = both.filter(col("kind") === 1)
          .select(col("a").as("cid"), col("u").as("c"))
        return (assign, cents)
      }
    }
    val pts = unitPoints(df, idCol, embCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var centroids = seedCentroids(pts, k)
    var assign: DataFrame = null
    for (_ <- 1 to iters) {
      assign = assignTo(pts, centroids)
      centroids = updateCentroids(assign, dim)
    }
    (assign, centroids)
  }

  /** Grouped [[assignTo]]: nearest centroid within each point's group
    * (product-quantization subspaces train side by side — `pts` and
    * `centroids` both carry a `g` column). Same math per group. */
  def assignToGrouped(pts: DataFrame, centroids: DataFrame): DataFrame = {
    if (graft.operators.SmallGraph.smallEnough(pts, "g", "id")) {
      val spark = pts.sparkSession
      import spark.implicits._
      // Bounded collected codebook (m groups × k × dim longs), assigned
      // per group inside one task.
      val byG = centroids.select(col("g"), col("cid"), col("c")).collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getSeq[Long](2).toArray)))
        .groupBy(_._1).map { case (g, xs) => (g, xs.map(_._2).sortBy(_._1)) }
      // byG.get: a point whose group has no centroid row is DROPPED,
      // matching the distributed inner join on g (ADVICE r16).
      return pts.select(col("g"), col("id"), col("u"))
        .as[(Long, Long, Seq[Long])].coalesce(1)
        .mapPartitions(it => it.flatMap { case (g, id, u) =>
          byG.get(g).map { cents =>
            val out = assignKernel(Iterator((id, u)), cents).next()
            (g, out._1, out._2, out._3, out._4)
          }
        })
        .toDF("g", "id", "u", "cid", "d")
    }
    pts.join(broadcast(centroids), Seq("g"))
      .select(col("g"), col("id"), col("u"), col("cid"),
        dist2(col("u"), col("c")).as("d"))
      .groupBy("g", "id")
      .agg(first(col("u")).as("u"), min(struct(col("d"), col("cid"))).as("m"))
      .select(col("g"), col("id"), col("u"),
        col("m").getField("cid").as("cid"), col("m").getField("d").as("d"))
  }

  /** Grouped [[fit]] over (g, id, u) unit points: every group trains its
    * own k centroids, but ALL groups share each round's two aggregate
    * passes — for m PQ subspaces this is m× fewer (tiny, scheduler-
    * bound) jobs than m separate fits, with per-group math identical to
    * [[fit]] (the per-group md5 seed order equals the per-slice
    * TakeOrdered; the generated oracle is unchanged). Measured 6.6 s →
    * ~2 s for q_llm_ann_pq at sf0.1. */
  def fitGrouped(pts: DataFrame, k: Int, iters: Int, dim: Int): (DataFrame, DataFrame) = {
    require(k >= 1 && iters >= 1)
    // COST gate: all groups' Lloyd runs in ONE executor task (same
    // shared (md5(id), id) seed order per group).
    if (graft.operators.SmallGraph.smallEnough(pts, "g", "id")) {
      val spark = pts.sparkSession
      import spark.implicits._
      val in = pts.select(col("g"), col("id"), col("u"))
        .as[(Long, Long, Seq[Long])]
      val assign = in.coalesce(1)
        .mapPartitions(it => lloydAssignGroupedKernel(it, k, iters))
        .toDF("g", "id", "u", "cid", "d")
      val cents = in.coalesce(1)
        .mapPartitions(it => lloydCentroidsGroupedKernel(it, k, iters))
        .toDF("g", "cid", "c")
      return (assign, cents)
    }
    val p = pts.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var centroids = p.withColumn("h", md5(col("id").cast("string")))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("g")
          .orderBy(col("h"), col("id"))))
      .filter(col("rn") <= k)
      .select(col("g"), (col("rn") - 1).cast("long").as("cid"), col("u").as("c"))
    var assign: DataFrame = null
    for (_ <- 1 to iters) {
      assign = assignToGrouped(p, centroids)
      centroids = assign.groupBy("g", "cid")
        .agg(count(lit(1)).as("n"),
          array((0 until dim).map(i => sum(element_at(col("u"), i + 1))): _*).as("s"))
        .select(col("g"), col("cid"),
          transform(col("s"), s => floor(s.cast("double") / col("n")).cast("long"))
            .as("c"))
    }
    (assign, centroids)
  }

  /** Generated DuckDB replay of [[fit]] — SQL kept in lockstep with the
    * Scala by construction (the PageRank/ZOrder generated-oracle
    * pattern). Emits CTEs {p}u0, {p}c0, {p}a1, {p}c1, …, {p}a_iters,
    * {p}c_iters over `table`; the caller appends the final SELECT (and
    * the leading `WITH `/`WITH RECURSIVE ` keyword via `lead` — pass ""
    * to chain multiple generated blocks, e.g. one per PQ subspace, in a
    * single WITH clause). `sliceFrom` trains on the 1-based inclusive
    * sub-range [sliceFrom+1, sliceFrom+dim] of the embedding — the
    * product-quantization subspace split. */
  def oracleCtes(table: String, idCol: String, embCol: String,
                 k: Int, iters: Int, dim: Int,
                 prefix: String = "", lead: String = "WITH ",
                 sliceFrom: Int = 0, preQuantized: Boolean = false): String = {
    val d1 = dim + 1
    val p = prefix
    val sliced =
      if (sliceFrom == 0 && dim > 0) s"$embCol[1:$dim]"
      else s"$embCol[${sliceFrom + 1}:${sliceFrom + dim}]"
    // preQuantized: the column already holds integer units (e.g. PQ
    // residuals, which are exact integer differences) — no re-quantize.
    val unitsSql =
      if (preQuantized) sliced
      else s"""list_transform($sliced, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5)
              AS BIGINT))"""
    def distSql(pt: String, c: String): String =
      s"list_sum(list_transform(range(1, $d1), i -> ($pt.u[i] - $c.c[i]) * ($pt.u[i] - $c.c[i])))"
    val sb = new StringBuilder
    sb.append(
      s"""$lead${p}u0 AS (SELECT $idCol AS id,
            $unitsSql AS u FROM $table),
          ${p}c0 AS (SELECT row_number() OVER (ORDER BY md5(CAST(id AS VARCHAR)), id) - 1
                   AS cid, u AS c
                 FROM ${p}u0
                 ORDER BY md5(CAST(id AS VARCHAR)), id LIMIT $k)""")
    for (i <- 1 to iters) {
      sb.append(
        s""",
          ${p}a$i AS (SELECT id, u, cid, d FROM (
            SELECT id, u, cid, d,
              row_number() OVER (PARTITION BY id ORDER BY d, cid) AS rk
            FROM (SELECT pt.id, pt.u, c.cid, ${distSql("pt", "c")} AS d
                  FROM ${p}u0 pt, ${p}c${i - 1} c) x) y WHERE rk = 1),
          ${p}c$i AS (SELECT cid,
                    list(CAST(floor(CAST(s AS DOUBLE) / n) AS BIGINT) ORDER BY dim) AS c
                  FROM (SELECT cid, dim, SUM(u[dim]) AS s, COUNT(*) AS n
                        FROM ${p}a$i, range(1, $d1) r(dim) GROUP BY cid, dim)
                  GROUP BY cid)""")
    }
    sb.toString
  }
}
