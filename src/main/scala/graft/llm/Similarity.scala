package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — a single map + TakeOrdered (no
  * shuffle of the corpus, no crossJoin; the query vector is a broadcast
  * literal). Scale paths: IVF-style partition restriction and random-
  * hyperplane LSH bucketing, both of which cut the scanned fraction while
  * keeping the same per-row kernel. */
object Similarity {

  /** Deterministic half-up rounding on doubles: floor(x*10^n + 0.5)/10^n.
    * Unlike ROUND (whose decimal/double semantics differ across engines),
    * this is plain IEEE arithmetic — bit-identical in any engine. */
  def roundHalfUp(c: Column, digits: Int): Column = {
    val p = math.pow(10, digits)
    floor(c * p + 0.5) / p
  }

  /** Cosine similarity between an embedding column and a literal query
    * vector, computed in double precision, index order (deterministic).
    * Unrolled to element_at term sums — the query length is always known,
    * and the unrolled form stays in whole-stage codegen while summing in
    * the exact same left-fold order as a lambda fold (bit-identical). */
  def cosineToQuery(emb: Column, query: Seq[Double]): Column = {
    def e(i: Int) = element_at(emb, i + 1).cast("double")
    val dot = query.indices.map(i => e(i) * lit(query(i))).reduce(_ + _)
    val na = sqrt(query.indices.map(i => e(i) * e(i)).reduce(_ + _))
    val nb = math.sqrt(query.map(x => x * x).sum)
    when(na === 0.0, lit(0.0)).otherwise(dot / (na * lit(nb)))
  }

  /** Cosine between two embedding columns (for pairwise verification). */
  def cosine(a: Column, b: Column): Column = {
    val ad = transform(a, x => x.cast("double"))
    val bd = transform(b, x => x.cast("double"))
    val dot = aggregate(zip_with(ad, bd, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val na = sqrt(aggregate(transform(ad, x => x * x), lit(0.0), (acc, x) => acc + x))
    val nb = sqrt(aggregate(transform(bd, x => x * x), lit(0.0), (acc, x) => acc + x))
    when(na === 0.0 || nb === 0.0, lit(0.0)).otherwise(dot / (na * nb))
  }

  /** Cosine between two columns on verification hot paths, via the native
    * loop kernel [[graft.expressions.FloatDot]]. History: this was first a
    * zip_with/aggregate lambda (interpreted per element), then an unrolled
    * `element_at` term sum (codegen'd, but a single giant expression tree
    * that cannot be method-split — fused with a sort/join stage at dim 64
    * it blew Janino's 64 KB method limit and dropped the stage to
    * interpreted eval). The loop kernel accumulates in the same ascending
    * index order as both prior forms, so results are bit-identical. `dim`
    * is ENFORCED, not documentation: the original element_at form returned
    * NULL past the array end, so a shorter-than-declared array nulled out;
    * the loop kernel alone would happily return a truncated-but-plausible
    * cosine. The size guard restores the length-assertion semantics. */
  def cosineUnrolled(a: Column, b: Column, dim: Int): Column = {
    val na = sqrt(dot(a, a))
    val nb = sqrt(dot(b, b))
    when(size(a) =!= dim || size(b) =!= dim, lit(null).cast("double"))
      .when(na === 0.0 || nb === 0.0, lit(0.0))
      .otherwise(dot(a, b) / (na * nb))
  }

  /** Native loop dot product (the single shared Column entry point for
    * [[graft.expressions.FloatDot]] — every similarity kernel routes
    * through here so a contract change lands in one place). */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(graft.expressions.FloatDot(
      Bridge.expression(a), Bridge.expression(b)))
  }

  /** Brute-force cosine top-k: scan → score → TakeOrderedAndProject.
    * The full-corpus baseline every ANN variant is measured against. */
  def bruteForceTopK(corpus: DataFrame, embCol: String, idCol: String,
                     query: Seq[Double], k: Int): DataFrame =
    corpus.select(col(idCol),
        roundHalfUp(cosineToQuery(col(embCol), query), 6).as("cosine_sim"))
      .orderBy(col("cosine_sim").desc, col(idCol))
      .limit(k)

  /** Batch ANN: top-k per query over MANY queries at once — the production
    * shape (scoring requests arrive in batches, not one at a time). The
    * query set broadcasts (it is small by definition); the corpus is scored
    * once per (row, query) with the codegen'd unrolled kernel, and the
    * per-query top-k resolves through a rank window that Spark prunes to k
    * rows per partition (WindowGroupLimit) BEFORE the one shuffle on query
    * id — shuffle volume is tasks × queries × k, independent of corpus
    * size. */
  def topKPerQuery(corpus: DataFrame, embCol: String, idCol: String,
                   queries: DataFrame, qIdCol: String, qEmbCol: String,
                   k: Int, dim: Int): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .select(col(qIdCol), col(idCol),
        roundHalfUp(cosineUnrolled(col(embCol), col(qEmbCol), dim), 6).as("cosine_sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(qIdCol)).orderBy(col("cosine_sim").desc, col(idCol))
    scored.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k).drop("_rn")
  }

  /** Per-row symmetric int8 quantization scale: max |e_i| / 127. Storing
    * embeddings as int8 + one double cuts ANN storage (and scan bytes) 4×;
    * cosine is scale-invariant, so quantized search needs no dequantize. */
  def int8Scale(emb: Column, dim: Int): Column =
    greatest((0 until dim).map(i => abs(element_at(emb, i + 1).cast("double"))): _*) / 127.0

  /** Quantize to int8 values (as ints) with engine-portable half-up
    * rounding; pass the precomputed [[int8Scale]] column. */
  def quantizeInt8(emb: Column, scale: Column, dim: Int): Column =
    array((0 until dim).map { i =>
      when(scale === 0.0, lit(0))
        .otherwise(floor(element_at(emb, i + 1).cast("double") / scale + 0.5))
        .cast("int")
    }: _*)

  /** IVF-style search: restrict the scan to one coarse partition (here the
    * pre-assigned cluster/label column; in production the nearest centroid's
    * inverted list). At 100 TB this is the difference between scanning the
    * corpus and scanning one partition-pruned slice of it. */
  def ivfTopK(corpus: DataFrame, embCol: String, idCol: String,
              partitionCol: String, partitionValue: Int,
              query: Seq[Double], k: Int): DataFrame =
    bruteForceTopK(corpus.filter(col(partitionCol) === partitionValue),
      embCol, idCol, query, k)

  /** Deterministic sign-LSH hyperplanes, derived per component from
    * md5("plane:i:j"): the first 13 hex chars (52 bits) scale to [-1, 1).
    * md5 — not an LCG — so an external SQL engine can replay the exact
    * plane values (`('0x' || substr(md5(...), 1, 13))::BIGINT`), which is
    * what upgrades the LSH-family queries from rows-only to oracle-checked.
    * Uniform per-component values are all sign-LSH needs (the sign of a
    * dot against a random direction); cryptographic md5 bits are as
    * uniform as the LCG stream they replace. */
  def hyperplanes(numPlanes: Int, dim: Int): Seq[Seq[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def component(i: Int, j: Int): Double = {
      val hex = md.digest(s"plane:$i:$j".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(13)
      java.lang.Long.parseLong(hex, 16).toDouble / 4503599627370496.0 * 2.0 - 1.0
    }
    Seq.tabulate(numPlanes)(i => Seq.tabulate(dim)(j => component(i, j)))
  }

  /** Sign-LSH bucket id: one bit per hyperplane (sign of the dot product).
    * Each dot rides the native loop kernel
    * ([[graft.expressions.FloatDot]] against a literal double-array plane)
    * rather than an unrolled `element_at` term sum: the unrolled form is a
    * single giant expression tree that codegen cannot method-split, and
    * with 8 planes × 64 dims it blew Janino's 64 KB limit whenever a sort
    * or join stage fused it (observed: the SemDeDup sub-bucket window
    * dropped its whole stage to interpreted eval). The kernel accumulates
    * in the same ascending index order, so bucket ids are bit-identical
    * to both prior formulations. */
  def lshBucket(emb: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dot(emb, lit(p.toArray)) >= 0, shiftleft(lit(1L), i))
        .otherwise(lit(0L))
    }.reduce(_ + _)

  /** LSH-bucketed ANN: score only rows whose bucket matches the query's.
    * Recall/latency tradeoff via numPlanes (fewer planes → bigger buckets). */
  def lshTopK(corpus: DataFrame, embCol: String, idCol: String,
              query: Seq[Double], k: Int, numPlanes: Int = 8): DataFrame = {
    val planes = hyperplanes(numPlanes, query.length)
    val queryBucket = planes.zipWithIndex.map { case (p, i) =>
      val dot = p.zip(query).map { case (a, b) => a * b }.sum
      if (dot >= 0) 1L << i else 0L
    }.sum
    bruteForceTopK(
      corpus.filter(lshBucket(col(embCol), planes) === queryBucket),
      embCol, idCol, query, k)
  }

  /** Embedding-cosine near-duplicate pairs at scale: LSH-bucket both sides,
    * self-join within buckets only, verify with exact cosine ≥ threshold. */
  def cosineNearDuplicates(corpus: DataFrame, embCol: String, idCol: String,
                           threshold: Double, numPlanes: Int = 12,
                           maxBucket: Int = 2000, dim: Int = 64): DataFrame = {
    val planes = hyperplanes(numPlanes, dim)
    // Norms are precomputed per ROW (2N sqrt-sums) rather than per pair
    // (2P, with P >> N after the self-join) — same bits, ~half the pair-
    // verification cost at scale. Dot products ride the native loop kernel
    // (see cosineUnrolled's history note — the unrolled tree blew codegen's
    // method limit once fused into the self-join stage).
    val bucketed = corpus.select(col(idCol).as("id"), col(embCol).as("emb"),
      sqrt(dot(col(embCol), col(embCol))).as("_norm"),
      lshBucket(col(embCol), planes).as("bucket"))
    val bounded = bucketed.withColumn("_n",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("bucket")))
      .filter(col("_n") <= maxBucket).drop("_n")
    val sim = when(col("l._norm") === 0.0 || col("r._norm") === 0.0, lit(0.0))
      .otherwise(dot(col("l.emb"), col("r.emb")) / (col("l._norm") * col("r._norm")))
    bounded.as("l").join(bounded.as("r"),
        col("l.bucket") === col("r.bucket") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        roundHalfUp(sim, 6).as("cosine_sim"))
      .filter(col("cosine_sim") >= threshold)
  }
}
