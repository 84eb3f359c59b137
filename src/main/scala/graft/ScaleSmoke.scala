package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llm.{Dedup, Similarity}

/** Scale stress main: blow the documents/embeddings corpora up ~20× with
  * deterministic mutations and run the bucketed near-dup paths, printing
  * row counts and timings. Catches quadratic cliffs the sf-sized bench
  * can't see (bucket blowup, lambda interpretation, plan recomputation). */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "20").toInt
    val spark = Sessions.local(defaultCpus = 32)

    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scale] $name: ${(System.nanoTime() - t0) / 1e9}%.1fs")
      r
    }

    // ~factor× documents: replicas get a replica-indexed token appended, so
    // replicas of the same doc are mutual near-duplicates.
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val big = docs.crossJoin(
        spark.range(factor).withColumnRenamed("id", "rep"))
      .select((col("doc_id") * factor + col("rep")).as("doc_id"),
        concat(col("text"), lit(" replica token "), col("rep").cast("string")).as("text"))
      .persist()
    println(s"[scale] corpus: ${big.count()} docs")

    val pairsDf = Dedup.minhashNearDuplicates(big, "doc_id", "text",
      shingleSize = 3, numPerms = 64, bands = 16, threshold = 0.5).persist()
    val pairs = timed("minhash-lsh near-dup")(pairsDf.count())
    println(s"[scale] minhash pairs: $pairs")

    // pairs -> components -> representatives: ~1M edges over ~100k nodes;
    // replica clusters are dense, so the label loop should converge in a
    // handful of rounds regardless of corpus size.
    val reps = timed("connected components + cluster dedup")(
      Dedup.dedupByCluster(big.select(col("doc_id")), "doc_id",
          pairsDf.select(col("id_a"), col("id_b")))
        .filter(col("is_representative")).count())
    println(s"[scale] representatives kept: $reps")

    val sims = timed("simhash near-dup")(
      Dedup.simhashNearDuplicates(big, "doc_id", "text", maxDist = 3).count())
    println(s"[scale] simhash pairs: $sims")

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val bigEmb = emb.crossJoin(spark.range(factor).withColumnRenamed("id", "rep"))
      .select((col("vec_id") * factor + col("rep")).as("vec_id"),
        transform(col("embedding"),
          x => x + (col("rep") % 7).cast("float") * 1e-4f).as("embedding"))
      .persist()
    println(s"[scale] embeddings: ${bigEmb.count()} vectors")

    val cosPairs = timed("cosine near-dup (sign-LSH bucketed)")(
      Similarity.cosineNearDuplicates(bigEmb, "embedding", "vec_id",
        threshold = 0.9999, numPlanes = 10, maxBucket = 20000).count())
    println(s"[scale] cosine pairs: $cosPairs")

    // SemDeDup at 20×: the quadratic step must track Σ|cluster|², not
    // corpus² — k scales with the corpus (64 here vs 16 at sf-scale) so
    // mean cluster size stays ~constant; the replica blow-up plants ~190
    // true semantic dups per base vector for the within-cluster cosine to
    // find.
    val semReps = timed("semdedup (k-means gate + within-cluster cosine)")(
      graft.llm.SemDedup.semDedup(bigEmb, "embedding", "vec_id",
          k = 64, threshold = 0.9999)
        .filter(col("is_representative")).count())
    println(s"[scale] semdedup representatives kept: $semReps")

    // The DETERMINISTIC bounded gate (the registered q_llm_semdedup shape,
    // round 14) at the same 20× corpus: k stays FIXED at 16, so the cap +
    // sign-LSH sub-split + chain degrade carry the whole scale load — with
    // ~factor near-identical replicas per base vector, every cell blows
    // past maxCluster and the mega-groups land in the chain branch. The
    // witness checks pair mass stays ~linear (the wavegate PairMassSweep
    // contract at 20× instead of 4×) before running the pairing itself.
    val detEmb = bigEmb.select(col("vec_id"),
      org.apache.spark.sql.functions.transform(col("embedding"),
        x => x.cast("double")).as("embedding"))
    val (_, detCents) = timed("det semdedup: DetKMeans fit (k=16 fixed)")(
      graft.llm.DetKMeans.fit(detEmb, "vec_id", "embedding", 16, 2, 64))
    val detCell = detEmb.select(col("vec_id").as("id"), col("embedding"))
      .join(graft.llm.DetKMeans.assignTo(
          graft.llm.DetKMeans.unitPoints(detEmb, "vec_id", "embedding"),
          detCents)
        .select(col("id"), col("u"), col("cid")), "id")
      .persist()
    val nDet = detCell.count()
    val detMass = graft.llm.SemDedup.detPairMass(detCell, maxCluster = 40)
    println(s"[scale] det semdedup pair mass: $detMass over $nDet vectors")
    require(detMass <= 60L * nDet,
      s"bounded-gate pair mass super-linear at 20x: $detMass for $nDet " +
        "vectors (cap/sub-split stopped binding)")
    val detPairs = timed("det semdedup: bounded pairing (cap+LSH+chain)")(
      graft.llm.SemDedup.detBoundedPairs(detCell, "id", "embedding",
        threshold = 0.9999, dim = 64, maxCluster = 40).count())
    println(s"[scale] det semdedup pairs: $detPairs")
    detCell.unpersist()

    // Round-5 curation ops at the blown-up corpus: decontamination must
    // stay linear in corpus grams (benchmark side broadcast), the inverted
    // index must stay bounded per term (pre-shuffle posting cap with
    // "replica"/"token" present in EVERY doc — the stopword stress), and
    // packing must stay shuffle-light with exact global offsets.
    val contaminated = timed("decontamination (5-gram vs 1% benchmark)")(
      graft.llm.Decontaminate.contamination(big, "doc_id", "text",
        big.filter(pmod(col("doc_id"), lit(97)) === 0), "text", n = 5)
        .filter(col("contaminated")).count())
    println(s"[scale] contaminated docs: $contaminated")

    val terms = timed("inverted index (df + capped postings)")(
      graft.llm.Index.invertedIndex(big, "doc_id", "text", maxPostings = 20).count())
    println(s"[scale] distinct terms: $terms")

    val seqs = timed("sequence packing (2048-token chop)")(
      graft.llm.Pack.packSequences(big, "doc_id", "text", seqLen = 2048)
        .agg(max(col("seq_id"))).head.getLong(0) + 1)
    println(s"[scale] packed sequences: $seqs")

    // Round-6 curation ops. Span dedup is the deliberate hot-key stress:
    // every replica of a base doc shares ALL its interior 10-token spans,
    // so each span value appears ~factor times corpus-wide — the
    // WindowGroupLimit partial rank-limit is what keeps those hot span
    // keys from shipping more than per-partition firsts to the shuffle.
    val spanKept = timed("span dedup (10-token spans, first-wins)")(
      Dedup.dedupSpans(big, "doc_id", "text", spanTokens = 10)
        .agg(sum(col("n_spans_kept"))).head.getLong(0))
    println(s"[scale] spans kept: $spanKept")

    val vocab = timed("vocabulary top-100")(
      graft.llm.TextAnalysis.topVocabulary(big, "text", n = 1, k = 100).count())
    println(s"[scale] vocab rows: $vocab")

    val lmModel = timed("bigram LM fit")(graft.llm.NgramLm.fit(big, "text"))
    val lmScored = timed("bigram LM score (broadcast model)")(
      graft.llm.NgramLm.scoreAvgLogProb(big, "doc_id", "text", lmModel).count())
    println(s"[scale] LM-scored docs: $lmScored (V=${lmModel.vocabSize})")

    // Round-6 ops. Line dedup at 20× is the boilerplate hot-key stress in
    // its pure form: the planted banner line appears in EVERY doc, so the
    // first-occurrence window's pre-shuffle rank-limit is what bounds it.
    val linesKept = timed("line dedup (boilerplate banner in every doc)")(
      Dedup.dedupLines(
          big.select(col("doc_id"), concat(col("text"),
            lit("\nall rights reserved cookie banner")).as("text")),
          "doc_id", "text")
        .agg(sum(col("n_lines_kept"))).head.getLong(0))
    println(s"[scale] lines kept: $linesKept")

    // BPE: training cost is bounded by the vocab table regardless of the
    // corpus blow-up; encode is scan-side only.
    val bpeMerges = timed("bpe train (200 merges, bounded word table)")(
      graft.llm.Bpe.train(big, "text", numMerges = 200))
    val bpeToks = timed("bpe encode (native expression)")(
      big.select(explode(graft.llm.Bpe.encode(col("text"), bpeMerges))).count())
    println(s"[scale] bpe tokens: $bpeToks (merges=${bpeMerges.size})")

    // Round-6 additions. Heavy hitters: counter tables combine map-side,
    // so the shuffle ships one O(cap) summary per partition no matter how
    // far the corpus blows up. HTML extraction / compression ratio /
    // fixed chunking are shuffle-free scans — their timings here pin the
    // per-row kernel cost at 20×.
    val hhAgg = udaf(graft.operators.HeavyHitters.TopKAgg(cap = 4096, k = 20))
    val hhTop = timed("heavy hitters (MG summary, map-side combine)")(
      big.select(explode(graft.llm.TextAnalysis.tokens(col("text"))).as("tok"))
        .agg(hhAgg(col("tok"))).head.getSeq[Any](0).size)
    println(s"[scale] heavy-hitter rows: $hhTop")

    val htmlChars = timed("html extract (regex cascade)")(
      big.select(sum(length(graft.llm.TextAnalysis.htmlToText(
          concat(lit("<html><body><p>"), col("text"),
            lit("</p><script>x &amp;= 1;</script></body></html>"))))))
        .head.getLong(0))
    println(s"[scale] extracted chars: $htmlChars")

    val flagged = timed("compression ratio (deflate kernel)")(
      big.filter(graft.llm.TextAnalysis.compressionRatio(col("text")) < 0.3)
        .count())
    println(s"[scale] low-ratio docs: $flagged")

    val chunks = timed("fixed-window chunking (128/16 overlap)")(
      graft.llm.Pack.fixedChunks(big, "doc_id", "text",
        chunkSize = 128, overlap = 16).count())
    println(s"[scale] fixed chunks: $chunks")

    // PageRank over a 20×-denser co-replica graph: edges link each doc to
    // its base-replica siblings' neighbors via shared (doc_id / factor).
    val liEdges = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select((col("l_suppkey") * 2).as("src"), (col("l_partkey") * 2 + 1).as("dst"))
    val prEdges = liEdges.union(
      liEdges.select(col("dst").as("src"), col("src").as("dst")))
    val prTop = timed("pagerank (10 iterations, integer units)")(
      graft.operators.PageRank.run(prEdges, "src", "dst", iterations = 10)
        .orderBy(col("rank").desc).limit(5).collect())
    println(s"[scale] pagerank top node: ${prTop.head.get(0)} @ ${prTop.head.get(1)}")

    // Borůvka MSF with the driver-Kruskal path DISABLED: the 100 TB
    // contract is the distributed component-merge rounds (hook +
    // pointer-jumping), and this is the only gate that runs them at a
    // corpus-sized edge relation (the sf0.01 oracle and sf0.1 bench both
    // sit under the 2²⁰ Kruskal threshold by design). Weights are a
    // deterministic residue so the (d, lo, hi) order still uniquely pins
    // the forest; the node/edge/weight line is the reproducibility
    // witness.
    val msfEdgesIn = liEdges
      .select(least(col("src"), col("dst")).as("lo"),
        greatest(col("src"), col("dst")).as("hi"))
      .filter(col("lo") < col("hi")).distinct()
      .select(col("lo"), col("hi"),
        pmod(col("lo") * 31 + col("hi"), lit(997L)).as("d"))
    val msfStats = timed("boruvka msf (distributed rounds, no Kruskal)")(
      graft.operators.Boruvka.msfEdges(msfEdgesIn, maxDriverEdges = 0L)
        .agg(count(lit(1)), sum(col("d"))).collect().head)
    println(s"[scale] msf edges: ${msfStats.get(0)} weight ${msfStats.get(1)}")

    // Round-6 aggregate reports at 20×: each one's scale contract is that
    // the corpus relation is NEVER broadcast — only KB-scale summaries
    // (per-source totals, per-type medians, tercile thresholds) are. The
    // blown-up corpus is far past any broadcast threshold, so a plan that
    // silently depended on the sf-sized table being broadcastable fails
    // loudly here instead of at 100 TB.
    val wc20 = graft.llm.TextAnalysis.tokenCount(col("text")).cast("long")
    val bucket20 = when(wc20 <= 16, 16L).when(wc20 <= 32, 32L)
      .when(wc20 <= 64, 64L).when(wc20 <= 128, 128L).when(wc20 <= 256, 256L)
      .when(wc20 <= 512, 512L).otherwise(1024L)
    val lbRows = timed("length buckets (groupBy over 20x corpus)")(
      big.select(wc20.as("wc"), bucket20.as("bucket"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_docs"), max("wc").as("max_tokens"),
          sum("wc").as("sum_tokens")).count())
    println(s"[scale] length buckets: $lbRows")

    // Temperature mix: the window relation is per-SOURCE (~10 rows) even
    // at 20× — the single-partition window stays a non-hazard by design.
    val srcField = pmod(col("doc_id"), lit(20)).cast("string")
    val tmRows = timed("temperature mix (per-source totals + unit renorm)")(
      big.groupBy(srcField.as("source"))
        .agg(count(lit(1)).as("n_docs"), sum(wc20).as("tokens"))
        .withColumn("total", sum(col("tokens")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(lit(0))))
        .withColumn("qu", floor(sqrt(col("tokens").cast("double")
          / col("total").cast("double")) * 1e12 + 0.5).cast("long"))
        .count())
    println(s"[scale] temperature-mix sources: $tmRows")

    // Robust outliers over 20× events: two exact-percentile passes with
    // tiny per-type medians broadcast back — no window over the relation.
    val ev20 = spark.read.parquet(s"$sfDir/events.parquet")
      .crossJoin(spark.range(factor).withColumnRenamed("id", "rep"))
      .select(col("event_type"),
        (col("value") + col("rep").cast("double") * 1e-6).as("value"))
    val med20 = ev20.groupBy("event_type")
      .agg(expr("percentile(value, 0.5)").as("med"))
    val dev20 = ev20.join(broadcast(med20), Seq("event_type"))
      .withColumn("absdev", abs(col("value") - col("med")))
    val mad20 = dev20.groupBy("event_type")
      .agg(expr("percentile(absdev, 0.5)").as("mad"))
    val outRows = timed("robust outliers (median/MAD, broadcast summaries)")(
      dev20.join(broadcast(mad20), Seq("event_type"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("absdev") > col("mad") * 4.4478, 1L).otherwise(0L))
            .as("n_outliers")).count())
    println(s"[scale] outlier event types: $outRows")

    // CCNet buckets: LM fit reads a bounded vocab relation; scoring is a
    // broadcast-model scan; terciles are a 3-double broadcast.
    val ccScored = graft.llm.NgramLm.scoreAvgLogProb(
      big, "doc_id", "text", lmModel)
    val ccTh = ccScored.agg(
      expr("percentile(avg_logp, 2.0/3)").as("t_high"),
      expr("percentile(avg_logp, 1.0/3)").as("t_low"))
    val ccRows = timed("ccnet buckets (broadcast terciles over 20x)")(
      ccScored.crossJoin(broadcast(ccTh))
        .withColumn("bucket",
          when(col("avg_logp") >= col("t_high"), "head")
            .when(col("avg_logp") >= col("t_low"), "middle")
            .otherwise("tail"))
        .groupBy("bucket").agg(count(lit(1)).as("n_docs")).count())
    println(s"[scale] ccnet buckets: $ccRows")

    // Round-7 ops. Blocklist: the automaton cost is O(|text|) per doc
    // independent of pattern count — a 1000-phrase blocklist at 20× must
    // time like the 10-phrase bench query scaled by corpus size only.
    val bigPatterns = (0 until 1000).map(i => s"phrase$i never present") ++
      Seq("replica token", "slow query")
    val blRows = timed("blocklist (1002-phrase automaton, one pass)")(
      graft.llm.Blocklist.report(big, "text", bigPatterns)
        .filter(col("n_docs_matched") > 0).count())
    println(s"[scale] blocklist patterns with hits: $blRows")

    // Corpus overlap: 64 min-agg buffers partial-aggregate map-side, so
    // the shuffle ships one candidate per partition per source even when
    // the gram relation is 20× — and replica sources share base vocab, so
    // estimates sit high (the interesting regime).
    val bigSrc = big.withColumn("source",
      pmod(col("doc_id"), lit(8)).cast("string"))
    val ovRows = timed("corpus overlap (md5-minhash signatures at 20x)")(
      graft.llm.CorpusSim.overlapMatrix(bigSrc, "source", "text",
        n = 3, numPerms = 64).count())
    println(s"[scale] overlap pairs: $ovRows")

    // Novelty: replicas duplicate every base gram ~factor times, so the
    // df relation is the hot-gram stress; the two-agg shape must stay
    // key-partitioned with no broadcast of the corpus.
    val nvLow = timed("novelty (share of corpus-unique 5-grams)")(
      graft.llm.CorpusSim.noveltyScores(big, "doc_id", "text", n = 5)
        .filter(col("novelty") < 0.1).count())
    println(s"[scale] low-novelty docs: $nvLow")

    // Edit-distance join at 40k near-identical strings: every replica
    // family is a dense distance-1 clique on its suffix digit — the
    // workload that degenerates q-gram filtering (shared rare grams at
    // shared positions → family² candidates; measured 83.6 s before the
    // deletion-neighborhood rewrite). Variant buckets only hold strings
    // agreeing outside the deleted char, so candidates track true pairs.
    val custNames = spark.read.parquet(s"$sfDir/customer.parquet")
      .filter(col("c_custkey") <= 2000)
      .crossJoin(spark.range(factor).withColumnRenamed("id", "rep"))
      .select((col("c_custkey") * factor + col("rep")).as("id"),
        concat(col("c_name"), lit("-"), pmod(col("rep"), lit(10)).cast("string"))
          .as("s"))
    val fjPairs = timed("ed-join (deletion-neighborhood variants, 40k strings)")(
      graft.operators.EditDistanceJoin.selfJoin(custNames, "id", "s",
        maxDist = 1).count())
    println(s"[scale] distance-1 pairs: $fjPairs")

    // Deterministic k-means at 100k vectors: per iteration one broadcast
    // of k·64 longs, one row-local scoring pass, two partial/final agg
    // pairs — the shuffle never carries the points.
    val kmStats = timed("det k-means (k=8, 3 integer Lloyd rounds, 100k vecs)")(
      graft.llm.DetKMeans.fit(bigEmb, "vec_id", "embedding",
        k = 8, iters = 3, dim = 64)._1
        .groupBy("cid").agg(count(lit(1))).count())
    println(s"[scale] det k-means clusters: $kmStats")

    // Grouped residual-PQ training at 320k (group, point) rows: all 8
    // subspace codebooks share each round's two aggregate passes, and
    // the shuffle still never carries the vectors.
    val pqPts = bigEmb.select(col("vec_id").cast("long").as("id"),
        posexplode(array((0 until 8).map(s =>
          slice(col("embedding"), s * 8 + 1, 8)): _*)).as(Seq("g", "sub")))
      .select(col("g").cast("long").as("g"), col("id"),
        graft.llm.DetKMeans.toUnits(col("sub")).as("u"))
    val pqCodebooks = timed("det grouped PQ fit (8 codebooks, 2 rounds, 320k rows)")(
      graft.llm.DetKMeans.fitGrouped(pqPts, k = 16, iters = 2, dim = 8)
        ._2.count())
    println(s"[scale] det PQ codebook rows: $pqCodebooks")

    // Round-8 ops. Triangles under power-law skew: the base co-purchase
    // graph (1.2M edges) plus a planted HUB wired to every node — the
    // worst case for id-ordered wedge joins (hub wedges = deg²/2 ≈ 20B).
    // Degree orientation makes the hub a wedge TARGET (out-degree 0), so
    // the hub run must time like the base run, not quadratically worse.
    val li8 = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
    val coEdges = li8.as("a").join(li8.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .select(col("a.p").as("x"), col("b.p").as("y"))
      .persist()
    val triBase = timed("triangles (1.2M-edge co-purchase graph)")(
      graft.operators.Triangles.triangles(coEdges, "x", "y").count())
    println(s"[scale] base triangles: $triBase")
    val hubEdges = coEdges.select(col("x").as("node"))
      .unionAll(coEdges.select(col("y").as("node"))).distinct()
      .select(lit(-1L).as("x"), col("node").as("y"))
    val triHub = timed("triangles (+hub wired to all 200k nodes)")(
      graft.operators.Triangles.triangles(
        coEdges.unionAll(hubEdges), "x", "y").count())
    println(s"[scale] hub triangles: $triHub")

    // Round-10: k-core peeling at the exact BENCH shape (k=8, rounds=6,
    // the same co-purchase graph q_graph_kcore runs) — the one heavy
    // bench query previously missing from this suite. Late rounds shrink
    // to KB scale and coalesce below ~500k edges/partition, so the
    // scheduler floor, not task count, bounds the tail.
    val kcoreRows = timed("kcore peel (k=8, rounds=6, bench shape)")(
      graft.operators.KCore.peelSummary(
        graft.operators.Triangles.canonical(coEdges, "x", "y"),
        k = 8, rounds = 6).collect())
    println(s"[scale] kcore rounds: ${kcoreRows.map(r =>
      s"${r.getLong(0)}:${r.getLong(1)}n/${r.getLong(2)}e").mkString(" ")}")

    // Round-10: label propagation at the exact BENCH shape (rounds=3,
    // same co-purchase graph). 200k nodes sit under the 2M broadcast
    // gate, so each round must run as broadcast-join + exchange-free
    // aggregates over the n-pre-partitioned neighbor relation; the
    // summaries evaluate in ONE deferred job.
    val lpaRows = timed("label propagation (3 rounds, bench shape)")(
      graft.operators.LabelProp.propagateSummary(
        graft.operators.Triangles.canonical(coEdges, "x", "y"),
        rounds = 3).collect())
    println(s"[scale] lpa rounds: ${lpaRows.sortBy(_.getLong(0)).map(r =>
      s"${r.getLong(0)}:${r.getLong(1)}c/${r.getLong(2)}max").mkString(" ")}")

    // Round-10: k-truss at the bench shape (k=4, rounds=3, the 1/16
    // modulus subgraph) — each round is a full degree-oriented triangle
    // pass, so the suite proves the per-round support computation holds
    // no quadratic wedge cliff on the skewed co-purchase structure.
    val trussRows = timed("ktruss peel (k=4, rounds=3, bench shape)")(
      graft.operators.KTruss.trussSummary(
        graft.operators.Triangles.canonical(
          coEdges.filter(col("x") % 4 === 0 && col("y") % 4 === 0), "x", "y"),
        k = 4, rounds = 3).collect())
    println(s"[scale] ktruss rounds: ${trussRows.sortBy(_.getLong(0)).map(r =>
      s"${r.getLong(0)}:${r.getLong(1)}n/${r.getLong(2)}e").mkString(" ")}")

    // Round-11: BFS at the bench shape (seedsMod=97, 4 hops, same
    // co-purchase graph) — per hop one frontier join + one min-agg over
    // the adjacency, frontier never wider than the node set.
    val bfsRows = timed("bfs hops (seedsMod=97, 4 rounds, bench shape)")(
      graft.operators.Bfs.hopSummary(
        graft.operators.Triangles.canonical(coEdges, "x", "y"),
        seedsMod = 97, rounds = 4).collect())
    println(s"[scale] bfs hops: ${bfsRows.sortBy(_.getLong(0)).map(r =>
      s"${r.getLong(0)}:${r.getLong(1)}").mkString(" ")}")

    // Round-11: harmonic closeness at the bench shape (mod-797 seeds,
    // 3 rounds) — the (seed, node)-pair frontier is |S|×reach; the
    // modulus IS the documented |S| cap (a mod-97 run scored 207 seeds
    // in 57.8 s with no cliff — cost linear in |S| as designed; the
    // bench shape keeps ~26 seeds so the artifact stays balanced).
    val closeRows = timed("harmonic closeness (mod-797 seeds, 3 rounds)")(
      graft.operators.Closeness.harmonicSummary(
        graft.operators.Triangles.canonical(coEdges, "x", "y"),
        seedsMod = 797, rounds = 3).count())
    println(s"[scale] closeness seeds scored: $closeRows")

    // Round-11: clustering coefficient at the bench shape — one extra
    // explode+agg of the triangle relation on top of the already-timed
    // degree-oriented enumeration; must track the triangle pass, not
    // add a second cliff.
    val ccoefRow = timed("clustering coefficient (full co-purchase)")(
      SparkEntry.queries("q_graph_clustering_coef")(spark, sfDir).collect())
    println(s"[scale] clustering coef: ${ccoefRow.map(r =>
      s"${r.getLong(0)}n tr=${r.getLong(1)} t6=${r.getLong(3)}").mkString}")

    // Round-11: link prediction at the bench shape (mod-4 subgraph,
    // degree cap 256) — the wedge relation is Σ min(d,256)² and the cap
    // is exactly what keeps the hub quadratic bounded; timing proves it.
    val lpRows = timed("link prediction (mod-4, cap 256)")(
      SparkEntry.queries("q_graph_link_pred")(spark, sfDir).count())
    println(s"[scale] link-pred candidates ranked: $lpRows")

    // Round-11: HITS on the 20× bipartite purchase graph (~12M edges,
    // disjoint id spaces per replica). The score snapshots stay under the
    // broadcast gate per side, so both half-steps must run broadcast-join
    // + exchange-free aggregate — 20× edges ⇒ ~20× time, no cliff.
    val ordKey = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey").as("l_orderkey"), col("o_custkey"))
    val bip20 = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"))
      .join(ordKey, Seq("l_orderkey"))
      .crossJoin(spark.range(factor.toLong).withColumnRenamed("id", "rep"))
      .select((col("o_custkey") + col("rep") * 100000000L).as("cust"),
        (col("l_partkey") + col("rep") * 100000000L).as("part"))
    val hitsRows = timed("hits (12M-edge bipartite, 2 rounds)")(
      graft.operators.Hits.topHubsAuthorities(bip20, "cust", "part",
        rounds = 2, k = 10).count())
    println(s"[scale] hits top rows: $hitsRows")

    // Round-11: personalized PageRank over 20 disjoint replicas of the
    // bench's symmetrized supplier-part graph (~24M directed edges, 5
    // rounds). Per round: ONE equi-join + one aggregate on the
    // pre-partitioned edge relation; disjoint copies ⇒ linear scaling.
    val li11 = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .crossJoin(spark.range(factor.toLong).withColumnRenamed("id", "rep"))
      .select((col("l_suppkey") * 2 + col("rep") * 100000000L).as("src"),
        (col("l_partkey") * 2 + 1 + col("rep") * 100000000L).as("dst"))
    val pprEdges = li11.unionAll(
      li11.select(col("dst").as("src"), col("src").as("dst")))
    val pprRows = timed("personalized pagerank (24M edges, 5 rounds)")(
      graft.operators.Ppr.run(pprEdges, "src", "dst",
        isSeed = n => n % 200 === 0, iterations = 5).count())
    println(s"[scale] ppr ranked nodes: $pprRows")

    // Round-11: weighted SSSP over the same 24M-edge replicated graph —
    // per round one src-partitioned join + one min-agg; the reached
    // relation grows with the frontier closure, never the node set.
    val ssspEdges = li11.select(col("src"), col("dst"),
        (pmod(col("src") + col("dst"), lit(5)) + 1).as("w"))
      .unionAll(li11.select(col("dst").as("src"), col("src").as("dst"),
        (pmod(col("src") + col("dst"), lit(5)) + 1).as("w")))
    val ssspRows = timed("weighted sssp (24M edges, 4 rounds)")(
      graft.operators.Sssp.distanceSummary(ssspEdges, seedsMod = 200,
        rounds = 4).collect())
    println(s"[scale] sssp rounds: ${ssspRows.sortBy(_.getLong(0)).map(r =>
      s"${r.getLong(0)}:${r.getLong(1)}n").mkString(" ")}")

    // Round-11: deterministic random walks on the 24M-edge graph — each
    // step exchanges only the walk relation (seed-set-sized); the one
    // edge-relation window runs once up front.
    val rwalkRows = timed("random walks (24M edges, 8 steps)")(
      graft.operators.RandomWalk.walkSummary(pprEdges, "src", "dst",
        seedsMod = 40, steps = 8).collect())
    println(s"[scale] rwalk steps: ${rwalkRows.sortBy(_.getLong(0)).map(r =>
      s"${r.getLong(0)}:${r.getLong(1)}w").mkString(" ")}")

    // Round-11: TextRank keywords over the 100k-doc corpus — the window
    // + count build the vocabulary-sized co-occurrence graph (the 20×
    // replica token inflates the vocab by `factor` nodes only), and all
    // 6 weighted-PageRank rounds run on that KB-scale relation.
    val kwWin = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    val kwToks = big.select(col("doc_id"),
        posexplode(graft.llm.TextAnalysis.tokens(col("text")))
          .as(Seq("pos", "tok")))
      .withColumn("nxt", lead(col("tok"), 1).over(kwWin))
      .filter(col("nxt").isNotNull && col("nxt") =!= col("tok"))
    val kwEdges = kwToks.select(col("tok").as("src"), col("nxt").as("dst"))
      .unionAll(kwToks.select(col("nxt").as("src"), col("tok").as("dst")))
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))
    val kwRows = timed("textrank keywords (100k docs -> vocab-sized graph, 6 rounds)")(
      graft.operators.WeightedPageRank.run(kwEdges, "src", "dst", "w",
        iterations = 6).count())
    println(s"[scale] textrank vocab nodes ranked: $kwRows")

    // Round-11: pivot-SCC probe over the 20×-corpus directed token graph
    // — the edge distinct + both radius-3 closures run on the
    // vocabulary-sized relation (the replica token adds `factor` nodes),
    // so 20× docs must cost ~one distinct more, not 20× traversals.
    val sccToks = big.select(col("doc_id"),
        posexplode(graft.llm.TextAnalysis.tokens(col("text")))
          .as(Seq("pos", "tok")))
      .withColumn("nxt", lead(col("tok"), 1).over(kwWin))
      .filter(col("nxt").isNotNull)
    val sccRows = timed("pivot-scc probe (100k docs, radius 3)")(
      graft.operators.Scc.pivotSccSummary(
        sccToks.select(col("tok").as("src"), col("nxt").as("dst")),
        "src", "dst", rounds = 3).collect())
    println(s"[scale] scc probe: ${sccRows.map(r =>
      s"${r.getString(0)}=${r.getLong(2)}").mkString(" ")}")

    // Round-11: banded dHash near-dup at sf0.1 (5000 real PNG decodes →
    // distinct-fingerprint pairing) — decode cost linear in images, the
    // pair join bounded by distinct fingerprints, never corpus².
    val dhashPairs = timed("dhash near-dup (5000 decodes, banded)")(
      SparkEntry.queries("q_mm_dhash_neardup")(spark, sfDir).count())
    println(s"[scale] dhash fingerprint near-pairs: $dhashPairs")

    // Round-11: ANN recall eval (bounded query loop over the full-corpus
    // index) and Gini (bucketed two-pass global rank, no corpus window).
    val recallRows = timed("ann recall@10 eval (mod-97 queries)")(
      SparkEntry.queries("q_llm_ann_recall")(spark, sfDir).collect())
    println(s"[scale] ann recall rows: ${recallRows.length}, min=${
      if (recallRows.isEmpty) -1L else recallRows.map(_.getLong(2)).min}")
    val gini = timed("gini (range-sharded two-pass rank)")(
      SparkEntry.queries("q_stats_gini")(spark, sfDir).collect().head)
    println(s"[scale] gini over ${gini.getLong(0)} customers: ${gini.getDouble(2)}")

    // Round-11: Min-K% membership scoring at 20× — the LM fit is two
    // bucket aggregates, per-doc scoring one broadcast join + a
    // row-local sorted-prefix fold; 20× docs ⇒ ~20× one scan, no cliff.
    val minkModel = graft.llm.NgramLm.fit(big, "text")
    val minkRows = timed("min-k% scoring (100k docs, corpus-fit LM)")(
      graft.llm.NgramLm.minKScore(big, "doc_id", "text", minkModel).count())
    println(s"[scale] min-k scored docs: $minkRows")
    minkModel.release()

    // Round-11: containment candidate generation at 20× — the df∈[2,8]
    // hot-gram cap is what bounds the pair set when every replica family
    // shares most of its 5-grams (df ≈ factor ⇒ the planted families
    // stay in-cap; corpus-wide boilerplate grams blow past it and drop).
    val contGrams = big
      .select(col("doc_id"), graft.llm.Dedup.shingles(col("text"), 5).as("grams"))
    val contPairs = timed("containment candidates (100k docs, df-capped)")(
      contGrams.select(col("doc_id"), explode(col("grams")).as("gr"))
        .groupBy("gr").agg(sort_array(collect_set(col("doc_id"))).as("ds"))
        .filter(size(col("ds")).between(2, 8))
        .select(explode(expr(
          "flatten(transform(ds, (x, i) -> " +
            "transform(slice(ds, i + 2, size(ds)), y -> struct(x, y))))"))
          .as("e"))
        .select(col("e.x"), col("e.y")).distinct().count())
    println(s"[scale] containment candidate pairs: $contPairs")

    // Round-11: PCA top component over the 100k-vector corpus — the only
    // corpus-sized work is the single dim² moment aggregate (row-local
    // 64×64 explosion → ≤4096 groups); the 8 power rounds are driver-side
    // BigInt on the KB-scale scatter, so 20× data ⇒ one ~20× aggregate.
    val pcaRows = timed("pca top component (100k vecs, dim 64, 8 rounds)")(
      graft.llm.Pca.topComponent(bigEmb, "vec_id", "embedding",
        dim = 64, rounds = 8).count())
    println(s"[scale] pca component dims: $pcaRows")

    // Round-11: connected components ABOVE the driver union-find gate —
    // 2M chain edges in 64-node blocks symmetrize to ~4M pairs (gate is
    // 1M), forcing the distributed pointer-jumping loop; diameter 63 must
    // converge in O(log d) ≈ 6-7 label rounds, not 63.
    val ccNodes = 2100000L
    val chain = spark.range(ccNodes - 1)
      .filter((col("id") + 1) % 64 =!= 0)
      .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
    val ccComponents = timed("connected components (4M pairs, distributed pointer jumping)")(
      graft.llm.Dedup.connectedComponents(chain, "id_a", "id_b")
        .select(col("component")).distinct().count())
    val ccExpected = (ccNodes + 63) / 64
    require(ccComponents == ccExpected,
      s"chain components $ccComponents != expected $ccExpected")
    println(s"[scale] chain components: $ccComponents (expected $ccExpected)")

    // Round-10: deterministic epoch shuffle over the 100k-doc corpus —
    // the 256-bucket two-pass prefix sum must keep every corpus-side
    // window bucket-partitioned (the 256-row offsets relation is the only
    // single-partition step) and the global ranks must be a contiguous
    // 1..N permutation (min=1, max=N, N distinct).
    val shufCheck = timed("epoch shuffle (100k docs, two-pass prefix ranks)") {
      val wB = org.apache.spark.sql.expressions.Window.orderBy("_bucket")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val wIn = org.apache.spark.sql.expressions.Window
        .partitionBy("_bucket").orderBy(col("h"), col("doc_id"))
      val h = big.select(col("doc_id"), md5(
          concat(col("doc_id").cast("string"), lit(":shuf42"))).as("h"))
        .withColumn("_bucket", substring(col("h"), 1, 2))
      val off = h.groupBy("_bucket").agg(count(lit(1)).as("_bn"))
        .withColumn("_boff", coalesce(sum("_bn").over(wB), lit(0L)))
        .select("_bucket", "_boff")
      h.join(broadcast(off), Seq("_bucket"))
        .withColumn("rn", col("_boff") + row_number().over(wIn))
        .agg(count(lit(1)).as("n"), min("rn").as("lo"), max("rn").as("hi"),
          countDistinct(col("rn")).as("nd")).head()
    }
    require(shufCheck.getLong(1) == 1L &&
      shufCheck.getLong(2) == shufCheck.getLong(0) &&
      shufCheck.getLong(3) == shufCheck.getLong(0),
      s"epoch-shuffle ranks not a contiguous permutation: $shufCheck")
    println(s"[scale] epoch shuffle ranks: 1..${shufCheck.getLong(2)} " +
      s"over ${shufCheck.getLong(0)} docs")

    // HLL registers over 20× events (~10M items): the register file must
    // stay ≤ 256 rows per group however many rows stream through — the
    // shuffle carries per-partition partial maxima only.
    val ev8 = spark.read.parquet(s"$sfDir/events.parquet")
      .crossJoin(spark.range(factor).withColumnRenamed("id", "rep"))
      .select(col("event_type"),
        (col("user_id") * factor + col("rep")).as("user_id"))
    val hllRows = timed("hll registers (10M items -> <=256 rows/group)")(
      graft.operators.HllSketch.registers(ev8, "event_type", "user_id").count())
    println(s"[scale] hll register rows: $hllRows")

    // SCD2 over the FULL 20× event stream (~10M changes, every user):
    // one hash shuffle by key + in-partition sorted windows — no
    // self-join against history, so 20× data must time ~20×, not worse.
    val ch8 = graft.queries.Registry.normalizeEventTs(
        spark.read.parquet(s"$sfDir/events.parquet"))
      .crossJoin(spark.range(factor).withColumnRenamed("id", "rep"))
      .select(col("user_id"),
        (col("ts") + col("rep") * 1000000L).as("ts"),
        (col("event_id") * factor + col("rep")).as("event_id"),
        col("event_type"))
    val scdRows = timed("scd2 build (10M changes, windowed, one shuffle)")(
      graft.operators.Scd2.build(ch8, "user_id", "ts", "event_id",
        "event_type").count())
    println(s"[scale] scd2 dimension rows: $scdRows")

    // Binary-quantized ANN at 100k vectors: the shortlist pass scans one
    // packed BIGINT per row (TakeOrdered, no shuffle of the corpus) and
    // full-precision reads stay proportional to the 50-row shortlist.
    val queryVec = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head.getSeq[Float](0).map(_.toDouble).toSeq
    val annBin = timed("binary ANN (100k codes scan + 50-row exact rerank)")(
      graft.llm.BinaryQuant.searchTopK(bigEmb, "embedding", "vec_id",
        queryVec, k = 10, shortlist = 50).count())
    println(s"[scale] binary ANN rows: $annBin")

    // Nearest-centroid classifier at 100k vectors: training shuffles 65
    // aggregate buffers per label (never the points); inference is a
    // broadcast-model row-local argmin.
    // Winnow overlap pairs under pathological duplication: every replica
    // family is a 20-doc clique sharing ~all fingerprints. With the df
    // cap BELOW the family size the hot fingerprints drop pre-join and
    // the pair join stays near-empty — the guard that keeps the MOSS
    // report linear when a 100 TB corpus is full of boilerplate mirrors.
    val wpPairs = timed("winnow overlap pairs (100k docs, df cap 10 < family 20)")(
      graft.llm.Winnow.overlapPairs(big, "doc_id", "text",
        k = 3, w = 4, maxDf = 10, minShared = 3).count())
    println(s"[scale] winnow pairs under cap: $wpPairs")

    // Hashed-feature classification at 100k docs: one 64-buffer agg for
    // features, one for centroids, broadcast-model scoring.
    val hcModel = graft.llm.FeatureHash.features(big, "doc_id", "text",
        n = 1, k = 64)
      .withColumn("label", pmod(col("doc_id"), lit(4)))
      .groupBy("label")
      .agg(count(lit(1)).as("n"))
    val hcRows = timed("hashed features (100k docs, 64 buffers)")(hcModel.count())
    println(s"[scale] hashed-feature label groups: $hcRows")

    val labEmb = bigEmb.withColumn("label", pmod(col("vec_id"), lit(8)))
    val ccModel = timed("centroid fit (100k vecs, 65 buffers/label)")(
      graft.llm.CentroidClassifier.fit(labEmb, "embedding", "label", 64))
    val ccPred = timed("centroid classify (broadcast model, row-local argmin)")(
      graft.llm.CentroidClassifier.classify(labEmb, ccModel, "vec_id",
        "embedding").groupBy("pred").count().count())
    println(s"[scale] centroid-classifier classes predicted: $ccPred")

    // Cohort retention over 20× events (~2M rows, factor× the user base):
    // the first-seen agg and activity join stay user-partitioned, cohort
    // sizes broadcast — nothing materializes wider than (user, week).
    val weekNs = 7L * 24 * 3600 * 1000 * 1000 * 1000
    val ev20r = graft.queries.Registry.normalizeEventTs(
        spark.read.parquet(s"$sfDir/events.parquet"))
      .crossJoin(spark.range(factor).withColumnRenamed("id", "rep"))
      .select((col("user_id") * factor + col("rep")).as("user_id"),
        expr(s"ts div $weekNs").as("wk"))
    val firstWk = ev20r.groupBy("user_id").agg(min("wk").as("cohort_wk"))
    val retRows = timed("cohort retention (2M events, broadcast cohort sizes)")(
      ev20r.join(firstWk, Seq("user_id"))
        .select(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("since"),
          col("user_id"))
        .distinct()
        .groupBy("cohort_wk", "since").agg(count(lit(1)).as("n"))
        .count())
    println(s"[scale] retention cells: $retRows")

    // Skyline at 100k docs: the corpus still collapses to ≤ 10001
    // per-quality champions before the only ordered window — corpus size
    // changes the AGG input, never the window input.
    val skyPts = timed("pareto skyline (100k docs -> bounded champion window)")({
      val m = big.select(
        floor(graft.llm.TextAnalysis.qualityScore(col("text")) * 10000 + 0.5)
          .cast("long").as("q4"),
        graft.llm.TextAnalysis.tokenCount(col("text")).cast("long").as("tok"))
      val champs = m.groupBy("q4").agg(min("tok").as("tok"))
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("q4").desc)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      champs.withColumn("_rm", min(col("tok")).over(w))
        .filter(col("_rm").isNull || col("tok") < col("_rm")).count()
    })
    println(s"[scale] skyline points: $skyPts")

    // Bucketed landing + exchange-free join at 20× lineitem (~12M rows):
    // the landing pays the one shuffle, the join runs off the bucket
    // files (the plan property PlanRegressionSpec pins at sf0.001).
    val li20 = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .crossJoin(spark.range(factor).withColumnRenamed("id", "rep"))
      .select((col("l_orderkey") * factor + col("rep")).as("l_orderkey"),
        col("l_quantity"))
    val or20 = spark.read.parquet(s"$sfDir/orders.parquet")
      .crossJoin(spark.range(factor).withColumnRenamed("id", "rep"))
      .select((col("o_orderkey") * factor + col("rep")).as("l_orderkey"),
        col("o_orderstatus"))
    timed("bucketed landing (12M + 3M rows, the one amortized shuffle)") {
      graft.store.Bucketed.land(li20, "graft_scale_li", "l_orderkey", 32)
      graft.store.Bucketed.land(or20, "graft_scale_or", "l_orderkey", 32)
    }
    val bktN = timed("bucketed join (exchange-free off the bucket files)")(
      graft.store.Bucketed.read(spark, "graft_scale_li").hint("merge")
        .join(graft.store.Bucketed.read(spark, "graft_scale_or").hint("merge"),
          Seq("l_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n")).count())
    println(s"[scale] bucketed join status groups: $bktN")

    // ER blocking at 20×: 10k typo'd variants against the (unchanged)
    // distinct-name catalog — candidate volume scales with variants ×
    // block density, never |variants|², and the Jaro-Winkler kernel is a
    // row-local integer computation.
    val partNames = spark.read.parquet(s"$sfDir/part.parquet")
      .select(col("p_name").as("name")).distinct()
      .select(col("name"), substring(col("name"), 1, 1).as("blk"),
        length(col("name")).as("len"))
    val erVars = spark.read.parquet(s"$sfDir/part.parquet")
      .crossJoin(spark.range(factor.toLong).withColumnRenamed("id", "rep"))
      .filter(col("p_partkey") < 500)
      .select((col("p_partkey") * factor + col("rep")).as("vid"),
        col("p_name").as("orig"),
        // Length- and first-char-preserving adjacent swap (the registry
        // query's typo model), position varied by replica.
        (lit(2) + pmod(col("p_partkey") * factor + col("rep"),
          length(col("p_name")) - 2)).cast("int").as("i"))
      .select(col("vid"),
        concat(
          col("orig").substr(lit(1), col("i") - 1),
          col("orig").substr(col("i") + 1, lit(1)),
          col("orig").substr(col("i"), lit(1)),
          col("orig").substr(col("i") + 2, length(col("orig"))))
          .as("variant"))
      .select(col("vid"), col("variant"),
        substring(col("variant"), 1, 1).as("blk"),
        length(col("variant")).as("len"))
    val erPairs = timed("ER blocking + integer JW verify (10k variants)")({
      import org.apache.spark.sql.graftbridge.Bridge
      erVars.join(partNames, Seq("blk", "len"))
        .select(Bridge.column(graft.expressions.JaroWinkler(
          Bridge.expression(col("variant")),
          Bridge.expression(col("name")))).as("s"))
        .filter(col("s") >= 8500).count()
    })
    println(s"[scale] ER candidate pairs >= 0.85: $erPairs")

    // Winsorize + transition matrix over 20× events (~2M rows): band
    // computation and clip are the broadcast two-pass; transitions stay
    // one per-user window + a 25-row share window.
    val ev20b = graft.queries.Registry.normalizeEventTs(
        spark.read.parquet(s"$sfDir/events.parquet"))
      .crossJoin(spark.range(factor.toLong).withColumnRenamed("id", "rep"))
      .select((col("user_id") * factor + col("rep")).as("user_id"),
        col("ts"), (col("event_id") * factor + col("rep")).as("event_id"),
        col("event_type"),
        (col("value") + col("rep").cast("double") * 1e-4).as("value"))
    val winsN = timed("winsorize (2M events, broadcast p5/p95 bands)")({
      val e4 = ev20b.select(col("event_type"),
        floor(col("value") * 10000 + 0.5).cast("long").as("v4"))
      val bands = e4.groupBy("event_type")
        .agg(floor(expr("percentile(v4, 0.05)") + 0.5).cast("long").as("lo4"),
          floor(expr("percentile(v4, 0.95)") + 0.5).cast("long").as("hi4"))
      e4.join(broadcast(bands), Seq("event_type"))
        .groupBy("event_type")
        .agg(sum(least(greatest(col("v4"), col("lo4")), col("hi4"))).as("s"))
        .count()
    })
    println(s"[scale] winsorized types: $winsN")
    val transN = timed("transition matrix (2M events, per-user window)")({
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      ev20b.withColumn("prev", lag(col("event_type"), 1).over(w))
        .filter(col("prev").isNotNull)
        .groupBy("prev", "event_type").agg(count(lit(1)).as("n")).count()
    })
    println(s"[scale] transition cells: $transN")

    // Round-12: mechanical scale witnesses for the post-wave-2 r11
    // operators (VERDICT r11 item 3). They ride relations this suite
    // already smokes (co-purchase graph, events, documents, embeddings)
    // at their registered shapes — the point is a [scale] line per
    // operator so the suite's completeness claim stays mechanical.
    for (qn <- Seq("q_graph_modularity", "q_graph_assortativity",
        "q_graph_rich_club", "q_stats_theil", "q_stats_runs_test",
        "q_w_interval_union", "q_w_sliding_distinct", "q_mm_scene_cuts",
        "q_llm_cluster_purity",
        // round-12 additions ride the same smoked relations
        "q_ts_changepoint", "q_stats_mann_kendall", "q_sketch_kmv",
        "q_llm_jsd",
        // round-12 continuation waves (stats/sketch/graph/eval)
        "q_stats_ols", "q_stats_kruskal", "q_stats_welch", "q_ts_hampel",
        "q_stats_psi", "q_sketch_theta", "q_graph_eccentricity",
        "q_ts_holt", "q_llm_self_bleu", "q_llm_silhouette",
        "q_graph_wcc", "q_stats_anova", "q_stats_levene",
        "q_ts_holt_winters", "q_llm_mcnemar",
        "q_stats_kappa", "q_llm_collocations", "q_ts_ccf",
        "q_e_survival", "q_llm_dbscan", "q_llm_lexdiv",
        "q_stats_mahalanobis", "q_llm_auc", "q_llm_rouge2",
        "q_ts_pacf",
        // round-12 continuation: retail rules, retrieval diversification,
        // classifier calibration, brokerage centrality
        "q_mb_assoc_rules", "q_llm_mmr", "q_llm_calibration",
        "q_graph_betweenness", "q_graph_anf", "q_graph_katz",
        "q_ts_backtest", "q_ts_conformal", "q_llm_gains",
        "q_stats_signed_rank", "q_llm_isotonic",
        "q_llm_split_leakage", "q_agg_abc", "q_agg_exact_median",
        "q_e_markov_stationary", "q_e_trigrams",
        "q_e_cohort_revenue", "q_graph_degree_dist",
        // round-14 additions: attribution/experimentation/governance/
        // storage/recsys/multimodal operators at their registered shapes
        "q_e_shapley_attribution", "q_e_window_funnel",
        "q_e_growth_accounting", "q_stats_xmr", "q_stats_tost",
        "q_stats_eb_shrink", "q_gov_dp_release", "q_gov_subject_export",
        "q_store_clustering_depth", "q_store_retention_plan",
        "q_rec_eval", "q_asof_nearest", "q_mm_vad", "q_mm_phash",
        "q_llm_code_detect", "q_llm_semdedup_eval",
        // round-15 additions: causal pair, calendar-bounded profile/
        // spectral, capped butterflies, Q17 decorrelation, graded NDCG,
        // PR sweep, IND audit, decay scoring, hourly concurrency
        "q_e_did", "q_e_cem", "q_e_decay_score", "q_e_concurrency",
        "q_ts_matrix_profile", "q_ts_goertzel", "q_graph_rectangles",
        "q_sql_small_qty_revenue", "q_llm_search_ndcg", "q_llm_pr_curve",
        "q_qc_ind_audit")) {
      val n = timed(s"$qn (registered shape)")(
        SparkEntry.queries(qn)(spark, sfDir).count())
      println(s"[scale] $qn rows: $n")
    }

    // Round-14: the two new per-user event-window operators at a TRUE
    // 20× (~2M events) — both are shared-partitioning window plans
    // whose cost must scale with events, never events².
    val wfLevels = timed("window funnel (2M events, 3 shared-shuffle minima)")({
      val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
      val winNs = 7L * 86400 * 1000 * 1000 * 1000
      ev20b.select(col("user_id"), col("ts"), col("event_type"))
        .withColumn("t1", min(when(col("event_type") === "signup",
          col("ts"))).over(w))
        .withColumn("t2", min(when(col("event_type") === "click"
          && col("ts") > col("t1") && col("ts") <= col("t1") + winNs,
          col("ts"))).over(w))
        .withColumn("t3", min(when(col("event_type") === "purchase"
          && col("ts") > col("t2") && col("ts") <= col("t2") + winNs,
          col("ts"))).over(w))
        .groupBy("user_id")
        .agg(max(when(col("t3").isNotNull, 3L)
          .when(col("t2").isNotNull, 2L)
          .when(col("t1").isNotNull, 1L).otherwise(0L)).as("level"))
        .groupBy("level").count().count()
    })
    println(s"[scale] window-funnel levels at 20x: $wfLevels")
    val gaWeeks = timed("growth accounting (2M events, per-user lag/lead)")({
      val weekNs = 7L * 86400 * 1000 * 1000 * 1000
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("week")
      val uw = ev20b.select(col("user_id"),
        expr(s"ts div $weekNs").as("week")).distinct()
      uw.withColumn("prev", lag(col("week"), 1).over(w))
        .select(col("week"),
          when(col("prev").isNull, "new")
            .when(col("prev") === col("week") - 1, "retained")
            .otherwise("resurrected").as("state"))
        .groupBy("week", "state").count().count()
    })
    println(s"[scale] growth-accounting cells at 20x: $gaWeeks")

    // Round-12: the two event-window shapes additionally at a TRUE 20×
    // (~2M events) — both are per-user window / bounded fan-out plans
    // whose cost must scale with events, never events².
    val iuIslands = timed("interval union (2M events, per-user sweep-line)")({
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      ev20b.select(col("user_id"), col("ts"), col("event_id"),
          (col("ts") + 300L * 1000000000L).as("e"))
        .withColumn("maxe", max(col("e")).over(w.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)))
        .filter(col("maxe").isNull || col("ts") > col("maxe"))
        .count()
    })
    println(s"[scale] interval-union islands: $iuIslands")
    val sdCells = timed("sliding distinct users (2M events, 2x fan-out)")({
      val hop = 300L * 1000000000L
      ev20b.select(col("user_id"), expr(s"ts div $hop").as("h"))
        .select(col("user_id"), explode(array(col("h"), col("h") + 1)).as("w"))
        .distinct().groupBy("w").agg(count(lit(1)).as("n")).count()
    })
    println(s"[scale] sliding-distinct window cells: $sdCells")

    // Round-15: session concurrency at a TRUE 20× — the session
    // reduction is one per-user window pass and the hour range-join is
    // bounded by the CALENDAR (the hour list does not grow with events),
    // so cost must scale with events, never events².
    val ccHours = timed("session concurrency (2M events, hour range-join)")({
      val hourNs = 3600L * 1000 * 1000 * 1000
      val gapNs = 30L * 60 * 1000 * 1000 * 1000
      val sess = graft.operators.Sessionize.assign(
          ev20b.select("user_id", "ts", "event_id"),
          "user_id", "ts", "event_id", gapNs)
        .groupBy("user_id", "session_id")
        .agg(expr(s"min(ts) div $hourNs").as("h0"),
          expr(s"max(ts) div $hourNs").as("h1"))
      val hours = sess.agg(min("h0").as("lo"), max("h1").as("hi"))
        .select(explode(expr("sequence(lo, hi)")).as("h"))
      sess.join(broadcast(hours),
          col("h0") <= col("h") && col("h") <= col("h1"))
        .groupBy("h").agg(count(lit(1)).as("n")).count()
    })
    println(s"[scale] concurrency hours at 20x: $ccHours")

    // Round-12: streaming at scale (VERDICT r11 item 7) — 1.05M events
    // with 50k planted replays through the production file-source dedup
    // path (dropDuplicatesWithinWatermark), one micro-batch per file,
    // throughput recorded. Every timestamp sits inside the 10-minute
    // watermark horizon, so the ONLY rows the stream may drop are the
    // planted duplicates — the unique count is exact, not best-effort.
    val sdir = java.nio.file.Files
      .createTempDirectory("graft-scale-stream").toString
    val nUnique = 1000000L
    val nTotal = nUnique + 50000L
    spark.range(nTotal)
      .select(
        when(col("id") < nUnique, col("id"))
          .otherwise((col("id") - nUnique) * 20L).as("event_id"),
        timestamp_millis(lit(1700000000000L) +
          pmod(col("id") * 37L, lit(300000L))).as("ts"),
        pmod(col("id"), lit(1000L)).as("user_id"),
        lit("click").as("event_type"),
        (col("id") % 100L).cast("double").as("value"))
      .repartition(8).write.parquet(s"$sdir/stream")
    val evSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.DoubleType)))
    val st0 = System.nanoTime()
    val sq = graft.streaming.EventStream.replayParquetAsStream(
      spark, s"$sdir/stream", evSchema,
      df => graft.streaming.EventStream.dedupStream(df), "scale_dedup_sink")
    sq.awaitTermination(600000)
    val sWall = (System.nanoTime() - st0) / 1e9
    val sGot = spark.table("scale_dedup_sink").count()
    println(f"[scale] streaming dedup: $nTotal%,d events -> $sGot%,d unique " +
      f"(expected $nUnique%,d) in $sWall%.1fs " +
      f"(${nTotal / sWall}%,.0f events/s, 8 micro-batches)")

    spark.stop()
  }
}
