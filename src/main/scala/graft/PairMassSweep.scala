package graft

/** Scale gate for the bounded semdedup pairing: the candidate-pair MASS of
  * the registered `q_llm_semdedup` gate (Σ C(n,2) over capped all-pairs
  * buckets + Σ (n−1) over chain buckets — the quantity the within-cell
  * join actually evaluates, pre-threshold) must grow ~linearly with corpus
  * size. Quadratic growth means the maxCluster cap / sign-LSH sub-split
  * stopped binding and the plan regressed to the corpus-quadratic shape
  * this gate exists to forbid.
  *
  * Usage: `runMain graft.PairMassSweep <sfDirA> <sfDirB> [maxExponent]`
  * with sfDirB the larger corpus. Requires
  * massB/massA ≤ (nB/nA)^maxExponent (default 1.3 — a bounded plan sits
  * near 1.0; the slack absorbs cell-boundary re-bucketing as k-means
  * re-fits on the bigger corpus). Exits nonzero on violation, printing
  * both masses and the measured growth exponent. */
object PairMassSweep {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: PairMassSweep <sfDirA> <sfDirB> [maxExponent]")
    val (dirA, dirB) = (args(0), args(1))
    val maxExp = if (args.length > 2) args(2).toDouble else 1.3
    val spark = Sessions.local(defaultCpus = 8)
    def at(dir: String): (Long, Long) = {
      val wc = graft.queries.Registry.semDedupWithCell(spark, dir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = wc.count()
      val mass = graft.llm.SemDedup.detPairMass(wc, maxCluster = 40)
      wc.unpersist()
      (n, mass)
    }
    val (na, ma) = at(dirA)
    val (nb, mb) = at(dirB)
    require(na > 0 && ma > 0, s"degenerate small corpus: n=$na mass=$ma")
    require(nb > na, s"sfDirB must be the larger corpus (n $nb vs $na)")
    val growthN = nb.toDouble / na
    val growthM = mb.toDouble / ma
    val exp = math.log(growthM) / math.log(growthN)
    println(f"[pairmass] $dirA: n=$na mass=$ma")
    println(f"[pairmass] $dirB: n=$nb mass=$mb")
    println(f"[pairmass] growth: n x$growthN%.2f, mass x$growthM%.2f, " +
      f"exponent $exp%.3f (gate: <= $maxExp%.2f)")
    if (growthM > math.pow(growthN, maxExp)) {
      System.err.println(f"[pairmass] GATE VIOLATION: pair mass grew " +
        f"x$growthM%.2f for n x$growthN%.2f (exponent $exp%.3f > $maxExp%.2f)")
      spark.stop()
      sys.exit(1)
    }
    println("[pairmass] GATE OK")
    spark.stop()
  }
}
