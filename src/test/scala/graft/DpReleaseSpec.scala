package graft

import java.nio.file.Files
import java.security.MessageDigest

/** Round-14 wave-12 pins: two-sided-geometric DP release — independent
  * inverse-CDF replay, the zero clamp, the truncated support, and the
  * α = 3/5 mass profile on a wide synthetic lattice. */
class DpReleaseSpec extends SparkSpecBase {

  private def custDir(segCounts: Seq[(String, Int)]): String = {
    import spark.implicits._
    val rows = for {
      ((s, n), si) <- segCounts.zipWithIndex
      i <- 0 until n
    } yield (si * 100000L + i, s, 0L, 100.0)
    val dir = Files.createTempDirectory("graft-dp").toString
    rows.toDF("c_custkey", "c_mktsegment", "c_nationkey", "c_acctbal")
      .repartition(2).write.mode("overwrite")
      .parquet(s"$dir/customer.parquet")
    dir
  }

  /** The mechanism's exact thresholds, re-derived independently. */
  private def geomZ(u: BigInt): Long = {
    val lattice = BigInt(1) << 60
    def thr(k: Int): BigInt =
      if (k < 0) {
        val j = -k
        lattice * BigInt(3).pow(j) / (BigInt(8) * BigInt(5).pow(j - 1))
      } else {
        val num = lattice * BigInt(3).pow(k + 1)
        val den = BigInt(8) * BigInt(5).pow(k)
        lattice - (num + den - 1) / den
      }
    (-20 to 19).find(k => u < thr(k)).getOrElse(20).toLong
  }

  private def draw(seg: String): Long = {
    val hex = MessageDigest.getInstance("MD5")
      .digest((seg + "|graft_dp_v1").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    geomZ(BigInt(hex.substring(0, 15), 16))
  }

  test("noise equals the independent inverse-CDF replay, release clamps at 0") {
    val dir = custDir(Seq(("ALPHA", 7), ("BETA", 1), ("GAMMA", 40)))
    val got = SparkEntry.queries("q_gov_dp_release")(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    for ((seg, n) <- Seq(("ALPHA", 7L), ("BETA", 1L), ("GAMMA", 40L))) {
      val z = draw(seg)
      val (nTrue, zGot, rel) = got(seg)
      assert(nTrue == n)
      assert(zGot == z, s"$seg: z mismatch vs independent replay")
      assert(rel == math.max(0L, n + z), s"$seg: clamp broken")
    }
  }

  test("draw is a salted replay: two runs are identical") {
    val dir = custDir(Seq(("AUTOMOBILE", 3), ("BUILDING", 5)))
    val a = SparkEntry.queries("q_gov_dp_release")(spark, dir).collect()
    val b = SparkEntry.queries("q_gov_dp_release")(spark, dir).collect()
    assert(a.sameElements(b))
  }

  test("alpha = 3/5 mass profile over 4096 cells: P(0) ~ 1/4, bounded, centered") {
    // One synthetic segment per cell; the md5 lattice is the sample.
    val zs = (0 until 4096).map(i => draw(f"SEG$i%05d"))
    assert(zs.forall(z => z >= -20 && z <= 20), "support truncation")
    val p0 = zs.count(_ == 0).toDouble / zs.size
    assert(p0 > 0.20 && p0 < 0.30,
      s"P(z=0) = $p0, expected (1-a)/(1+a) = 0.25")
    val mean = zs.sum.toDouble / zs.size
    assert(math.abs(mean) < 0.2, s"mean z = $mean, expected ~0")
    // Symmetric decay: one-step mass ratio ~ alpha = 0.6 on each side.
    val p1 = zs.count(z => z == 1 || z == -1).toDouble / zs.size
    assert(p1 > 0.22 && p1 < 0.38, s"P(|z|=1) = $p1, expected 0.30")
  }
}
