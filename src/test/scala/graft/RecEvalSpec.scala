package graft

import java.nio.file.Files
import java.security.MessageDigest

/** Round-14 wave-19 pins: offline recommender eval — full independent
  * brute-force replay (split, training pairs, top-10 cut, hits, exact
  * MRR) on a constructed corpus with a cold-start anchor. */
class RecEvalSpec extends SparkSpecBase {

  private def isHoldout(o: Long): Boolean = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(s"$o|rec_v1".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 8)
    java.lang.Long.parseLong(hex, 16) % 5 == 0
  }

  test("metrics match a full brute-force replay") {
    import spark.implicits._
    // 40 orders over a 12-part catalog with strong pair structure:
    // parts 2k/2k+1 co-occur constantly; part 999 appears once (cold).
    val orders: Seq[(Long, Seq[Long])] =
      (0L until 40L).map { o =>
        val base = (o % 6) * 2
        val parts = Seq(base, base + 1, (o % 5) * 2) ++
          (if (o == 17L) Seq(999L) else Nil)
        (o, parts.distinct)
      }
    val rows = for { (o, ps) <- orders; p <- ps } yield (o, p)
    val dir = Files.createTempDirectory("graft-rec").toString
    rows.toDF("l_orderkey", "l_partkey")
      .repartition(3).write.mode("overwrite")
      .parquet(s"$dir/lineitem.parquet")

    // Independent replay.
    val train = orders.filterNot(o => isHoldout(o._1))
    val ho = orders.filter(o => isHoldout(o._1))
    assert(ho.nonEmpty && train.nonEmpty, "split degenerate for this corpus")
    val pairCount = train.flatMap { case (_, ps) =>
      for (a <- ps; b <- ps if a != b) yield (a, b)
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val recs: Map[Long, Seq[Long]] = pairCount.keys.map(_._1).toSeq.distinct
      .map { a =>
        a -> pairCount.collect { case ((`a`, b), n) => (b, n) }.toSeq
          .sortBy { case (b, n) => (-n, b) }.take(10).map(_._1)
      }.toMap
    val anchors = ho.flatMap { case (_, ps) =>
      ps.map(a => (a, ps.filterNot(_ == a)))
    }.filter(_._2.nonEmpty)
    val perAnchor = anchors.map { case (a, rel) =>
      val r = recs.getOrElse(a, Seq.empty)
      val hits = rel.count(r.contains)
      val r1 = rel.flatMap(b => {
        val i = r.indexOf(b); if (i >= 0) Some(i + 1) else None
      }).sorted.headOption
      (hits.toLong, r1)
    }
    val nAnchors = perAnchor.size.toLong
    val nHit = perAnchor.count(_._1 > 0).toLong
    val sumHits = perAnchor.map(_._1).sum
    val mrrNum = perAnchor.flatMap(_._2).map(2520L / _).sum

    val r = SparkEntry.queries("q_rec_eval")(spark, dir).collect()(0)
    assert(r.getLong(0) == nAnchors, "n_anchors")
    assert(r.getLong(1) == nHit, "n_hit_anchors")
    assert(r.getLong(2) == nHit * 10000 / nAnchors, "hitrate_bp")
    assert(r.getLong(3) == sumHits, "sum_hits")
    assert(r.getLong(4) == sumHits * 10000 / (10 * nAnchors), "precision_bp")
    assert(r.getLong(5) == mrrNum, "mrr_num")
    assert(r.getLong(6) == mrrNum * 10000 / (2520 * nAnchors), "mrr4")
    // The cold anchor must exist if order 17 is held out; either way the
    // replay above already scored it identically.
    if (isHoldout(17L)) assert(recs.get(999L).isEmpty, "999 must be cold")
  }
}
