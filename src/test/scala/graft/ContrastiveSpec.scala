package graft

import org.apache.spark.sql.functions._

import graft.llm.Contrastive

class ContrastiveSpec extends SparkSpecBase {

  private def docs(n: Int) = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, (i * 37 % 500) + 10L)).toDF("id", "len")
  }

  test("negative sampling: k negatives per anchor, never itself, deterministic") {
    val out = Contrastive.negativeSamples(docs(300), "id", k = 3).collect()
    val byAnchor = out.groupBy(_.getLong(0))
    assert(byAnchor.size == 300)
    byAnchor.foreach { case (a, rows) =>
      assert(rows.length == 3, s"anchor $a got ${rows.length}")
      assert(!rows.exists(_.getLong(1) == a), s"anchor $a sampled itself")
      assert(rows.map(_.getLong(2)).sorted.toSeq == Seq(1L, 2L, 3L))
    }
    val again = Contrastive.negativeSamples(docs(300), "id", k = 3).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      again.map(r => (r.getLong(0), r.getLong(1))).toSet)
  }

  test("negatives come only from the anchor's md5-prefix pool") {
    def pool(id: Long) = org.apache.commons.codec.digest.DigestUtils
      .md5Hex(id.toString).substring(0, 1)
    val out = Contrastive.negativeSamples(docs(200), "id", k = 2).collect()
    out.foreach(r =>
      assert(pool(r.getLong(0)) == pool(r.getLong(1))))
  }

  test("curriculum: phases are value-monotone and cover every doc") {
    val out = Contrastive.curriculum(docs(400), "id", "len", phases = 4)
      .select("id", "len", "phase", "phase_pos").collect()
    assert(out.length == 400)
    val byPhase = out.groupBy(_.getInt(2)).view.mapValues(_.map(_.getLong(1))).toMap
    assert(byPhase.keySet == Set(1, 2, 3, 4))
    (1 to 3).foreach { p =>
      assert(byPhase(p).max <= byPhase(p + 1).min,
        s"phase $p max ${byPhase(p).max} > phase ${p + 1} min ${byPhase(p + 1).min}")
    }
    // within-phase positions are 1..|phase| and the shuffle is deterministic
    out.groupBy(_.getInt(2)).foreach { case (_, rows) =>
      assert(rows.map(_.getLong(3)).sorted.toSeq == (1 to rows.length).map(_.toLong))
    }
  }
}
