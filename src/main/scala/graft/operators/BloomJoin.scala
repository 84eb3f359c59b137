package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expressions.MdBloom

/** Bloom semi-join reduction (the classic distributed-join optimization:
  * Bloomjoin, Mackert & Lohman 1986 "R* evaluation of remote queries";
  * every modern warehouse's runtime filter is this shape): when a
  * selective build side decides which probe rows can join, ship a
  * Bloom filter of the build keys to the probe scan INSTEAD of shuffling
  * the whole probe side — probe rows failing the filter never enter the
  * exchange, so the join moves |matches| + |false positives| rows, not
  * |probe|. The exact join then removes the false positives; one-sided
  * error means the reduction can never drop a true match.
  *
  * The bitset is the md5-derived [[MdBloom]] (not Murmur
  * `util.sketch.BloomFilter`): every bit position is
  * `md5("j:key") mod m`, so an external SQL engine rebuilds the exact
  * bitset and replays membership INCLUDING the false positives — the
  * pass/fail decision per key is oracle-checkable bit for bit.
  *
  * Scale shape: the build aggregates to an m-bit array via ONE
  * treeAggregate (bounded by m regardless of key count); the probe is a
  * shuffle-free codegen'd projection. Nothing scales with
  * |probe| × |build|. */
object BloomJoin {

  /** Distributed md5-Bloom build over `keys(keyCol)` (strings; cast
    * numeric keys first). Returns (bits, numBits, numHashes). Standard
    * sizing: m = ⌈−n·ln(fpp)/ln²2⌉, k = max(1, ⌊m/n·ln2 + 0.5⌋). */
  def buildBits(keys: DataFrame, keyCol: String,
                fpp: Double): (Array[Long], Long, Int) = {
    val distinctKeys = keys.select(col(keyCol).cast("string").as("k"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = math.max(distinctKeys.count(), 1L)
    val m = MdBloom.optimalNumBits(n, fpp)
    val k = MdBloom.optimalNumHashes(n, m)
    val words = ((m + 63) / 64).toInt
    // Positions via BUILTIN codegen'd md5/conv — the identical arithmetic
    // MdBloom.position runs on the probe side and the oracle replays.
    val posCols = (0 until k).map(j =>
      conv(substring(md5(concat(lit(s"$j:"), col("k"))), 1, 13), 16, 10)
        .cast("long") % m)
    val bits = distinctKeys.select(explode(array(posCols: _*)).as("pos"))
      .select(col("pos")).rdd.map(_.getLong(0))
      .treeAggregate(new Array[Long](words))(
        (arr, p) => { arr((p >> 6).toInt) |= 1L << (p & 63).toInt; arr },
        (a, b) => { var i = 0; while (i < a.length) { a(i) |= b(i); i += 1 }; a })
    distinctKeys.unpersist()
    (bits, m, k)
  }

  /** Membership probe column for `keyCol` against a built bitset — true
    * iff all k positions are set (maybe-member; false = provably absent). */
  def mayContain(keyCol: Column, bits: Array[Long], numBits: Long,
                 numHashes: Int): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(graft.expressions.MdBloomAnyContain(
      Bridge.expression(array(keyCol.cast("string"))), bits, numBits,
      numHashes))
  }

  /** The reduction itself: probe rows that MAY join `build` on
    * `probeKey == buildKey` — a superset of the true matches containing
    * only Bloom false positives, produced without shuffling `probe`. */
  def reduce(probe: DataFrame, probeKey: String, build: DataFrame,
             buildKey: String, fpp: Double = 0.01): DataFrame = {
    val (bits, m, k) = buildBits(build, buildKey, fpp)
    probe.filter(mayContain(col(probeKey), bits, m, k))
  }
}
