package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry integrity: the driver's contract couples `queries` and
  * `oracleSql` by NAME — an oracle keyed to a nonexistent query (or a
  * dangling rename) would silently weaken the correctness gate. */
class RegistrySpec extends AnyFunSuite {

  test("every oracle belongs to a registered query") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("registry size and oracle coverage match COVERAGE.md") {
    assert(SparkEntry.queries.size == 406)
    assert(SparkEntry.oracleSql.size == 404)
    // The irreducible two: q_llm_bpe's production word table is capped at
    // 65536 rows (its _det twin replays the full merge loop under oracle),
    // and DuckDB has no DEFLATE for q_llm_compress_ratio — though its
    // _det twin pins the DeflateLen kernel against precomputed constants.
    val rowsOnly = SparkEntry.queries.keySet.diff(SparkEntry.oracleSql.keySet)
    assert(rowsOnly == Set("q_llm_bpe", "q_llm_compress_ratio"),
      s"rows-only set drifted: $rowsOnly")
  }

  test("query names are unique after bench key compaction") {
    val keys = SparkEntry.queries.keySet.toSeq.map(Bench.benchKey)
    assert(keys.distinct.size == keys.size,
      s"bench keys collide: ${keys.diff(keys.distinct)}")
  }
}
