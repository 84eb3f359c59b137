package graft

import graft.operators.Katz

/** Hand-computed Katz pins — α = 1/3 makes every attenuation step a
  * strict floor, so a per-round (instead of per-edge) division, or a
  * double in the loop, moves the result. */
class KatzSpec extends SparkSpecBase {

  test("star, two rounds at alpha = 1/3: hand-walked per-edge floors") {
    import spark.implicits._
    // x0 = 10^6. Round 1: in(0) = 3*floor(10^6/3) = 999999 ->
    // x1(0) = 1999999; x1(leaf) = 1333333. Round 2: in(0) =
    // 3*floor(1333333/3) = 1333332 -> x2(0) = 2333332 (NOT 2333333 —
    // the per-edge floor loses a unit); x2(leaf) = 1 + 1999999/3.
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("lo", "hi")
    val out = Katz.topK(edges, alphaDen = 3, iterations = 2, k = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((0L, 2333332L),
      (1L, 1666666L), (2L, 1666666L), (3L, 1666666L)))
  }
}
