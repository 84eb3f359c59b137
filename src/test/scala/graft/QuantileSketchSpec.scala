package graft

import org.apache.spark.sql.functions._

import graft.operators.QuantileSketch

class QuantileSketchSpec extends SparkSpecBase {

  private def rankError(est: Double, values: Array[Double], q: Double): Double = {
    val sorted = values.sorted
    val rank = sorted.count(_ <= est).toDouble / sorted.length
    math.abs(rank - q)
  }

  test("local sketch: quantiles within 5% rank error on skewed data") {
    val values = (1 to 20000).map(i => math.pow(i.toDouble, 2.0)).toArray
    var buf = QuantileSketch.emptyBuf(200)
    values.foreach(v => buf = buf.insert(v))
    Seq(0.1, 0.5, 0.9, 0.99).foreach { q =>
      val err = rankError(buf.quantile(q), values, q)
      assert(err <= 0.05, s"q=$q rank error $err")
    }
    assert(buf.totalWeight == 20000L)
  }

  test("merge preserves weight and keeps rank error bounded") {
    val left = (1 to 10000).map(_.toDouble).toArray
    val right = (10001 to 20000).map(_.toDouble).toArray
    var (a, b) = (QuantileSketch.emptyBuf(200), QuantileSketch.emptyBuf(200))
    left.foreach(v => a = a.insert(v))
    right.foreach(v => b = b.insert(v))
    val m = a.mergeWith(b)
    assert(m.totalWeight == 20000L)
    val all = left ++ right
    Seq(0.25, 0.5, 0.75).foreach { q =>
      assert(rankError(m.quantile(q), all, q) <= 0.05)
    }
  }

  test("distributed aggregation via udaf matches exact percentiles closely") {
    import spark.implicits._
    val df = (1 to 50000).map(i => ((i % 3).toString, i.toDouble)).toDF("g", "v")
      .repartition(8)
    val sk = udaf(QuantileSketch.SketchAgg(k = 200, qs = Seq(0.5, 0.9)))
    val out = df.groupBy("g")
      .agg(sk(col("v")).as("est"),
        expr("percentile(v, 0.5)").as("x50"),
        expr("percentile(v, 0.9)").as("x90"))
      .collect()
    assert(out.length == 3)
    out.foreach { r =>
      val est = r.getSeq[Double](1)
      // values are ~uniform on [1, 50000]: 5% rank error ≈ 2500 in value
      assert(math.abs(est(0) - r.getDouble(2)) <= 2500.0,
        s"p50 ${est(0)} vs ${r.getDouble(2)}")
      assert(math.abs(est(1) - r.getDouble(3)) <= 2500.0,
        s"p90 ${est(1)} vs ${r.getDouble(3)}")
    }
  }

  test("empty input yields NaN quantiles, zero weight") {
    val b = QuantileSketch.emptyBuf(16)
    assert(b.quantile(0.5).isNaN && b.totalWeight == 0L)
  }
}
