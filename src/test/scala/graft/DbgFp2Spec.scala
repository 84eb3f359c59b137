package graft
class DbgFp2Spec extends SparkSpecBase {
  test("dbg2") {
    for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val rows = SparkEntry.queries("q_mm_audio_fp")(spark, sf)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val twins = rows.filter { case (a, b, _, _) => b == a + 10000 }
      val nonTwin = rows.filterNot { case (a, b, _, _) => b == a + 10000 }
      println(s"DBG $sf total=${rows.length} twins=${twins.length} minTwinVotes=${if (twins.nonEmpty) twins.map(_._4).min else -1}")
      println(s"DBG $sf nonTwinVotesHist=${nonTwin.groupBy(_._4).view.mapValues(_.length).toMap.toSeq.sorted.take(10)}")
      println(s"DBG $sf nonTwinOffsets=${nonTwin.groupBy(_._3).view.mapValues(_.length).toMap.toSeq.sortBy(-_._2).take(5)}")
    }
  }
}
