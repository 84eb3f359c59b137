package graft

/** Diagnostic: print the formatted physical plan of named registered
  * queries (the `.explain("formatted")` audit loop PLANS.md records per
  * wave) without spinning a notebook.
  *
  * Usage: `runMain graft.ExplainOne [sfDir] q_name [q_name ...]` */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val (dir, names) =
      if (args.nonEmpty && args.head.startsWith("/"))
        (args.head, args.tail.toSeq)
      else ("/root/testdata/sf0.001", args.toSeq)
    require(names.nonEmpty, "usage: ExplainOne [sfDir] q_name ...")
    val spark = Sessions.local(defaultCpus = 8)
    graft.queries.Registry.configure(spark)
    names.foreach { n =>
      println(s"==== $n ====")
      val df = SparkEntry.queries(n)(spark, dir)
      df.collect() // populate AQE final plan
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
