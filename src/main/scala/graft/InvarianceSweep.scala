package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: the full-surface version of PartitionInvarianceSpec — run
  * EVERY registered query at two shuffle widths and require bit-identical
  * collected rows. This mechanically verifies the engine-wide determinism
  * contract (integer units / DECIMAL sums / floor-before-sum) that each
  * query's scaladoc claims individually: any double sum that leaked into
  * a hot path shows up here as a width-dependent low bit, the one bug
  * class the DuckDB oracle can miss when both engines happen to add in
  * the same order at one width.
  *
  * Run: `sbt "runMain graft.InvarianceSweep [sfDir] [widthA] [widthB]
  * [q_name ...]"` (defaults /root/testdata/sf0.001, 3, 32; extra args
  * restrict to the named queries — the per-wave gate runs new queries
  * subset-mode, the round close runs the full registry). Prints per-query
  * PASS/DIFF and exits nonzero on any DIFF. */
object InvarianceSweep {

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val wA = if (args.length > 1) args(1).toInt else 3
    val wB = if (args.length > 2) args(2).toInt else 32
    val only = args.drop(3).toSet
    val spark = Sessions.local(defaultCpus = 32)
    graft.queries.Registry.configure(spark)

    def runAt(name: String, parts: Int): Either[String, Seq[String]] = {
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      try Right(SparkEntry.queries(name)(spark, sfDir)
        .collect().map(_.toSeq.mkString("|")).toSeq.sorted)
      catch { case e: Throwable => Left(s"${e.getClass.getSimpleName}: ${e.getMessage}") }
      finally spark.catalog.clearCache()
    }

    var diffs = 0
    var errs = 0
    val t0 = System.nanoTime()
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
    selected.foreach { case (name, _) =>
      (runAt(name, wA), runAt(name, wB)) match {
        case (Right(a), Right(b)) if a == b =>
          println(s"[inv] PASS $name (${a.size} rows)")
        case (Right(a), Right(b)) =>
          diffs += 1
          val firstDiff = a.zipAll(b, "<missing>", "<missing>")
            .find { case (x, y) => x != y }
          println(s"[inv] DIFF $name rows=${a.size}/${b.size} first=${firstDiff}")
        case (l, r) =>
          errs += 1
          println(s"[inv] ERR  $name ${l.left.toOption.orElse(r.left.toOption).get}")
      }
    }
    println(f"[inv] done: ${selected.size} queries, $diffs diffs, " +
      f"$errs errors, widths $wA vs $wB, ${(System.nanoTime() - t0) / 1e9}%.0f s")
    spark.stop()
    if (diffs + errs > 0) sys.exit(1)
  }
}
