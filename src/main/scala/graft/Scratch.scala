package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway phase-timing harness (not part of the public surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val planted = emb.filter(col("vec_id") < 20)
      .withColumn("vec_id", col("vec_id") + 10000)
      .withColumn("embedding", transform(col("embedding"), x => x * lit(1.001f)))
    val corpus = emb.unionByName(planted)
    corpus.count()
    val idx = time("ivf.build+fit")(graft.llm.Ivf.build(corpus, "embedding", "vec_id", 16, 42L, 5))
    time("assigned.count")(idx.assigned.count())
    time("assigned.count2")(idx.assigned.count())
    val pairs = time("semanticPairs plan")(
      graft.llm.SemDedup.semanticPairs(corpus, "embedding", "vec_id", 16, 0.999))
    time("pairs.count")(pairs.count())
    import spark.implicits._
    val edges = (0L until 20L).map(i => (i, i + 10000L)).toDF("id_a", "id_b")
    val cc1 = time("cc plan (20 edges)")(
      graft.llm.Dedup.connectedComponents(edges, "id_a", "id_b"))
    time("cc.count")(cc1.count())
    val chain = (0L until 300L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val cc2 = time("cc plan (300-path)")(
      graft.llm.Dedup.connectedComponents(chain, "id_a", "id_b"))
    time("cc2.count")(cc2.count())
    spark.stop()
  }
}
