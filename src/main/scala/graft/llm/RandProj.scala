package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection (Achlioptas 2003's
  * database-friendly variant of JL 1984): project d-dim embeddings onto
  * k ≪ d random directions, preserving pairwise distances to within
  * 1 ± ε with k = O(ε⁻² log n) — the standard cheap first stage before
  * near-dup search or clustering when 64+ dims are too wide to scan.
  *
  * Directions reuse the repo's md5-derived hyperplane family
  * ([[Similarity.hyperplanes]], the same planes sign-LSH uses): every
  * component is replayable by an external SQL engine, so unlike a
  * seeded-RNG Gaussian matrix the WHOLE projection is oracle-checkable.
  * Each output coordinate rides the native [[graft.expressions.FloatDot]]
  * loop kernel (codegen-safe at any k·d; an unrolled term-sum tree blows
  * Janino's 64 KB method limit — the lshBucket lesson), accumulating in
  * ascending index order so results are bit-identical to the SQL
  * list_zip fold.
  *
  * Scale shape: shuffle-free scan → project (k dot products per row);
  * output rows are k doubles instead of d floats. Distance preservation
  * within the JL bound is pinned statistically in RandProjSpec. */
object RandProj {

  /** (id, proj[k]) with each coordinate half-up-rounded to 6 dp (the
    * repo's engine-portable surfacing convention for derived doubles). */
  def project(df: DataFrame, idCol: String, embCol: String,
              kOut: Int, dim: Int): DataFrame = {
    val planes = Similarity.hyperplanes(kOut, dim)
    df.select(col(idCol),
      array(planes.map(p =>
        Similarity.roundHalfUp(
          Similarity.dot(col(embCol), lit(p.toArray)), 6)): _*).as("proj"))
  }
}
