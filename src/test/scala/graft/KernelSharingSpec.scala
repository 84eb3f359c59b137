package graft

import org.scalatest.funsuite.AnyFunSuite

/** The two rows-only queries (`q_llm_bpe`, `q_llm_compress_ratio`) are
  * oracle-covered by their `_det` twins ONLY IF production and twin run
  * the same kernel — the twin pins `Bpe.train`/`Bpe.encode` (full merge
  * loop replayed in DuckDB recursive CTEs) and `TextAnalysis.deflateLen`
  * (hash-matched against precomputed JDK-zlib constants), so the claim
  * "the oracle on the twin covers the production query" rests on both
  * invoking those exact entry points, just with different bounds. This
  * spec makes that source-level contract mechanical: if someone forks the
  * production query onto a parallel implementation, the twin's oracle
  * silently stops covering it — and this spec fails by name. */
class KernelSharingSpec extends AnyFunSuite {

  /** Body of `private def <name>(` up to the next `private def` /
    * `val queries` boundary, searched across every queries/ source file
    * (survives the Registry split). */
  private def defBody(name: String): String = {
    val dir = new java.io.File("src/main/scala/graft/queries")
    val files = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".scala"))
    val bodies = files.flatMap { f =>
      val src = new String(
        java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      val start = src.indexOf(s"def $name(")
      if (start < 0) None
      else {
        val restStart = start + s"def $name(".length
        val nextDef = src.indexOf(" def ", restStart)
        val end = if (nextDef < 0) src.length else nextDef
        Some(src.substring(start, end))
      }
    }
    assert(bodies.length == 1,
      s"expected exactly one definition of $name across queries/, " +
        s"found ${bodies.length}")
    bodies.head
  }

  test("q_llm_bpe and q_llm_bpe_det share the Bpe.train + Bpe.encode " +
      "kernel (twin oracle covers the production trainer)") {
    for (d <- Seq("llmBpe", "llmBpeDet")) {
      val body = defBody(d)
      assert(body.contains("Bpe.train("), s"$d no longer calls Bpe.train")
      assert(body.contains("Bpe.encode("), s"$d no longer calls Bpe.encode")
    }
  }

  test("q_llm_compress_ratio and its det twin share the " +
      "TextAnalysis.deflateLen kernel (twin constants cover production)") {
    for (d <- Seq("llmCompressRatio", "llmCompressRatioDet")) {
      val body = defBody(d)
      assert(body.contains("TextAnalysis.deflateLen("),
        s"$d no longer calls TextAnalysis.deflateLen")
    }
  }

  test("q_llm_semdedup and q_llm_semdedup_det share the BOUNDED pairing " +
      "chain SemDedup.detCorpusPairs (neither may fork back to an " +
      "uncapped within-cell self-join — the corpus-quadratic shape)") {
    for (d <- Seq("llmSemDedup", "llmSemDedupDet")) {
      val body = defBody(d)
      assert(body.contains("SemDedup.detCorpusPairs("),
        s"$d no longer routes pairing through SemDedup.detCorpusPairs")
    }
    // detCorpusPairs itself must stay a front door to the bounded
    // kernel: its distributed fallback composes detBoundedPairs and its
    // single-task path composes detPairsKernel (the same capped /
    // sub-split / chain-degrade arithmetic both ways).
    val semSrc = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/main/scala/graft/llm/SemDedup.scala")),
      "UTF-8")
    val front = semSrc.substring(semSrc.indexOf("def detCorpusPairs("))
    assert(front.contains("detBoundedPairs(") &&
      front.contains("detPairsKernel("),
      "detCorpusPairs no longer routes both paths through the bounded " +
        "pairing kernel")
    // And the production query's gate input is the corpus helper that
    // PairMassSweep's semDedupWithCell consumes — the scale gate must
    // watch the REGISTERED plan's input.
    assert(defBody("llmSemDedup").contains("semDedupCorpus("),
      "llmSemDedup no longer builds its gate input via semDedupCorpus")
    assert(defBody("semDedupWithCell").contains("semDedupCorpus("),
      "PairMassSweep's semDedupWithCell no longer shares the registered " +
        "corpus builder (the scale gate would measure a different input)")
  }

  test("q_llm_semdedup_eval prices the registered plan: same gate input " +
      "helper and the same bounded pairing chain as production") {
    val body = defBody("llmSemdedupEval")
    assert(body.contains("semDedupCorpus("),
      "llmSemdedupEval no longer evaluates the registered gate input")
    assert(body.contains("SemDedup.detCorpusPairs("),
      "llmSemdedupEval no longer scores the bounded pairing chain — " +
        "its recall number would describe a lookalike, not the plan")
  }
}
