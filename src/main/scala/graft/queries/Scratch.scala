package graft.queries

/** Per-JVM scratch directories for queries that must materialize an
  * intermediate on-disk layout (JSONL/shard exports, manifest and Bloom
  * file layouts, format roundtrips). One directory per tag per process —
  * a repeated invocation overwrites the same path instead of minting a
  * new one — and a JVM shutdown hook removes each tree, so repeated
  * bench/verify runs no longer accumulate corpus copies under /tmp.
  * Concurrent JVMs are safe by construction: `createTempDirectory`
  * hands every process its own unique path. */
private[graft] object Scratch {

  private val dirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The per-process scratch dir for `tag`, created (and registered for
    * exit-time deletion) on first use. */
  def dir(tag: String): String =
    dirs.computeIfAbsent(tag, { t =>
      val p = java.nio.file.Files.createTempDirectory(s"graft-$t")
      sys.addShutdownHook(delete(p.toFile))
      p.toString
    })

  /** A UNIQUE directory per call, nested under `dir(tag)` so the exit
    * hook sweeps it with the parent. For state that must start empty on
    * every invocation (e.g. a fresh [[graft.store.VersionStore]] —
    * reusing one path would leak rows between store-lifecycle queries). */
  def fresh(tag: String): String =
    java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(dir(tag)), "run").toString

  private def delete(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(delete)
    f.delete()
    ()
  }
}
