package graft.engine

import java.nio.file.{Files, Path}
import java.util.Comparator
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

/** Per-process scratch space for derived artifacts (partitioned
  * layouts, dedup band indexes, IVF codebooks): built ONCE per
  * (prefix, key) per JVM, reused by every later invocation, deleted
  * whole on JVM exit.
  *
  * This is the local stand-in for a deployment's persisted-artifact
  * store: the build step that runs here at first use is exactly the
  * build-once job a 100 TB pipeline schedules (and points at durable
  * storage instead of a temp dir). Keying by the INPUT path keeps the
  * artifact deterministic — same input, same artifact — so reuse
  * within a process (a multi-pass bench, a Verify run) is safe, and a
  * bounded number of distinct inputs bounds disk.
  */
object Scratch {

  private val roots = new ConcurrentHashMap[String, Path]()
  private val built =
    new ConcurrentHashMap[String, java.util.concurrent.CompletableFuture[String]]()
  private val seq = new AtomicLong(0)

  /** One scratch root per (JVM, prefix), deleted recursively on exit. */
  private def root(prefix: String): Path =
    roots.computeIfAbsent(prefix, { p =>
      val r = Files.createTempDirectory(s"graft_${p}_")
      sys.addShutdownHook {
        if (Files.exists(r)) {
          val s = Files.walk(r)
          try s.sorted(Comparator.reverseOrder[Path]())
            .forEach(f => Files.deleteIfExists(f))
          finally s.close()
        }
      }
      r
    })

  /** Path of the (prefix, key) artifact, running `build` exactly once
    * per JVM for it. `build` must fully materialize the artifact at
    * the given path before returning.
    *
    * Memoized as a per-key future claimed with putIfAbsent and BUILT
    * OUTSIDE the map — builds are long Spark jobs, and running them
    * inside computeIfAbsent would hold the bin lock (blocking
    * unrelated same-bin keys) and forbid a build that composes another
    * cached artifact (CHM throws on recursive update). A failed build
    * removes its future so a later caller can retry; concurrent
    * callers of a failing build all see the failure. */
  def cached(prefix: String, key: String)(build: String => Unit): String = {
    val k = s"$prefix\n$key"
    val fresh = new java.util.concurrent.CompletableFuture[String]()
    val prior = built.putIfAbsent(k, fresh)
    if (prior != null) prior.join()
    else
      try {
        val path = s"${root(prefix)}/${seq.incrementAndGet()}"
        build(path)
        fresh.complete(path)
        path
      } catch {
        case e: Throwable =>
          fresh.completeExceptionally(e)
          built.remove(k, fresh)
          throw e
      }
  }
}
