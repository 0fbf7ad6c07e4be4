package graft.io

/** The one recursive temp-dir delete (Bench's corpus-day store and
  * staging warehouse, the time-travel store's shutdown hook, the
  * scaling probes' per-tier stores) — cleanup fixes land once, not in
  * three hand-rolled copies. */
object TempDirs {

  def deleteRecursively(path: String): Unit =
    deleteRecursively(new java.io.File(path))

  def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(); ()
  }

  /** Remove `path` at JVM exit — for per-session stores whose
    * lifetime IS the session (the time-travel query's memoized store:
    * every entry point — Bench, Verify, a spec run — builds one, and
    * nothing outlives the JVM to read it). */
  def deleteOnExit(path: String): Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      deleteRecursively(new java.io.File(path))))
    ()
  }
}
