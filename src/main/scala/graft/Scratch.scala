package graft

/** Per-JVM scratch-space manager for operators that materialize
  * intermediate artifacts (dedup indexes, Derby snapshots, format
  * round-trips). Two disciplines, both learned from the round-13
  * bench forensics (seven `Files.createTempDirectory` sites, none
  * cleaned — at bench time each gate runs 3x and the leaked parquet
  * indexes + Derby zips accumulated on the shared scratch disk until
  * the later blocks measured the disk, not the engine):
  *
  *  1. '''Fixed per-tag paths, wiped on reuse.''' `dir("mh_index")`
  *     always resolves to the same location inside this JVM's scratch
  *     root; re-invoking the same gate wipes and reuses it instead of
  *     leaking a fresh sibling. A bench pass-3 invocation therefore
  *     holds exactly one copy of each gate's scratch, not three.
  *  2. '''Shutdown-hook cleanup of the whole root.''' The scratch
  *     root is deleted recursively when the JVM exits, so Verify,
  *     Bench, the soak harnesses, and every ScalaTest JVM leave the
  *     host disk as they found it.
  *
  * Callers that return LAZY plans over scratch artifacts (the gate
  * surfaces do — e.g. the incremental probe reads the index it just
  * wrote) are safe under (1) because each gate fully materializes its
  * result before the harness invokes the next one, and a re-invocation
  * of the SAME gate only wipes its own tag after the prior plan is
  * spent.
  */
object Scratch {

  private lazy val root: java.nio.file.Path = {
    val r = java.nio.file.Files.createTempDirectory("graft_scratch")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(r)))
    r
  }

  /** Fixed scratch directory for `tag`: wiped if it already exists
    * (the reuse-not-leak discipline), then recreated empty. Returns
    * the absolute path as a string — every call site feeds it to
    * file-URI consumers (parquet writers, Derby URLs).
    */
  def dir(tag: String): String = synchronized {
    val d = root.resolve(tag)
    deleteRecursively(d)
    java.nio.file.Files.createDirectories(d)
    d.toString
  }

  /** Wipe every tag under the root (between bench blocks — so the
    * soak10x and cluster12 measurements start from the disk state a
    * fresh JVM would see). The root itself survives for later tags.
    */
  def wipeAll(): Unit = synchronized {
    val r = root
    if (java.nio.file.Files.exists(r)) {
      val stream = java.nio.file.Files.list(r)
      try {
        stream.forEach(p => deleteRecursively(p))
      } finally stream.close()
    }
  }

  /** Bytes free on the filesystem holding the scratch root — sampled
    * into the bench artifact so a disk-pressure run is diagnosable
    * from the artifact alone.
    */
  def freeBytes(): Long = root.toFile.getUsableSpace

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      val stream = java.nio.file.Files.walk(p)
      try {
        stream.sorted(java.util.Comparator.reverseOrder())
          .forEach(q => { q.toFile.delete(); () })
      } finally stream.close()
    }
}
