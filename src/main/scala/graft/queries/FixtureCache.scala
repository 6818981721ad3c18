package graft.queries

/** Process-wide memo for deterministic in-query fixture directories
  * (q227's .warc.gz files, q228's WebDataset shards, …).
  *
  * The container-ingest queries build their scan input as real files in
  * a unique per-run temp directory — race-free across concurrent
  * processes (each JVM gets its own dirs) and cluster-safe (built on
  * the driver). But the build is scaffolding, not the measured path:
  * rebuilding it on every invocation would dominate bench timings at
  * large SFs (the collect + compress of the whole corpus). Since the
  * content is a pure deterministic function of the source directory,
  * one build per JVM per source is sufficient; repeated invocations
  * (bench's two timed passes, multi-query verifies) reuse the same
  * files. Directories register for JVM-exit cleanup.
  */
object FixtureCache {
  private val dirs = scala.collection.mutable.Map.empty[String, String]

  /** Return the fixture dir for `key`, building it via `populate` (which
    * receives the new directory's path) exactly once per JVM.
    */
  def dir(key: String)(populate: String => Unit): String = synchronized {
    dirs.getOrElseUpdate(key, {
      val path = java.nio.file.Files
        .createTempDirectory("graft_fixture_").toString
      // dir registered first = deleted last on JVM exit
      new java.io.File(path).deleteOnExit()
      populate(path)
      new java.io.File(path).listFiles().foreach(_.deleteOnExit())
      path
    })
  }
}
