package graft

/** Sub-metric stamps for bench attribution (r11 VERDICT #8): a query
  * whose timed region is dominated by a fixed setup cost (q124 rebuilds
  * a full scratch IVF-PQ index before exercising the ~0.5 s maintenance
  * policy it actually measures) wraps its MEASURED phase in [[time]];
  * Bench emits the stamps as a `sub` map in the artifact, so a policy
  * regression is readable through the training noise without isolated
  * re-runs. Stamps keep the MIN across passes — the same min-of-two
  * discipline as the per-query numbers.
  */
object BenchProbes {
  private val stamps =
    scala.collection.concurrent.TrieMap.empty[String, Double]

  def time[A](key: String)(f: => A): A = {
    val t0 = System.nanoTime()
    try f
    finally {
      val sec = (System.nanoTime() - t0) / 1e9
      stamps.updateWith(key) {
        case Some(prev) => Some(math.min(prev, sec))
        case None => Some(sec)
      }
      ()
    }
  }

  def snapshot(): Map[String, Double] = stamps.toMap
}
