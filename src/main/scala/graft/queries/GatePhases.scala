package graft.queries

/** Build/fold phase attribution for the bench's ingest group (r16 —
  * VERDICT "what's wrong" #4): several ingest gates construct their
  * persisted-store stand-ins EAGERLY at query-function invocation (the
  * one-shot CC store, decoded fingerprint frames, the DSIR model) —
  * gate scaffolding that a real deployment amortizes across nights but
  * the timed gate pays every run. Those gates wrap the eager build in
  * [[build]], so Bench can report `build_s` (scaffolding) and `fold_s`
  * (the O(batch) trend the group exists to watch) separately — a fold
  * regression is visible in the sidecar without a ScaleProbe run.
  *
  * Bench times queries strictly sequentially and drains between them;
  * Verify/tests ignore the registry entirely (recording is a nanoTime
  * subtraction and one map update — noise). Lazy gates never call in,
  * and their absence reads as build_s = 0: honest — their store
  * lineage executes inside the fold. */
object GatePhases {
  private val buildNs = scala.collection.mutable.Map.empty[String, Long]

  // attribution keys are gate-name string literals inside query closures
  // (r16 VERDICT "what's wrong" #4): a gate rename would silently zero
  // its build/fold sidecar split. One line of defense: a recorded key
  // must name a registered query. Lazy — SparkEntry.queries is fully
  // constructed before any closure can call build().
  private lazy val knownQueries: Set[String] = graft.SparkEntry.queries.keySet

  /** Record the wall-clock of an eager store-build block under `query`
    * (cumulative — a gate may build several artifacts). */
  def build[A](query: String)(body: => A): A = {
    require(knownQueries(query),
      s"GatePhases.build('$query'): not a registered SparkEntry query — " +
        "a renamed gate must rename its build-attribution key with it")
    val t0 = System.nanoTime()
    try body
    finally synchronized {
      buildNs(query) = buildNs.getOrElse(query, 0L) + (System.nanoTime() - t0)
    }
  }

  /** Read-and-clear the recorded build seconds for one query. */
  def drain(query: String): Double = synchronized {
    buildNs.remove(query).map(_.toDouble / 1e9).getOrElse(0.0)
  }

  def reset(): Unit = synchronized { buildNs.clear() }
}
