package graft

import org.apache.spark.sql.SparkSession

/** Once-per-(session, key) memo for derived frames and committed-layout
  * handles — the shared form of the per-session caches in
  * PipelineQueries/IvfPqIndex (one compute per session, NOT a data cache).
  *
  * Lifetime caveat, documented rather than hidden: the map is weak-KEYED
  * by session, but a memoized DataFrame strongly references its session
  * through its QueryExecution — such entries pin their key and die with
  * the JVM, not with the session. That is acceptable here because every
  * harness JVM holds a handful of sessions and the memo's job is
  * once-per-session COST (skipping rebuilds), not memory reclamation;
  * callers that memoize session-independent values (byte arrays, paths)
  * keep the full weak-key semantics.
  *
  * Staleness caveat (r13 advice, documented as the contract): entries
  * keyed on a data directory have NO invalidation — rewriting the data
  * under the same dir mid-session silently returns the old frames.
  * That is acceptable for the harness (testdata is immutable per run
  * and every bench/verify process is a fresh JVM); a deployment that
  * rewrites inputs in place must open a new session per dataset
  * version, or key the memo on a dataset fingerprint (file mtime/size)
  * instead of the bare dir. */
private[graft] object SessionMemo {
  private val maps = new java.util.WeakHashMap[
    SparkSession, scala.collection.concurrent.TrieMap[String, Any]]()

  def memo[T](spark: SparkSession, key: String)(body: => T): T = {
    val m = maps.synchronized {
      var mm = maps.get(spark)
      if (mm == null) {
        mm = scala.collection.concurrent.TrieMap.empty[String, Any]
        maps.put(spark, mm)
      }
      mm
    }
    m.getOrElseUpdate(key, body).asInstanceOf[T]
  }
}
