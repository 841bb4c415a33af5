package graft

/** In-band attribution of Structured-Streaming engine startup (round-8
  * verdict #6: the suite's streaming queries each carry seconds of
  * engine/state-store/file-listing startup that is CONSTANT in data size —
  * ~18 s across the suite at sf0.1 — and without a channel of its own it
  * reads as data-proportional query cost).
  *
  * Every blocking streaming run goes through [[await]]: it awaits
  * termination, then records the wall time from the caller's pre-`start()`
  * timestamp to the END of the FIRST micro-batch (trigger start from
  * `recentProgress.head.timestamp` + its `batchDuration`) — i.e. stream
  * initialization + source discovery + state-store open + the first
  * trigger's fixed overheads. A run that processed zero batches is pure
  * startup and records its whole wall time. [[graft.Bench]] drains after
  * every timed query and emits a `stream_startup_sec` JSON field (sum over
  * the query's runs), so the data-proportional remainder is separable in
  * the artifact. Same process-wide buffer discipline as [[LayoutLog]].
  */
object StreamLog {
  private val buf = scala.collection.mutable.ArrayBuffer.empty[Double]

  def record(sec: Double): Unit = buf.synchronized { buf += sec }

  /** Drain all startup timings recorded since the previous drain. */
  def drain(): Seq[Double] = buf.synchronized { val r = buf.toList; buf.clear(); r }

  /** Await a streaming query's termination, recording its time-to-first-
    * batch-completion measured from `t0Ms` (epoch millis taken by the
    * caller BEFORE `.start()`). */
  def await(t0Ms: Long, q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    q.awaitTermination()
    val ps = q.recentProgress
    val sec =
      if (ps.nonEmpty)
        (java.time.Instant.parse(ps.head.timestamp).toEpochMilli +
          ps.head.batchDuration - t0Ms) / 1000.0
      else (System.currentTimeMillis() - t0Ms) / 1000.0
    record(math.max(0.0, sec))
  }
}
