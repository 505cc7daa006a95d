package graft.pipeline

import scala.collection.concurrent.TrieMap

/** In-process sink for pipeline phase wall-clocks, so the bench harness
  * can surface per-phase seconds in its JSON line instead of losing them
  * to stderr. Queries that time phases record here in addition to their
  * own logging; `Bench` drains after each flagship run.
  */
object PhaseLog {
  private val timings = TrieMap.empty[String, Double]
  private val annotations = TrieMap.empty[String, String]

  def record(phase: String, seconds: Double): Unit =
    timings.put(phase, seconds)

  /** Free-form run facts (e.g. which CC kernel `auto` picked) surfaced
    * in the bench JSON's "notes" map alongside the phase seconds.
    */
  def note(key: String, value: String): Unit =
    annotations.put(key, value)

  /** Snapshot the recorded (phase → seconds) map and clear it. */
  def drain(): Map[String, Double] = {
    val snap = timings.readOnlySnapshot().toMap
    timings.clear()
    snap
  }

  def drainNotes(): Map[String, String] = {
    val snap = annotations.readOnlySnapshot().toMap
    annotations.clear()
    snap
  }
}
