package graft

/** Quiet-window gate shared by [[Bench]] and [[ScaleProof]] (VERDICT r12
  * item 6, extended to the scale tiers by r14 item 4): min-of-N only
  * partially repairs a contended box — when the 1-minute load average is
  * above `threshold`, WAIT (up to `maxWaitS`) for the window instead of
  * committing a noisy artifact; if it never quiets, the returned JSON
  * records an explicit waiver rather than silence.
  *
  * The 1-minute average cannot distinguish external contention from our
  * own just-finished Spark work, so gates placed AFTER a measured section
  * (Bench's scale tiers) use a shorter cap: the self-inflicted component
  * decays in ~1–2 min of idling, and an external hog keeps the average
  * up past the cap and lands in the waiver.
  */
object LoadGate {
  def load(): Double = java.lang.management.ManagementFactory
    .getOperatingSystemMXBean.getSystemLoadAverage

  /** Wait for a quiet window; returns a JSON object describing what was
    * seen (initial/at_start load, seconds waited, ok-or-waiver status)
    * for embedding in the measurement artifact.
    */
  def await(maxWaitS: Int = 300, threshold: Double = 1.0,
            tag: String = "bench"): String = {
    val initial = load()
    var waited = 0
    while (load() > threshold && waited < maxWaitS) {
      System.err.println(f"[$tag] load_avg ${load()}%.2f > $threshold%.1f — waiting")
      Thread.sleep(30000); waited += 30
    }
    val fin = load()
    val status = if (fin > threshold) "waiver: still contended after wait"
                 else "ok"
    f"""{"initial":$initial%.2f,"at_start":$fin%.2f,"waited_s":$waited,"status":"$status"}"""
  }
}
