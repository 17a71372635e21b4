package graft

/** Tiny env-gated progress logger (GRAFT_VERBOSE=1) for driver-side phase
  * timing of the iterative operators — stderr only, never in the data path.
  */
object Log {
  private val on = sys.env.get("GRAFT_VERBOSE").contains("1")
  private val t0 = System.nanoTime()
  def v(msg: => String): Unit =
    if (on) System.err.println(f"[graft ${(System.nanoTime() - t0) / 1e9}%8.2fs] $msg")
}
