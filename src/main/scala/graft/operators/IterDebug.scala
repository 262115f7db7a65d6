package graft.operators

/** Opt-in stderr tracing for the iterative operators (TreeDepth,
  * Components): per-round row counts and wall time. Off unless
  * GRAFT_ITER_DEBUG is set — zero cost on the normal path, and the
  * bench/driver output streams stay clean.
  */
private[graft] object IterDebug {
  val on: Boolean = sys.env.contains("GRAFT_ITER_DEBUG")
  def log(msg: String): Unit = Console.err.println(s"[graft-iter] $msg")
}
