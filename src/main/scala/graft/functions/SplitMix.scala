package graft.functions

/** THE splitmix64 finalizer both deterministic constant streams draw
  * from: [[graft.operators.Similarity]]'s hyperplane components and
  * [[MirrorHash]]'s affine coefficients. One definition on purpose —
  * every value derived from it is embedded as a literal in DuckDB
  * oracle SQL, so two drifting private copies would silently break
  * hash-checks (the bug class this hoist removes).
  */
private[graft] object SplitMix {
  def mix(seed: Long, k: Long): Long = {
    var h = seed ^ (k * 0x9E3779B97F4A7C15L)
    h = (h ^ (h >>> 30)) * 0xBF58476D1CE4E5B9L
    h = (h ^ (h >>> 27)) * 0x94D049BB133111EBL
    h ^ (h >>> 31)
  }
}
