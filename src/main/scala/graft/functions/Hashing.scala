package graft.functions

/** Shared deterministic hash utilities. */
object Hashing {
  /** splitmix64 finalizer — a fixed, public constant stream used for every
    * derived coefficient (MinHash families, LSH hyperplanes, stub
    * features), so results are stable across runs and deployments.
    */
  def splitmix64(seed: Long): Long = {
    var z = seed + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
}
