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

  /** Java-style wraparound polynomial string hash (h = 31h + c over long
    * overflow, fixed seed). Chosen over murmur3 for the sketch operators
    * deliberately: it is exactly emulatable in portable SQL (HUGEINT
    * arithmetic mod 2^64), so every sketch built on it gets a bit-exact
    * external oracle instead of a rows-only check.
    */
  def polyHash(s: String): Long = {
    var h = 1125899906842597L
    var i = 0
    while (i < s.length) { h = 31 * h + s.charAt(i); i += 1 }
    h
  }

  /** Well-mixed 64-bit string hash: splitmix64 finalizer over [[polyHash]].
    * Full avalanche (poly hash alone has weak high bits for short strings)
    * while staying SQL-emulatable — the oracle replicates both stages.
    */
  def mixHash(s: String): Long = splitmix64(polyHash(s))
}
