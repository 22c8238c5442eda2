package graft.queries

/** Builders for DuckDB oracle SQL that bit-exactly replicates the engine's
  * deterministic hash kernels (graft.functions.Hashing.polyHash /
  * splitmix64) using HUGEINT arithmetic mod 2^64. DuckDB has no unsigned
  * 64-bit integer and checks BIGINT overflow, so every 64-bit wraparound
  * operation is emulated over HUGEINT (int128) values held in [0, 2^64):
  *
  *  - add / mod:   plain HUGEINT ops followed by `% 2^64`;
  *  - multiply:    split into 32-bit halves so intermediates stay < 2^96
  *    (a full 64×64 product would overflow int128);
  *  - xor / shift: xor only exists on BIGINT, so values round-trip through
  *    a two's-complement signed view; `>>> k` is `// 2^k` on the unsigned
  *    view.
  *
  * Each builder emits a `list_transform` pipeline so the per-element
  * expression stays linear in size (naive nesting doubles the operand per
  * splitmix step).
  */
object OracleSql {
  val M64 = "18446744073709551616::HUGEINT" // 2^64
  private val C1 = BigInt("9E3779B97F4A7C15", 16)
  private val C2 = BigInt("BF58476D1CE4E5B9", 16)
  private val C3 = BigInt("94D049BB133111EB", 16)

  /** Two's-complement BIGINT view of a HUGEINT in [0, 2^64). */
  def toSigned(e: String): String =
    s"(CASE WHEN $e >= 9223372036854775808::HUGEINT THEN $e - $M64 ELSE $e END)::BIGINT"

  /** HUGEINT-in-[0,2^64) view of a signed BIGINT. */
  def toUnsigned(e: String): String =
    s"(CASE WHEN $e < 0 THEN $e::HUGEINT + $M64 ELSE $e::HUGEINT END)"

  /** (z * c) mod 2^64 for z in [0,2^64) without int128 overflow:
    * z*c = z_lo*c + (z_hi*c mod 2^32)*2^32 (mod 2^64), both < 2^96.
    */
  private def mulMod(z: String, c: BigInt): String = {
    val cl = c % (BigInt(1) << 32)
    s"((($z % 4294967296) * $c::HUGEINT + " +
      s"((($z // 4294967296) * $cl) % 4294967296) * 4294967296) % $M64)"
  }

  /** list<varchar> → list<hugeint>: Java-style wraparound polynomial hash
    * (graft.functions.Hashing.polyHash) of each element, as the unsigned
    * [0,2^64) value. Lambda vars: s (element), i (char index), a/b (fold).
    */
  def polyHashList(listExpr: String): String =
    s"list_transform($listExpr, s -> list_reduce(" +
      "list_prepend(1125899906842597::HUGEINT, " +
      "list_transform(range(1, length(s)+1), i -> unicode(s[i:i])::HUGEINT)), " +
      s"(a,b) -> (31*a+b) % $M64))"

  /** Scalar variant of [[polyHashList]] for a single varchar expression
    * (char-index lambda var: j, fold vars: ph_a/ph_b to avoid collisions).
    */
  def polyHashScalar(e: String): String =
    s"list_reduce(list_prepend(1125899906842597::HUGEINT, " +
      s"list_transform(range(1, length($e)+1), j -> unicode($e[j:j])::HUGEINT)), " +
      s"(ph_a,ph_b) -> (31*ph_a+ph_b) % $M64)"

  private def xorShift(shift: Int): String =
    s"xor(${toSigned("z")}, (z // ${1L << shift})::BIGINT)"

  /** list<hugeint in [0,2^64)> → list<hugeint>: splitmix64 finalizer
    * (graft.functions.Hashing.splitmix64) of each element.
    */
  def splitmixList(listExpr: String): String = {
    val s0 = s"list_transform($listExpr, z -> (z + $C1::HUGEINT) % $M64)"
    def mulStep(prev: String, shift: Int, c: BigInt): String =
      s"list_transform($prev, z -> list_transform([${toUnsigned(xorShift(shift))}], " +
        s"y -> ${mulMod("y", c)})[1])"
    val s1 = mulStep(s0, 30, C2)
    val s2 = mulStep(s1, 27, C3)
    s"list_transform($s2, z -> ${toUnsigned(xorShift(31))})"
  }

  /** list<varchar> → list<hugeint>: splitmix64 ∘ polyHash — the engine's
    * mixHash — of each element, unsigned.
    */
  def mixHashList(listExpr: String): String = splitmixList(polyHashList(listExpr))

  /** Exact replica of the engine's dot product (graft.functions.DotProduct
    * and the driver-side while-loops): ascending-index left fold of
    * elementwise products. IEEE ops in identical order give bit-identical
    * doubles, so sign tests and comparisons agree across engines.
    * Lambda vars: i (index), x/y (fold accumulator/element).
    */
  def dotFold(a: String, b: String): String =
    s"list_reduce(list_transform(range(1, len($a)+1), i -> $a[i]*$b[i]), (x,y) -> x+y)"

  /** Bit-exact replica of Similarity.cosine: dot/(sqrt(aa)·sqrt(bb)) —
    * note sqrt(aa)*sqrt(bb), NOT sqrt(aa*bb), to match the engine's
    * rounding step-for-step. Use for ORDER BY so top-k tie behavior at the
    * selection boundary matches the engine's raw-similarity ranking
    * (ordering by the 4-dp-rounded output can pick a different survivor
    * when two candidates straddle the boundary within 1e-4).
    */
  def cosExact(a: String, b: String): String =
    s"(${dotFold(a, b)} / (sqrt(${dotFold(a, a)}) * sqrt(${dotFold(b, b)})))"

  /** SQL literal list of BIGINTs. */
  def longList(xs: Seq[Long]): String = xs.mkString("[", ",", "]")

  /** `(VALUES (1::HUGEINT),(2::HUGEINT),...)` rows of 2^0..2^63. */
  def bitPowerValues: String =
    (0 until 64).map(i => s"(${BigInt(1) << i}::HUGEINT)").mkString(",")
}
