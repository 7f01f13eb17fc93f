package graft.util

/** splitmix64 (Steele et al. 2014; public-domain mixing constants) — the
  * repo's single deterministic pseudo-random stream for derived constants:
  * minhash permutation coefficients, ANN hyperplanes/centroids/codebooks,
  * classifier weights, and (via [[graft.functions.Mix64]]) the columnar
  * per-key selector in the MLM/span-corruption plans. One definition so a
  * constant or mixing change can never skew one consumer's determinism
  * contract away from the others'. */
object SplitMix64 {

  /** 2/φ in 64-bit fixed point — the stream increment ("golden gamma"). */
  val Gamma: Long = 0x9E3779B97F4A7C15L
  val C1: Long = 0xBF58476D1CE4E5B9L
  val C2: Long = 0x94D049BB133111EBL

  /** The avalanche finalizer (splitmix64.c, public domain). */
  def mix(x: Long): Long = {
    var z = x
    z = (z ^ (z >>> 30)) * C1
    z = (z ^ (z >>> 27)) * C2
    z ^ (z >>> 31)
  }

  /** Random access into the stream seeded at `seed`. Alignment is 1-BASED
    * against [[generator]]: `at(seed, n)` is the n-th generated output for
    * n >= 1 (the generator's first draw is `mix(seed + Gamma)` =
    * `at(seed, 1)`); `at(seed, 0)` = `mix(seed)` is NEVER produced by the
    * generator. Consumers aligning indexed access with a walked sequence
    * must start at n = 1 or the whole stream shifts by one draw. */
  def at(seed: Long, n: Long): Long = mix(seed + n * Gamma)

  /** A stateful generator closure seeded at `seed`; each call returns the
    * next value of the sequence. */
  def generator(seed: Long): () => Long = {
    var x = seed
    () => {
      x += Gamma
      mix(x)
    }
  }
}
