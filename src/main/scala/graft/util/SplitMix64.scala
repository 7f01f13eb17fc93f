package graft.util

/** splitmix64 (Steele et al. 2014; public-domain mixing constants) — the
  * repo's single deterministic pseudo-random stream for derived constants:
  * minhash permutation coefficients, ANN hyperplanes/centroids/codebooks,
  * classifier weights. One definition so a constant or mixing change can
  * never skew one consumer's determinism contract away from the others'. */
object SplitMix64 {

  /** A stateful generator closure seeded at `seed`; each call returns the
    * next value of the sequence. */
  def generator(seed: Long): () => Long = {
    var x = seed
    () => {
      x += 0x9E3779B97F4A7C15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
  }
}
