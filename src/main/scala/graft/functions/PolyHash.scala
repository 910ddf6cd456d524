package graft.functions

/** Shared integer-hash primitives for the dedup/LSH family — every
  * constant and fold here is chosen to be REPLAYABLE IN DUCKDB SQL
  * with no 64-bit wraparound: all arithmetic stays inside a signed
  * Long, so the identical expressions run on both engines and the
  * driver's correctness gate can hash-compare the full MinHash /
  * SimHash / banding pipelines instead of recording them rows-only
  * (round 8; the previous xxhash64 basis is not expressible in SQL —
  * XXH64 needs 64-bit wraparound multiplies).
  *
  * Building blocks:
  *  - [[mix32]]: 32-bit multiplicative + xor-shift scramble (also the
  *    basis of the ANN hyperplanes in graft.sim.Similarity) — seeds
  *    the MinHash permutation coefficients.
  *  - token hash: TWO byte-level polynomial rolling folds (mults 31
  *    and 37) mod M, packed into one 60-bit value `h31 << 31 | h37` —
  *    wide enough that token/shingle collisions are ~2^-60 noise,
  *    while each half stays < 2^30 so every downstream fold fits a
  *    Long.
  *  - [[combine]]: seeded polynomial fold over longs mod M — shingle
  *    hashes (two folds packed the same way) and band keys.
  *  - MinHash "permutations": universal-hash family
  *    `(a_p · (x mod M) + b_p) mod M` with mix32-seeded coefficients.
  */
object PolyHash {

  /** Fold modulus (1e9+7) — intermediates stay < 2^61. */
  val M = 1000000007L
  /** Primary / secondary fold multipliers (both < M). */
  val B1 = 1000003L
  val B2 = 999983L

  /** 32-bit integer mix: multiplicative scramble + two xor-shift
    * folds, everything mod 2^32 — every intermediate fits a Long and
    * the same arithmetic runs in DuckDB (`%`, `//`, `xor`).
    */
  def mix32(x: Long): Long = {
    val Mod = 4294967296L
    var v = (x * 2654435761L) % Mod
    v = v ^ (v >> 16)
    v = (v * 40503L) % Mod
    v ^ (v >> 16)
  }

  /** Seeded polynomial fold over already-hashed longs:
    * `h = (h * mult + v) mod M`, h0 = `seed`. Inputs may be up to
    * 60-bit (packed token hashes): `h·mult < 2^50` plus `v < 2^61`
    * stays well inside a Long before the mod.
    */
  def combine(seed: Long, mult: Long, vs: Array[Long]): Long = {
    var h = seed
    var i = 0
    while (i < vs.length) {
      h = (h * mult + vs(i)) % M
      i += 1
    }
    h
  }

  /** 60-bit packed token hash over UTF-8 bytes: two rolling folds
    * (mults 31 / 37, seed 0) mod M, packed `h31 << 31 | h37`. The
    * DuckDB replay folds `ascii()` code points — identical for ASCII
    * corpora (the documents fixture; same caveat as RollingHash).
    */
  def tokenHash64(bytes: Array[Byte]): Long = {
    var h31 = 0L
    var h37 = 0L
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xFFL
      h31 = (h31 * 31L + b) % M
      h37 = (h37 * 37L + b) % M
      i += 1
    }
    (h31 << 31) | h37
  }

  /** 60-bit packed combine of `n` packed token hashes (word-n-gram
    * shingle): two seeded folds (seed 7, mults B1/B2) packed as
    * `s1 · M + s2` — a single Long (< (M−1)·M + M ≈ 1.0e18).
    */
  def shingleHash(th: Array[Long], from: Int, n: Int): Long = {
    var s1 = 7L
    var s2 = 7L
    var j = 0
    while (j < n) {
      val v = th(from + j)
      s1 = (s1 * B1 + v) % M
      s2 = (s2 * B2 + v) % M
      j += 1
    }
    s1 * M + s2
  }

  /** MinHash permutation coefficients, mix32-seeded at offset 1000:
    * `a_p ∈ [1, M−1]`, `b_p ∈ [0, M)`.
    */
  val MaxPerms = 64
  val PermA: Array[Long] =
    Array.tabulate(MaxPerms)(p => mix32(1000L + 2L * p) % (M - 1L) + 1L)
  val PermB: Array[Long] =
    Array.tabulate(MaxPerms)(p => mix32(1001L + 2L * p) % M)

  /** Permutation p of a (possibly packed ≥M) hash value:
    * `(a_p · (x mod M) + b_p) mod M` — product < M² ≈ 1e18.
    */
  def perm(p: Int, x: Long): Long =
    (PermA(p) * (x % M) + PermB(p)) % M
}
