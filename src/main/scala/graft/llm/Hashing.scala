package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine deterministic hashing for the dedup/similarity
  * operators: md5 prefix as an integer. Unlike Spark's murmur `hash()`
  * (seed/implementation-specific), md5 is identical everywhere, so the
  * DuckDB oracle can recompute signatures bit-for-bit.
  *
  * Spark:  conv(substr(md5(s), 1, k), 16, 10) :: long
  * DuckDB: CAST('0x' || substr(md5(s), 1, k) AS BIGINT)
  *
  * `hash28` keeps 28 bits (7 hex chars) so minhash's `(a*h + b) % p`
  * stays far from 64-bit overflow with 30-bit coefficients.
  */
object Hashing {
  /** 60-bit positive hash of a string column. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** 28-bit positive hash of a string column. */
  def hash28(c: Column): Column =
    conv(substring(md5(c), 1, 7), 16, 10).cast("long")

  def sqlHash60(expr: String): String =
    s"CAST('0x' || substr(md5($expr), 1, 15) AS BIGINT)"

  def sqlHash28(expr: String): String =
    s"CAST('0x' || substr(md5($expr), 1, 7) AS BIGINT)"

  /** Minhash permutation constants — one (a, b) pair per permutation,
    * derived from a fixed LCG so Scala emits the SAME literals into the
    * Spark plan and the oracle SQL. p = 2^31-1 (Mersenne): with 28-bit
    * shingle hashes and 30-bit coefficients, a*h+b < 2^58 fits a long,
    * and p < a*h ensures the modulus actually permutes (a larger p
    * would make `(a*h+b) % p` the identity and collapse every
    * permutation onto argmin(h)).
    */
  val MinhashP: Long = (1L << 31) - 1
  def minhashCoeffs(k: Int): Seq[(Long, Long)] = {
    var state = 42L
    def next(): Long = { state = (state * 6364136223846793005L + 1442695040888963407L) & 0x3FFFFFFFL; state }
    (0 until k).map { _ =>
      val a = next() | 1L // odd, <2^30
      val b = next()
      (a, b)
    }
  }
}
