package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Product quantization — the public FAISS/IVF-PQ recipe that makes
  * billion-vector ANN affordable: split the 64-dim embedding into
  * [[M]] contiguous 16-dim subspaces, train an INDEPENDENT k-means
  * codebook per subspace ([[KMeans.fitOn]] — same md5 seeds, DECIMAL
  * means, exact fixpoint stop), and represent each vector by its M
  * nearest-centroid ids: 64 doubles (512 B) become 4 small codes.
  * Search then runs in code space via ADC (asymmetric distance
  * computation): the probe precomputes one M×K table of
  * subspace-distances to every centroid, and each corpus vector's
  * approximate distance is M table lookups + adds — no float vector
  * is ever touched at query time.
  *
  * Scale: training cost is M independent Lloyd runs over ONE
  * localCheckpoint'd corpus scan per round (the slices are plan
  * expressions, not materialized copies); encoding is a single
  * map-only projection (M argmins inside whole-stage codegen); the
  * ADC table is M·K doubles computed driver-side and inlined as
  * literals, so the scan side of a query is map-only arithmetic over
  * a BIGINT-codes column — the memory-bandwidth win (128× smaller
  * than the raw vectors) is exactly why a 100 TB corpus quantizes
  * before it indexes.
  *
  * Determinism carries through from KMeans: subspace seeds are the
  * same md5-ordered rows' sub-vectors, so a DuckDB oracle unrolling
  * [[OracleRounds]] Lloyd rounds per subspace reproduces codes,
  * reconstruction errors, and ADC distances bit-for-bit.
  */
object PQ {

  /** Subspaces (64 = M × SubDim). */
  val M = 4
  val SubDim = 16

  /** Codes per subspace codebook. */
  val K = 8

  /** Oracle unroll count per subspace chain — EXACTLY the Scala round
    * cap, which makes the equality unconditional: a subspace that
    * converges early is covered by the fixpoint identity (every round
    * past convergence is the identity), and a subspace that hits the
    * cap unconverged ran exactly this many recomputes in both engines.
    * 16-dim subspaces genuinely do hit the cap (measured rounds at
    * sf0.001/0.01/0.1: 22,25,21,13 / 19,14,19,30 / 30,30,30,30 — low
    * dims leave near-ties everywhere, so Lloyd drifts longer), which
    * is why this must be MaxRounds and not a measured-convergence
    * number like [[KMeans.OracleRounds]].
    */
  val OracleRounds: Int = KMeans.MaxRounds

  case class Codebooks(books: Seq[KMeans.Model])

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Codebooks]()

  /** The j-th subspace slice as a Column over an `e` vector. */
  def subVec(e: org.apache.spark.sql.Column, j: Int) =
    slice(e, j * SubDim + 1, SubDim)

  def fit(s: SparkSession, d: String): Codebooks =
    cache.computeIfAbsent(d, _ => {
      // the KMeans model-registry contract applied per subspace:
      // serving processes load the trained codebooks from disk
      // instead of re-running M Lloyd chains
      val files = (0 until M).map(j => KMeans.modelFile(s"pq$j", d))
      val loaded = files.map(KMeans.loadModel)
      if (loaded.forall(_.isDefined)) Codebooks(loaded.map(_.get))
      else {
        val t = graft.Tables.embeddings(s, d)
          .select(col("vec_id"),
            col("embedding").cast("array<double>").as("full"))
          .localCheckpoint()
        val books = (0 until M).map { j =>
          val ej = subVec(col("full"), j)
          val m = KMeans.fitOn(
            t.select(col("vec_id"), ej.as("e"),
              graft.functions.DotProduct(ej, ej).as("ee")), K)
          KMeans.saveModel(m, files(j))
          m
        }
        Codebooks(books)
      }
    })

  /** Sequential left-fold dot — the same reduction order as
    * [[graft.functions.DotProduct]] and DuckDB's list_inner_product,
    * so driver-computed ADC entries match the oracle bitwise.
    */
  private def dotSeq(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** The probe's ADC table: luts(j)(cid) = d²(probe_j, centroid) with
    * the identical `pp − 2·p·c + c·c` expression shape the oracle
    * recomputes. M·K doubles — always literal-sized.
    */
  def adcTable(probe: Array[Double], cb: Codebooks): Seq[Seq[Double]] =
    (0 until M).map { j =>
      val pj = probe.slice(j * SubDim, (j + 1) * SubDim)
      val pp = dotSeq(pj, pj)
      cb.books(j).centroids.map { case (_, c) =>
        pp - 2.0 * dotSeq(pj, c) + dotSeq(c, c)
      }
    }

  /** Probe main: per-subspace rounds-to-convergence (OracleRounds
    * margin evidence, as KMeans.main is for n7).
    */
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { d =>
      val cb = fit(spark, d)
      println(s"$d: rounds=${cb.books.map(_.rounds).mkString(",")}")
    }
    spark.stop()
  }
}
