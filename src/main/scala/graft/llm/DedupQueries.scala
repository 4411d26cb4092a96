package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for a large-scale training-data pipeline,
  * over the `documents` table: exact (hash group-by), MinHash+LSH
  * (shingle → minhash → band → bucket-join), n-gram Jaccard, SimHash.
  * Embedding-cosine near-dup lives in [[SimilarityQueries]].
  *
  * All signatures use the cross-engine md5 hashing in [[Hashing]] so
  * the DuckDB oracle reproduces them bit-for-bit. Shingles are 8-char
  * substrings (probed on the testdata: unigram sets saturate — 31-word
  * vocabulary — while 8-grams give jaccard ≤ 0.2 for unrelated docs
  * and isolate the planted near-dup pair).
  *
  * Scale notes: minhash signatures are computed entirely inside one
  * projection (array expressions, no explode, no shuffle); LSH banding
  * shuffles only (doc, band, bucket) tuples — |docs|·4 rows — and the
  * candidate-pair join is per-bucket, which is the whole point of LSH;
  * exact dedup groups by a 128-bit digest, never by raw text, so
  * shuffle rows stay small no matter how large documents get.
  */
object DedupQueries {
  import graft.Tables.documents
  import Hashing._

  private val K = 16 // permutations
  private val Bands = 4 // 4 bands x 4 rows
  private val BucketCap = 2 // d7 hot-bucket cap (binds on the testdata)
  private val coeffs = minhashCoeffs(K)

  /** Effective hot-bucket cap for this session: conf
    * `graft.dedup.bucket_cap`, default [[BucketCap]]. The dial exists
    * because the cap is the dedup family's RECALL lever — the
    * D15CountProbe census measured planted-dup recall falling
    * 44% → 26% on the 4M→16M step at the default as saturating
    * buckets shed — and production re-dials it with corpus density
    * ([[lshOccupancy]] computes the recommendation). Verification
    * assumes the DEFAULT (the DuckDB oracles bake BucketCap in), the
    * same contract as the ANN family's nprobe/pq.k dials.
    */
  private[graft] def bucketCap(s: SparkSession): Int =
    s.conf.getOption("graft.dedup.bucket_cap").map(_.toInt)
      .getOrElse(BucketCap)

  /** One-touch preset over the measured recall ladder (round-11
    * verdict item 2): `graft.dedup.profile=recall` bundles the point
    * SCALING.md measured as dominant on saturated corpora —
    * num_perms=32 at rows_per_band=8 (engine-validated 0.966/0.960
    * planted recall at 4M/16M, ~2× d7 cost, candidates still linear)
    * — because the two dials are only sound TOGETHER: k=32 at the
    * default r=4 measured WORSE than defaults (0.44 vs the 0.44–0.68
    * band). A session that sets the profile AND a conflicting
    * explicit dial is a misconfiguration this preset exists to close,
    * so it fails loudly instead of silently picking one.
    * Verification assumes no profile, like every other dial.
    */
  private[graft] val RecallProfilePerms = 32
  private[graft] val RecallProfileRowsPerBand = 8
  private def profileOf(s: SparkSession): Option[String] =
    s.conf.getOption("graft.dedup.profile").map {
      case p @ "recall" => p
      case other => throw new IllegalArgumentException(
        s"unknown graft.dedup.profile '$other' (supported: recall)")
    }

  /** Resolve one chain dial against the active profile: explicit conf
    * wins when no profile is set; under a profile the preset value
    * applies and a CONFLICTING explicit conf throws (a half-dialed
    * recall config measured worse than defaults — SCALING.md r11). */
  private def profiledDial(
      s: SparkSession, conf: String, default: Int, preset: Int): Int = {
    val explicit = s.conf.getOption(conf).map(_.toInt)
    profileOf(s) match {
      case Some(p) =>
        explicit match {
          case Some(v) if v != preset =>
            throw new IllegalArgumentException(
              s"graft.dedup.profile=$p pins $conf=$preset but the " +
                s"session sets $conf=$v - unset one (the dials are " +
                "only sound together; the half-configured state " +
                "measured worse than defaults, SCALING.md round 11)")
          case _ => preset
        }
      case None => explicit.getOrElse(default)
    }
  }

  /** The THIRD dedup recall lever (round-10 verdict item 2): the
    * permutation count K. `graft.dedup.rows_per_band` squares down
    * per-band collision probability but CAPS recall at the
    * bands-that-remain ceiling (2 bands of 8 ⇒ pairs sharing any
    * bucket ≈ 0.84 of planted at 16M — SCALING.md); raising K adds
    * independent bands, which lifts that ceiling (1 −
    * (1 − j^r)^(K/r) → 1 with K) at a signature cost LINEAR in K and
    * a banded-relation cost linear in bands. Session dial
    * `graft.dedup.num_perms` (must be divisible by rows_per_band),
    * default [[K]]; verification assumes the default like the other
    * two dials.
    */
  private[graft] def numPerms(s: SparkSession): Int =
    profiledDial(s, "graft.dedup.num_perms", K, RecallProfilePerms)

  /** Spark-side SQL expr for the distinct 8-char shingle hash array. */
  private val shingleHashesExpr =
    """array_distinct(transform(
      |  sequence(0, greatest(length(text) - 8, 0)),
      |  i -> CAST(conv(substr(md5(substring(text, i + 1, 8)), 1, 7), 16, 10) AS BIGINT)))"""
      .stripMargin

  /** DuckDB equivalent of [[shingleHashesExpr]] (shared with x8). */
  private[llm] val sqlShingleHashes =
    """list_distinct(list_transform(
      |  range(greatest(len(text) - 7, 1)),
      |  i -> CAST('0x' || substr(md5(substr(text, i + 1, 8)), 1, 7) AS BIGINT)))"""
      .stripMargin

  private val sigExpr = {
    val mins = coeffs.map { case (a, b) =>
      s"array_min(transform(hs, h -> (${a}L * h + ${b}L) % ${MinhashP}L))"
    }
    s"array(${mins.mkString(", ")})"
  }

  private val sqlSig = {
    val mins = coeffs.map { case (a, b) =>
      s"list_min(list_transform(hs, h -> ($a * h + $b) % $MinhashP))"
    }
    s"[${mins.mkString(", ")}]"
  }

  /** Band bucket ids: 60-bit BIGINT digests of each band's sigs.
    * A fixed-width integer, not the md5 hex string — the banded
    * relation (|docs| x bands rows) shuffles through one group-by and
    * two joins, so key width is its whole cost (the x11 lesson). LSH
    * blocking tolerates digest truncation: a 60-bit collision only
    * creates a spurious candidate pair, which d8's exact verify
    * kills — unlike d1's exact digest, which stays full-width.
    *
    * Parametrized by ROWS PER BAND `r` (bands = K/r): raising r
    * squares down the per-band collision probability (a band matches
    * iff all r mins agree), which is the production response to a
    * corpus whose band-signature space saturates — the saturated 4M
    * probe's widest bucket fell 61,017 → narrow at r=8 while
    * near-identical dups (agreement ~0.95) still share a band with
    * high probability. Session dial `graft.dedup.rows_per_band`
    * (divisor of K, default 4 — the oracle-pinned banding).
    */
  private def bucketsExprFor(r: Int, k: Int = K): String = {
    require(k % r == 0, s"rows_per_band must divide num_perms $k")
    val bs = (0 until k / r).map { b =>
      val parts = (0 until r).map(i => s"sig[${b * r + i}]")
      s"CAST(conv(substr(md5(concat_ws('_', ${parts.mkString(", ")})), 1, 15), 16, 10) AS BIGINT)"
    }
    s"array(${bs.mkString(", ")})"
  }
  private val bucketsExpr = bucketsExprFor(K / Bands)

  /** Effective rows-per-band for this session (see [[bucketsExprFor]]);
    * verification assumes the default, like the cap dial. */
  private[graft] def rowsPerBand(s: SparkSession): Int =
    profiledDial(s, "graft.dedup.rows_per_band", K / Bands,
      RecallProfileRowsPerBand)

  /** Every session dial the d7→d15 chain reads, as (tag, value) —
    * the SINGLE source the queries' dial reads and the d15 memo key
    * both derive from (ADVICE round 11: a dial added to the chain but
    * not the hand-maintained key string would silently serve
    * stale-dial memos). Adding a chain dial means adding it HERE;
    * the memo key then picks it up by construction. The profile
    * resolves through numPerms/rowsPerBand, so a profiled session
    * keys identically to the equivalent explicit dials — which is
    * correct, because the pair sets are identical by construction
    * (ProfilePresetSpec pins it).
    */
  private[graft] def chainDials(s: SparkSession): Seq[(String, String)] =
    Seq(
      "c" -> bucketCap(s).toString,
      "r" -> rowsPerBand(s).toString,
      "k" -> numPerms(s).toString,
      "cb" -> candBroadcastCap(s).toString)
  private def chainDialKey(s: SparkSession): String =
    chainDials(s).map { case (t, v) => s"$t$v" }.mkString(":")

  private val sqlBuckets = (0 until Bands).map { b =>
    val parts = (0 until K / Bands).map(r => s"CAST(sig[${b * 4 + r + 1}] AS VARCHAR)")
    s"CAST('0x' || substr(md5(${parts.map(p => s"$p").mkString(" || '_' || ")}), 1, 15) AS BIGINT)"
  }

  /** Signatures via the native one-pass [[graft.functions.MinhashSignature]]
    * expression (identical values to [[sigExpr]], which the oracle and
    * the equivalence spec pin down — the custom expression walks the
    * shingle array once instead of k times).
    */
  private def sigs(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("hs", graft.functions.ShingleHashes(col("text")))
      .withColumn("sig",
        graft.functions.MinhashSignature(col("hs"), numPerms(s)))
      .select(col("doc_id"), col("sig"))

  /** Candidate-id semi join sized for its strategy: BROADCAST when
    * the distinct-id count is bounded (the design case), a
    * BLOOM-PREFILTERED shuffle semi when a near-duplicate-heavy
    * corpus pushes the set past what one executor broadcast should
    * carry. An UNCONDITIONAL broadcast hint bypasses
    * autoBroadcastJoinThreshold and would fail (or OOM the driver) at
    * exactly the corpora where dedup matters most. The cap is sized
    * for the materialized HashedRelation — an UnsafeRow per key plus
    * map arrays, ~4-5× the raw 8 B/key — not the raw key bytes: 2M
    * keys ≈ tens of MB resident, safe under default driver/executor
    * memory. The candidate set is localCheckpoint-materialized first
    * so the gate's count and the join consume ONE evaluation of the
    * distinct, not two.
    *
    * The over-cap path earned its bloom stage at the 16M-doc probe:
    * the bare shuffle-hash fallback ships the CORPUS's wide side
    * (sorted shingle arrays, ~KB/row) into the semi's exchange —
    * measured d8 204-248 s vs ~121 s when the semi was an
    * (unsafely) unconditional broadcast. The id set now folds into a
    * bloom sketch (~1.4 MB per 1M keys at 3% fpp, a driver-held
    * constant like Spark's own runtime filters) that prunes MAP-SIDE
    * ON THE SCAN inside whole-stage codegen; only the surviving
    * ~candidate-sized sliver (+ fpp) pays the exact semi's shuffle,
    * so the contract stays exact while the wide relation entering
    * the exchange shrinks from corpus-sized to candidate-sized.
    */
  private val CandBroadcastCap = 2L * 1000 * 1000
  /** Session-conf override of [[CandBroadcastCap]] — exists so a spec
    * (and an operator tuning for a smaller driver) can drive the
    * bloom fallback without a >2M-candidate corpus. */
  private def candBroadcastCap(s: SparkSession): Long =
    s.conf.getOption("graft.dedup.cand_broadcast_cap")
      .map(_.toLong).getOrElse(CandBroadcastCap)
  private def candSemi(base: DataFrame, candDocs: DataFrame): DataFrame = {
    val ids = candDocs.localCheckpoint()
    val n = ids.count()
    if (n <= candBroadcastCap(base.sparkSession))
      base.join(broadcast(ids), Seq("doc_id"), "left_semi")
    else {
      // BloomSketch.build raises the ACTIVE session's runtime-bloom
      // size confs to fit n keys. Rounds 9–10 snapshot-and-restored
      // the shared session's confs under a lock, which was still
      // racy against PARALLEL catalog queries planning joins inside
      // the raised window (carried ADVICE caution). Now the sketch
      // builds and materializes on a throwaway `newSession()` —
      // same SparkContext and cached blocks (the checkpointed ids
      // RDD re-binds directly), ISOLATED RuntimeConfig — so no
      // shared state is ever written and nothing needs restoring.
      val spark = base.sparkSession
      val sess2 = spark.newSession()
      val ids2 = sess2.createDataFrame(ids.rdd, ids.schema)
      val prevActive = SparkSession.getActiveSession
      // CAUTION (round-11 verdict, residual): setActiveSession is a
      // THREAD-LOCAL write, so this swap is invisible to other
      // threads — safe because the sketch build below is synchronous
      // and the window is restored in `finally`. If catalog queries
      // ever plan concurrently ON THIS THREAD (callbacks, a shared
      // executor), the same argument that moved the conf writes onto
      // sess2 applies here: hand the build its session explicitly
      // instead of via the active-session global.
      SparkSession.setActiveSession(sess2)
      val sketch =
        try ids2
          .agg(graft.functions.BloomSketch.build(col("doc_id"), n).as("bf"))
          .head.getAs[Array[Byte]](0)
        finally prevActive match {
          case Some(p) => SparkSession.setActiveSession(p)
          case None => SparkSession.clearActiveSession()
        }
      base
        .where(graft.functions.BloomSketch.mightContain(sketch, col("doc_id")))
        .join(ids.hint("shuffle_hash"), Seq("doc_id"), "left_semi")
    }
  }

  /** Memoized corpus row count — one count-only parquet scan per
    * (corpus, process), the input [[bandedPartitions]] sizes from.
    * Keyed on the corpus fingerprint so a regenerated corpus never
    * serves a stale count (the sidecar convention, minus the sidecar:
    * a count is cheaper to recompute than to round-trip).
    */
  private val docCountCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private[graft] def docCount(s: SparkSession, d: String): Long =
    docCountCache.computeIfAbsent(docsKey(d),
      _ => java.lang.Long.valueOf(documents(s, d).count()))

  /** Partitions-scale-with-data, IN the engine (round-11 verdict item
    * 1). The banded relation's exchanges — band explode → cap
    * group-by → pair self-join — carry |docs|·bands rows of
    * numPerms-long signatures, so their bytes are computable BEFORE
    * any shuffle runs, while `spark.sql.shuffle.partitions` is
    * whatever the session happens to carry. The 16M-doc k=32 probe
    * OOM'd its shuffle-hash build exactly here (SCALING.md round 11:
    * "Can't acquire 536870912 bytes" — 64M banded rows of 32-long
    * sigs across 32 fixed partitions is a >1 GB per-task build), and
    * that run was following the advisory's OWN recommended dial. The
    * fix was previously an env var on the probe; this puts the rule
    * where production d3/d7/d15 plan: partitions = max(session
    * default, estimated banded bytes / files.maxPartitionBytes) —
    * the scan-side sizing discipline applied to the shuffle, with
    * the build-side HashedRelation's ~2× UnsafeRow blow-up priced in.
    * Pure function of (rows, perms, session confs) so the sizing is
    * spec-pinnable without a 16M corpus.
    */
  /** The generic sizing rule [[bandedPartitionsFor]] instantiates:
    * partitions = max(default, rows × bytes/row × 2 / target) — the
    * ×2 prices the shuffle-hash build's resident HashedRelation over
    * the raw UnsafeRow bytes. Shared by every corpus-scale
    * shuffle-hash build in the family (banded signatures AND the
    * exploded shingle relations — the same OOM class on a different
    * axis).
    */
  private[graft] def exchangePartitionsFor(
      rows: Long, bytesPerRow: Long, defaultParts: Int,
      targetBytes: Long): Int = {
    val want = rows * bytesPerRow * 2L / math.max(targetBytes, 1L) + 1L
    math.max(defaultParts.toLong, want).min(Int.MaxValue.toLong).toInt
  }

  private[graft] def bandedPartitionsFor(
      bandedRows: Long, perms: Int, defaultParts: Int,
      targetBytes: Long): Int =
    // UnsafeRow per banded row: doc_id + bucket (8 B each), the
    // perms-long sig array (8 B/element + ~32 B array header)
    exchangePartitionsFor(bandedRows, 8L + 8L + 8L * perms + 32L,
      defaultParts, targetBytes)
  private[graft] def bandedPartitions(s: SparkSession, d: String): Int =
    bandedPartitionsFor(
      docCount(s, d) * (numPerms(s) / rowsPerBand(s)).toLong,
      numPerms(s),
      s.sessionState.conf.numShufflePartitions,
      s.sessionState.conf.filesMaxPartitionBytes)

  /** Apply the sizing ONLY when the estimate exceeds the session
    * default: an explicit repartition pins its partition count (AQE
    * cannot coalesce a REPARTITION_BY_NUM), so forcing it when the
    * default already fits would just forbid AQE's small-corpus
    * coalescing — measured +0.2 s per banded query at sf0.1 for zero
    * benefit. Under-default estimates keep the round-11 plan shape
    * bit-for-bit; over-default estimates (the 16M k=32 OOM regime)
    * get the explicit hash(bucket, N) exchange the whole chain then
    * reuses.
    */
  private def sizeBanded(
      s: SparkSession, d: String)(df: DataFrame): DataFrame = {
    val want = bandedPartitions(s, d)
    if (want > s.sessionState.conf.numShufflePartitions)
      df.repartition(want, col("bucket"))
    else df
  }

  /** Memoized Σ n_chars over the corpus — one single-int-column scan
    * per (corpus, process). Each character position yields at most
    * one 8-char shingle, so this UPPER-BOUNDS the exploded shingle
    * relation's rows (array_distinct only shrinks it) — the input
    * the shingle-side exchange sizing works from, the way docCount
    * feeds the banded side.
    */
  private val charCountCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private[graft] def charCount(s: SparkSession, d: String): Long =
    charCountCache.computeIfAbsent(docsKey(d), _ =>
      java.lang.Long.valueOf(
        documents(s, d)
          .agg(coalesce(sum(col("n_chars")), lit(0L))).head.getLong(0)))

  /** The banded-exchange discipline applied to the exploded SHINGLE
    * relations — d10's cross-source self-join and d4/d13's
    * block-scaffold self-join build corpus-scale (…, shingle-hash)
    * relations under shuffle-hash hints, the identical fixed-
    * partition OOM class as the k=32 banded build, just on the
    * shingle axis (16M docs ≈ 10⁹ shingle rows ≈ 50 GB through
    * whatever partition count the session carries). Sized from the
    * Σ n_chars upper bound × ~56 B/row (ids + source string + hash +
    * UnsafeRow overhead); engaged, like sizeBanded, only past the
    * session default, keyed on the relation's join key columns so
    * the downstream joins reuse the exchange.
    */
  private def sizeShingles(
      s: SparkSession, d: String, keys: Seq[String])(
      df: DataFrame): DataFrame = {
    val want = exchangePartitionsFor(
      charCount(s, d), 56L,
      s.sessionState.conf.numShufflePartitions,
      s.sessionState.conf.filesMaxPartitionBytes)
    if (want > s.sessionState.conf.numShufflePartitions)
      df.repartition(want, keys.map(col): _*)
    else df
  }

  /** (doc_id, bs = the band bucket ids as an ARRAY) — the banded
    * relation before the explode; OccCurveProbe derives the recall/
    * cost curve from it (at any rows-per-band) without the pair join. */
  private[graft] def sigsWithBuckets(
      s: SparkSession, d: String,
      r: Int = K / Bands): DataFrame =
    sigs(s, d).withColumn("bs", expr(bucketsExprFor(r, numPerms(s))))
      .select("doc_id", "bs")

  /** The composed-builtins signature pipeline (kept as the reference
    * formulation and for the equivalence spec).
    */
  def sigsBuiltin(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("hs", expr(shingleHashesExpr))
      .withColumn("sig", expr(sigExpr))
      .select(col("doc_id"), col("sig"))

  /** d4's block-width cap: sources wider than this many docs are
    * excluded from the exact all-pairs baseline (testdata sources are
    * ≤250 docs, so the cap never binds there; DedupCapSpec drives it
    * with a skewed corpus and a small cap to prove it does bind).
    */
  private[llm] val BlockCap = 1000

  /** Session dial over [[BlockCap]] (`graft.dedup.block_cap`) — the
    * exact pairwise family's width lever, added with its advisory
    * (round 11): the cap silently DROPS every doc of an over-wide
    * source from d4/d13/d14's output, which is correct cost
    * discipline (the per-block self-join is quadratic) but the same
    * silent-recall regime d7/d9/m5 escaped this round. Verification
    * assumes the default.
    */
  private[llm] def blockCap(s: SparkSession): Int =
    s.conf.getOption("graft.dedup.block_cap").map(_.toInt)
      .getOrElse(BlockCap)

  private val blockCapWarned =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Source-block occupancy census at the default cap — [[LshCensus]]
    * with the SOURCE as the bucket: one tiny aggregate (|sources|
    * rows), sidecar-cached like every census.
    */
  private[graft] def blockOccupancy(
      s: SparkSession, d: String): LshCensus.Occupancy =
    LshCensus.occupancy(
      s"block_${docsKey(d)}_cap${BlockCap}_v1",
      BlockCap, PairBudgetPerRow)(
      documents(s, d).select(col("source").as("bucket")))

  /** Block-cap recall advisory (the d7/d9/m5 contract for the exact
    * pairwise family): fires once per (corpus, process) when the
    * default [[BlockCap]] excludes ≥ the warn fraction of documents
    * from d4/d13/d14's exact baselines — a corpus dominated by one
    * crawl would silently return near-empty "exact ground truth".
    * Advisory-only; failures skip the warning, never the query.
    */
  private[graft] def maybeWarnBlockCap(
      s: SparkSession, d: String): Boolean = {
    val dialed = s.conf.getOption("graft.dedup.block_cap").isDefined
    val fire = !dialed &&
      (try blockOccupancy(s, d).shedFraction >= DedupShedWarnFraction
      catch { case scala.util.control.NonFatal(e) =>
        advisoryLog.warn(s"block-cap advisory skipped for $d: $e")
        false })
    if (fire) {
      val occ = blockOccupancy(s, d)
      Advisories.record("dedup_block_cap", d, occ.shedFraction,
        if (occ.capRec > BlockCap)
          s"graft.dedup.block_cap=${occ.capRec} (linear pair envelope)"
        else "no in-envelope cap admits the wide sources; use the " +
          "capped-LSH chain (d7 -> d8/d15)",
        fingerprint = docsKey(d))
    }
    if (fire && blockCapWarned.add(d)) {
      val occ = blockOccupancy(s, d)
      advisoryLog.warn(
        f"source-block cap (default graft.dedup.block_cap=$BlockCap) " +
          f"is excluding ${occ.shedFraction * 100}%.1f%% of documents " +
          f"from the exact pairwise baselines (d4/d13/d14) over $d " +
          f"(${occ.nOverCap} of ${occ.nBuckets} sources over-cap, " +
          f"widest ${occ.maxWidth}) - their pairs are silently absent " +
          "from the output. Re-dials: " +
          (if (occ.capRec > BlockCap)
            f"graft.dedup.block_cap=${occ.capRec} stays inside the " +
              "linear pair envelope on this corpus's census; "
          else
            "no cap inside the linear pair envelope admits the wide " +
              "sources (their self-join is genuinely quadratic); ") +
          "for unbounded corpora the scale path is the capped-LSH " +
          "chain (d7 -> d8/d15), which these exact baselines " +
          "calibrate. Verification oracles assume the default.")
    }
    fire
  }

  /** Shared scaffold for the exact pairwise shingle-overlap family
    * (d4 resemblance, d13 containment): block-capped self-join on
    * shingle hashes → (doc_a, doc_b, shared, na, nb). The metric on
    * top is a per-pair projection; the expensive plan is identical.
    */
  private[llm] def sharedShinglePairs(
      s: SparkSession, d: String, cap: Int): DataFrame = {
    val docs = documents(s, d)
      .select(col("doc_id"), col("source"), col("text"))
    // skip over-cap blocks BEFORE the shingle explode: the width check
    // is one tiny aggregate over (source, count), and dropped sources
    // never produce shuffle rows at all
    val narrow = docs.groupBy("source")
      .agg(count(lit(1)).as("w"))
      .where(col("w") <= cap)
      .select("source")
    // ShingleHashes projects AFTER the cap join, not before: Catalyst
    // prunes columns but never pushes expressions down through joins,
    // so hashing placed here runs only on cap-SURVIVING docs. The 4M
    // ScaleProbe measured the difference — with every source over the
    // cap, the old plan still shingle-hashed the whole corpus on both
    // self-join sides (d13 59.9 s of pure discarded projection work);
    // this shape makes the all-capped case cost one width aggregate.
    // narrow is a SOURCE-NAME list (bounded by the catalog of
    // sources, never by corpus rows) — broadcast it so the text-
    // bearing side never shuffles; a source-keyed SMJ here would
    // move every document's text bytes through one skewed exchange
    val capped = docs.join(broadcast(narrow), "source")
      .select(col("doc_id"), col("source"),
        graft.functions.ShingleHashes(col("text")).as("hs"))
    // Per-doc set size RIDES THROUGH the explode next to each shingle
    // row (one int wider per exploded row) and surfaces from the pair
    // aggregate as a grouping column — n is functionally dependent on
    // the doc id, so the groups are unchanged. The previous shape
    // joined a separate `sizes` projection back in twice (na, nb),
    // and each broadcast build re-ran the corpus scan + ShingleHashes
    // kernel from scratch: the kernel evaluated over the corpus 3x
    // and the plan carried two extra joins (measured 2.5 s -> 1.5 s
    // at sf0.1 for d4). At 100 TB the removed joins also retire a
    // |docs|-row broadcast that could not survive a big corpus.
    // data-sized exchange on the self-join's keys (sizeShingles):
    // when the exploded relation outgrows the session default, both
    // join sides reuse one explicit hash(source, h, N) partitioning
    // whose per-task build fits memory.
    //
    // explode_OUTER, not explode: InferFiltersFromGenerate turns a
    // plain explode into a `size(hs) > 0 AND isnotnull(hs)` filter
    // that predicate-pushdown then inlines BELOW the cap join as
    // `size(shingle_hashes(text)) > 0` — re-running the kernel on
    // every RAW scan row (round-13 plan audit) whenever at least one
    // source survives the cap. (In the ALL-capped regime AQE's
    // empty-broadcast propagation elides the whole subtree, filter
    // included — measured flat old-vs-new on a 1M-doc fully-capped
    // probe corpus — so the r12 cap-placement property was only
    // broken for mixed corpora, which the bench SFs are.) The rule
    // skips outer generates; the handful of null-h rows an empty hs
    // produces are dropped by the inner self-join's equi condition,
    // so the pair relation is unchanged.
    val sh = sizeShingles(s, d, Seq("source", "h"))(capped
      .select(col("doc_id"), col("source"), size(col("hs")).as("n"),
        explode_outer(col("hs")).as("h")))
    // shuffle-hash hint: size estimation cannot see the explode
    // blow-up and would broadcast the full shingle relation — a plan
    // that cannot survive scale-up
    sh.as("a").hint("shuffle_hash")
      .join(sh.as("b").hint("shuffle_hash"),
        col("a.source") === col("b.source") && col("a.h") === col("b.h") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.n").as("na"), col("b.n").as("nb"))
      .agg(count(lit(1)).as("shared"))
  }

  /** The d4 plan with an explicit block cap (see the catalog entry). */
  private[llm] def ngramJaccard(
      s: SparkSession, d: String, cap: Int): DataFrame =
    sharedShinglePairs(s, d, cap)
      .withColumn("jaccard",
        round(col("shared") / (col("na") + col("nb") - col("shared")), 4))
      .where(col("jaccard") >= 0.5)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")

  /** The d13 plan: same pair scaffold, containment metric (Broder's
    * |A∩B| / min(|A|,|B|)) — catches subset duplicates (a short doc
    * embedded verbatim in a longer one) that resemblance misses: a
    * 200-shingle doc inside a 4000-shingle page has jaccard ≈ 0.05
    * but containment 1.0. Jaccard rides along for the contrast.
    */
  private[llm] def ngramContainment(
      s: SparkSession, d: String, cap: Int): DataFrame =
    sharedShinglePairs(s, d, cap)
      .withColumn("containment",
        round(col("shared") / least(col("na"), col("nb")), 4))
      .where(col("containment") >= 0.5)
      .withColumn("jaccard",
        round(col("shared") / (col("na") + col("nb") - col("shared")), 4))
      .select("doc_a", "doc_b", "containment", "jaccard")
      .orderBy("doc_a", "doc_b")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // D1 — exact dedup: survivors = min doc_id per content digest.
    // The digest groups as 16 BINARY bytes, not the 32-char hex
    // string (same 128-bit exactness, half the shuffle-key width —
    // the x11 lesson; hex<->binary is bijective so the grouping, and
    // therefore the oracle, is unchanged).
    "d1_dedup_exact" -> ((s, d) =>
      documents(s, d)
        .groupBy(unhex(md5(col("text"))).as("digest"))
        .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
        .select("doc_id", "n_copies")
        .orderBy("doc_id")),

    // D2 — minhash signatures (k=16) computed in a single projection.
    // Emitted as a '_'-joined string: the driver's comparator sorts
    // result rows in pandas, where raw array cells are unhashable.
    "d2_minhash_signatures" -> ((s, d) =>
      sigs(s, d)
        .select(col("doc_id"),
          // native formatter: the transform-lambda version was
          // CodegenFallback and dragged the whole signature
          // projection (shingle + minhash kernels) interpreted —
          // round-8 audit; parity pinned in FunctionsSpec
          graft.functions.LongArrayJoin(col("sig"), "_").as("sig"))
        .orderBy("doc_id")),

    // D3 — LSH candidate pairs: docs sharing any of 4 band buckets,
    // with signature agreement as the similarity estimate.
    "d3_minhash_lsh_pairs" -> ((s, d) => {
      // data-sized exchange on the chain's join key (see
      // bandedPartitions/sizeBanded): when the banded bytes outgrow
      // the session default, the group-by and both self-join sides
      // reuse one explicit hash(bucket, N) partitioning sized so the
      // wide signature relation's per-task build fits memory
      val banded = sizeBanded(s, d)(sigs(s, d)
        .withColumn("bucket",
          explode(expr(bucketsExprFor(K / Bands, numPerms(s))))))
      // shuffle-hash hints: size estimation cannot see the band
      // explode's blow-up and would broadcast the full banded relation
      // — a plan that cannot survive scale-up (same reasoning as d4)
      // agreement is a function of the two signatures alone, so it is
      // identical no matter which band bucket surfaced the pair —
      // compute it INSIDE the join projection and let the pair-dedup
      // shuffle carry (id, id, double) instead of two 16-long
      // signature arrays (~16x narrower rows on the widest shuffle of
      // the chain; the redundant zip per extra shared bucket is 16
      // comparisons, far cheaper than shipping the arrays)
      banded.as("a").hint("shuffle_hash")
        .join(banded.as("b").hint("shuffle_hash"),
          col("a.bucket") === col("b.bucket") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          expr(s"size(filter(zip_with(a.sig, b.sig, (x, y) -> x = y), v -> v)) / CAST(${numPerms(s)} AS DOUBLE)")
            .as("agreement"))
        .dropDuplicates("doc_a", "doc_b")
        .orderBy("doc_a", "doc_b")
    }),

    // D7 — LSH with hot-bucket capping: identical to d3 except buckets
    // wider than BucketCap docs are skipped before the pair join. A
    // fat bucket means a band signature shared by huge numbers of
    // near-identical-boilerplate docs, and the per-bucket self-join is
    // quadratic in bucket width — measured on a deliberately
    // collision-heavy 1M-doc ScaleProbe corpus, uncapped d3 took 317 s
    // while every other dedup stage stayed sub-second. Skipping hot
    // buckets is the standard production mitigation (such buckets
    // carry no dedup signal a cheaper exact pass would not). Cap = 2
    // here so the path binds on the 500-doc testdata; production sets
    // it orders of magnitude higher.
    "d7_lsh_bucket_cap" -> ((s, d) => {
      // same serving-time discipline as the ANN family's
      // maybeWarnRecall: default dials over a saturated corpus lose
      // recall SILENTLY (the cap sheds exactly the buckets where the
      // dups are) — warn once per corpus, naming the computed re-dial
      maybeWarnDedupRecall(s, d)
      // same data-sized exchange as d3: when engaged, one explicit
      // hash(bucket, N) shuffle of the wide banded relation feeds the
      // cap group-by, the cap join, and the pair self-join (all
      // keyed on bucket)
      val banded = sizeBanded(s, d)(sigs(s, d)
        .withColumn("bucket",
          explode(expr(bucketsExprFor(rowsPerBand(s), numPerms(s))))))
      val narrow = banded.groupBy("bucket")
        .agg(count(lit(1)).as("w"))
        .where(col("w") <= bucketCap(s))
        .select("bucket")
      // shuffle-hash hints throughout: the bucket-id relation scales
      // with |docs|·bands/width and the banded relation with
      // |docs|·bands — neither is broadcastable at 100 TB, but size
      // estimation cannot see past the explode and would broadcast
      // (same reasoning as d4)
      val capped = banded.hint("shuffle_hash")
        .join(narrow.hint("shuffle_hash"), "bucket")
      // same narrow-pair-shuffle trick as d3: agreement folds inside
      // the join projection, dedup ships (id, id, double) not arrays
      capped.as("a").hint("shuffle_hash")
        .join(capped.as("b").hint("shuffle_hash"),
          col("a.bucket") === col("b.bucket") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          expr(s"size(filter(zip_with(a.sig, b.sig, (x, y) -> x = y), v -> v)) / CAST(${numPerms(s)} AS DOUBLE)")
            .as("agreement"))
        .dropDuplicates("doc_a", "doc_b")
        .orderBy("doc_a", "doc_b")
    }),

    // D8 — candidate verification: exact shingle jaccard computed ONLY
    // for the capped-LSH candidate pairs (d7) — the production dedup
    // chain's verify stage (cheap approximate mining prunes the pair
    // space, exact verification decides). Work is O(|candidates| ·
    // shingles) instead of d4's O(all co-blocked pairs); the shingle
    // arrays join in by doc_id and the intersection folds inside one
    // projection per pair, no explode.
    "d8_jaccard_verify" -> ((s, d) => {
      // Materialize the candidate pairs ONCE (localCheckpoint): this
      // query consumes them through THREE paths — the pair relation
      // itself, the candDocs union (both sides), and the final
      // orderBy's range-partitioning sample — and without a
      // materialization barrier Catalyst re-inlines the whole d7
      // subplan (band explode + cap join + pair self-join) per
      // consumer: a 239-node physical plan at the 4M probe whose
      // re-evaluation made the d14-style fan-out backfire 13× at
      // sf0.1 (SCALING.md round-6 note). The checkpointed relation is
      // byte-tiny (two longs per pair), so the materialization cost
      // is one d7 evaluation — the minimum any consumer needs.
      val cands = queries("d7_lsh_bucket_cap")(s, d)
        .select(col("doc_a"), col("doc_b"))
        .localCheckpoint()
      // Shingle arrays ONLY for docs that appear in a candidate pair:
      // the semi-join (16-byte id shuffle) pushes below the shingle
      // projection, so un-candidated docs never compute OR shuffle
      // their ~KB-wide arrays. Without this the verify stage shuffles
      // the corpus-sized array relation twice — measured 4× corpus →
      // 9× wall at the 4M-doc probe; with it the stage scales with
      // CANDIDATES, which is the whole contract of verify-after-LSH.
      val candDocs = cands.select(col("doc_a").as("doc_id"))
        .union(cands.select(col("doc_b").as("doc_id"))).distinct()
      // sorted ONCE per doc so the per-PAIR intersection below is a
      // merge scan, not a hash set per call (jaccard is set algebra —
      // element order never surfaces)
      // BROADCAST the candidate-id set into the semi join (count-
      // gated, see candSemi): a shuffle-hash semi here ships the
      // corpus's (doc_id, text) rows — ~8 GB at the 4M probe,
      // measured ~20 s, the whole residual over d7 — while the id
      // set is |candidate docs| × 8 B (1 MB at 4M). The filter then
      // runs map-side ON THE SCAN, and the shingle projection above
      // it hashes only surviving docs.
      // Materialized ONCE (localCheckpoint): the pair relation joins
      // this twice — keyed doc_a and doc_b, DIFFERENT partitionings,
      // so exchange reuse can never kick in and each side would
      // re-run the corpus scan + ShingleHashes + semi from scratch
      // (measured 1.2 s → 0.9 s at sf0.1). The relation is bounded
      // by |candidate docs| rows — the same size class the broadcast
      // gate above already admits.
      val hs = candSemi(documents(s, d)
        .select(col("doc_id"),
          sort_array(graft.functions.ShingleHashes(col("text"))).as("hs")),
        candDocs)
        .localCheckpoint()
      // NO d14-style fan-out here: with the merge-scan kernel the
      // per-pair intersection is no longer the stage's CPU, and a
      // repartition after the joins re-ships 600k ~3KB rows (both
      // arrays) for no win — measured fanned ≈ unfanned at the 4M
      // probe once the kernel landed, so the exchange is pure cost
      // the shingle-array relation is still wide per row; hint both
      // verify joins off the broadcast path
      cands.hint("shuffle_hash")
        .join(hs.select(col("doc_id").as("doc_a"), col("hs").as("hs_a"))
          .hint("shuffle_hash"), "doc_a")
        .join(hs.select(col("doc_id").as("doc_b"), col("hs").as("hs_b"))
          .hint("shuffle_hash"), "doc_b")
        .withColumn("shared",
          graft.functions.SortedIntersectCount(col("hs_a"), col("hs_b")))
        .withColumn("jaccard", round(
          col("shared") / (size(col("hs_a")) + size(col("hs_b")) - col("shared")), 4))
        .select("doc_a", "doc_b", "jaccard")
        .orderBy("doc_a", "doc_b")
    }),

    // D4 — exact n-gram jaccard over blocked pairs (block = source):
    // shingle-set overlap via a distinct-shingle self-join, never
    // materializing pairwise sets. Blocks wider than BlockCap docs are
    // skipped (same mitigation as d7's hot buckets): the per-block
    // self-join is quadratic in block width, and one dominant crawl at
    // 100 TB would otherwise explode this exact baseline. The cap is
    // mirrored in the oracle, and DedupCapSpec pins that it binds on a
    // skewed corpus. The scale path for unbounded corpora stays
    // d7 (capped LSH) → d8 (exact verify on candidates); d4's role is
    // the oracle-checkable exact ground truth on bounded blocks.
    "d4_ngram_jaccard" -> ((s, d) => {
      maybeWarnBlockCap(s, d)
      ngramJaccard(s, d, blockCap(s))
    }),

    // D13 — containment dedup: the production policy for "this doc is
    // a verbatim SUBSET of that one" (boilerplate wrappers, quoted
    // articles, page templates). Same block-capped pair scaffold as
    // d4; at scale the production path is the same d7 LSH candidate
    // generation with this metric in the verify stage.
    "d13_containment" -> ((s, d) => {
      maybeWarnBlockCap(s, d)
      ngramContainment(s, d, blockCap(s))
    }),

    // D14 — edit-distance near-dup: exact normalized Levenshtein
    // similarity 1 - lev/max(len), floor 0.8, over the same
    // block-capped (source) pair scaffold as d4/d13. Two exact
    // prunings make it tractable: (1) the length band — lev >= |len_a
    // - len_b|, so a pair with 5*|len_a - len_b| > max(len) can never
    // reach 0.8 and is dropped BEFORE the O(n*m) DP (integer
    // arithmetic: sim >= 0.8 <=> 5*lev <= max, no float edge cases);
    // (2) the banded DP — Spark's 3-arg levenshtein(a, b, thr)
    // computes only a 2*thr-wide diagonal band and early-exits to -1,
    // O(n*thr) instead of O(n*m) per pair. At 100 TB the production
    // path is d7 LSH candidates with this metric in the verify stage
    // (like d8); d14's role is the oracle-checkable exact ground truth
    // on bounded blocks.
    "d14_edit_distance" -> ((s, d) => {
      maybeWarnBlockCap(s, d)
      val docs = documents(s, d)
        .select(col("doc_id"), col("text"), col("source"),
          length(col("text")).as("n"))
      val narrow = docs.groupBy("source").count()
        .filter(col("count") <= blockCap(s)).select("source")
      val dd = docs.join(broadcast(narrow), Seq("source"))
      // Fan the probe side out to the full parallelism with an
      // EXPLICIT partition count: the pair stage below is
      // CPU-quadratic while its input is byte-tiny, so a plain
      // repartition gets coalesced right back to one partition by
      // AQE (it sizes by bytes and cannot see downstream CPU) and the
      // whole DP stage runs on one core — measured 12 s vs 1 s at
      // sf0.1 on a 32-core box.
      val fan = dd.sparkSession.sparkContext.defaultParallelism
      val a = dd.repartition(fan, col("doc_id"))
        .select(col("source"), col("doc_id").as("doc_a"),
          col("text").as("ta"), col("n").as("na"))
      val b = dd.select(col("source").as("source_b"), col("doc_id").as("doc_b"),
        col("text").as("tb"), col("n").as("nb"))
      // The lev projection must stay ABOVE the join and be evaluated
      // ONCE: left alone, PushPredicateThroughJoin folds the lev
      // filter into the join condition, where it lands BEFORE the
      // cheap band/ordering conjuncts and evaluates the DP twice per
      // RAW pair (measured ~100x: every un-banded pair pays the full
      // DP, twice, then survivors a third time in the projection).
      // The observe() node is the barrier — a filter cannot push
      // below CollectMetrics without changing the observed count, so
      // the optimizer leaves the single-eval shape alone; the metric
      // itself (banded candidate pairs) is the operator's natural
      // cost gauge.
      a.join(b, col("source") === col("source_b") &&
          col("doc_a") < col("doc_b") &&
          abs(col("na") - col("nb")) * 5 <= greatest(col("na"), col("nb")))
        .select(col("doc_a"), col("doc_b"),
          greatest(col("na"), col("nb")).as("m"),
          graft.functions.BandedLevenshtein(col("ta"), col("tb"),
            (greatest(col("na"), col("nb")) / 5).cast("int")).as("lev"))
        .observe("d14_banded_pairs", count(lit(1)).as("pairs"))
        .filter(col("lev") >= 0 && col("lev") * 5 <= col("m"))
        .select(col("doc_a"), col("doc_b"), col("lev"),
          round(lit(1.0) - col("lev").cast("double") / col("m"), 4).as("sim"))
        .orderBy("doc_a", "doc_b")
    }),

    // D15 — the PRODUCTION edit-distance chain: d7's capped-LSH
    // candidates verified with the banded Levenshtein kernel (the
    // composition d14's docs promise — d14 itself is the
    // block-capped exact baseline). Work is O(|candidates| · n·thr):
    // the LSH stage prunes the pair space, the signature-estimated
    // similarity floor ([[D15AgreeFloor]]) prunes the candidates, and
    // the band prunes the DP. The -1 sentinel (distance proven >
    // max/5, computation abandoned early) remains part of the
    // kernel's cross-engine contract — the oracle reproduces it as a
    // CASE over the full distance (on the current testdata no
    // floored candidate fails verify, so the sentinel rows live in
    // d14's intermediate filter and the kernel specs).
    "d15_lsh_lev_verify" -> ((s, d) =>
      d15Scored(s, d).orderBy("doc_a", "doc_b")),

    // D5 — simhash (28-bit) over distinct word tokens: majority vote
    // per bit position, computed entirely inside one projection
    // (nested array folds — the token hashes are materialized once per
    // row and the 28 bit-votes fold over them; no explode, no shuffle,
    // so the operator scales with document count, not documents×bits).
    // The 28 per-bit vote sums run as ONE codegen'd hash aggregate
    // over exploded distinct tokens (map-side partials, each token
    // hashed once). The obvious array formulation — a per-bit
    // `aggregate(ths, …)` lambda nested inside an outer per-bit fold —
    // computes the same thing but nested higher-order functions drop
    // out of whole-stage codegen into interpreted evaluation
    // (measured 9.6 s vs 0.9 s on the 500-doc table once the bench
    // stopped letting count() prune the projection entirely).
    "d5_simhash" -> ((s, d) => {
      val toks = documents(s, d)
        .select(col("doc_id"), explode(
          array_distinct(graft.functions.WsTokens(col("text"))))
          .as("tok"))
        .select(col("doc_id"),
          expr("CAST(conv(substr(md5(tok), 1, 7), 16, 10) AS BIGINT)").as("h"))
      val voteCols = (0 until 28).map(b =>
        sum(when(expr(s"(shiftright(h, $b) & 1) = 1"), 1L).otherwise(-1L))
          .as(s"v$b"))
      val simhash = (0 until 28)
        .map(b => when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L)))
        .reduce(_ + _)
      toks.groupBy("doc_id").agg(voteCols.head, voteCols.tail: _*)
        .select(col("doc_id"), simhash.as("simhash"))
        .orderBy("doc_id")
    }),

    // D10 — cross-source contamination matrix: distinct 8-gram
    // shingles shared by each PAIR of sources — the corpus-level "is
    // crawl A leaking into crawl B / is the eval set inside the
    // training mix" sweep (x8 answers it per-document; this answers
    // it per-source-pair). Scale shape: only (source, shingle-hash)
    // rows ever shuffle (16 bytes + source), the pair join is keyed
    // on the shingle hash, and shingles present in MORE than
    // [[MaxOverlapSources]] sources are dropped BEFORE the self-join
    // — ubiquitous boilerplate carries no contamination signal but
    // would cost C(n,2) rows per shingle (the d7 hot-bucket cap
    // applied to the source axis). Both joins are shuffle-hash
    // hinted: size estimation cannot see the explode's blow-up, and
    // broadcasting a corpus-scale digest list is the d4 bug class.
    "d10_cross_source_overlap" -> ((s, d) => {
      val ds = documents(s, d)
        .select(col("source"),
          explode(graft.functions.ShingleHashes(col("text"))).as("h"))
        .distinct()
      val eligible = ds.groupBy("h")
        .agg(count(lit(1)).as("nsrc"))
        .where(col("nsrc").between(2, MaxOverlapSources))
        .select("h")
      // data-sized exchange on the pair join's key (sizeShingles —
      // the (source, shingle) relation is corpus-scale and its
      // self-join build is the d-family's other fixed-partition OOM
      // class); engaged only past the session default, reused by
      // both self-join sides
      val dsc = sizeShingles(s, d, Seq("h"))(
        ds.join(eligible.hint("shuffle_hash"), Seq("h"), "left_semi"))
      dsc.as("a").hint("shuffle_hash")
        .join(dsc.as("b").hint("shuffle_hash"),
          col("a.h") === col("b.h") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
        .agg(count(lit(1)).as("shared_shingles"))
        .orderBy("src_a", "src_b")
    }),

    // D11 — incremental dedup: today's batch (the md5-bucket ≥ 90
    // slice, c2's split convention) deduplicated against the all-time
    // corpus WITHOUT scanning it. The history side is the PERSISTED
    // [[HistorySnapshot]]: a digest-keyed manifest table plus a
    // count-sized bloom sketch, built once per maintenance window
    // (the reference's processed-files-ledger semantics — computed
    // once, carried forward) — NOT recomputed scan+digest+distinct
    // per run, which at 1e10 docs would BE the job. Per run this
    // reads: the batch, the sketch (constant), and only the snapshot
    // buckets the batch's digests hash into. The sketch rejects
    // provably-new docs map-side before any join (bloom has no false
    // negatives); sketch hits take the exact bucket-pruned join that
    // kills FPs. Within-batch dups resolve by min doc_id over the
    // batch side only. Joins are shuffle-hash hinted: the candidate
    // volume is invisible to size estimation and must never be
    // broadcast. Key = bag-of-words digest (md5 over the sorted
    // distinct token set) — catches token-reshuffled boilerplate
    // byte-exact md5 misses (d1 finds zero exact dups here; the
    // normalized key finds 21 groups).
    "d11_incremental_dedup" -> ((s, d) => {
      val snap = HistorySnapshot.forCorpus(s, d)
      val incoming = documents(s, d)
        .withColumn("bucket", HistorySnapshot.splitBucketExpr)
        .where(col("bucket") >= 90)
        .withColumn("digest", HistorySnapshot.digestExpr)
        .withColumn("bk", HistorySnapshot.bkExpr)
        .select(col("doc_id"), col("digest"), col("bk"))
      val flagged = snap.sketch match {
        case None => // empty history: nothing can be a history dup
          incoming.withColumn("in_history", lit(null).cast("int"))
        case Some(_) =>
          val hist = snap.touchedDigests(s, incoming)
            .withColumn("in_history", lit(1))
          val miss = incoming
            .where(!snap.mightContain(col("bk")))
            .withColumn("in_history", lit(null).cast("int"))
          val hit = incoming
            .where(snap.mightContain(col("bk")))
            .join(hist.hint("shuffle_hash"), Seq("digest"), "left")
          miss.unionByName(hit)
      }
      val firsts = incoming.groupBy("digest")
        .agg(min(col("doc_id")).as("first_doc"))
      flagged
        .join(firsts.hint("shuffle_hash"), Seq("digest"))
        .select(col("doc_id"), col("digest"),
          when(col("in_history") === 1, "history")
            .when(col("doc_id") > col("first_doc"), "batch")
            .otherwise("new").as("status"))
        .orderBy("doc_id")
    }),

    // D16 — DEDUP RECALL EVAL: the d-family analog of n8_ann_recall.
    // Ground truth = EXACT banded-Levenshtein near-dups (d14/d15's
    // dup predicate, lev·5 ≤ max len) mined UNBLOCKED for a bounded
    // deterministic probe sample (doc_id % 5 under [[D16ProbeBudget]]
    // — ≤400 probes at any corpus size, the n5/n8 budget discipline);
    // the approximate side is the production d15 chain's is_dup set.
    // One output row: |truth|, |truth ∩ found|, recall. This is the
    // recurring index-quality job a production dedup deployment runs
    // as the corpus grows — recall dropping means the bucket cap /
    // bands need re-dialing (the advisory on d7 names the computed
    // re-dial; this query MEASURES what the advisory warns about).
    // Scale: the probe side is budget-bounded and broadcasts; the
    // corpus streams against it through a LENGTH-BUCKET equi join
    // (multiplicative 1.25 buckets — the dup predicate bounds the
    // length ratio at 1.25, so every true mate is within ±1 bucket;
    // coverage is engine-internal, the oracle never buckets), and two
    // EXACT prunes run inside the join before any pair reaches the
    // early-exit banded DP: the integer length band (lev ≥ |Δlen|)
    // and the counting bound (lev ≥ L1(charHist)/2 — see
    // [[graft.functions.CharHistExpr]]; histograms precompute once
    // per doc map-side, the per-pair conjunct is 64 subtractions).
    // Both bounds are exact, so the truth set — and the oracle, which
    // mines truth with neither — is bit-identical. Measured honestly
    // (D16Probe, sf0.1): on THIS corpus the L1 bound prunes only ~6%
    // of band pairs (481k → 454k) and a trigram-deficit bound ~8% —
    // the generator draws every doc from one ~30-word vocabulary, so
    // random same-length pairs genuinely share character/q-gram mass
    // and only ORDER (what lev measures) separates them; on a natural
    // corpus with heterogeneous character distributions the same
    // conjunct is the standard cheap kill. The actual round-10
    // 30.9 s was d14's one-partition trap (fan-out comment below):
    // fixed, d16 is 2.3 s steady / brief cold at sf0.1. The observe()
    // barrier is d14's: without it PushDownPredicates folds the lev
    // filter into the join condition and the DP runs per RAW pair.
    "d16_dedup_recall" -> ((s, d) => {
      // truth = a pure function of (corpus, probe budget), mined once
      // and sidecar-persisted (round-11 verdict item 6) — repeat
      // bench/CI runs load a few hundred id pairs instead of
      // re-running the banded-DP sweep; see [[d16Truth]]
      import s.implicits._
      val truth = d16Truth(s, d).toDF("doc_a", "doc_b")
      val found = d15Scored(s, d)
        .where(col("is_dup"))
        .select(col("doc_a"), col("doc_b"), lit(1L).as("hit"))
      truth.join(found, Seq("doc_a", "doc_b"), "left")
        .agg(count(lit(1)).as("n_true"),
          coalesce(sum(col("hit")), lit(0L)).as("n_hit"),
          round(coalesce(sum(col("hit")), lit(0L)) / count(lit(1)), 4)
            .as("recall"))
    })
  )

  /** d16's exact ground-truth mining — the distributed banded-DP
    * sweep (the expensive part; runs on the one cold ask per corpus).
    */
  private def d16MinedTruth(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
      .select(col("doc_id"), col("text"), length(col("text")).as("n"),
        graft.functions.CharHist(col("text")).as("ch"))
      .withColumn("bk", floor(log(1.25,
        greatest(col("n"), lit(1)).cast("double"))).cast("int"))
    val isProbe = col("doc_id") % 5 === 0 &&
      col("doc_id") < D16ProbeBudget
    val probes = docs.where(isProbe)
      .select(col("doc_id").as("pid"), col("text").as("pt"),
        col("n").as("pn"), col("ch").as("pch"),
        explode(array(col("bk") - 1, col("bk"), col("bk") + 1))
          .as("pbk"))
    // d14's explicit fan-out, which d16 was missing (the round-10
    // 30.9 s: a small corpus is ONE parquet file = ONE scan task,
    // so the whole DP population ran on a single core; explicit
    // numPartitions so AQE cannot coalesce a byte-tiny exchange
    // under a CPU-bound stage)
    val fan = s.sparkContext.defaultParallelism
    docs.repartition(fan, col("doc_id"))
      .join(broadcast(probes),
        col("bk") === col("pbk") && col("doc_id") =!= col("pid") &&
          abs(col("n") - col("pn")) * 5 <= greatest(col("n"), col("pn")) &&
          graft.functions.IntArrayL1(col("ch"), col("pch")) * 5 <=
            lit(2) * greatest(col("n"), col("pn")))
      .select(
        least(col("doc_id"), col("pid")).as("doc_a"),
        greatest(col("doc_id"), col("pid")).as("doc_b"),
        greatest(col("n"), col("pn")).as("m"),
        graft.functions.BandedLevenshtein(col("text"), col("pt"),
          (greatest(col("n"), col("pn")) / 5).cast("int")).as("lev"))
      .observe("d16_band_pairs", count(lit(1)).as("pairs"))
      .filter(col("lev") >= 0 && col("lev") * 5 <= col("m"))
      .select("doc_a", "doc_b")
      .dropDuplicates("doc_a", "doc_b")
  }

  /** d16's truth-set sidecar (round-11 verdict item 6): the truth
    * pair set is IMMUTABLE given (corpus fingerprint, probe budget) —
    * it depends on no session dial (the approximate side does; truth
    * is the unblocked exact sweep) — so it persists fingerprint-keyed
    * in tmpdir like lshOccupancy, and repeat bench/CI runs read a
    * probe-budget-bounded pair list (≤400 probes × their length-band
    * mates) instead of re-mining. The collect, the sidecar, and the
    * local relation it reloads into are all statistic-sized; the
    * mining itself stays fully distributed on the cold run. Pairs
    * sort before publish so the sidecar bytes are deterministic.
    */
  private val d16TruthCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(Long, Long)]]()
  private[graft] def d16Truth(
      s: SparkSession, d: String): Seq[(Long, Long)] =
    d16TruthCache.computeIfAbsent(
      s"d16truth_${docsKey(d)}_b${D16ProbeBudget}_v1", key => {
        val f = new java.io.File(sys.props("java.io.tmpdir"),
          s"graft_$key.txt")
        val loaded: Option[Seq[(Long, Long)]] =
          if (!f.isFile) None
          else {
            val src = scala.io.Source.fromFile(f, "UTF-8")
            try Some(src.getLines().filter(_.nonEmpty).map { l =>
              val a = l.trim.split(' ')
              (a(0).toLong, a(1).toLong)
            }.toVector)
            finally src.close()
          }
        loaded.getOrElse {
          val pairs = d16MinedTruth(s, d).collect()
            .map(r => (r.getLong(0), r.getLong(1))).toVector.sorted
          val lines = pairs
            .map { case (a, b) => s"$a $b" }.mkString("", "\n", "\n")
          val tmp = java.io.File.createTempFile(
            f.getName, ".tmp", f.getParentFile)
          java.nio.file.Files.write(tmp.toPath,
            lines.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          // pure function of the corpus: a lost publish race reads
          // the same content either way (the LshCensus convention)
          if (!tmp.renameTo(f)) {
            if (!f.isFile)
              java.nio.file.Files.move(tmp.toPath, f.toPath,
                java.nio.file.StandardCopyOption.REPLACE_EXISTING)
            else tmp.delete()
          }
          pairs
        }
      })

  /** One d15 evaluation per (app, corpus, dials) — round-10 verdict
    * item 5: d16 replays the full production chain as its approximate
    * side, and without sharing, a bench run evaluating d15 AND d16
    * paid the d7 candidate mining + the Levenshtein verify twice. The
    * scored pair relation is byte-tiny (ids + two ints + a double per
    * candidate), so the localCheckpoint both materializes it once and
    * keeps it alive for later consumers in the same SparkContext; the
    * key carries the applicationId so a checkpoint can never outlive
    * its context, and every dial the chain reads, so a dialed session
    * never serves a default-dial cache (the pqBaseErr lesson).
    */
  private val d15Cache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  private def d15Scored(s: SparkSession, d: String): DataFrame =
    d15Cache.computeIfAbsent(
      // the dial list comes from chainDials — the one place a chain
      // dial is declared — so a dial can never be added to the chain
      // without also keying this memo (ADVICE round 11).
      // cand_broadcast_cap is a pure STRATEGY dial (CandSemiFallbackSpec
      // pins value-equality across it) but it keys the cache anyway so
      // the spec's dialed run exercises the real bloom path instead of
      // reading the default-dial memo
      s"${s.sparkContext.applicationId}:${docsKey(d)}:${chainDialKey(s)}",
      _ => {
      // same two structural moves as d8: the candidates materialize
      // ONCE (three consumers would otherwise re-inline the whole d7
      // subplan), and the candidate-id set BROADCASTS into the semi
      // join (count-gated, see candSemi) so the corpus's text column
      // is never shuffled
      val cands = queries("d7_lsh_bucket_cap")(s, d)
        .where(col("agreement") >= D15AgreeFloor)
        .select(col("doc_a"), col("doc_b"))
        .localCheckpoint()
      val candDocs = cands.select(col("doc_a").as("doc_id"))
        .union(cands.select(col("doc_b").as("doc_id"))).distinct()
      // texts ONLY for candidate docs (d8's semi-join discipline)
      val txt = candSemi(
        documents(s, d).select(col("doc_id"), col("text")), candDocs)
      // same explicit fan-out as d14: the candidate-pair relation is
      // byte-tiny, AQE coalesces it to one partition, and the DP
      // stage below is the query's CPU (measured at the 4M probe:
      // 30 s single-partition vs ~3 s fanned)
      val fan = s.sparkContext.defaultParallelism
      cands.hint("shuffle_hash")
        .join(txt.select(col("doc_id").as("doc_a"), col("text").as("ta"))
          .hint("shuffle_hash"), "doc_a")
        .join(txt.select(col("doc_id").as("doc_b"), col("text").as("tb"))
          .hint("shuffle_hash"), "doc_b")
        .repartition(fan, col("doc_a"), col("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          graft.functions.BandedLevenshtein(col("ta"), col("tb"),
            (greatest(length(col("ta")), length(col("tb"))) / 5)
              .cast("int")).as("lev"),
          greatest(length(col("ta")), length(col("tb"))).as("m"))
        .select(col("doc_a"), col("doc_b"), col("lev"),
          when(col("lev") >= 0,
            round(lit(1.0) - col("lev").cast("double") / col("m"), 4))
            .as("sim"),
          (col("lev") >= 0).as("is_dup"))
        .localCheckpoint()
    })

  /** d10's source-axis cap: shingles in more sources than this are
    * boilerplate, not contamination — and each would emit C(n,2) pair
    * rows. Testdata has 20 sources; the 2..10 band binds there.
    */
  private[llm] val MaxOverlapSources = 10

  /** d15's estimate-then-verify floor: only candidates whose
    * SIGNATURE-estimated jaccard (band agreement, already computed by
    * d7) clears this run the O(n·thr) Levenshtein DP. This is the
    * standard LSH discipline — the signature is an unbiased jaccard
    * estimator, so a candidate estimated far below dup similarity is
    * a band collision, not a near-dup. Measured on the testdata the
    * populations are cleanly bimodal (spurious ≤ 0.44, true dups
    * ≥ 0.81 at both SFs), and at the 16M-doc probe the sub-floor
    * collision population is the super-linear component (the
    * fixed-vocab generator's band-signature space saturates, so
    * birthday collisions grow faster than the corpus) — the floor
    * bounds the verify stage to the linearly-growing near-dup set by
    * construction. Mirrored in the oracle.
    *
    * Contract cost, quantified (ADVICE round 9): a TRUE near-dup can
    * estimate below the floor and be dropped before verify. With K=16
    * independent permutations, agreement ~ Binomial(16, j)/16 for
    * true jaccard j, so the miss probability P(agreement < 8/16) is
    * 1.5e-3 at j=0.8, 2.6e-2 at j=0.7, 0.14 at j=0.6 — negligible at
    * dup-threshold similarity, material only for pairs already near
    * the decision boundary. The oracle mirrors the floor, so this is
    * part of d15's PINNED semantics, not a hidden divergence.
    */
  private[graft] val D15AgreeFloor = 0.5

  /** d16's probe budget (n5's discipline applied to recall eval):
    * ground-truth pairs are mined for probe docs only — doc_id % 5
    * bounded by this budget, ≤400 probes at any corpus size — so the
    * exact banded-Levenshtein sweep is O(|probes| · length-band
    * mates), never O(corpus²). Every testdata doc_id is under it.
    */
  private[graft] val D16ProbeBudget = 2000L

  /** The cap recommendation's cost envelope: the kept-bucket self-join
    * may emit at most this many candidate pairs PER BANDED ROW (= 2 ×
    * bands per doc) — pairs stay LINEAR in corpus size, the only
    * envelope that survives scale-up. The envelope, not a row-mass
    * target, is what picks the cap: OccCurveProbe measured on the 4M
    * probe corpus that planted recall saturates far below the
    * row-mass knee (cap 32 → recall 0.905 at 7.4 pairs/doc; the
    * 99%-of-rows cap 7902 → recall 0.997 at 494 pairs/doc — a 66×
    * cost for the last 9 points), so a rows-based rule is
    * recall-correct but cost-blind on exactly the saturated corpora
    * that need the advisory.
    */
  private[graft] val PairBudgetPerRow = 2L

  /** Advisory threshold: fire when the DEFAULT cap sheds at least
    * this fraction of banded rows. Testdata sheds 0.8–1.4% at the
    * default cap (healthy blocking — a few boilerplate buckets); the
    * saturated fixed-vocab probe corpora shed far more, and the
    * D15CountProbe census ties that shed to planted-dup recall
    * falling 44% → 26% on the 4M→16M step. 10% is a 7× margin over
    * the healthy band (DedupRecallAdvisorySpec pins both sides).
    */
  private[graft] val DedupShedWarnFraction = 0.10

  /** Corpus fingerprint for occupancy/truth sidecars (the KMeans
    * registry's (path, mtime, size) convention on documents.parquet —
    * a regenerated corpus can never serve stale stats). */
  private def docsKey(d: String): String =
    LshCensus.fileKey(d, "documents.parquet")

  /** The d-family's band-bucket occupancy census — the measured basis
    * for the dedup recall advisory and the COMPUTED cap re-dial
    * (round-9 verdict items 1–2). The census machinery itself lives
    * in [[LshCensus]] (round-10 item 3 generalized it to d9/m5);
    * here it runs over the DEFAULT banding (capRec == the default cap
    * means the shed mass sits in buckets too wide to admit at linear
    * cost — near-identical boilerplate — where the production answer
    * is an exact-dedup pre-pass (d1) or re-banding, not a bigger cap;
    * the advisory message carries both branches).
    *
    * Sidecar v2: capRec moved from the rows-mass rule to the linear
    * pair envelope — the version suffix retires sidecars computed
    * under the old formula.
    */
  private[graft] def lshOccupancy(
      s: SparkSession, d: String): LshCensus.Occupancy =
    LshCensus.occupancy(
      s"dedup_${docsKey(d)}_cap${BucketCap}_v2",
      BucketCap, PairBudgetPerRow)(
      // census of the DEFAULT-dial regime by construction (the
      // advisory only fires un-dialed; a dialed session's census
      // would silently key differently) — K and banding pinned
      documents(s, d)
        .withColumn("hs", graft.functions.ShingleHashes(col("text")))
        .withColumn("sig", graft.functions.MinhashSignature(col("hs"), K))
        .withColumn("bucket", explode(expr(bucketsExpr)))
        .select("bucket"))

  private val dedupRecallWarned =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private lazy val advisoryLog =
    org.slf4j.LoggerFactory.getLogger("graft.dedup.advisory")

  /** Dedup-family recall advisory (the d-analog of the ANN family's
    * maybeWarnRecall): when the LSH chain is built AT DEFAULT DIALS
    * over a corpus whose band buckets saturate — the default cap
    * shedding ≥ [[DedupShedWarnFraction]] of banded rows — warn once
    * per (corpus, process), naming the measured shed and the COMPUTED
    * re-dial. The cap contract (bounded cost, recall traded) was
    * documented but SILENT: an operator running d7→d8/d15 on a
    * growing corpus lost half their near-dup yield (D15CountProbe:
    * planted recall 44% → 26% on the 4M→16M step) with nothing in a
    * log. Advisory-only: any recoverable stats failure skips the
    * warning, never the query. Returns whether the condition holds.
    */
  private[graft] def maybeWarnDedupRecall(
      s: SparkSession, d: String): Boolean = {
    val dialed = s.conf.getOption("graft.dedup.bucket_cap").isDefined ||
      s.conf.getOption("graft.dedup.rows_per_band").isDefined ||
      s.conf.getOption("graft.dedup.num_perms").isDefined ||
      s.conf.getOption("graft.dedup.profile").isDefined
    val fire = !dialed &&
      (try lshOccupancy(s, d).shedFraction >= DedupShedWarnFraction
      catch { case scala.util.control.NonFatal(e) =>
        advisoryLog.warn(s"dedup recall advisory skipped for $d: $e")
        false })
    if (fire) {
      val occ = lshOccupancy(s, d)
      Advisories.record("dedup_lsh_cap", d, occ.shedFraction,
        "graft.dedup.profile=recall" +
          (if (occ.capRec > BucketCap)
            s"; or graft.dedup.bucket_cap=${occ.capRec} (linear pair " +
              "envelope)"
          else "; or a d1 exact pre-pass (shed mass is boilerplate " +
            "wider than the envelope admits)"),
        fingerprint = docsKey(d))
    }
    if (fire && dedupRecallWarned.add(d)) {
      val occ = lshOccupancy(s, d)
      val redial =
        if (occ.capRec > BucketCap)
          "One-touch: set graft.dedup.profile=recall - it bundles " +
            "the measured-dominant point (num_perms=32 at " +
            "rows_per_band=8) and rejects conflicting dials (the " +
            "half-configured state measured WORSE than defaults). " +
            "The three individual levers: set " +
            "graft.dedup.rows_per_band=8 to square " +
            "down the band collision rate at unchanged d7 cost " +
            "(ceiling = the bands that remain); raise " +
            "graft.dedup.num_perms (e.g. 32) to ADD bands, lifting " +
            "that ceiling at signature cost linear in K; and/or set " +
            f"graft.dedup.bucket_cap=${occ.capRec}, the largest cap " +
            "whose kept buckets emit <= " +
            f"$PairBudgetPerRow candidate pairs per banded row " +
            "(this corpus's census; costs a pair exchange). For " +
            "calibration, measured ON THE 16M FIXED-VOCAB PROBE " +
            "CORPUS ONLY (SCALING.md rounds 10-11): re-banding took " +
            "planted recall 26% -> 82%, the cap route 79%, and " +
            "the profile=recall point 96% at ~2x d7 cost - your " +
            "corpus's numbers will differ with its bucket shape."
        else
          "No cap inside the linear cost envelope recovers the shed " +
            "mass (it sits in near-identical boilerplate buckets " +
            "wider than the envelope admits): run an exact-dedup " +
            "pre-pass (d1) before LSH, or set " +
            "graft.dedup.profile=recall (= rows_per_band=8 to square " +
            "down the band collision rate and thin the buckets, plus " +
            "num_perms=32 to recover the ceiling the re-banding " +
            "costs; the measured point, SCALING.md round 11)."
      advisoryLog.warn(
        f"LSH hot-bucket cap (default graft.dedup.bucket_cap=" +
          f"$BucketCap) is shedding ${occ.shedFraction * 100}%.1f%% of " +
          f"banded rows over $d (${occ.nOverCap} of ${occ.nBuckets} " +
          f"buckets over-cap, widest ${occ.maxWidth}) - near-dup " +
          "recall degrades silently in this regime (on the 4x probe " +
          "corpus step this measured 44% -> 26% planted recall; " +
          "SCALING.md). " +
          redial + " Verification oracles assume the default dials.")
    }
    fire
  }

  /** d15's oracle chain, shared: its own entry verbatim, and d16's
    * `found` CTE (the recall eval replays the full production chain
    * in SQL so engine and oracle measure the same approximate set).
    */
  private val d15OracleSql: String =
    s"""WITH hashed AS (SELECT doc_id, $sqlShingleHashes AS hs FROM documents),
       |sigs AS (SELECT doc_id, $sqlSig AS sig FROM hashed),
       |banded AS (
       |  SELECT doc_id, sig, unnest([${sqlBuckets.mkString(", ")}]) AS bucket
       |  FROM sigs),
       |narrow AS (
       |  SELECT bucket FROM banded GROUP BY bucket HAVING count(*) <= $BucketCap),
       |capped AS (SELECT banded.* FROM banded JOIN narrow USING (bucket)),
       |cand AS (
       |  SELECT doc_a, doc_b FROM (
       |    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |           a.sig AS sig_a, b.sig AS sig_b
       |    FROM capped a JOIN capped b
       |      ON a.bucket = b.bucket AND a.doc_id < b.doc_id)
       |  WHERE len(list_filter(list_transform(range($K),
       |      i -> sig_a[i + 1] = sig_b[i + 1]), v -> v))
       |      / CAST($K AS DOUBLE) >= $D15AgreeFloor),
       |scored AS (
       |  SELECT doc_a, doc_b,
       |    levenshtein(ta.text, tb.text) AS full_lev,
       |    greatest(length(ta.text), length(tb.text)) AS m
       |  FROM cand
       |  JOIN documents ta ON ta.doc_id = doc_a
       |  JOIN documents tb ON tb.doc_id = doc_b)
       |SELECT doc_a, doc_b,
       |  CASE WHEN full_lev * 5 <= m THEN full_lev ELSE -1 END AS lev,
       |  CASE WHEN full_lev * 5 <= m
       |       THEN round(1.0 - CAST(full_lev AS DOUBLE) / m, 4) END AS sim,
       |  full_lev * 5 <= m AS is_dup
       |FROM scored ORDER BY doc_a, doc_b""".stripMargin

  val oracle: Map[String, String] = Map(
    "d1_dedup_exact" ->
      """SELECT min(doc_id) AS doc_id, count(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY doc_id""".stripMargin,
    "d2_minhash_signatures" ->
      s"""WITH hashed AS (SELECT doc_id, $sqlShingleHashes AS hs FROM documents)
         |SELECT doc_id, array_to_string($sqlSig, '_') AS sig
         |FROM hashed ORDER BY doc_id""".stripMargin,
    "d3_minhash_lsh_pairs" ->
      s"""WITH hashed AS (SELECT doc_id, $sqlShingleHashes AS hs FROM documents),
         |sigs AS (SELECT doc_id, $sqlSig AS sig FROM hashed),
         |banded AS (
         |  SELECT doc_id, sig, unnest([${sqlBuckets.mkString(", ")}]) AS bucket
         |  FROM sigs),
         |pairs AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |         a.sig AS sig_a, b.sig AS sig_b
         |  FROM banded a JOIN banded b
         |    ON a.bucket = b.bucket AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b,
         |  len(list_filter(list_transform(range($K),
         |      i -> sig_a[i + 1] = sig_b[i + 1]), v -> v)) / CAST($K AS DOUBLE)
         |    AS agreement
         |FROM pairs ORDER BY doc_a, doc_b""".stripMargin,
    "d7_lsh_bucket_cap" ->
      s"""WITH hashed AS (SELECT doc_id, $sqlShingleHashes AS hs FROM documents),
         |sigs AS (SELECT doc_id, $sqlSig AS sig FROM hashed),
         |banded AS (
         |  SELECT doc_id, sig, unnest([${sqlBuckets.mkString(", ")}]) AS bucket
         |  FROM sigs),
         |narrow AS (
         |  SELECT bucket FROM banded GROUP BY bucket HAVING count(*) <= $BucketCap),
         |capped AS (SELECT banded.* FROM banded JOIN narrow USING (bucket)),
         |pairs AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |         a.sig AS sig_a, b.sig AS sig_b
         |  FROM capped a JOIN capped b
         |    ON a.bucket = b.bucket AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b,
         |  len(list_filter(list_transform(range($K),
         |      i -> sig_a[i + 1] = sig_b[i + 1]), v -> v)) / CAST($K AS DOUBLE)
         |    AS agreement
         |FROM pairs ORDER BY doc_a, doc_b""".stripMargin,
    "d8_jaccard_verify" ->
      s"""WITH hashed AS (SELECT doc_id, $sqlShingleHashes AS hs FROM documents),
         |sigs AS (SELECT doc_id, $sqlSig AS sig FROM hashed),
         |banded AS (
         |  SELECT doc_id, sig, unnest([${sqlBuckets.mkString(", ")}]) AS bucket
         |  FROM sigs),
         |narrow AS (
         |  SELECT bucket FROM banded GROUP BY bucket HAVING count(*) <= $BucketCap),
         |capped AS (SELECT banded.* FROM banded JOIN narrow USING (bucket)),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM capped a JOIN capped b
         |    ON a.bucket = b.bucket AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b,
         |  round(CAST(len(list_intersect(ha.hs, hb.hs)) AS DOUBLE) /
         |        (len(ha.hs) + len(hb.hs) - len(list_intersect(ha.hs, hb.hs))), 4)
         |    AS jaccard
         |FROM cand
         |JOIN hashed ha ON ha.doc_id = doc_a
         |JOIN hashed hb ON hb.doc_id = doc_b
         |ORDER BY doc_a, doc_b""".stripMargin,
    "d4_ngram_jaccard" ->
      s"""WITH narrow AS (
         |  SELECT source FROM documents GROUP BY source
         |  HAVING count(*) <= $BlockCap),
         |sh AS (
         |  SELECT doc_id, d.source, unnest($sqlShingleHashes) AS h
         |  FROM documents d JOIN narrow USING (source)),
         |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |shared AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
         |  FROM sh a JOIN sh b
         |    ON a.source = b.source AND a.h = b.h AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT doc_a, doc_b,
         |  round(CAST(shared AS DOUBLE) / (na.n + nb.n - shared), 4) AS jaccard
         |FROM shared
         |JOIN sizes na ON na.doc_id = doc_a
         |JOIN sizes nb ON nb.doc_id = doc_b
         |WHERE round(CAST(shared AS DOUBLE) / (na.n + nb.n - shared), 4) >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin,
    "d13_containment" ->
      s"""WITH narrow AS (
         |  SELECT source FROM documents GROUP BY source
         |  HAVING count(*) <= $BlockCap),
         |sh AS (
         |  SELECT doc_id, d.source, unnest($sqlShingleHashes) AS h
         |  FROM documents d JOIN narrow USING (source)),
         |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |shared AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
         |  FROM sh a JOIN sh b
         |    ON a.source = b.source AND a.h = b.h AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT doc_a, doc_b,
         |  round(CAST(shared AS DOUBLE) / least(na.n, nb.n), 4) AS containment,
         |  round(CAST(shared AS DOUBLE) / (na.n + nb.n - shared), 4) AS jaccard
         |FROM shared
         |JOIN sizes na ON na.doc_id = doc_a
         |JOIN sizes nb ON nb.doc_id = doc_b
         |WHERE round(CAST(shared AS DOUBLE) / least(na.n, nb.n), 4) >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin,
    "d15_lsh_lev_verify" -> d15OracleSql,
    "d16_dedup_recall" ->
      s"""WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
         |p AS (SELECT doc_id AS pid, text AS pt, n AS pn FROM d
         |      WHERE doc_id % 5 = 0 AND doc_id < $D16ProbeBudget),
         |truth AS (
         |  SELECT DISTINCT least(d.doc_id, p.pid) AS doc_a,
         |         greatest(d.doc_id, p.pid) AS doc_b
         |  FROM d JOIN p ON d.doc_id <> p.pid
         |    AND abs(d.n - p.pn) * 5 <= greatest(d.n, p.pn)
         |  WHERE levenshtein(d.text, p.pt) * 5 <= greatest(d.n, p.pn)),
         |found AS (
         |  SELECT doc_a, doc_b
         |  FROM (${d15OracleSql.replace("ORDER BY doc_a, doc_b", "")})
         |  WHERE is_dup)
         |SELECT count(*) AS n_true,
         |  CAST(coalesce(sum(CASE WHEN f.doc_a IS NOT NULL
         |                         THEN 1 ELSE 0 END), 0) AS BIGINT)
         |    AS n_hit,
         |  round(CAST(coalesce(sum(CASE WHEN f.doc_a IS NOT NULL
         |                               THEN 1 ELSE 0 END), 0) AS DOUBLE)
         |        / count(*), 4) AS recall
         |FROM truth t LEFT JOIN found f
         |  ON t.doc_a = f.doc_a AND t.doc_b = f.doc_b""".stripMargin,
    "d14_edit_distance" ->
      s"""WITH narrow AS (
         |  SELECT source FROM documents GROUP BY source
         |  HAVING count(*) <= $BlockCap),
         |d AS (
         |  SELECT doc_id, text, d.source, length(text) AS n
         |  FROM documents d JOIN narrow USING (source)),
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    levenshtein(a.text, b.text) AS lev, greatest(a.n, b.n) AS m
         |  FROM d a JOIN d b
         |    ON a.source = b.source AND a.doc_id < b.doc_id
         |    AND abs(a.n - b.n) * 5 <= greatest(a.n, b.n))
         |SELECT doc_a, doc_b, lev,
         |  round(1.0 - CAST(lev AS DOUBLE) / m, 4) AS sim
         |FROM pairs WHERE lev * 5 <= m
         |ORDER BY doc_a, doc_b""".stripMargin,
    "d5_simhash" ->
      s"""WITH toks AS (
         |  SELECT DISTINCT doc_id,
         |    unnest(list_distinct(list_filter(
         |      regexp_split_to_array(lower(text), '\\s+'), x -> x <> ''))) AS tok
         |  FROM documents),
         |votes AS (
         |  SELECT doc_id, i.range AS bit,
         |    sum(CASE WHEN (${sqlHash28("tok")} >> i.range) & 1 = 1
         |             THEN 1 ELSE -1 END) AS vote
         |  FROM toks, range(28) i GROUP BY 1, 2)
         |SELECT doc_id,
         |  CAST(sum(CASE WHEN vote > 0
         |           THEN CAST(pow(2, bit) AS BIGINT) ELSE 0 END) AS BIGINT)
         |    AS simhash
         |FROM votes GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "d10_cross_source_overlap" ->
      s"""WITH ds AS (
         |  SELECT DISTINCT source, h FROM (
         |    SELECT source, unnest($sqlShingleHashes) AS h
         |    FROM documents)),
         |elig AS (
         |  SELECT h FROM ds GROUP BY h
         |  HAVING count(*) BETWEEN 2 AND $MaxOverlapSources),
         |dsc AS (SELECT ds.* FROM ds JOIN elig USING (h))
         |SELECT a.source AS src_a, b.source AS src_b,
         |  count(*) AS shared_shingles
         |FROM dsc a JOIN dsc b ON a.h = b.h AND a.source < b.source
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "d11_incremental_dedup" ->
      """WITH k AS (
        |  SELECT doc_id,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7) AS BIGINT)
        |      % 100 AS bucket,
        |    md5(array_to_string(list_sort(list_distinct(list_filter(
        |      regexp_split_to_array(lower(text), '\s+'), x -> x <> ''))), ' '))
        |      AS digest
        |  FROM documents),
        |inc AS (SELECT doc_id, digest FROM k WHERE bucket >= 90),
        |hist AS (SELECT DISTINCT digest FROM k WHERE bucket < 90),
        |firsts AS (SELECT digest, min(doc_id) AS first_doc
        |           FROM inc GROUP BY digest)
        |SELECT i.doc_id, i.digest,
        |  CASE WHEN h.digest IS NOT NULL THEN 'history'
        |       WHEN i.doc_id > f.first_doc THEN 'batch'
        |       ELSE 'new' END AS status
        |FROM inc i LEFT JOIN hist h USING (digest)
        |JOIN firsts f USING (digest)
        |ORDER BY doc_id""".stripMargin
  )
}
