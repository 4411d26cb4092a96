package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-curation operators for a large-scale training-data pipeline:
  * dedup-cluster resolution (connected components over LSH candidate
  * pairs), deterministic train/val/test splitting, and per-source quota
  * sampling. These are the steps between "found near-dup pairs" and
  * "emitted a training corpus": pairs must become clusters with one
  * canonical survivor, and the corpus must be split and rebalanced
  * reproducibly — no RNG, so any re-run (or a re-run over 100 TB on a
  * different cluster) lands byte-identical rows.
  *
  * Scale notes: connected components is iterative min-label
  * propagation — each round is one self-join + groupBy(min) over the
  * EDGE set (the LSH candidate pairs, which are tiny relative to the
  * corpus by construction), converging in O(diameter) rounds; cluster
  * diameter for near-dup graphs is small (dups of a doc are dups of
  * each other, so clusters are near-cliques) and 2–4 rounds dominate
  * in practice. Pathological chain-shaped graphs would want the
  * large-star/small-star variant, which contracts in O(log n) rounds
  * with the same per-round plan shape. The split
  * and quota sample are embarrassingly parallel: a codegen'd md5 on
  * each row, plus (for the quota) one shuffle by the partition column
  * — exactly the operators a 1000-executor job wants.
  */
object CurationQueries {
  import graft.Tables.documents

  /** LSH candidate pairs at agreement >= 0.5 — the hot-bucket-capped
    * d7 pipeline (shingle → minhash → band → capped bucket join; the
    * cap is what keeps pair mining alive on boilerplate-heavy corpora,
    * see d7), keeping only pairs whose signatures agree on half the
    * permutations.
    */
  private def dupPairs(s: SparkSession, d: String): DataFrame =
    DedupQueries.queries("d7_lsh_bucket_cap")(s, d)
      .where(col("agreement") >= 0.5)
      .select(col("doc_a"), col("doc_b"))

  /** Min-label propagation to a fixpoint: every doc in the pair graph
    * ends up labeled with the smallest doc_id reachable from it.
    *
    * The edge list stays fixed; only the |vertices|-row label table
    * updates per round. Labels are monotonically non-increasing, so the
    * label SUM is a fixpoint witness — convergence detection is one
    * tiny aggregate per round, no diff join. `localCheckpoint`
    * materializes each round's labels AND truncates lineage (an
    * iterative plan otherwise nests one join per round until planning
    * dominates); on a production cluster with executor churn, a
    * reliable `checkpoint` to the cluster FS is the durable variant.
    */
  private[graft] def connectedComponents(pairs: DataFrame): DataFrame = {
    // both edge directions from ONE scan of the pair plan (a union of
    // two projections would evaluate the upstream LSH pipeline twice)
    val edges = pairs.select(explode(array(
        struct(col("doc_a").as("src"), col("doc_b").as("dst")),
        struct(col("doc_b").as("src"), col("doc_a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .cache()
    var labels = edges.select(col("src").as("doc_id"))
      .distinct()
      .withColumn("cluster_id", col("doc_id"))
      .localCheckpoint(true)
    def labelSum(df: DataFrame): Long =
      df.agg(sum(col("cluster_id"))).first().getLong(0)
    var prevSum = labelSum(labels)
    val debug = sys.env.contains("GRAFT_CC_DEBUG")
    var converged = false
    var rounds = 0
    while (!converged && rounds < 50) {
      val t0 = System.nanoTime()
      // label(v) <- min(label(v), min over neighbors u of label(u))
      val fromNeighbors = edges
        .join(labels.withColumnRenamed("doc_id", "dst"), "dst")
        .groupBy(col("src").as("doc_id"))
        .agg(min(col("cluster_id")).as("nbr_min"))
      val propagated = labels.join(fromNeighbors, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("cluster_id"), coalesce(col("nbr_min"), col("cluster_id")))
            .as("cluster_id"))
      // pointer jumping: label(v) <- min(label(v), label(label(v))).
      // Every label is itself a vertex id, so a self-join doubles the
      // distance a label has traveled — neighbor propagation alone
      // walks chains one hop per round (O(diameter) rounds, each a
      // fixed-cost Spark job), with jumping it is O(log diameter).
      // (A second jump per round was measured and does not cut rounds:
      // spreading is neighbor-hop-bound, not pointer-depth-bound. The
      // large-star/small-star edge-contraction algorithm is the next
      // rung if adversarial graph shapes ever dominate.)
      val next = propagated.as("x")
        .join(propagated.select(col("doc_id").as("p_id"),
            col("cluster_id").as("p_lbl")),
          col("x.cluster_id") === col("p_id"), "left")
        .select(col("x.doc_id").as("doc_id"),
          least(col("x.cluster_id"), coalesce(col("p_lbl"), col("x.cluster_id")))
            .as("cluster_id"))
        .localCheckpoint(true)
      val s = labelSum(next)
      labels = next
      converged = s == prevSum
      prevSum = s
      rounds += 1
      if (debug) System.err.println(
        f"[cc] round $rounds sum=$s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // an unconverged exit would silently mislabel clusters — refuse
    if (!converged) throw new IllegalStateException(
      s"connectedComponents: no fixpoint within $rounds rounds")
    edges.unpersist()
    labels
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // C1 — dedup clusters: connected components over the LSH pair
    // graph; each doc in a cluster gets the cluster's min doc_id as
    // its id, and the canonical survivor is the doc equal to it.
    "c1_dedup_clusters" -> ((s, d) =>
      connectedComponents(dupPairs(s, d))
        .withColumn("is_canonical",
          (col("doc_id") === col("cluster_id")).cast("int"))
        .orderBy("doc_id")),

    // C2 — deterministic train/val/test split: md5 of the doc_id keys
    // an 80/10/10 split that is stable across runs, partitionings and
    // engines (no RNG, no row order dependence).
    "c2_hash_split" -> ((s, d) =>
      documents(s, d)
        .withColumn("bucket",
          expr("CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 7), 16, 10) AS BIGINT) % 100"))
        .withColumn("split",
          when(col("bucket") < 80, "train")
            .when(col("bucket") < 90, "val")
            .otherwise("test"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("n_chars"),
          min(col("doc_id")).as("first_doc"))
        .orderBy("split")),

    // C4 — the end-to-end corpus filter: drop near-dup non-survivors
    // (c1 clusters over capped-LSH candidates), gate on quality score
    // (x2 >= 0.5 in ppm), keep the train split (c2 buckets), and emit
    // per-source corpus stats — the one-plan composition of the whole
    // curation chain a training-data job runs before tokenization.
    // The dedup drop is a left-anti join against the (tiny) cluster
    // non-canonical set; quality and split are map-side expressions.
    "c4_corpus_filter" -> ((s, d) => {
      val dupDrop = queries("c1_dedup_clusters")(s, d)
        .where(col("is_canonical") === 0)
        .select("doc_id")
      val scored = TextQueries.queries("x2_quality_score")(s, d)
        .select("doc_id", "score_ppm")
      documents(s, d)
        .join(dupDrop, Seq("doc_id"), "left_anti")
        .join(scored, "doc_id")
        .where(col("score_ppm") >= 500000)
        .withColumn("bucket",
          expr("CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 7), 16, 10) AS BIGINT) % 100"))
        .where(col("bucket") < 80)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("n_chars"))
        .orderBy("source")
    }),

    // C3 — per-source quota sample: k docs per source, chosen by md5
    // rank — a deterministic stand-in for uniform sampling that
    // rebalances a skewed source mix. One shuffle on source; the
    // rank+filter prunes to k·|sources| rows immediately.
    "c3_quota_sample" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source")
        .orderBy(md5(concat_ws("_", col("doc_id"), col("text"))), col("doc_id"))
      documents(s, d)
        .withColumn("rk", row_number().over(w))
        .where(col("rk") <= 5)
        .select("source", "rk", "doc_id")
        .orderBy("source", "rk")
    })
  )

  private val sqlPairs =
    s"""${DedupQueries.oracle("d7_lsh_bucket_cap")
        .replace("ORDER BY doc_a, doc_b", "")}"""

  val oracle: Map[String, String] = Map(
    "c1_dedup_clusters" ->
      s"""WITH pairs AS ($sqlPairs),
         |edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM pairs WHERE agreement >= 0.5
         |  UNION ALL
         |  SELECT doc_b AS src, doc_a AS dst FROM pairs WHERE agreement >= 0.5),
         |reach AS (
         |  WITH RECURSIVE r(doc_id, lbl) AS (
         |    SELECT src, src FROM edges
         |    UNION
         |    SELECT e.dst, r.lbl FROM r JOIN edges e ON e.src = r.doc_id)
         |  SELECT * FROM r)
         |SELECT doc_id, min(lbl) AS cluster_id,
         |  CAST(doc_id = min(lbl) AS INT) AS is_canonical
         |FROM reach GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "c4_corpus_filter" ->
      s"""WITH pairs AS ($sqlPairs),
         |edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM pairs WHERE agreement >= 0.5
         |  UNION ALL
         |  SELECT doc_b AS src, doc_a AS dst FROM pairs WHERE agreement >= 0.5),
         |reach AS (
         |  WITH RECURSIVE r(doc_id, lbl) AS (
         |    SELECT src, src FROM edges
         |    UNION
         |    SELECT e.dst, r.lbl FROM r JOIN edges e ON e.src = r.doc_id)
         |  SELECT * FROM r),
         |drop_docs AS (
         |  SELECT doc_id FROM reach GROUP BY doc_id
         |  HAVING doc_id <> min(lbl)),
         |x AS (${TextQueries.oracle("x2_quality_score")
            .replace("ORDER BY doc_id", "")})
         |SELECT d.source AS source, count(*) AS n_docs,
         |  CAST(sum(d.n_chars) AS BIGINT) AS n_chars
         |FROM documents d JOIN x ON x.doc_id = d.doc_id
         |WHERE d.doc_id NOT IN (SELECT doc_id FROM drop_docs)
         |  AND x.score_ppm >= 500000
         |  AND CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 7)
         |      AS BIGINT) % 100 < 80
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "c2_hash_split" ->
      """WITH b AS (
        |  SELECT *,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7) AS BIGINT)
        |      % 100 AS bucket
        |  FROM documents)
        |SELECT CASE WHEN bucket < 80 THEN 'train'
        |            WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
        |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS n_chars,
        |  min(doc_id) AS first_doc
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,
    "c3_quota_sample" ->
      """WITH r AS (
        |  SELECT source, doc_id,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR) || '_' || text), doc_id)
        |      AS rk
        |  FROM documents)
        |SELECT source, rk, doc_id FROM r WHERE rk <= 5
        |ORDER BY source, rk""".stripMargin
  )
}
