package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline, over the
  * `documents` table: language-ID (stopword n-gram heuristic), quality
  * scoring (length/punct/stopword ratios), token counting (whitespace
  * + BPE-ish regex), and winnowing-style document fingerprinting
  * (rolling min over shingle hashes).
  *
  * Everything is codegen'd Catalyst expressions (regexp/array/window) —
  * no UDFs — so the plans stay inside whole-stage codegen and the
  * DuckDB oracle can recompute every score exactly.
  */
object TextQueries {
  import graft.Tables.documents
  import Hashing._

  private val enStop = Seq("the", "a", "of", "and", "to", "in", "is", "for", "on", "with")
  private val dataStop = Seq("table", "row", "data", "query", "join", "scan")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // X1 — language ID heuristic: stopword-list hit ratios, argmax of
    // two profiles with a deterministic tie rule.
    "x1_langid" -> ((s, d) => {
      val toks = expr("filter(split(lower(text), '\\\\s+'), x -> x <> '')")
      val en = enStop.map(w => s"'$w'").mkString(", ")
      val da = dataStop.map(w => s"'$w'").mkString(", ")
      documents(s, d)
        .withColumn("toks", toks)
        .withColumn("n_toks", size(col("toks")))
        .withColumn("en_hits",
          expr(s"size(filter(toks, x -> array_contains(array($en), x)))"))
        .withColumn("data_hits",
          expr(s"size(filter(toks, x -> array_contains(array($da), x)))"))
        .select(col("doc_id"),
          round(col("en_hits") / col("n_toks"), 4).as("en_ratio"),
          round(col("data_hits") / col("n_toks"), 4).as("data_ratio"),
          when(col("en_hits") >= col("data_hits"), lit("en"))
            .otherwise(lit("data-domain")).as("pred_lang"))
        .orderBy("doc_id")
    }),

    // X2 — quality score: length/punctuation/stopword/mean-token-length
    // features combined into a bounded score.
    "x2_quality_score" -> ((s, d) =>
      documents(s, d)
        .withColumn("toks",
          expr("filter(split(lower(text), '\\\\s+'), x -> x <> '')"))
        .withColumn("n_toks", size(col("toks")))
        .withColumn("len_chars", length(col("text")))
        .withColumn("punct", regexp_count(col("text"), lit("[.!?,;:]")))
        .withColumn("mean_tok_len",
          round(expr("aggregate(toks, 0L, (acc, x) -> acc + length(x))")
            / col("n_toks"), 4))
        .withColumn("punct_ratio", round(col("punct") / col("len_chars"), 4))
        // Score in exact DECIMAL arithmetic (equivalent to
        // 0.5·min(n_toks/100,1) + 0.3·min(mean_len/10,1) + 0.2·(1−punct)),
        // surfaced as integer parts-per-million — decimal→double
        // conversion is not correctly rounded in every engine, so the
        // comparable value stays integral.
        .withColumn("score_ppm",
          ((least(col("n_toks"), lit(100)).cast("decimal(18,4)") * lit(BigDecimal("0.005")) +
            least(col("mean_tok_len").cast("decimal(18,4)"),
              lit(BigDecimal(10)).cast("decimal(18,4)")) * lit(BigDecimal("0.03")) +
            (lit(1).cast("decimal(18,4)") - col("punct_ratio").cast("decimal(18,4)")) *
              lit(BigDecimal("0.2"))) * lit(1000000)).cast("long"))
        .select("doc_id", "len_chars", "n_toks", "punct_ratio",
          "mean_tok_len", "score_ppm")
        .orderBy("doc_id")),

    // X3 — token counting: whitespace tokens vs a BPE-ish regex
    // (letter runs / digit runs / single other chars).
    "x3_token_count" -> ((s, d) =>
      documents(s, d)
        .select(col("doc_id"),
          size(expr("filter(split(text, '\\\\s+'), x -> x <> '')"))
            .as("ws_tokens"),
          size(regexp_extract_all(col("text"),
            lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))
            .as("bpe_tokens"),
          round(length(col("text")) /
            size(regexp_extract_all(col("text"),
              lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))), 4)
            .as("chars_per_token"))
        .orderBy("doc_id")),

    // X4 — winnowing fingerprint: 8-char shingle hashes, min over each
    // 4-shingle window, distinct mins are the fingerprint set. Exposed
    // as count/min/max/sum so the result is scalar per doc. The native
    // WinnowFingerprint expression keeps the whole computation inside
    // one projection — map-only, vs the posexplode + window-function
    // formulation that shuffles |docs|×|chars| rows (the oracle pins
    // that formulation's values; WinnowFingerprintSpec proves equality).
    // The long sum is exact: ≤len(text) values < 2^28 cannot overflow.
    "x4_fingerprint" -> ((s, d) =>
      documents(s, d)
        .select(col("doc_id"),
          graft.functions.WinnowFingerprint(col("text")).as("fps"))
        .select(col("doc_id"),
          size(col("fps")).cast("long").as("n_fp"),
          array_min(col("fps")).as("min_fp"),
          array_max(col("fps")).as("max_fp"),
          expr("aggregate(fps, 0L, (acc, x) -> acc + x)").as("sum_fp"))
        .orderBy("doc_id"))
  )

  val oracle: Map[String, String] = {
    val en = enStop.map(w => s"'$w'").mkString(", ")
    val da = dataStop.map(w => s"'$w'").mkString(", ")
    Map(
      "x1_langid" ->
        s"""WITH t AS (
           |  SELECT doc_id,
           |    list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS toks
           |  FROM documents)
           |SELECT doc_id,
           |  round(CAST(len(list_filter(toks, x -> list_contains([$en], x))) AS DOUBLE)
           |        / len(toks), 4) AS en_ratio,
           |  round(CAST(len(list_filter(toks, x -> list_contains([$da], x))) AS DOUBLE)
           |        / len(toks), 4) AS data_ratio,
           |  CASE WHEN len(list_filter(toks, x -> list_contains([$en], x)))
           |            >= len(list_filter(toks, x -> list_contains([$da], x)))
           |       THEN 'en' ELSE 'data-domain' END AS pred_lang
           |FROM t ORDER BY doc_id""".stripMargin,
      "x2_quality_score" ->
        """WITH t AS (
          |  SELECT doc_id, text,
          |    list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS toks
          |  FROM documents),
          |f AS (
          |  SELECT doc_id,
          |    length(text) AS len_chars, len(toks) AS n_toks,
          |    len(regexp_extract_all(text, '[.!?,;:]')) AS punct,
          |    round(CAST(list_reduce(list_transform(toks, x -> length(x)),
          |          (a, b) -> a + b) AS DOUBLE) / len(toks), 4) AS mean_tok_len,
          |    round(CAST(len(regexp_extract_all(text, '[.!?,;:]')) AS DOUBLE)
          |          / length(text), 4) AS punct_ratio
          |  FROM t)
          |SELECT doc_id, len_chars, n_toks, punct_ratio, mean_tok_len,
          |  CAST((CAST(least(n_toks, 100) AS DECIMAL(18,4)) * 0.005 +
          |        least(CAST(mean_tok_len AS DECIMAL(18,4)),
          |              CAST(10 AS DECIMAL(18,4))) * 0.03 +
          |        (CAST(1 AS DECIMAL(18,4)) - CAST(punct_ratio AS DECIMAL(18,4)))
          |          * 0.2) * 1000000 AS BIGINT) AS score_ppm
          |FROM f ORDER BY doc_id""".stripMargin,
      "x3_token_count" ->
        """SELECT doc_id,
          |  len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> ''))
          |    AS ws_tokens,
          |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
          |    AS bpe_tokens,
          |  round(CAST(length(text) AS DOUBLE) /
          |    len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')), 4)
          |    AS chars_per_token
          |FROM documents ORDER BY doc_id""".stripMargin,
      "x4_fingerprint" ->
        """WITH sh0 AS (
          |  SELECT doc_id,
          |    unnest([{'i': i,
          |             'h': CAST('0x' || substr(md5(substr(text, i + 1, 8)), 1, 7) AS BIGINT)}
          |            FOR i IN range(greatest(len(text) - 7, 1))]) AS u
          |  FROM documents),
          |sh AS (SELECT doc_id, u.i AS i, u.h AS h FROM sh0),
          |fps AS (
          |  SELECT doc_id,
          |    min(h) OVER (PARTITION BY doc_id ORDER BY i
          |                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
          |  FROM sh)
          |SELECT doc_id, count(DISTINCT fp) AS n_fp, min(fp) AS min_fp,
          |  max(fp) AS max_fp,
          |  CAST(CAST(sum(DISTINCT CAST(fp AS DECIMAL(28,0))) AS DECIMAL(28,0)) AS BIGINT) AS sum_fp
          |FROM fps GROUP BY doc_id ORDER BY doc_id""".stripMargin
    )
  }
}
