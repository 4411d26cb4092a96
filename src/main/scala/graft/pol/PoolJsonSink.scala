package graft.pol

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Output sinks matching the reference's load stage:
  *
  *   - S6 consolidated JSON upsert (`etl/load.py:16-82`): one JSON
  *     object keyed by POSIX-normalized source path; existing entries
  *     not re-processed are preserved (J2 anti-semantics), processed
  *     keys are overwritten, new keys appended in processing order.
  *   - S7 summary report (`etl/load.py:85-104`).
  *   - S8 index (`etl/load.py:107-155`, declared/dead code).
  *   - S9 CSV summary (`etl/load.py:158-213`, declared/dead code).
  *
  * The consolidated file is rendered with a Python-`json.dump(indent=2,
  * ensure_ascii=False)`-compatible printer so outputs stay byte-stable
  * against the reference's golden files. The upsert itself never parses
  * existing VALUES — it splits the top-level object into raw key/value
  * spans and re-emits untouched entries verbatim, so a round-trip
  * through the sink is the identity on unprocessed entries.
  *
  * Scale: the driver-side writer is for the reference-shaped corpus
  * (one row per FILE — thousands, not billions). At data-lake scale use
  * [[upsertDistributed]] (left-anti + unionByName, the same plan Delta
  * MERGE lowers to for insert-overwrite-by-key) and keep documents in a
  * keyed table instead of one JSON blob.
  */
object PoolJsonSink {

  // ---------- Python-compatible JSON rendering ----------

  sealed trait J
  case class JStr(s: String) extends J
  case class JLong(v: Long) extends J
  case class JDouble(v: Double) extends J
  case class JBool(v: Boolean) extends J
  case object JNull extends J
  case class JArr(items: Seq[J]) extends J
  case class JObj(fields: Seq[(String, J)]) extends J
  /** Pre-rendered raw span (used to re-emit existing entries verbatim). */
  case class JRaw(text: String) extends J

  private def escape(s: String): String = {
    val b = new StringBuilder
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.toString
  }

  /** Python repr(float) for the value ranges the pipeline produces
    * (|x| in [1e-4, 1e16) renders in positional notation).
    */
  private def pyFloat(v: Double): String = {
    if (v == v.toLong.toDouble && math.abs(v) < 1e16) s"${v.toLong}.0"
    else {
      val s = v.toString
      if (s.contains("E")) { // fall back for extreme magnitudes
        java.math.BigDecimal.valueOf(v).stripTrailingZeros.toPlainString
      } else s
    }
  }

  /** Render with `json.dump(..., indent=2)` layout. */
  def render(j: J, indent: Int = 0): String = j match {
    case JStr(s) => "\"" + escape(s) + "\""
    case JLong(v) => v.toString
    case JDouble(v) => pyFloat(v)
    case JBool(v) => if (v) "true" else "false"
    case JNull => "null"
    case JRaw(t) => t
    case JArr(Nil) => "[]"
    case JArr(items) =>
      val pad = " " * (indent + 2)
      items.map(i => pad + render(i, indent + 2))
        .mkString("[\n", ",\n", "\n" + " " * indent + "]")
    case JObj(Nil) => "{}"
    case JObj(fields) =>
      val pad = " " * (indent + 2)
      fields.map { case (k, v) =>
        pad + "\"" + escape(k) + "\": " + render(v, indent + 2)
      }.mkString("{\n", ",\n", "\n" + " " * indent + "}")
  }

  // ---------- document row -> JSON (reference field order) ----------

  /** Shape of `etl/transform.py:237-256`, with `max_win_factor` emitted
    * after `min_bet` when present (optional passthrough, matching the
    * golden corpus layout).
    */
  def docJson(r: Row): JObj = {
    def opt(name: String): Option[Any] =
      if (r.isNullAt(r.fieldIndex(name))) None else Some(r.getAs[Any](name))
    def jd(name: String): J =
      opt(name).map(v => JDouble(v.asInstanceOf[Double])).getOrElse(JNull)
    def js(name: String): J =
      opt(name).map(v => JStr(v.toString)).getOrElse(JNull)
    val tag: J =
      if (r.getAs[Boolean]("tag_is_scalar")) JStr("UNKNOWN")
      else JArr(r.getAs[collection.Seq[String]]("tag").toSeq.map(JStr))
    val meta = r.getAs[Row]("metadata")
    val metaJ = JObj(Seq(
      "source_file" -> JStr(meta.getAs[String]("source_file")),
      "file_name" -> JStr(meta.getAs[String]("file_name")),
      "folder_path" -> JStr(meta.getAs[String]("folder_path")),
      "processed_at" -> JStr(meta.getAs[String]("processed_at")),
      "hit_frequency" -> (if (meta.isNullAt(meta.fieldIndex("hit_frequency"))) JNull
        else JDouble(meta.getAs[Double]("hit_frequency")))))
    val mwf = opt("max_win_factor").map(v =>
      Seq("max_win_factor" -> JDouble(v.asInstanceOf[Double]))).getOrElse(Nil)
    JObj(
      Seq(
        "pool_name" -> js("pool_name"),
        "pool_id" -> js("pool_id"),
        "pool_type" -> js("pool_type"),
        "game_ids" -> JArr(
          r.getAs[collection.Seq[String]]("game_ids").toSeq.map(JStr)),
        "min_bet" -> jd("min_bet")) ++ mwf ++ Seq(
        "rtp" -> jd("rtp"),
        "volatility" -> jd("volatility"),
        "is_flat" -> JLong(r.getAs[Int]("is_flat").toLong),
        "tag" -> tag,
        "size" -> JLong(r.getAs[Long]("size")),
        "max_multiplier" -> js("max_multiplier"),
        "metadata" -> metaJ))
  }

  // ---------- S6: consolidated upsert ----------

  /** Split a top-level JSON object into (key, raw value text) spans in
    * document order, without interpreting values.
    */
  def splitTopLevel(text: String): Seq[(String, String)] = {
    val out = collection.mutable.ArrayBuffer[(String, String)]()
    var i = text.indexOf('{') + 1
    def skipWs(): Unit = { while (i < text.length && text(i).isWhitespace) i += 1 }
    def readString(): String = {
      // positioned at opening quote
      val b = new StringBuilder
      i += 1
      while (text(i) != '"') {
        if (text(i) == '\\') {
          text(i + 1) match {
            case 'n' => b.append('\n'); case 't' => b.append('\t')
            case 'r' => b.append('\r'); case 'u' =>
              b.append(Integer.parseInt(text.substring(i + 2, i + 6), 16).toChar)
              i += 4
            case c => b.append(c)
          }
          i += 2
        } else { b.append(text(i)); i += 1 }
      }
      i += 1
      b.toString
    }
    skipWs()
    while (i < text.length && text(i) != '}') {
      val key = readString()
      skipWs(); i += 1 // ':'
      skipWs()
      val start = i
      var depth = 0
      var inStr = false
      var done = false
      while (!done) {
        val c = text(i)
        if (inStr) {
          if (c == '\\') i += 1
          else if (c == '"') inStr = false
        } else c match {
          case '"' => inStr = true
          case '{' | '[' => depth += 1
          case '}' | ']' => if (depth == 0) done = true else depth -= 1
          case ',' => if (depth == 0) done = true
          case _ =>
        }
        if (!done) i += 1
      }
      out.append((key, text.substring(start, i).reverse.dropWhile(_.isWhitespace).reverse))
      skipWs()
      if (i < text.length && text(i) == ',') { i += 1; skipWs() }
    }
    out.toSeq
  }

  /** S6 + J2: upsert the documents into `outputFile`, preserving
    * untouched existing entries (verbatim raw spans) and their order;
    * processed keys are overwritten in place, new keys appended in
    * `docs` order. Returns the number of upserted entries.
    */
  def upsert(docs: Seq[Row], outputFile: Path): Int = {
    val existing: Seq[(String, String)] =
      if (Files.exists(outputFile))
        splitTopLevel(new String(Files.readAllBytes(outputFile), StandardCharsets.UTF_8))
      else Seq.empty
    val incoming: Seq[(String, String)] = docs.flatMap { r =>
      val meta = r.getAs[Row]("metadata")
      Option(meta.getAs[String]("source_file")).map { sf =>
        val key = sf.replace('\\', '/') // P6 POSIX normalization
        key -> render(docJson(r), 2)
      }
    }
    val incomingMap = incoming.toMap
    val keptOrder = existing.map(_._1)
    val merged: Seq[(String, String)] =
      existing.map { case (k, raw) => k -> incomingMap.getOrElse(k, raw) } ++
        incoming.filterNot { case (k, _) => keptOrder.contains(k) }
    val body = merged.map { case (k, v) => s"""  "${escape(k)}": $v""" }
      .mkString("{\n", ",\n", "\n}")
    Files.createDirectories(outputFile.getParent)
    Files.write(outputFile, body.getBytes(StandardCharsets.UTF_8))
    incoming.size
  }

  /** The same upsert semantics as a distributed plan (for keyed-table
    * storage at scale): keys of `incoming` replace matching keys of
    * `existing`, everything else survives.
    */
  def upsertDistributed(existing: DataFrame, incoming: DataFrame): DataFrame = {
    val key = col("metadata.source_file")
    existing.join(incoming.select(key.as("__k")), key === col("__k"), "left_anti")
      .unionByName(incoming)
  }

  /** S6's executable scale path: the MERGE-shaped keyed upsert against
    * a parquet table hash-partitioned on the upsert key (`__pt =
    * pmod(xxhash64(key), nBuckets)`) — the same plan a Delta/Iceberg
    * MERGE lowers to for overwrite-by-key, runnable on plain parquet.
    *
    * Only partitions that incoming keys hash into are READ (partition
    * pruning via the `__pt IN (...)` filter — the bucket list is at
    * most nBuckets values, collected driver-side) and only those are
    * REWRITTEN (dynamic partition overwrite); a billion-row table with
    * a thousand-row incoming batch touches a handful of directories
    * and leaves the rest byte-identical on disk. The merged touched
    * partitions are localCheckpoint'ed before the write because Spark
    * (correctly) refuses to overwrite a path it is still reading from;
    * the materialized footprint is bounded by the touched partitions,
    * not the table. On a production cluster, a reliable checkpoint or
    * a staging-dir swap is the durable variant of that severing step.
    *
    * Returns the bucket ids rewritten. `key` must be an unresolved
    * column expression valid on both incoming and the stored schema
    * (e.g. `col("metadata.source_file")`).
    */
  def upsertPartitioned(
      spark: org.apache.spark.sql.SparkSession,
      tableDir: String,
      incoming: DataFrame,
      key: org.apache.spark.sql.Column,
      nBuckets: Int = 64): Seq[Long] = {
    val withPt = incoming.withColumn("__pt",
      pmod(xxhash64(key), lit(nBuckets.toLong)))
    if (!new java.io.File(tableDir).exists()) {
      withPt.write.partitionBy("__pt").parquet(tableDir)
      return withPt.select("__pt").distinct().collect().map(_.getLong(0)).toSeq
    }
    val touched = withPt.select("__pt").distinct()
      .collect().map(_.getLong(0)).toSeq
    val existing = spark.read.parquet(tableDir)
      .where(col("__pt").isin(touched: _*))
    val keep = existing.join(
      withPt.select(key.as("__k")).distinct(),
      key === col("__k"), "left_anti")
    val merged = keep.unionByName(withPt).localCheckpoint(true)
    merged.write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("__pt")
      .parquet(tableDir)
    touched
  }

  /** Maintenance for [[upsertPartitioned]] tables: every MERGE batch
    * appends at least one parquet file to each touched bucket, so a
    * table taking frequent small upserts accumulates the classic
    * small-files problem (scan tasks, open costs and footer reads all
    * scale with file count, not bytes). Compaction rewrites ONLY the
    * buckets whose file count exceeds `maxFilesPerPartition` — one
    * task per fat bucket (`repartition` on the partition column), so
    * each lands as a single file — and leaves every other partition
    * byte-identical on disk. Returns the bucket ids compacted.
    */
  def compactPartitions(
      spark: org.apache.spark.sql.SparkSession,
      tableDir: String,
      maxFilesPerPartition: Int = 4): Seq[Long] = {
    val root = new java.io.File(tableDir)
    val fat = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && d.getName.startsWith("__pt="))
      .filter(_.listFiles().count(f =>
        f.getName.endsWith(".parquet") && !f.getName.startsWith(".")) >
        maxFilesPerPartition)
      .map(_.getName.stripPrefix("__pt=").toLong)
      .toSeq
    if (fat.nonEmpty) {
      val df = spark.read.parquet(tableDir)
        .where(col("__pt").isin(fat: _*))
        .localCheckpoint(true) // sever file lineage before overwrite
      df.repartition(fat.size, col("__pt"))
        .write
        .mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("__pt")
        .parquet(tableDir)
    }
    fat
  }

  // ---------- S7: summary report ----------

  /** Render the run summary (`etl/main.py:135-148` shape + A7 block). */
  def summaryJson(
      timestamp: String,
      processed: Long,
      succeeded: Long,
      failed: Long,
      errors: Seq[(String, String)],
      outputFiles: Seq[String],
      aggregated: Row): JObj = {
    def mapOf(name: String): Seq[(String, J)] =
      aggregated.getAs[Map[String, Long]](name).toSeq.sortBy(_._1)
        .map { case (k, v) => k -> (JLong(v): J) }
    // tags_distribution arrives as an ORDERED array<struct<tag,cnt>>
    // (first-encounter order, like the reference's dict(Counter)).
    def orderedOf(name: String): Seq[(String, J)] =
      aggregated.getAs[collection.Seq[Row]](name)
        .map(r => r.getString(0) -> (JLong(r.getLong(1)): J)).toSeq
    def stats(prefix: String): Option[(String, J)] = {
      if (aggregated.isNullAt(aggregated.fieldIndex(s"${prefix}_min"))) None
      else Some(s"${prefix}_stats" -> JObj(Seq(
        "min" -> JDouble(aggregated.getAs[Double](s"${prefix}_min")),
        "max" -> JDouble(aggregated.getAs[Double](s"${prefix}_max")),
        "avg" -> JDouble(aggregated.getAs[Double](s"${prefix}_avg")))))
    }
    JObj(Seq(
      "timestamp" -> JStr(timestamp),
      "total_files_processed" -> JLong(processed),
      "successful_transforms" -> JLong(succeeded),
      "failed_transforms" -> JLong(failed),
      "errors" -> JArr(errors.map { case (f, e) =>
        JObj(Seq("file" -> JStr(f), "error" -> JStr(e))) }),
      "output_files" -> JArr(outputFiles.map(JStr)),
      "aggregated" -> JObj(Seq(
        "total_files_processed" ->
          JLong(aggregated.getAs[Long]("total_files_processed")),
        "total_records_across_all_files" ->
          JLong(aggregated.getAs[Long]("total_records_across_all_files")),
        "tags_distribution" -> JObj(orderedOf("tags_distribution")),
        "files_by_folder" -> JObj(mapOf("files_by_folder")),
        "generated_at" -> JStr(aggregated.getAs[String]("generated_at"))) ++
        stats("rtp") ++ stats("volatility"))))
  }

  def writeSummary(j: JObj, outputFile: Path): Unit = {
    Files.createDirectories(outputFile.getParent)
    Files.write(outputFile, render(j).getBytes(StandardCharsets.UTF_8))
  }

  // ---------- S8: index ----------

  /** `_index.json`: entries sorted by source file + count. */
  def writeIndex(docs: Seq[Row], generatedAt: String, outputFile: Path): Unit = {
    val entries = docs.map { r =>
      val meta = r.getAs[Row]("metadata")
      JObj(Seq(
        "source_file" -> JStr(meta.getAs[String]("source_file")),
        "pool_name" -> JStr(r.getAs[String]("pool_name")),
        "size" -> JLong(r.getAs[Long]("size"))))
    }.sortBy(_.fields.head._2.asInstanceOf[JStr].s)
    val j = JObj(Seq(
      "generated_at" -> JStr(generatedAt),
      "total_files" -> JLong(entries.size.toLong),
      "files" -> JArr(entries)))
    Files.createDirectories(outputFile.getParent)
    Files.write(outputFile, render(j).getBytes(StandardCharsets.UTF_8))
  }

  // ---------- S9: CSV summary ----------

  /** Flat per-file summary CSV (header + one row per document),
    * written by Spark's CSV sink.
    */
  def writeCsv(docs: DataFrame, outDir: String): Unit =
    docs.select(
        col("pool_name"), col("pool_id"), col("pool_type"),
        col("min_bet"), col("rtp"), col("volatility"),
        col("metadata.hit_frequency").as("hit_frequency"),
        col("size"), col("is_flat"), col("max_multiplier"),
        col("metadata.source_file").as("source_file"))
      .orderBy("source_file")
      .coalesce(1)
      .write.mode("overwrite").option("header", "true").csv(outDir)
}
