package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.QueryHarness.{spark, sf0001}

/** t11 (streaming incremental MV) and c10 (epoch upsampling).
  *
  * t11's oracle pins the END STATE against DuckDB's direct aggregate;
  * these specs pin the two properties the oracle can't see: (1) the
  * streamed retraction path lands on exactly the same rows as the
  * one-shot batch retraction expression (j4) — i.e. splitting the
  * change feed across micro-batch boundaries loses nothing — and
  * (2) a group whose membership nets to zero is physically DELETED
  * from the MV table (the tombstone GC arm), not left behind as a
  * zero row that the final filter happens to hide.
  */
class StreamMvSpec extends AnyFunSuite {
  import spark.implicits._

  test("t11 streamed retraction MV equals j4's batch retraction MV") {
    val streamed = graft.SparkEntry
      .queries("t11_stream_incremental_mv")(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    val batch = graft.SparkEntry
      .queries("j4_incremental_mv")(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch)
  }

  test("t11 GC deletes a group that nets to zero (no zombie rows)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_t11gc").toString
    // grp 5's only member is user 35, and 35 % 7 == 0 so version 3
    // deletes it: the MV row for grp 5 must LEAVE THE TABLE, not
    // survive as a zero. Users 1 and 2 keep grps 1 and 2 alive.
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z")
    Seq(
      (1L, 35L, "view", 10.0), (2L, 35L, "view", 20.0),
      (3L, 1L, "view", 1.0), (4L, 1L, "view", 2.0),
      (5L, 2L, "view", 3.0), (6L, 2L, "view", 4.0))
      .map { case (e, u, t, v) =>
        (e, java.sql.Timestamp.from(base.plusSeconds(e)), u, t, v, "{}")
      }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val mv = graft.SparkEntry
      .queries("t11_stream_incremental_mv")(spark, dir)
      .select("grp", "n_users").as[(Long, Long)].collect().toMap
    assert(mv == Map(1L -> 1L, 2L -> 1L))
  }

  test("c10 replicates each doc exactly its source-tier epoch count") {
    val out = graft.SparkEntry.queries("c10_epoch_mix")(spark, sf0001)
      .localCheckpoint()
    val perDoc = out.groupBy("doc_id")
      .agg(first(col("epochs")).as("epochs"), count(lit(1)).as("n"),
        countDistinct(col("epoch")).as("n_epochs"))
    // every doc appears exactly `epochs` times with epochs 1..epochs
    assert(perDoc.where(col("n") =!= col("epochs") ||
      col("n_epochs") =!= col("epochs")).isEmpty)
    // tiers are only 1, 2 or 3 epochs
    assert(out.where(!col("epochs").isin(1L, 2L, 3L)).isEmpty)
    // the shuffle key is a total order: no collisions
    assert(out.select("shuffle_key").distinct().count() == out.count())
    // corpus covered: every source doc is present
    val nDocs = graft.Tables.documents(spark, sf0001).count()
    assert(out.select("doc_id").distinct().count() == nDocs)
  }
}
