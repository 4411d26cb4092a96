package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.QueryHarness.spark
import graft.pol.PoolJsonSink

/** Write-audit-publish branches, end to end in SQL:
  * `system.create_branch` forks a hard-link clone, writes against
  * `<t>.branch_<name>` (keyed merges, CHECK constraints) leave the
  * parent untouched, the audit is plain SQL on the branch,
  * `system.publish_branch` fast-forwards the audited content into the
  * parent as ONE commit — and refuses when the parent diverged. Also
  * pins the vacuum contract in both directions: the parent reclaiming
  * a file name never breaks a branch that still links it.
  */
class BranchWapSpec extends AnyFunSuite {

  private val wh = java.nio.file.Files
    .createTempDirectory("graft_wap_wh").toString
  spark.conf.set("spark.sql.catalog.gwap", "graft.sources.GraftCatalog")
  spark.conf.set("spark.sql.catalog.gwap.warehouse", wh)

  private def rows(sql: String): Seq[Seq[Any]] =
    spark.sql(sql).collect().toSeq.map(_.toSeq)

  test("WAP loop: fork, write on branch, parent isolated, audit, publish") {
    spark.sql("CREATE TABLE gwap.default.t (k BIGINT, v STRING) " +
      "USING graft TBLPROPERTIES ('key'='k', 'nbuckets'='4')")
    spark.sql("INSERT INTO gwap.default.t VALUES (1, 'a'), (2, 'b')")
    val parentV0 = PoolJsonSink.readManifest(s"$wh/default/t").get.version

    val forked = spark.sql(
      "CALL gwap.system.create_branch(tbl => 'default.t', " +
        "name => 'audit')").collect()
    assert(forked.head.getLong(1) == parentV0)

    // write through the branch face: keyed merge (2 updated, 1 new)
    spark.sql("INSERT INTO gwap.default.t.branch_audit " +
      "VALUES (2, 'B'), (3, 'c')")

    // parent sees NOTHING of it
    assert(rows("SELECT k, v FROM gwap.default.t ORDER BY k") ==
      Seq(Seq(1L, "a"), Seq(2L, "b")))
    assert(PoolJsonSink.readManifest(s"$wh/default/t").get.version
      == parentV0)

    // the audit is plain SQL on the branch — both addressing forms
    assert(rows(
      "SELECT k, v FROM gwap.default.t.branch_audit ORDER BY k") ==
      Seq(Seq(1L, "a"), Seq(2L, "B"), Seq(3L, "c")))
    assert(rows(
      "SELECT k, v FROM gwap.default.t VERSION AS OF 'audit' ORDER BY k") ==
      Seq(Seq(1L, "a"), Seq(2L, "B"), Seq(3L, "c")))

    // .branches sub-table: one in-flight branch, one commit on it
    val b = spark.sql("SELECT branch, fork_version, head_version, " +
      "commits FROM gwap.default.t.branches").collect()
    assert(b.map(_.getString(0)).toSeq == Seq("audit"))
    assert(b.head.getLong(3) == 1L)

    // publish: ONE new parent commit with the branch content
    val pub = spark.sql(
      "CALL gwap.system.publish_branch(tbl => 'default.t', " +
        "name => 'audit')").collect()
    assert(pub.head.getLong(1) == parentV0 + 1)
    assert(rows("SELECT k, v FROM gwap.default.t ORDER BY k") ==
      Seq(Seq(1L, "a"), Seq(2L, "B"), Seq(3L, "c")))
    val hist = spark.sql("SELECT operation FROM gwap.default.t.history " +
      s"WHERE version = ${parentV0 + 1}").collect()
    assert(hist.head.getString(0) == "PUBLISH")

    // drop: the branch face disappears, the parent keeps the content
    spark.sql("CALL gwap.system.drop_branch(tbl => 'default.t', " +
      "name => 'audit')")
    assert(spark.sql("SELECT * FROM gwap.default.t.branches").isEmpty)
    assert(rows("SELECT count(*) FROM gwap.default.t") == Seq(Seq(3L)))
  }

  test("publish refuses when the parent diverged (fast-forward only)") {
    spark.sql("CREATE TABLE gwap.default.ff (k BIGINT, v STRING) " +
      "USING graft TBLPROPERTIES ('key'='k', 'nbuckets'='4')")
    spark.sql("INSERT INTO gwap.default.ff VALUES (1, 'a')")
    spark.sql("CALL gwap.system.create_branch(tbl => 'default.ff', " +
      "name => 'stale')")
    spark.sql("INSERT INTO gwap.default.ff.branch_stale VALUES (2, 'b')")
    // parent advances past the fork point
    spark.sql("INSERT INTO gwap.default.ff VALUES (9, 'z')")
    val e = intercept[Exception] {
      spark.sql("CALL gwap.system.publish_branch(tbl => 'default.ff', " +
        "name => 'stale')").collect()
    }
    assert(e.getMessage.contains("not a fast-forward"))
    // parent content is exactly its own writes
    assert(rows("SELECT k, v FROM gwap.default.ff ORDER BY k") ==
      Seq(Seq(1L, "a"), Seq(9L, "z")))
  }

  test("CHECK constraints ride the fork and gate branch writes") {
    spark.sql("CREATE TABLE gwap.default.ck (k BIGINT, v BIGINT) " +
      "USING graft TBLPROPERTIES ('key'='k', 'nbuckets'='4', " +
      "'check.positive'='v > 0')")
    spark.sql("INSERT INTO gwap.default.ck VALUES (1, 10)")
    spark.sql("CALL gwap.system.create_branch(tbl => 'default.ck', " +
      "name => 'w')")
    val e = intercept[Exception] {
      spark.sql("INSERT INTO gwap.default.ck.branch_w VALUES (2, -5)")
    }
    assert(e.getMessage.contains("violated"))
    spark.sql("INSERT INTO gwap.default.ck.branch_w VALUES (2, 5)")
    spark.sql("CALL gwap.system.publish_branch(tbl => 'default.ck', " +
      "name => 'w')")
    assert(rows("SELECT k, v FROM gwap.default.ck ORDER BY k") ==
      Seq(Seq(1L, 10L), Seq(2L, 5L)))
  }

  test("no-op publish, duplicate create, unknown branch") {
    spark.sql("CREATE TABLE gwap.default.e (k BIGINT, v STRING) " +
      "USING graft TBLPROPERTIES ('key'='k', 'nbuckets'='4')")
    spark.sql("INSERT INTO gwap.default.e VALUES (1, 'a')")
    val head = PoolJsonSink.readManifest(s"$wh/default/e").get.version
    spark.sql("CALL gwap.system.create_branch(tbl => 'default.e', " +
      "name => 'idle')")
    // nothing committed on the branch → publish is a no-op at head
    val pub = spark.sql("CALL gwap.system.publish_branch(" +
      "tbl => 'default.e', name => 'idle')").collect()
    assert(pub.head.getLong(1) == head)
    val dup = intercept[Exception] {
      spark.sql("CALL gwap.system.create_branch(tbl => 'default.e', " +
        "name => 'idle')").collect()
    }
    assert(dup.getMessage.contains("already exists"))
    val missing = intercept[Exception] {
      spark.sql("CALL gwap.system.publish_branch(tbl => 'default.e', " +
        "name => 'nope')").collect()
    }
    assert(missing.getMessage.contains("no branch"))
  }

  test("parent vacuum cannot break a live branch (hard-link safety)") {
    spark.sql("CREATE TABLE gwap.default.vc (k BIGINT, v STRING) " +
      "USING graft TBLPROPERTIES ('key'='k', 'nbuckets'='4')")
    spark.sql("INSERT INTO gwap.default.vc VALUES (1, 'a'), (2, 'b')")
    spark.sql("CALL gwap.system.create_branch(tbl => 'default.vc', " +
      "name => 'keep')")
    // parent rewrites everything (merge on both keys), then vacuums
    // to retain only the new version: the OLD files' parent names go
    spark.sql("INSERT INTO gwap.default.vc VALUES (1, 'A'), (2, 'B')")
    spark.sql("CALL gwap.system.vacuum(tbl => 'default.vc', " +
      "retain => 1, min_age_ms => 0)").collect()
    // the branch still reads its fork snapshot through its own links
    assert(rows(
      "SELECT k, v FROM gwap.default.vc.branch_keep ORDER BY k") ==
      Seq(Seq(1L, "a"), Seq(2L, "b")))
    // and branch vacuum is scoped to the branch dir: parent unharmed
    PoolJsonSink.vacuum(
      PoolJsonSink.branchDir(s"$wh/default/vc", "keep"))
    assert(rows("SELECT k, v FROM gwap.default.vc ORDER BY k") ==
      Seq(Seq(1L, "A"), Seq(2L, "B")))
  }

  test("path face: option(branch) reads and writes the branch") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_wap_path").toString + "/t"
    Seq((1L, "a")).toDF("k", "v").write.format("graft")
      .option("key", "k").option("nBuckets", "4").save(dir)
    PoolJsonSink.createBranch(dir, "side")
    Seq((2L, "b")).toDF("k", "v").write.format("graft")
      .option("key", "k").option("branch", "side")
      .mode("append").save(dir)
    assert(spark.read.format("graft").load(dir).count() == 1)
    assert(spark.read.format("graft").option("branch", "side")
      .load(dir).count() == 2)
    PoolJsonSink.publishBranch(dir, "side")
    assert(spark.read.format("graft").load(dir).count() == 2)
  }

  test("row-level SQL and streams land on the branch face too") {
    import spark.implicits._
    spark.sql("CREATE TABLE gwap.default.rl (k BIGINT, v STRING) " +
      "USING graft TBLPROPERTIES ('key'='k', 'nbuckets'='4')")
    spark.sql("INSERT INTO gwap.default.rl VALUES (1, 'a'), (2, 'b')")
    spark.sql("CALL gwap.system.create_branch(tbl => 'default.rl', " +
      "name => 's')")
    // MERGE INTO the branch: V2 row-level op against the branch table
    spark.sql("""MERGE INTO gwap.default.rl.branch_s t
      USING (SELECT 2L AS k, 'B' AS v UNION ALL SELECT 3L, 'c') s
      ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    // DELETE on the branch
    spark.sql("DELETE FROM gwap.default.rl.branch_s WHERE k = 1")
    assert(rows("SELECT k, v FROM gwap.default.rl.branch_s ORDER BY k") ==
      Seq(Seq(2L, "B"), Seq(3L, "c")))
    // parent untouched through all of it
    assert(rows("SELECT k, v FROM gwap.default.rl ORDER BY k") ==
      Seq(Seq(1L, "a"), Seq(2L, "b")))
    // a micro-batch stream into the branch face
    val srcDir = java.nio.file.Files
      .createTempDirectory("graft_wap_src").toString
    Seq((9L, "z")).toDF("k", "v")
      .write.mode("append").json(srcDir)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_wap_ckpt").toString
    val q = spark.readStream.schema("k BIGINT, v STRING").json(srcDir)
      .writeStream.option("checkpointLocation", ckpt)
      .toTable("gwap.default.rl.branch_s")
    q.processAllAvailable(); q.stop()
    assert(rows("SELECT k FROM gwap.default.rl.branch_s ORDER BY k") ==
      Seq(Seq(2L), Seq(3L), Seq(9L)))
    assert(rows("SELECT count(*) FROM gwap.default.rl") == Seq(Seq(2L)))
  }

  test("bloom sidecars ride the fork (constructed names, no listing)") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_wap_bloom").toString + "/t"
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").write.format("graft")
      .option("key", "k").option("nBuckets", "4")
      .option("bloomCols", "k").save(dir)
    val sidecarsParent = PoolJsonSink.readManifest(dir).get.files
      .map(rel => new java.io.File(dir, s"$rel.bloom-k"))
      .count(_.isFile)
    assert(sidecarsParent > 0, "probe premise: parent has sidecars")
    PoolJsonSink.createBranch(dir, "b")
    val bdir = PoolJsonSink.branchDir(dir, "b")
    val sidecarsBranch = PoolJsonSink.readManifest(bdir).get.files
      .map(rel => new java.io.File(bdir, s"$rel.bloom-k"))
      .count(_.isFile)
    assert(sidecarsBranch == sidecarsParent)
  }

  test("metadata sub-tables address the branch: the audit reads its own CDC") {
    spark.sql("CREATE TABLE gwap.default.md (k BIGINT, v STRING) " +
      "USING graft TBLPROPERTIES ('key'='k', 'nbuckets'='4')")
    spark.sql("INSERT INTO gwap.default.md VALUES (1, 'a')")
    spark.sql("CALL gwap.system.create_branch(tbl => 'default.md', " +
      "name => 'cdc')")
    spark.sql("INSERT INTO gwap.default.md.branch_cdc VALUES (2, 'b')")
    spark.sql("INSERT INTO gwap.default.md.branch_cdc " +
      "VALUES (1, 'A')") // update on the branch
    // the branch's OWN change feed: what exactly would publish?
    val ch = spark.sql("SELECT _change_type, k FROM " +
      "gwap.default.md.branch_cdc.changes ORDER BY _commit_version, k")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(ch.contains(("insert", 2L)))
    assert(ch.contains(("update_postimage", 1L)) ||
      ch.count(_._2 == 1L) >= 2) // pre+post images for the update
    // .history on the branch face: BRANCH fork + the two merges
    val hist = spark.sql("SELECT operation FROM " +
      "gwap.default.md.branch_cdc.history ORDER BY version")
      .collect().map(_.getString(0)).toSeq
    assert(hist.head == "BRANCH" && hist.count(_ == "UPSERT") == 2)
    // .files on the branch face answers from the branch manifest
    assert(spark.sql("SELECT count(*) FROM " +
      "gwap.default.md.branch_cdc.files").collect().head.getLong(0) > 0)
    // parent's own history is untouched by branch commits
    val phist = spark.sql("SELECT operation FROM " +
      "gwap.default.md.history").collect().map(_.getString(0)).toSeq
    assert(!phist.contains("BRANCH"))
  }

  test("maintenance procedures address the branch face") {
    spark.sql("CREATE TABLE gwap.default.mt (k BIGINT, v STRING) " +
      "USING graft TBLPROPERTIES ('key'='k', 'nbuckets'='4')")
    spark.sql("INSERT INTO gwap.default.mt VALUES (1, 'a')")
    spark.sql("CALL gwap.system.create_branch(tbl => 'default.mt', " +
      "name => 'ops')")
    // fragment the branch: a task-layout write (optimizedWrite=false,
    // 4 tasks) stages multiple files per bucket — the shape a
    // pre-clustered production writer leaves and OPTIMIZE repairs
    import spark.implicits._
    val bdir = PoolJsonSink.branchDir(s"$wh/default/mt", "ops")
    (2L until 80L).map(i => (i, "b")).toDF("k", "v")
      .repartition(4)
      .write.format("graft").option("key", "k")
      .option("optimizedWrite", "false").mode("append").save(bdir)
    assert(PoolJsonSink.readManifest(bdir).get.files.size > 4)
    // compact + vacuum the BRANCH through the normal procedures
    spark.sql("CALL gwap.system.optimize(" +
      "tbl => 'default.mt.branch_ops', max_files => 1)").collect()
    val ops = spark.sql("CALL gwap.system.history(" +
      "tbl => 'default.mt.branch_ops')").collect()
      .map(_.getString(1)).toSeq
    assert(ops.contains("OPTIMIZE"))
    val removed = spark.sql("CALL gwap.system.vacuum(" +
      "tbl => 'default.mt.branch_ops', retain => 1, min_age_ms => 0)").collect()
    assert(removed.head.getInt(0) > 0) // pre-compaction files reclaimed
    // branch content intact, parent untouched by branch maintenance
    assert(rows("SELECT count(*) FROM gwap.default.mt.branch_ops")
      == Seq(Seq(79L)))
    assert(rows("SELECT k FROM gwap.default.mt") == Seq(Seq(1L)))
  }

  test("readStream.table from the branch face (the audit can be a stream)") {
    spark.sql("CREATE TABLE gwap.default.sr (k BIGINT, v STRING) " +
      "USING graft TBLPROPERTIES ('key'='k', 'nbuckets'='4')")
    spark.sql("INSERT INTO gwap.default.sr VALUES (1, 'a')")
    spark.sql("CALL gwap.system.create_branch(tbl => 'default.sr', " +
      "name => 'live')")
    spark.sql("INSERT INTO gwap.default.sr.branch_live VALUES (2, 'b')")
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_wap_srckpt").toString
    val sink = java.nio.file.Files
      .createTempDirectory("graft_wap_srsink").toString
    val q = spark.readStream.table("gwap.default.sr.branch_live")
      .writeStream.format("parquet")
      .option("checkpointLocation", ckpt)
      .option("path", sink).start()
    q.processAllAvailable(); q.stop()
    assert(spark.read.parquet(sink).count() == 2) // fork row + branch row
  }

  test("racing publishes of two branches: exactly one wins the CAS") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_wap_race").toString + "/t"
    Seq((1L, "a")).toDF("k", "v").write.format("graft")
      .option("key", "k").option("nBuckets", "4").save(dir)
    PoolJsonSink.createBranch(dir, "b1")
    PoolJsonSink.createBranch(dir, "b2")
    Seq((2L, "b1")).toDF("k", "v").write.format("graft")
      .option("key", "k").option("branch", "b1").mode("append").save(dir)
    Seq((3L, "b2")).toDF("k", "v").write.format("graft")
      .option("key", "k").option("branch", "b2").mode("append").save(dir)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val gate = new java.util.concurrent.CountDownLatch(1)
    def tryPublish(n: String): Future[Either[Throwable, Long]] = Future {
      gate.await()
      try Right(PoolJsonSink.publishBranch(dir, n))
      catch { case t: Throwable => Left(t) }
    }
    val fs = Seq(tryPublish("b1"), tryPublish("b2"))
    gate.countDown()
    val results = Await.result(Future.sequence(fs), 60.seconds)
    val (losers, winners) = results.partition(_.isLeft)
    assert(winners.size == 1,
      s"exactly one publish must win, got: $results")
    assert(losers.size == 1)
    assert(losers.head.swap.toOption.get.getMessage
      .contains("fast-forward"))
    // the table holds exactly the winner's content, nothing merged
    val content = spark.read.format("graft").load(dir)
      .select("k", "v").collect().map(_.getString(1)).toSet
    assert(content == Set("a", "b1") || content == Set("a", "b2"))
  }

  test("schema evolution stages on the branch; publish carries it") {
    spark.sql("CREATE TABLE gwap.default.se (k BIGINT, v STRING) " +
      "USING graft TBLPROPERTIES ('key'='k', 'nbuckets'='4')")
    spark.sql("INSERT INTO gwap.default.se VALUES (1, 'a')")
    spark.sql("CALL gwap.system.create_branch(tbl => 'default.se', " +
      "name => 'evo')")
    spark.sql("ALTER TABLE gwap.default.se.branch_evo " +
      "ADD COLUMN score DOUBLE")
    spark.sql("INSERT INTO gwap.default.se.branch_evo " +
      "VALUES (2, 'b', 0.5)")
    // parent schema untouched
    assert(spark.table("gwap.default.se").columns.toSeq ==
      Seq("k", "v"))
    assert(rows("SELECT k, v, score FROM gwap.default.se.branch_evo " +
      "ORDER BY k") == Seq(Seq(1L, "a", null), Seq(2L, "b", 0.5)))
    spark.sql("CALL gwap.system.publish_branch(tbl => 'default.se', " +
      "name => 'evo')")
    assert(spark.table("gwap.default.se").columns.toSeq ==
      Seq("k", "v", "score"))
    assert(rows("SELECT k, v, score FROM gwap.default.se ORDER BY k") ==
      Seq(Seq(1L, "a", null), Seq(2L, "b", 0.5)))
  }

  test("system.clone: independent zero-copy table, both sides evolve freely") {
    spark.sql("CREATE TABLE gwap.default.src (k BIGINT, v STRING) " +
      "USING graft TBLPROPERTIES ('key'='k', 'nbuckets'='4', " +
      "'check.nonempty'='v <> \\'\\'')")
    spark.sql("INSERT INTO gwap.default.src VALUES (1, 'a'), (2, 'b')")
    spark.sql("CALL gwap.system.clone(tbl => 'default.src', " +
      "target => 'default.dev')").collect()
    // same content, independent identity
    assert(rows("SELECT k, v FROM gwap.default.dev ORDER BY k") ==
      Seq(Seq(1L, "a"), Seq(2L, "b")))
    // properties + constraints rode along: the clone rejects bad rows
    val e = intercept[Exception] {
      spark.sql("INSERT INTO gwap.default.dev VALUES (3, '')")
    }
    assert(e.getMessage.contains("violated"))
    // both sides evolve without seeing each other
    spark.sql("INSERT INTO gwap.default.dev VALUES (3, 'c')")
    spark.sql("INSERT INTO gwap.default.src VALUES (9, 'z')")
    assert(rows("SELECT count(*) FROM gwap.default.dev") == Seq(Seq(3L)))
    assert(rows("SELECT count(*) FROM gwap.default.src") == Seq(Seq(3L)))
    // source vacuum after full rewrite cannot break the clone
    spark.sql("INSERT INTO gwap.default.src VALUES (1, 'A'), (2, 'B')")
    spark.sql("CALL gwap.system.vacuum(tbl => 'default.src', " +
      "retain => 1, min_age_ms => 0)").collect()
    assert(rows("SELECT k, v FROM gwap.default.dev ORDER BY k") ==
      Seq(Seq(1L, "a"), Seq(2L, "b"), Seq(3L, "c")))
    // clone refuses an existing target
    val dup = intercept[Exception] {
      spark.sql("CALL gwap.system.clone(tbl => 'default.src', " +
        "target => 'default.dev')").collect()
    }
    assert(dup.getMessage.toLowerCase.contains("already exists"))
  }

  test("branch from a tag, tag wins VERSION AS OF name collisions") {
    spark.sql("CREATE TABLE gwap.default.tg (k BIGINT, v STRING) " +
      "USING graft TBLPROPERTIES ('key'='k', 'nbuckets'='4')")
    spark.sql("INSERT INTO gwap.default.tg VALUES (1, 'a')")
    val v1 = PoolJsonSink.readManifest(s"$wh/default/tg").get.version
    spark.sql(s"CALL gwap.system.tag(tbl => 'default.tg', " +
      s"name => 'r1', version => $v1)")
    spark.sql("INSERT INTO gwap.default.tg VALUES (2, 'b')")
    // fork from the TAG, not the head
    spark.sql("CALL gwap.system.create_branch(tbl => 'default.tg', " +
      "name => 'from-r1', from => 'r1')")
    assert(rows("SELECT k FROM gwap.default.tg.`branch_from-r1`") ==
      Seq(Seq(1L)))
    // a branch named like the tag: VERSION AS OF resolves the TAG
    spark.sql("CALL gwap.system.create_branch(tbl => 'default.tg', " +
      "name => 'r1x')")
    assert(rows(
      "SELECT k FROM gwap.default.tg VERSION AS OF 'r1' ORDER BY k") ==
      Seq(Seq(1L)))
  }
}
