package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.QueryHarness.spark
import graft.pol.PoolJsonSink

/** The branch matrix on OBJECT-STORE semantics: a table declared
  * `TBLPROPERTIES('forklayer'='ref')` forks branches by writing ONE
  * manifest whose entries are parent-relative refs — zero data files
  * copied or linked, O(1) data bytes at any table size (the
  * rename-less-store port SCALING.md sketches: link(2) degrades to a
  * full copy there, so links are not an option). Pins: creation
  * copies nothing; reads resolve refs; branch writes stay isolated;
  * publish translates refs back and fast-forwards; the parent's
  * vacuum treats branch-referenced files as live (refs, unlike links,
  * do not pin bytes); clones COPY (independent table).
  */
class BranchRefLayerSpec extends AnyFunSuite {

  private val wh = java.nio.file.Files
    .createTempDirectory("graft_ref_wh").toString
  spark.conf.set("spark.sql.catalog.gref", "graft.sources.GraftCatalog")
  spark.conf.set("spark.sql.catalog.gref.warehouse", wh)

  private def rows(sql: String): Seq[Seq[Any]] =
    spark.sql(sql).collect().toSeq.map(_.toSeq)

  private def dataFiles(dir: String): Seq[String] =
    Option(new java.io.File(dir, "data").listFiles())
      .getOrElse(Array.empty).map(_.getName).toSeq
      .filter(_.endsWith(".parquet"))

  test("ref-layer WAP loop: zero-copy fork, isolated writes, publish") {
    spark.sql("CREATE TABLE gref.default.t (k BIGINT, v STRING) " +
      "USING graft TBLPROPERTIES ('key'='k', 'nbuckets'='4', " +
      "'forklayer'='ref')")
    spark.sql("INSERT INTO gref.default.t VALUES (1, 'a'), (2, 'b')")
    val dir = s"$wh/default/t"
    val parentV0 = PoolJsonSink.readManifest(dir).get.version

    spark.sql("CALL gref.system.create_branch(tbl => 'default.t', " +
      "name => 'audit')").collect()

    // THE layer contract: the branch dir holds NO data files — its
    // manifest refers to the parent's
    val bdir = PoolJsonSink.branchDir(dir, "audit")
    assert(dataFiles(bdir).isEmpty,
      s"ref-layer fork copied files: ${dataFiles(bdir)}")
    val bm = PoolJsonSink.readManifest(bdir).get
    assert(bm.files.nonEmpty && bm.files.forall(_.startsWith("../../")),
      s"expected parent-relative refs, got ${bm.files}")
    // the table property rode the fork
    assert(bm.forkLayerProp.contains("ref"))

    // reads resolve the refs
    assert(rows("SELECT k, v FROM gref.default.t.branch_audit ORDER BY k")
      == Seq(Seq(1L, "a"), Seq(2L, "b")))

    // branch write: keyed merge rewrites touched buckets into the
    // BRANCH's own data dir; untouched entries stay refs
    spark.sql("INSERT INTO gref.default.t.branch_audit " +
      "VALUES (2, 'B'), (3, 'c')")
    assert(rows("SELECT k, v FROM gref.default.t.branch_audit ORDER BY k")
      == Seq(Seq(1L, "a"), Seq(2L, "B"), Seq(3L, "c")))
    // parent untouched
    assert(rows("SELECT k, v FROM gref.default.t ORDER BY k")
      == Seq(Seq(1L, "a"), Seq(2L, "b")))
    assert(PoolJsonSink.readManifest(dir).get.version == parentV0)
    val headFiles = PoolJsonSink.readManifest(bdir).get.files
    assert(headFiles.exists(!_.startsWith("../../")),
      "branch write should add branch-local files")

    // publish: refs translate back to canonical parent rels,
    // branch-added files copy in, ONE new parent version
    spark.sql("CALL gref.system.publish_branch(tbl => 'default.t', " +
      "name => 'audit')").collect()
    assert(rows("SELECT k, v FROM gref.default.t ORDER BY k")
      == Seq(Seq(1L, "a"), Seq(2L, "B"), Seq(3L, "c")))
    val pm = PoolJsonSink.readManifest(dir).get
    assert(pm.version == parentV0 + 1)
    assert(pm.files.forall(!_.startsWith("../../")),
      s"published manifest must hold canonical rels, got ${pm.files}")
    spark.sql("CALL gref.system.drop_branch(tbl => 'default.t', " +
      "name => 'audit')").collect()
  }

  test("parent vacuum keeps branch-referenced files live (refs don't pin)") {
    spark.sql("CREATE TABLE gref.default.vc (k BIGINT, v STRING) " +
      "USING graft TBLPROPERTIES ('key'='k', 'nbuckets'='4', " +
      "'forklayer'='ref')")
    spark.sql("INSERT INTO gref.default.vc VALUES (1, 'a'), (2, 'b')")
    spark.sql("CALL gref.system.create_branch(tbl => 'default.vc', " +
      "name => 'keep')").collect()

    // parent rewrites everything, then vacuums aggressively: with
    // hard links the branch survives via link counts; with refs only
    // the vacuum-side branch scan keeps the bytes
    spark.sql("INSERT INTO gref.default.vc VALUES (1, 'A'), (2, 'B')")
    spark.sql("CALL gref.system.vacuum(tbl => 'default.vc', " +
      "retain => 1, min_age_ms => 0)").collect()

    // the branch still reads its fork snapshot through its refs
    assert(rows("SELECT k, v FROM gref.default.vc.branch_keep ORDER BY k")
      == Seq(Seq(1L, "a"), Seq(2L, "b")))

    // dropping the branch releases the refs: the next vacuum reclaims
    spark.sql("CALL gref.system.drop_branch(tbl => 'default.vc', " +
      "name => 'keep')").collect()
    val removed = spark.sql("CALL gref.system.vacuum(" +
      "tbl => 'default.vc', retain => 1, min_age_ms => 0)").collect()
    assert(removed.head.getInt(0) > 0,
      "post-drop vacuum should reclaim the previously-ref'd files")
    assert(rows("SELECT k, v FROM gref.default.vc ORDER BY k")
      == Seq(Seq(1L, "A"), Seq(2L, "B")))
  }

  test("CHECKs, time travel by branch name, .branches metadata on refs") {
    spark.sql("CREATE TABLE gref.default.ck (k BIGINT, n BIGINT) " +
      "USING graft TBLPROPERTIES ('key'='k', 'nbuckets'='4', " +
      "'forklayer'='ref', 'check.nonneg'='n >= 0')")
    spark.sql("INSERT INTO gref.default.ck VALUES (1, 5)")
    spark.sql("CALL gref.system.create_branch(tbl => 'default.ck', " +
      "name => 'wap')").collect()
    // CHECK rides the ref fork and gates branch writes
    intercept[Exception] {
      spark.sql("INSERT INTO gref.default.ck.branch_wap VALUES (2, -1)")
    }
    spark.sql("INSERT INTO gref.default.ck.branch_wap VALUES (2, 7)")
    assert(rows("SELECT k, n FROM gref.default.ck VERSION AS OF 'wap' " +
      "ORDER BY k") == Seq(Seq(1L, 5L), Seq(2L, 7L)))
    val b = spark.sql(
      "SELECT branch, commits FROM gref.default.ck.branches").collect()
    assert(b.map(_.getString(0)).toSeq == Seq("wap"))
    assert(b.head.getLong(1) == 1L)
  }

  test("ALTER to 'ref' applies to branches from EARLIER versions too") {
    // the dial describes the STORE, not the snapshot: a table that
    // declares forklayer=ref after some history still ref-forks a
    // branch created FROM an old version
    spark.sql("CREATE TABLE gref.default.al (k BIGINT, v STRING) " +
      "USING graft TBLPROPERTIES ('key'='k', 'nbuckets'='4')")
    spark.sql("INSERT INTO gref.default.al VALUES (1, 'a')")
    val oldV = PoolJsonSink.readManifest(s"$wh/default/al").get.version
    spark.sql("INSERT INTO gref.default.al VALUES (2, 'b')")
    spark.sql("ALTER TABLE gref.default.al " +
      "SET TBLPROPERTIES ('forklayer'='ref')")
    spark.sql("CALL gref.system.create_branch(tbl => 'default.al', " +
      s"name => 'old', from => '$oldV')").collect()
    val bdir = PoolJsonSink.branchDir(s"$wh/default/al", "old")
    assert(dataFiles(bdir).isEmpty, "post-ALTER fork should be refs")
    assert(rows("SELECT k, v FROM gref.default.al.branch_old ORDER BY k")
      == Seq(Seq(1L, "a")))
  }

  test("clone of a ref-layer table COPIES: fully independent bytes") {
    spark.sql("CREATE TABLE gref.default.src (k BIGINT, v STRING) " +
      "USING graft TBLPROPERTIES ('key'='k', 'nbuckets'='4', " +
      "'forklayer'='ref')")
    spark.sql("INSERT INTO gref.default.src VALUES (1, 'a'), (2, 'b')")
    spark.sql("CALL gref.system.clone(tbl => 'default.src', " +
      "target => 'default.dev')").collect()
    // clone holds its own files (copies), no refs
    val cm = PoolJsonSink.readManifest(s"$wh/default/dev").get
    assert(cm.files.nonEmpty && cm.files.forall(!_.startsWith("../../")))
    assert(dataFiles(s"$wh/default/dev").nonEmpty)
    // source full rewrite + vacuum cannot break the clone
    spark.sql("INSERT INTO gref.default.src VALUES (1, 'A'), (2, 'B')")
    spark.sql("CALL gref.system.vacuum(tbl => 'default.src', " +
      "retain => 1, min_age_ms => 0)").collect()
    assert(rows("SELECT k, v FROM gref.default.dev ORDER BY k")
      == Seq(Seq(1L, "a"), Seq(2L, "b")))
  }

  test("nested ref branch: branch of a branch still resolves and publishes") {
    spark.sql("CREATE TABLE gref.default.nb (k BIGINT, v STRING) " +
      "USING graft TBLPROPERTIES ('key'='k', 'nbuckets'='4', " +
      "'forklayer'='ref')")
    spark.sql("INSERT INTO gref.default.nb VALUES (1, 'a')")
    spark.sql("CALL gref.system.create_branch(tbl => 'default.nb', " +
      "name => 'b1')").collect()
    spark.sql("INSERT INTO gref.default.nb.branch_b1 VALUES (2, 'b')")
    // nested branch of the branch (the procedures resolve
    // '<t>.branch_<x>' as a table)
    spark.sql("CALL gref.system.create_branch(" +
      "tbl => 'default.nb.branch_b1', name => 'b2')").collect()
    val ndir = PoolJsonSink.branchDir(
      PoolJsonSink.branchDir(s"$wh/default/nb", "b1"), "b2")
    assert(dataFiles(ndir).isEmpty, "nested ref fork copied files")
    // the nested branch reads through stacked refs
    val nested = PoolJsonSink.readTable(spark, ndir)
      .selectExpr("k", "v").collect().map(_.toSeq).sortBy(_.head.toString)
    assert(nested.toSeq == Seq(Seq(1L, "a"), Seq(2L, "b")))
  }
}
