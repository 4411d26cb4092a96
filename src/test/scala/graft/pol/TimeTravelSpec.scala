package graft.pol

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.QueryHarness.spark

/** Versioned reads over the manifest table: every commit is an
  * immutable `_graft_manifest.v<N>` file and data files are
  * append-only, so any retained version is re-readable bit-for-bit —
  * the "pin the corpus for a reproducible training run" primitive.
  * Vacuum's retention window bounds how far back travel reaches, and
  * a reclaimed version must fail loudly, never silently read the
  * current state.
  */
class TimeTravelSpec extends AnyFunSuite {
  import spark.implicits._

  private def table(): String =
    java.nio.file.Files.createTempDirectory("graft_tt")
      .resolve("tbl").toString

  private def payloads(dir: String, df: org.apache.spark.sql.DataFrame) =
    df.select("k", "payload").as[(String, String)].collect().toMap

  test("each committed version stays readable as-of, current follows head") {
    val dir = table()
    PoolJsonSink.upsertPartitioned(spark, dir,
      (0 until 20).map(i => (s"key$i", "v1")).toDF("k", "payload"),
      col("k"), nBuckets = 8)
    PoolJsonSink.upsertPartitioned(spark, dir,
      Seq(("key3", "v2")).toDF("k", "payload"), col("k"), nBuckets = 8)
    PoolJsonSink.upsertPartitioned(spark, dir,
      Seq(("key3", "v3"), ("key7", "v3")).toDF("k", "payload"),
      col("k"), nBuckets = 8)

    assert(PoolJsonSink.listVersions(dir) == Seq(1L, 2L, 3L))
    val at1 = payloads(dir, PoolJsonSink.readTableAsOf(spark, dir, 1))
    val at2 = payloads(dir, PoolJsonSink.readTableAsOf(spark, dir, 2))
    val at3 = payloads(dir, PoolJsonSink.readTableAsOf(spark, dir, 3))
    assert(at1("key3") == "v1" && at1("key7") == "v1" && at1.size == 20)
    assert(at2("key3") == "v2" && at2("key7") == "v1" && at2.size == 20)
    assert(at3("key3") == "v3" && at3("key7") == "v3" && at3.size == 20)
    // current read = head version
    assert(payloads(dir, PoolJsonSink.readTable(spark, dir)) == at3)
  }

  test("vacuum retention bounds travel; reclaimed versions fail loudly") {
    val dir = table()
    (1 to 4).foreach { v =>
      PoolJsonSink.upsertPartitioned(spark, dir,
        Seq(("key1", s"v$v")).toDF("k", "payload"), col("k"), nBuckets = 4)
    }
    assert(PoolJsonSink.vacuum(dir, retainVersions = 2) > 0)
    assert(PoolJsonSink.listVersions(dir) == Seq(3L, 4L))
    // retained versions still read their exact snapshots
    assert(payloads(dir,
      PoolJsonSink.readTableAsOf(spark, dir, 3))("key1") == "v3")
    assert(payloads(dir,
      PoolJsonSink.readTableAsOf(spark, dir, 4))("key1") == "v4")
    // a vacuumed version errors with the available range, never
    // silently serves other data
    val e = intercept[RuntimeException] {
      PoolJsonSink.readTableAsOf(spark, dir, 1)
    }
    assert(e.getMessage.contains("not available") &&
      e.getMessage.contains("v3..v4"))
    // and the still-current read is unaffected
    assert(payloads(dir, PoolJsonSink.readTable(spark, dir))("key1") == "v4")
  }

  test("the age gate protects young files from vacuum") {
    val dir = table()
    (1 to 3).foreach { v =>
      PoolJsonSink.upsertPartitioned(spark, dir,
        Seq(("key1", s"v$v")).toDF("k", "payload"), col("k"), nBuckets = 2)
    }
    // everything on disk is seconds old: an hour-long age gate must
    // delete nothing, even though v1/v2 are outside retention
    assert(PoolJsonSink.vacuum(dir, retainVersions = 1,
      minAgeMs = 3600L * 1000) == 0)
    assert(PoolJsonSink.listVersions(dir) == Seq(1L, 2L, 3L))
    // a reader pinned at v1 still reads its snapshot
    assert(payloads(dir,
      PoolJsonSink.readTableAsOf(spark, dir, 1))("key1") == "v1")
    // with the gate open the same vacuum reclaims
    assert(PoolJsonSink.vacuum(dir, retainVersions = 1) > 0)
    assert(PoolJsonSink.listVersions(dir) == Seq(3L))
  }

  test("retained old version is byte-stable under later upserts") {
    val dir = table()
    PoolJsonSink.upsertPartitioned(spark, dir,
      (0 until 50).map(i => (s"key$i", s"orig$i")).toDF("k", "payload"),
      col("k"), nBuckets = 8)
    val v1Files = PoolJsonSink.readManifestAt(dir, 1).files
    val fp = v1Files.map { rel =>
      val f = new java.io.File(dir, rel)
      rel -> ((f.length(), f.lastModified()))
    }.toMap
    // churn every key twice
    (0 until 2).foreach { r =>
      PoolJsonSink.upsertPartitioned(spark, dir,
        (0 until 50).map(i => (s"key$i", s"r$r")).toDF("k", "payload"),
        col("k"), nBuckets = 8)
    }
    // v1's files are untouched on disk and its snapshot unchanged
    v1Files.foreach { rel =>
      val f = new java.io.File(dir, rel)
      assert(f.exists() && (f.length(), f.lastModified()) == fp(rel),
        s"v1 data file $rel modified by later upserts")
    }
    val at1 = payloads(dir, PoolJsonSink.readTableAsOf(spark, dir, 1))
    assert(at1.size == 50 && at1.values.forall(_.startsWith("orig")))
  }
}
