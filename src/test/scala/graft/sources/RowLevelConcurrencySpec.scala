package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.QueryHarness.spark

/** The V2 row-level write path under contention and failure: racing
  * SQL UPDATEs against the CAS commit, and staged-file hygiene when a
  * statement aborts. The commit protocol is the SAME hard-link CAS
  * every other writer uses, so the possible outcomes are serial — one
  * winner per version, no lost updates, no torn state.
  */
class RowLevelConcurrencySpec extends AnyFunSuite {
  import spark.implicits._

  private val wh = java.nio.file.Files
    .createTempDirectory("rl_wh").toString
  spark.conf.set("spark.sql.catalog.grl", "graft.sources.GraftCatalog")
  spark.conf.set("spark.sql.catalog.grl.warehouse", wh)

  test("concurrent UPDATE statements serialize through the CAS commit") {
    spark.sql("CREATE TABLE grl.default.ctr (k BIGINT, n BIGINT) " +
      "USING graft TBLPROPERTIES ('key'='k','nbuckets'='4')")
    spark.sql("INSERT INTO grl.default.ctr " +
      "SELECT id, 0 FROM range(0, 40)")

    // 4 threads, each bumps a DISJOINT key slice 3 times. Commits
    // race; every one must land (the loser of a CAS race surfaces as
    // an error which the thread retries, like any optimistic writer).
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val tasks = (0 until 4).map { t =>
      pool.submit(new Runnable {
        override def run(): Unit =
          try {
            (1 to 3).foreach { _ =>
              var done = false
              var attempts = 0
              while (!done && attempts < 10) {
                attempts += 1
                try {
                  spark.sql("UPDATE grl.default.ctr SET n = n + 1 " +
                    s"WHERE k % 4 = $t")
                  done = true
                } catch {
                  case _: Throwable if attempts < 10 =>
                    Thread.sleep(50L * attempts)
                }
              }
              assert(done, s"thread $t: update never landed")
            }
          } catch { case e: Throwable => errs.add(e) }
      })
    }
    tasks.foreach(_.get())
    pool.shutdown()
    assert(errs.isEmpty, s"worker errors: ${errs.toArray.mkString(";")}")

    // every key bumped exactly 3 times — no lost updates across the
    // 12 racing copy-on-write commits
    val got = spark.sql(
      "SELECT count(*), min(n), max(n) FROM grl.default.ctr").head
    assert(got.getLong(0) == 40L)
    assert(got.getLong(1) == 3L && got.getLong(2) == 3L,
      s"lost update: min=${got.getLong(1)} max=${got.getLong(2)}")
    spark.sql("DROP TABLE grl.default.ctr")
  }

  test("a failed row-level statement leaves no staged debris, no new version") {
    spark.sql("CREATE TABLE grl.default.ab (k BIGINT, v STRING) " +
      "USING graft TBLPROPERTIES ('key'='k','nbuckets'='4')")
    spark.sql("INSERT INTO grl.default.ab VALUES (1, 'a'), (2, 'b')")
    val dir = s"$wh/default/ab"
    val vBefore = graft.pol.PoolJsonSink.readManifest(dir).get.version

    // a MERGE whose source evaluation throws mid-execution
    intercept[Throwable] {
      spark.sql(
        """MERGE INTO grl.default.ab t
          |USING (SELECT id AS k, CAST(assert_true(id < 0) AS STRING)
          |       AS v FROM range(1, 3)) s
          |ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET v = s.v""".stripMargin)
    }

    assert(graft.pol.PoolJsonSink.readManifest(dir).get.version
      == vBefore, "aborted statement must not commit")
    // abort hook removed the staging dir
    val stray = Option(new java.io.File(dir).listFiles())
      .getOrElse(Array.empty).filter(_.getName.startsWith(".v2stage-"))
    assert(stray.isEmpty, s"staged debris: ${stray.mkString(",")}")
    // table still reads
    assert(spark.sql("SELECT count(*) FROM grl.default.ab")
      .head.getLong(0) == 2L)
    spark.sql("DROP TABLE grl.default.ab")
  }
}
