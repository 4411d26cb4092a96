package graft.sources

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.QueryHarness.spark

/** The CAS commit across PROCESS boundaries: RowLevelConcurrencySpec
  * races 4 threads in one JVM, but the driver's own verify and bench
  * runs overlap as separate processes in practice (the round-6 j5 red
  * row), so the serializability claim must hold there too. The commit
  * is link(2)-based — an OS-level compare-and-swap that two JVMs
  * cannot both win — and conflict detection rebases or throws; this
  * spec forks a real second JVM running keyed MERGEs on two key
  * slices while this session runs SQL UPDATEs on the other two, and
  * asserts the serial outcome (every slice bumped exactly
  * `iterations` times, no lost updates, no torn versions).
  */
class CrossProcessConcurrencySpec extends AnyFunSuite {

  private val wh = java.nio.file.Files
    .createTempDirectory("xproc_wh").toString
  spark.conf.set("spark.sql.catalog.gxp", "graft.sources.GraftCatalog")
  spark.conf.set("spark.sql.catalog.gxp.warehouse", wh)

  test("MERGEs from a second JVM serialize with this session's UPDATEs") {
    spark.sql("CREATE TABLE gxp.default.xctr (k BIGINT, n BIGINT) " +
      "USING graft TBLPROPERTIES ('key'='k','nbuckets'='4')")
    spark.sql("INSERT INTO gxp.default.xctr SELECT id, 0 FROM range(0, 40)")

    // fork the worker JVM: same classpath as this forked test JVM,
    // same JDK17 --add-opens set (Spark 4 outside spark-submit)
    val javaBin = new java.io.File(
      new java.io.File(sys.props("java.home"), "bin"), "java").toString
    val addOpens = java.lang.management.ManagementFactory
      .getRuntimeMXBean.getInputArguments.asScala
      .filter(a => a.startsWith("--add-opens") || a.startsWith("--add-exports"))
    val cmd = (Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx2g", "-cp", sys.props("java.class.path"),
      "graft.sources.CrossProcessWorker", wh, "0,1", "3")).asJava
    val pb = new ProcessBuilder(cmd)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val drain = new Thread(() => {
      val in = proc.getInputStream
      val buf = new Array[Byte](8192)
      while (in.read(buf) >= 0) ()
    })
    drain.setDaemon(true)
    drain.start()

    // concurrently: this session bumps slices 2 and 3, 3 times each,
    // retrying CAS losses like any optimistic writer
    Seq(2, 3).foreach { t =>
      (1 to 3).foreach { _ =>
        var done = false
        var attempts = 0
        while (!done && attempts < 30) {
          attempts += 1
          try {
            spark.sql("UPDATE gxp.default.xctr SET n = n + 1 " +
              s"WHERE k % 4 = $t")
            done = true
          } catch {
            case _: Throwable if attempts < 30 =>
              Thread.sleep(100L * attempts)
          }
        }
        assert(done, s"slice $t: update never landed in 30 attempts")
      }
    }

    assert(proc.waitFor(10, java.util.concurrent.TimeUnit.MINUTES),
      "worker JVM did not finish")
    assert(proc.exitValue() == 0, s"worker exited ${proc.exitValue()}")

    // serial outcome: all 40 keys at exactly 3 — no lost updates
    // across 12 racing cross-process copy-on-write commits
    val got = spark.sql(
      "SELECT count(*), min(n), max(n) FROM gxp.default.xctr").head
    assert(got.getLong(0) == 40L)
    assert(got.getLong(1) == 3L && got.getLong(2) == 3L,
      s"lost update across processes: min=${got.getLong(1)} " +
        s"max=${got.getLong(2)}")
    spark.sql("DROP TABLE gxp.default.xctr")
  }
}
