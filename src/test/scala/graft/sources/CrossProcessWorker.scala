package graft.sources

import org.apache.spark.sql.SparkSession

/** Child-JVM writer for [[CrossProcessConcurrencySpec]]: a SEPARATE
  * process (own SparkSession, own catalog instance) running keyed
  * MERGEs against the same on-disk table the spec's session is
  * concurrently UPDATE-ing. Retries on CAS loss like any optimistic
  * writer. args = (warehouse, comma-separated key slices mod 4,
  * iterations per slice).
  */
object CrossProcessWorker {
  def main(args: Array[String]): Unit = {
    val Array(wh, slices, iters) = args
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-xproc-worker")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.catalog.gxw", "graft.sources.GraftCatalog")
      .config("spark.sql.catalog.gxw.warehouse", wh)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      slices.split(',').map(_.trim.toInt).foreach { t =>
        (1 to iters.toInt).foreach { _ =>
          var done = false
          var attempts = 0
          while (!done && attempts < 30) {
            attempts += 1
            try {
              spark.sql(
                s"""MERGE INTO gxw.default.xctr t
                   |USING (SELECT id * 4 + $t AS k FROM range(0, 10)) s
                   |ON t.k = s.k
                   |WHEN MATCHED THEN UPDATE SET n = t.n + 1""".stripMargin)
              done = true
            } catch {
              case _: Throwable if attempts < 30 =>
                Thread.sleep(100L * attempts)
            }
          }
          if (!done) { System.err.println(s"slice $t never landed"); sys.exit(2) }
        }
      }
    } finally spark.stop()
  }
}
