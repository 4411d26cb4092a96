package graft.pol

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
import org.scalatest.funsuite.AnyFunSuite

/** parseObserved must deliver the reference's success/fail counters
  * (A8) from the SAME scan that parses — metrics ride the action
  * through observe(), no second pass. The fixture corpus has known
  * counts: Pool_0300_395.pol (4 valid lines) + malformed.pol (9 lines,
  * 6 valid — incl. negative, third-column-add, bare-zero and
  * whitespace-led forms — and 3 dropped: 'abc', blank, float '5.0').
  */
class ObserveMetricsSpec extends AnyFunSuite {
  import graft.QueryHarness._

  test("observe() metrics count seen/parsed/dropped lines in one pass") {
    @volatile var observed: Option[org.apache.spark.sql.Row] = None
    val listener = new QueryExecutionListener {
      override def onSuccess(f: String, qe: QueryExecution, d: Long): Unit =
        qe.observedMetrics.get("graft_parse").foreach(r => observed = Some(r))
      override def onFailure(f: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val parsed = PolParser.parseObserved(
        PolParser.readRaw(spark, "src/test/resources/pol"))
      assert(parsed.count() == 10) // rows surviving the filter
      // the listener bus is async — poll briefly
      val deadline = System.nanoTime() + 10e9.toLong
      while (observed.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      val m = observed.getOrElse(fail("no observed metrics within 10s"))
      assert(m.getAs[Long]("lines_seen") == 13)
      assert(m.getAs[Long]("lines_parsed") == 10)
      assert(m.getAs[Long]("lines_dropped") == 3)
    } finally spark.listenerManager.unregister(listener)
  }
}
