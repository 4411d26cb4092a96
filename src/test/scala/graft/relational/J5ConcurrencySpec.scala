package graft.relational

import org.scalatest.funsuite.AnyFunSuite

/** Same-JVM concurrent executions of j5_sql_catalog — the exact vector
  * the round-7 verdict flagged as still open after the process-unique
  * warehouse fix: Spark's CatalogManager caches the catalog instance
  * by NAME, so with a fixed table name two concurrent executions in
  * one JVM interleave CREATE/INSERT on one table (rows_match: true,
  * hash_match: false). The round-8 fix gives every invocation its own
  * table name (dropped in a finally) and every corpus its own catalog
  * name, so N simultaneous runs — any mix of corpora — must each
  * produce the exact single-threaded result.
  */
class J5ConcurrencySpec extends AnyFunSuite {
  import graft.QueryHarness._

  private def run(d: String): Seq[String] =
    graft.SparkEntry.queries("j5_sql_catalog")(spark, d)
      .collect().map(_.toString).toSeq

  test("8 concurrent same-JVM j5 runs across two corpora all match serial") {
    val expected0001 = run(sf0001)
    val expected001 = run(sf001)
    val dirs = Seq(sf0001, sf001, sf0001, sf001, sf0001, sf001, sf0001, sf001)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val results = Await.result(
      Future.sequence(dirs.map(d => Future((d, run(d))))), 10.minutes)
    results.foreach { case (d, got) =>
      val want = if (d == sf0001) expected0001 else expected001
      assert(got == want, s"concurrent j5 at $d diverged from serial")
    }
  }
}
