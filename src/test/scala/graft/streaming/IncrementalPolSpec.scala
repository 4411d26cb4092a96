package graft.streaming

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.QueryHarness.spark
import graft.pol.PoolJsonSink

/** T1: the checkpoint makes the second run a no-op (exactly-once per
  * file) and newly arriving files are processed incrementally — the
  * reference's changed-files mode.
  */
class IncrementalPolSpec extends AnyFunSuite {
  val lookup = "src/test/resources/lookup/game_lookup.csv"

  test("incremental run processes each file exactly once") {
    val work = Files.createTempDirectory("inc")
    val polDir = work.resolve("pols")
    Files.createDirectories(polDir)
    Files.writeString(polDir.resolve("Pool_6371_100.pol"), "5 TB1\n0 TB1\n10 TB2\n")
    val out = work.resolve("all_pools_data.json")
    val ckpt = work.resolve("ckpt").toString

    val n1 = IncrementalPol.runOnce(spark, polDir.toString, lookup, out, ckpt,
      Some("2026-01-01T00:00:00+00:00"))
    assert(n1 == 1)
    val afterFirst = Files.readString(out)
    assert(afterFirst.contains("\"Pool_6371_100.pol\""))

    // second run with no new files: nothing processed, output untouched
    val n2 = IncrementalPol.runOnce(spark, polDir.toString, lookup, out, ckpt,
      Some("2026-01-01T00:00:00+00:00"))
    assert(n2 == 0)
    assert(Files.readString(out) == afterFirst)

    // a new file arrives: only it is processed; old entry preserved
    Files.writeString(polDir.resolve("Pool_6371_395.pol"), "7 TB1\n9 TB2\n")
    val n3 = IncrementalPol.runOnce(spark, polDir.toString, lookup, out, ckpt,
      Some("2026-01-02T00:00:00+00:00"))
    assert(n3 == 1)
    val afterThird = Files.readString(out)
    assert(afterThird.contains("\"Pool_6371_100.pol\""))
    assert(afterThird.contains("\"Pool_6371_395.pol\""))
    val keys = PoolJsonSink.splitTopLevel(afterThird).map(_._1)
    assert(keys == Seq("Pool_6371_100.pol", "Pool_6371_395.pol"))
  }
}
