package graft.pol

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.QueryHarness.spark

/** Byte-exact reproduction of the reference's committed
  * `Meta_data/_pipeline_summary.json` (a 1-file changed-files run over
  * `pool_6371_9999.pol`) with the golden run's timestamps injected —
  * the strongest possible S7/A7 parity check: field order, indent,
  * int-vs-float rendering and the aggregated block all match
  * `json.dump(indent=2)` output byte for byte.
  */
class SummaryGoldenSpec extends AnyFunSuite {

  test("pipeline summary for the golden run reproduces the committed bytes") {
    val golden = Files.readString(
      Paths.get("/root/reference/Meta_data/_pipeline_summary.json"))
    val ts = "2026-01-07T15:59:26+00:00" // golden run clock

    val dim = GameLookup.fromCsv(spark, "src/test/resources/lookup/game_lookup.csv")
    val parsed = PolParser.read(
      spark, "/root/reference/samples/pools2/pool_6371_9999.pol")
    val docs = PoolMetrics.documents(PoolMetrics.perPool(parsed, dim), Some(ts))
    val agg = PoolSummary.aggregate(docs, Some(ts)).collect()(0)
    val rendered = PoolJsonSink.render(
      PoolJsonSink.summaryJson(
        timestamp = ts, processed = 1, succeeded = 1, failed = 0,
        errors = Seq.empty,
        outputFiles = Seq("Meta_data/all_pools_data.json"),
        aggregated = agg))
    assert(rendered == golden)
  }

  test("multi-tag summary keeps first-encounter tag order (dict(Counter))") {
    val ts = "2026-01-07T15:59:26+00:00"
    val dim = GameLookup.fromCsv(spark, "src/test/resources/lookup/game_lookup.csv")
    // three files whose consolidated order is 0201 (REG), 0300 (GAB,PFB),
    // 0302 (REG): encounter order must be REG, GAB, PFB — NOT alphabetical
    val dir = Files.createTempDirectory("tagorder")
    Files.write(dir.resolve("Pool_0201_1.pol"), "5 TB1\n".getBytes)
    Files.write(dir.resolve("Pool_0300_395.pol"), "7 TB1\n".getBytes)
    Files.write(dir.resolve("Pool_0302_2.pol"), "9 TB1\n".getBytes)
    val parsed = PolParser.read(spark, dir.toString)
    val docs = PoolMetrics.documents(PoolMetrics.perPool(parsed, dim), Some(ts))
    val agg = PoolSummary.aggregate(docs, Some(ts)).collect()(0)
    val rendered = PoolJsonSink.render(
      PoolJsonSink.summaryJson(
        timestamp = ts, processed = 3, succeeded = 3, failed = 0,
        errors = Seq.empty,
        outputFiles = Seq("Meta_data/all_pools_data.json"),
        aggregated = agg))
    val tagsBlock = rendered.split("\"tags_distribution\": \\{")(1)
      .split("\\}")(0)
    val order = "\"(\\w+)\"".r.findAllMatchIn(tagsBlock).map(_.group(1)).toSeq
    assert(order == Seq("REG", "GAB", "PFB"), rendered)
    assert(tagsBlock.contains("\"REG\": 2"), rendered)
  }
}
