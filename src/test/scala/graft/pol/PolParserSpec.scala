package graft.pol

import org.scalatest.funsuite.AnyFunSuite
import graft.QueryHarness.spark

class PolParserSpec extends AnyFunSuite {
  val res = "src/test/resources/pol"

  test("P1 permissive parse: drops non-numeric, adds third column") {
    val parsed = PolParser.read(spark, s"$res/malformed.pol")
    val wins = parsed.select("game_win").collect().map(_.getLong(0)).toSeq
    // 5; 'abc' dropped; blank dropped; 7+3; 9 (xx unparseable); -4;
    // 12+8 (4th token ignored); 0; '5.0' dropped (int() semantics)
    assert(wins == Seq(5L, 10L, 9L, -4L, 20L, 0L))
  }

  test("P1 keeps type codes for the declared per-type stats") {
    val parsed = PolParser.read(spark, s"$res/malformed.pol")
    val codes = parsed.select("type_code").collect().map(_.getString(0)).toSeq
    assert(codes == Seq("TB1", "TB1", "TB2", "TF1", "TB3", null))
  }

  test("S1/S4 metadata projection: relative path + file name") {
    val raw = PolParser.readRaw(spark, res)
    val rows = raw.select("file_name", "relative_path", "folder_path")
      .distinct().collect()
    val names = rows.map(_.getString(0)).toSet
    assert(names == Set("malformed.pol", "Pool_0300_395.pol"))
    rows.foreach { r =>
      assert(r.getString(1) == r.getString(0)) // flat dir → rel = name
      assert(r.getString(2) == "")
    }
  }

  test("empty / all-unparseable files emit size-0 documents") {
    import java.nio.file.Files
    import java.nio.charset.StandardCharsets
    val dir = Files.createTempDirectory("inv")
    Files.write(dir.resolve("Pool_0300_395.pol"),
      "5 TB1\n7 TB2\n".getBytes(StandardCharsets.UTF_8))
    Files.write(dir.resolve("Pool_0301_1.pol"),
      "garbage lines\nonly here\n".getBytes(StandardCharsets.UTF_8))
    Files.write(dir.resolve("Pool_0302_1.pol"), Array.emptyByteArray)

    val dim = GameLookup.fromCsv(spark, "src/test/resources/lookup/game_lookup.csv")
    val parsed = PolParser.read(spark, dir.toString)
    val inventory = PolParser.listFiles(spark, dir.toString)
    assert(inventory.count() == 3) // 0-byte file IS discovered
    val pools = PoolMetrics.perPool(parsed, dim, Some(inventory))
      .select("file_name", "size", "rtp", "pool_id")
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)), r.getString(3))).sortBy(_._1)
    assert(pools.map(_._1).toSeq ==
      Seq("Pool_0300_395.pol", "Pool_0301_1.pol", "Pool_0302_1.pol"))
    assert(pools(0)._2 == 2)
    // dead files: size 0, null metrics, but decoded identity intact
    assert(pools(1)._2 == 0 && pools(1)._3.isEmpty && pools(1)._4 == "0301")
    assert(pools(2)._2 == 0 && pools(2)._3.isEmpty && pools(2)._4 == "0302")
    // and they count in the summary like the reference's
    // total_files_processed
    val docs = PoolMetrics.documents(pools = PoolMetrics.perPool(
      parsed, dim, Some(inventory)), processedAt = Some("2026-01-01T00:00:00+00:00"))
    val agg = PoolSummary.aggregate(docs,
      Some("2026-01-01T00:00:00+00:00")).collect()(0)
    assert(agg.getAs[Long]("total_files_processed") == 3)
    assert(agg.getAs[Long]("total_records_across_all_files") == 2)
  }

  test("parallel (distributed) listing equals the driver-side walk") {
    val root = "/root/reference/samples/pools2"
    val seqList = PolParser.listFiles(spark, root)
      .select("relative_path", "size_bytes")
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    // threshold 1: every subtree is handed to the cluster
    val parList = PolParser.listFiles(spark, root, parallelThreshold = 1)
      .select("relative_path", "size_bytes")
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(seqList.nonEmpty && seqList == parList)
  }

  test("scan filter ignores non-.pol files") {
    val raw = PolParser.readRaw(spark, "src/test/resources/lookup")
      .count() // no .pol files there
    // pathGlobFilter yields empty scan rather than reading CSVs
    assert(raw == 0)
  }
}
