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

  test("scan filter ignores non-.pol files") {
    val raw = PolParser.readRaw(spark, "src/test/resources/lookup")
      .count() // no .pol files there
    // pathGlobFilter yields empty scan rather than reading CSVs
    assert(raw == 0)
  }
}
