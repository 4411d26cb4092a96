package graft.pol

import org.scalatest.funsuite.AnyFunSuite
import graft.QueryHarness.spark
import org.apache.spark.sql.functions._

class GameLookupSpec extends AnyFunSuite {
  lazy val dim = GameLookup.fromCsv(spark, "src/test/resources/lookup/fallback_lookup.csv")

  def resolve(ids: String*): Map[String, (Double, Seq[String], Double)] = {
    import spark.implicits._
    val pools = ids.toDF("pool_id")
    GameLookup.resolved(dim, pools).collect().map { r =>
      r.getAs[String]("pool_id") ->
        ((r.getAs[Double]("min_bet"),
          r.getAs[collection.Seq[String]]("game_ids").toSeq,
          r.getAs[Double]("max_win_factor")))
    }.toMap
  }

  test("stage 1: exact match wins") {
    val m = resolve("0300")
    assert(m("0300") == ((5.0, Seq("100"), 111.0)))
  }

  test("stage 2: leading zeros stripped from the file id; multi-game order preserved") {
    val m = resolve("0301")
    assert(m("0301") == ((7.0, Seq("201", "202"), 222.0)))
  }

  test("stage 3: dim id zero-padded to 4") {
    val m = resolve("0042")
    assert(m("0042") == ((9.0, Seq("300"), 333.0)))
  }

  test("all-zero id strips to '0' (lstrip('0') or '0')") {
    val m = resolve("0000")
    assert(m("0000") == ((3.0, Seq("400"), 444.0)))
  }

  test("miss resolves to nothing (null ladder downstream)") {
    assert(resolve("9999").isEmpty)
  }

  test("exact match takes precedence over pad when both could apply") {
    // '42' exact-matches dim '42' at stage 1; stage 3 (pad to 0042)
    // must not fire for other dims
    val m = resolve("42")
    assert(m("42")._2 == Seq("300"))
  }

  test("loadFromRoot probes the reference's three candidate locations") {
    // etl/transform.py:43-47: repo root, then config/, then data/
    val src = java.nio.file.Paths.get(
      "src/test/resources/lookup/game_lookup.csv")
    for (sub <- Seq("", "config", "data")) {
      val root = java.nio.file.Files.createTempDirectory("graft_lookup")
      val dir = if (sub.isEmpty) root else
        java.nio.file.Files.createDirectory(root.resolve(sub))
      java.nio.file.Files.copy(src, dir.resolve("game_id_to_pools.csv"))
      val got = GameLookup.loadFromRoot(spark, root.toString)
      assert(got.count() > 0, s"location '$sub' did not resolve")
    }
    // earlier location wins when several exist
    val root = java.nio.file.Files.createTempDirectory("graft_lookup")
    java.nio.file.Files.createDirectory(root.resolve("config"))
    java.nio.file.Files.copy(src, root.resolve("game_id_to_pools.csv"))
    java.nio.file.Files.write(
      root.resolve("config").resolve("game_id_to_pools.csv"),
      "Game,Game_id,Pool_id,Bet\n".getBytes)
    assert(GameLookup.loadFromRoot(spark, root.toString).count() > 0)
    // and a miss reports every probed path
    val empty = java.nio.file.Files.createTempDirectory("graft_lookup")
    val e = intercept[RuntimeException](
      GameLookup.loadFromRoot(spark, empty.toString))
    assert(e.getMessage.contains("config/") && e.getMessage.contains("data/"))
  }
}
