package graft.pol

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import graft.QueryHarness.spark

/** Primary correctness oracle for reference semantics (SURVEY §5.1):
  * run the Spark pipeline over the reference's in-repo sample corpus
  * and field-compare against the recomputable golden entries of
  * `Meta_data/all_pools_data.json` — including half-even rounding and
  * the round-then-sum volatility order.
  *
  * The golden values below are transcribed from the reference's
  * committed golden output (data, not code); the lookup fixture rows
  * (0201→9493@25, 6371→Pharaoh@10) come from the committed workbook +
  * the golden documents.
  */
class GoldenParitySpec extends AnyFunSuite {
  val samples = "/root/reference/samples/pools2"
  val lookupCsv = "src/test/resources/lookup/game_lookup.csv"

  // pool_name -> (rtp, volatility, hit, size, tag, is_flat, max_mult)
  val golden: Map[String, (Double, Double, Double, Long, Seq[String], Int, Option[String])] = Map(
    "Pool_0201_1401.pol" -> (139.68, 14.75, 41.48, 1000000L, Seq("REG"), 0, None),
    "Pool_0201_292.pol" -> (92.0, 5.19, 26.12, 1000000L, Seq("REG"), 0, None),
    "Pool_0201_294.pol" -> (94.01, 5.34, 26.19, 1000000L, Seq("REG"), 0, None),
    "Pool_0201_395.pol" -> (4749.78, 56.52, 100.0, 100000L, Seq("GAB", "PFB"), 0, None),
    "Pool_0201_40920160.pol" -> (92.0, 4.79, 41.08, 1000000L, Seq("REG"), 1, Some("0160")),
    "Pool_0201_40920400.pol" -> (92.0, 4.86, 41.07, 1000000L, Seq("REG"), 1, Some("0400")),
    "Pool_0201_40940060.pol" -> (94.0, 4.62, 41.25, 1000000L, Seq("REG"), 1, Some("0060")),
    "Pool_0201_40940160.pol" -> (94.0, 5.16, 41.11, 1000000L, Seq("REG"), 1, Some("0160")),
    "Pool_0201_40940400.pol" -> (94.0, 5.2, 41.11, 1000000L, Seq("REG"), 1, Some("0400")),
    "Pool_0201_40950060.pol" -> (95.0, 4.68, 41.3, 1000000L, Seq("REG"), 1, Some("0060")),
    "Pool_0201_40950160.pol" -> (95.0, 5.2, 41.17, 1000000L, Seq("REG"), 1, Some("0160")),
    "Pool_0201_40950400.pol" -> (95.0, 5.23, 41.2, 1000000L, Seq("REG"), 1, Some("0400")),
    "Pool_0201_40960060.pol" -> (96.0, 4.71, 41.39, 1000000L, Seq("REG"), 1, Some("0060")),
    "Pool_0201_40960160.pol" -> (96.0, 5.24, 41.24, 1000000L, Seq("REG"), 1, Some("0160")),
    "Pool_0201_40960400.pol" -> (96.0, 5.24, 41.31, 1000000L, Seq("REG"), 1, Some("0400")),
    "Pool_0201_50940020.pol" -> (94.0, 3.25, 47.48, 1000000L, Seq("PFB"), 0, None),
    "Pool_0201_50940198.pol" -> (94.0, 5.45, 26.11, 1000000L, Seq("PFB"), 0, None),
    "Pool_0201_550940020.pol" -> (94.0, 3.84, 30.26, 1000000L, Seq("PFB"), 0, None),
    "Pool_0201_880.pol" -> (88.0, 5.37, 36.04, 1000000L, Seq("REG"), 0, None),
    "Pool_0201_885.pol" -> (88.0, 6.08, 25.92, 1000000L, Seq("REG"), 0, None),
    "Pool_0201_921.pol" -> (92.0, 5.47, 40.96, 1000000L, Seq("REG"), 0, None),
    "Pool_0201_935.pol" -> (93.0, 5.86, 26.16, 1000000L, Seq("REG"), 0, None),
    "Pool_0201_941.pol" -> (94.2, 5.56, 41.21, 1000000L, Seq("REG"), 0, None),
    "Pool_0201_945.pol" -> (94.0, 6.47, 25.92, 1000000L, Seq("REG"), 0, None),
    "Pool_0201_951.pol" -> (95.01, 5.71, 41.22, 1000000L, Seq("REG"), 0, None),
    "Pool_0201_955.pol" -> (94.88, 6.52, 26.18, 1000000L, Seq("REG"), 0, None),
    "Pool_0201_961.pol" -> (96.0, 5.82, 41.24, 1000000L, Seq("REG"), 0, None)
  )

  lazy val pools: Array[Row] = {
    val dim = GameLookup.fromCsv(spark, lookupCsv)
    val parsed = PolParser.read(spark, samples)
    PoolMetrics.perPool(parsed, dim)
      .select("file_name", "relative_path", "pool_id", "pool_type",
        "game_ids", "min_bet", "rtp", "volatility", "hit_frequency",
        "size", "tag", "is_flat", "max_multiplier")
      .collect()
  }

  test("all 29 sample files processed") {
    assert(pools.length == 29)
  }

  test("golden parity: rtp/volatility/hit/size/tag/is_flat/max_multiplier") {
    var checked = 0
    pools.foreach { r =>
      val name = r.getString(0)
      golden.get(name).foreach { case (rtp, vol, hit, size, tag, flat, mm) =>
        val ctx = s"$name (${r.getString(1)})"
        assert(r.getAs[Double]("rtp") == rtp, s"rtp $ctx")
        assert(r.getAs[Double]("volatility") == vol, s"vol $ctx")
        assert(r.getAs[Double]("hit_frequency") == hit, s"hit $ctx")
        assert(r.getAs[Long]("size") == size, s"size $ctx")
        assert(r.getAs[collection.Seq[String]]("tag").toSeq == tag, s"tag $ctx")
        assert(r.getAs[Int]("is_flat") == flat, s"is_flat $ctx")
        assert(Option(r.getAs[String]("max_multiplier")) == mm, s"max_mult $ctx")
        assert(r.getAs[collection.Seq[String]]("game_ids").toSeq == Seq("9493"), s"game_ids $ctx")
        assert(r.getAs[Double]("min_bet") == 25.0, s"min_bet $ctx")
        checked += 1
      }
    }
    // 27 distinct golden names; Pool_0201_395.pol exists twice (root +
    // 0201/) with identical content so it matches twice → 28 checks.
    assert(checked == 28, s"only $checked golden rows checked")
  }

  test("pool_6371_9999 matches the golden run summary (rtp 94.0, vol 13.86)") {
    val r = pools.find(_.getString(0) == "pool_6371_9999.pol").get
    assert(r.getAs[String]("pool_id") == "6371")
    assert(r.getAs[String]("pool_type") == "9999")
    assert(r.getAs[Double]("min_bet") == 10.0)
    assert(r.getAs[Double]("rtp") == 94.0)
    assert(r.getAs[Double]("volatility") == 13.86)
    assert(r.getAs[Long]("size") == 999999L)
    assert(r.getAs[collection.Seq[String]]("game_ids").toSeq == Seq("6371"))
  }
}
