package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.QueryHarness.{spark, sf0001}

/** The custom as-of join operator: semantics vs the composed window
  * formulation, brute-force randomized parity, plan shape (custom exec
  * node, one exchange per side, no window buffering).
  */
class AsOfJoinSpec extends AnyFunSuite {
  graft.GraftExtensions.register(spark)

  test("matches the running-max window formulation on events") {
    val viaWindow = graft.relational.JoinQueries
      .queries("r11_asof_join")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2))))
    val viaCustom = graft.relational.JoinQueries
      .queries("r15_asof_custom")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2))))
    assert(viaCustom.toSeq == viaWindow.toSeq)
    assert(viaCustom.nonEmpty)
  }

  test("randomized parity with a brute-force model (ties, misses, dups)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // small key space to force collisions; duplicate times to pin the
    // last-match-wins tie rule
    val leftRows = (0 until 500).map(i =>
      (i.toLong, rnd.nextInt(12).toLong, rnd.nextInt(40).toLong))
    val rightRows = (0 until 300).map(i =>
      (rnd.nextInt(12).toLong, rnd.nextInt(40).toLong, i.toLong))
    val left = leftRows.toDF("lid", "k", "t")
    val right = rightRows.toDF("rk", "rt", "payload")
    val got = AsOf.join(left, right, "k", "rk", "t", "rt")
      .select("lid", "payload").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    // model: per (key, time) the LAST right row in (rt, insertion) order
    // with rt <= t — insertion order is not defined for equal (rk, rt),
    // so compare against the SET of admissible payloads' max rt instead:
    // any row the sort could legally leave last shares the max rt.
    leftRows.foreach { case (lid, k, t) =>
      val candidates = rightRows.filter(r => r._1 == k && r._2 <= t)
      val gotP = got(lid)
      if (candidates.isEmpty) assert(gotP.isEmpty, s"lid $lid")
      else {
        val maxRt = candidates.map(_._2).max
        val admissible = candidates.filter(_._2 == maxRt).map(_._3).toSet
        assert(gotP.isDefined && admissible.contains(
          gotP.get.asInstanceOf[Long]), s"lid $lid")
      }
    }
  }

  test("forward direction and tolerance match the brute-force model") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val leftRows = (0 until 400).map(i =>
      (i.toLong, rnd.nextInt(10).toLong, rnd.nextInt(50).toLong))
    val rightRows = (0 until 250).map(i =>
      (rnd.nextInt(10).toLong, rnd.nextInt(50).toLong, i.toLong))
    val left = leftRows.toDF("lid", "k", "t")
    val right = rightRows.toDF("rk", "rt", "payload")

    // forward: FIRST right row with rt >= t (min rt)
    val fwd = AsOf.join(left, right, "k", "rk", "t", "rt",
        direction = "forward").select("lid", "payload").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    leftRows.foreach { case (lid, k, t) =>
      val cands = rightRows.filter(r => r._1 == k && r._2 >= t)
      if (cands.isEmpty) assert(fwd(lid).isEmpty, s"fwd lid $lid")
      else {
        val minRt = cands.map(_._2).min
        val admissible = cands.filter(_._2 == minRt).map(_._3).toSet
        assert(fwd(lid).exists(p => admissible(p.asInstanceOf[Long])),
          s"fwd lid $lid")
      }
    }

    // backward with tolerance 5: match only if t - rt <= 5
    val tol = AsOf.join(left, right, "k", "rk", "t", "rt",
        tolerance = Some(5L)).select("lid", "payload").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    leftRows.foreach { case (lid, k, t) =>
      val cands = rightRows.filter(r => r._1 == k && r._2 <= t && t - r._2 <= 5)
      if (cands.isEmpty) assert(tol(lid).isEmpty, s"tol lid $lid")
      else {
        val maxRt = cands.map(_._2).max
        val admissible = cands.filter(_._2 == maxRt).map(_._3).toSet
        assert(tol(lid).exists(p => admissible(p.asInstanceOf[Long])),
          s"tol lid $lid")
      }
    }
  }

  test("null keys/times never match and never block the merge") {
    import spark.implicits._
    val left = Seq((1L, Option(5L), Option(10L)), (2L, None, Option(10L)),
      (3L, Option(5L), None)).toDF("lid", "k", "t")
    val right = Seq((Option.empty[Long], Option(1L), 100L),
      (Option(5L), Option.empty[Long], 200L),
      (Option(5L), Option(9L), 300L)).toDF("rk", "rt", "payload")
    val got = AsOf.join(left, right, "k", "rk", "t", "rt")
      .select("lid", "payload").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got(1L).contains(300L)) // only the non-null (5, 9) matches
    assert(got(2L).isEmpty) // null left key
    assert(got(3L).isEmpty) // null left time
  }

  test("plan: custom exec node, one exchange per side, no window") {
    val purchases = graft.Tables.events(spark, sf0001)
      .where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"))
    val signups = graft.Tables.events(spark, sf0001)
      .where(col("event_type") === "signup")
      .select(col("user_id").as("s_user_id"), col("event_id").as("asof_signup"))
    val df = AsOf.join(purchases, signups,
      "user_id", "s_user_id", "event_id", "asof_signup")
    // (AQE wraps the tree, so match on the printed node name — Spark
    // strips the Exec suffix)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin "), plan)
    assert(!plan.contains("Window"), plan)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 2, s"expected 2 exchanges, plan:\n$plan")
    df.count() // and it executes
  }
}
