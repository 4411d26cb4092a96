package graft.relational

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import graft.QueryHarness.{spark, sf001}

/** Co-located joins via bucketing (SCALING.md): writing both join sides
  * bucketed by the join key lets the sort-merge join run with ZERO
  * shuffle exchanges — the physical proof that the pre-partitioning
  * strategy the engine recommends for repeated fact-fact joins at
  * 100 TB actually removes the shuffle.
  */
class BucketingSpec extends AnyFunSuite {

  private def countShuffles(plan: SparkPlan): Int = {
    def walk(p: SparkPlan): Int = {
      val self = p match {
        case _: ShuffleExchangeExec => 1
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case _ => 0
      }
      self + p.children.map(walk).sum
    }
    walk(plan)
  }

  test("bucketed tables join without any shuffle exchange") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.sources.bucketing.enabled", "true")

    graft.Tables.lineitem(s2, sf001)
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    graft.Tables.orders(s2, sf001)
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_bucketed")

    val joined = s2.table("li_bucketed")
      .join(s2.table("ord_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderkey").agg(sum("l_quantity").as("q"))
    joined.collect() // materialize so AQE finalizes the plan
    val shuffles = countShuffles(joined.queryExecution.executedPlan)
    // join itself is shuffle-free; the only exchange allowed is the
    // final groupBy (which is also bucket-local here since the key
    // matches the bucketing)
    assert(shuffles == 0, s"expected shuffle-free plan, got $shuffles shuffles:\n" +
      joined.queryExecution.executedPlan)

    // sanity: same result as the unbucketed join
    val expect = graft.Tables.lineitem(s2, sf001)
      .join(graft.Tables.orders(s2, sf001),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderkey").agg(sum("l_quantity").as("q"))
      .orderBy("o_orderkey").collect().toSeq
    assert(joined.orderBy("o_orderkey").collect().toSeq == expect)
  }

  test("custom as-of join is shuffle-free on bucketed sides") {
    val s2 = spark.newSession()
    graft.GraftExtensions.register(s2)
    s2.conf.set("spark.sql.sources.bucketing.enabled", "true")

    graft.Tables.events(s2, sf001)
      .where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"))
      .write.bucketBy(8, "user_id").sortBy("user_id", "event_id")
      .mode("overwrite").saveAsTable("purch_bucketed")
    graft.Tables.events(s2, sf001)
      .where(col("event_type") === "signup")
      .select(col("user_id").as("s_user_id"), col("event_id").as("asof_signup"))
      .write.bucketBy(8, "s_user_id").sortBy("s_user_id", "asof_signup")
      .mode("overwrite").saveAsTable("sign_bucketed")

    val df = graft.plans.AsOf.join(
      s2.table("purch_bucketed"), s2.table("sign_bucketed"),
      "user_id", "s_user_id", "event_id", "asof_signup")
    df.collect()
    val shuffles = countShuffles(df.queryExecution.executedPlan)
    // AsOfJoinExec declares ClusteredDistribution on the key: bucketed
    // sides satisfy it, so EnsureRequirements inserts NO exchange —
    // the co-partitioned zero-shuffle path claimed in SURVEY §2.1
    assert(shuffles == 0, s"expected shuffle-free as-of join, got $shuffles:\n" +
      df.queryExecution.executedPlan)

    // and the values still match the window formulation
    val viaWindow = graft.relational.JoinQueries
      .queries("r11_asof_join")(s2, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)))).toSeq
    val got = df.select(col("event_id"), col("user_id"), col("asof_signup"))
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)))).toSeq
    assert(got == viaWindow)
  }
}
