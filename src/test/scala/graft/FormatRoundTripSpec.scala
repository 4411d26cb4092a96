package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink format coverage: the engine's tables must survive a
  * round-trip through every columnar/text format the runtime ships
  * (parquet is the native testdata format; ORC, CSV and JSON lines are
  * the other built-in lake formats). Schema-carrying formats must
  * reproduce rows exactly; CSV re-enters through an explicit schema.
  */
class FormatRoundTripSpec extends AnyFunSuite {
  import QueryHarness._

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.select("doc_id", "text", "lang", "source", "n_chars")
      .orderBy("doc_id").collect().map(_.toString).toSeq

  private lazy val docs = Tables.documents(spark, sf0001)
  private lazy val want = canon(docs)

  test("documents round-trip through ORC") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString
    docs.write.mode("overwrite").orc(dir)
    assert(canon(spark.read.orc(dir)) == want)
  }

  test("documents round-trip through JSON lines") {
    val dir = java.nio.file.Files.createTempDirectory("graft_json").toString
    docs.write.mode("overwrite").json(dir)
    // JSON re-infers types; read with the declared schema instead
    assert(canon(spark.read.schema(docs.schema).json(dir)) == want)
  }

  test("documents round-trip through CSV") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    docs.write.mode("overwrite")
      .option("header", "true").option("escape", "\"")
      .csv(dir)
    assert(canon(spark.read.schema(docs.schema)
      .option("header", "true").option("escape", "\"")
      .csv(dir)) == want)
  }

  test("ORC scan prunes columns and pushes filters like parquet") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc2").toString
    docs.write.mode("overwrite").orc(dir)
    val plan = spark.read.orc(dir)
      .where(col("doc_id") < 10).select("doc_id", "lang")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,10)]"),
      s"filter not pushed:\n$plan")
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,lang:string>"),
      s"columns not pruned:\n$plan")
  }
}
