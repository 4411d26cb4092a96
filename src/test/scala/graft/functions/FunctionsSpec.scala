package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.QueryHarness.{spark, sf0001}

class FunctionsSpec extends AnyFunSuite {

  test("MinhashSignature equals the composed-builtins pipeline (codegen path)") {
    val a = graft.llm.DedupQueries.sigsBuiltin(spark, sf0001)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) ->
        r.getAs[collection.Seq[Long]](1).mkString("_"))
    // d2 emits the '_'-joined string form (driver-comparator friendly)
    val b = graft.llm.DedupQueries.queries("d2_minhash_signatures")(spark, sf0001)
      .collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(a.toSeq == b.toSeq)
  }

  test("MinhashSignature interpreted eval equals codegen") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val coeffs = graft.llm.Hashing.minhashCoeffs(16)
    val e = MinhashSignature(
      Literal.create(Seq(7L, 99L, 12345L), ArrayType(LongType)),
      coeffs.map(_._1).toArray, coeffs.map(_._2).toArray,
      graft.llm.Hashing.MinhashP)
    val out = e.eval(null).asInstanceOf[ArrayData].toLongArray().toSeq
    // brute-force expectation
    val expect = coeffs.map { case (a, b) =>
      Seq(7L, 99L, 12345L).map(h => (a * h + b) % graft.llm.Hashing.MinhashP).min
    }
    assert(out == expect)
  }

  test("minhash_signature registered for SQL via GraftExtensions.register") {
    graft.GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT minhash_signature(array(7L, 99L, 12345L)) AS sig").collect()(0)
    val coeffs = graft.llm.Hashing.minhashCoeffs(16)
    val expect = coeffs.map { case (a, b) =>
      Seq(7L, 99L, 12345L).map(h => (a * h + b) % graft.llm.Hashing.MinhashP).min
    }
    assert(r.getAs[collection.Seq[Long]]("sig").toSeq == expect)
  }

  test("one-pass VolatilityAgg equals two-pass on random pools") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    val dim = graft.pol.GameLookup.fromCsv(
      spark, "src/test/resources/lookup/game_lookup.csv")
    val winGen = Gen.frequency(
      (5, Gen.const(0L)), (3, Gen.choose(1L, 50L)), (1, Gen.choose(51L, 100000L)))
    val winsGen = Gen.listOfN(500, winGen)
    (0 until 3).foreach { i =>
      val wins = winsGen(Gen.Parameters.default, Seed(1000L + i)).get
      val parsed = wins.toDF("game_win")
        .withColumn("type_code", lit("TB1"))
        .withColumn("relative_path", lit("Pool_6371_1.pol"))
        .withColumn("file_name", lit("Pool_6371_1.pol"))
        .withColumn("folder_path", lit(""))
        .withColumn("parent_folder", lit(""))
        .repartition(7) // force multi-partition partial aggregation
      val two = graft.pol.PoolMetrics.perPool(parsed, dim).collect().head
      val one = graft.pol.PoolMetrics.perPoolOnePass(parsed, dim).collect().head
      for (f <- Seq("rtp", "volatility", "hit_frequency"))
        assert(one.getAs[Double](f) == two.getAs[Double](f), s"$f seed $i")
    }
  }

  test("one-pass VolatilityAgg matches the two-pass golden path on samples") {
    val dim = graft.pol.GameLookup.fromCsv(
      spark, "src/test/resources/lookup/game_lookup.csv")
    val parsed = graft.pol.PolParser.read(
      spark, "/root/reference/samples/pools2/0201/Pool_0201_294.pol")
    val twoPass = graft.pol.PoolMetrics.perPool(parsed, dim).collect().head
    val onePass = graft.pol.PoolMetrics.perPoolOnePass(parsed, dim).collect().head
    for (f <- Seq("rtp", "volatility", "hit_frequency"))
      assert(onePass.getAs[Double](f) == twoPass.getAs[Double](f), f)
    assert(onePass.getAs[Long]("size") == twoPass.getAs[Long]("size"))
  }
}
