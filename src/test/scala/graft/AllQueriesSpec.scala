package graft

import org.scalatest.funsuite.AnyFunSuite

/** Catalog-wide invariants for the driver contract. */
class AllQueriesSpec extends AnyFunSuite {
  import QueryHarness._

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("catalog covers the SURVEY §2 operator families") {
    val keys = SparkEntry.queries.keySet
    val required = Seq("s1", "p1", "p2", "p3", "p5", "p6", "p7", "p8", "p9",
      "j1", "j2", "a1", "a2", "a3", "a4", "a5", "a6", "a8", "a9",
      "o1", "o2", "o3", "o4", "w1",
      "d1", "d2", "d3", "d4", "d5", "d6", "d7", "d8", "n1", "n2", "n4",
      "c1", "c2", "c3", "c4", "t5", "o6", "h4", "h5",
      "x1", "x2", "x3", "x4", "x5", "x6", "x7", "m1", "m2",
      "x10", "x11", "x12", "w2", "r20")
    val uncovered = required.filterNot(p => keys.exists(_.startsWith(p + "_")))
    assert(uncovered.isEmpty, s"families with no query: $uncovered")
  }

  test("every query runs at sf0.001 (rows may be 0 only for pair-miners)") {
    val mayBeEmpty = Set("d3_minhash_lsh_pairs", "d4_ngram_jaccard",
      "d6_embedding_neardup", "r8_except", "n3_ann_lsh",
      // r26 is EMPTY BY CONTRACT on healthy default-dial testdata —
      // no advisory condition holds there (AdvisorySurfaceSpec pins
      // the non-empty side on saturated fixtures)
      "r26_advisories")
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf0001).count()
      assert(n > 0 || mayBeEmpty(name), s"$name empty at sf0.001")
    }
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  /** Output-type lint: the driver's comparator reads Spark parquet via
    * pandas and the DuckDB oracle as a pandas df, then compares
    * STRINGIFIED values. Types that coerce asymmetrically on that path
    * (DECIMAL -> Decimal objects on the Spark side vs float64 on the
    * DuckDB side; STRUCT/MAP -> unstringifiable objects) produce
    * deterministic hash mismatches the arrow-based local mirror cannot
    * see — j5's three-round red streak was exactly this. Every query's
    * FINAL schema is therefore restricted to the types proven to
    * round-trip the comparator identically on both sides.
    */
  test("every query's final schema round-trips the pandas comparator") {
    import org.apache.spark.sql.types._
    def primOk(t: DataType): Boolean = t match {
      case StringType | LongType | IntegerType | DoubleType |
           BooleanType | DateType | TimestampType => true
      case _ => false
    }
    def ok(t: DataType): Boolean = t match {
      case ArrayType(e, _) => primOk(e)
      case other => primOk(other)
    }
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val schema = fn(spark, sf0001).schema
        schema.fields.filterNot(f => ok(f.dataType))
          .map(f => s"$name.${f.name}: ${f.dataType.sql}")
    }
    assert(bad.isEmpty,
      s"final columns with comparator-unsafe types: ${bad.mkString(", ")}")
  }
}
