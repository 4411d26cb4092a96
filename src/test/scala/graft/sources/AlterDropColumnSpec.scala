package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.QueryHarness.spark
import graft.pol.PoolJsonSink

/** `ALTER TABLE ... DROP COLUMN` — metadata-only schema evolution:
  * the recorded schema loses the column, files keep their bytes
  * (readers project them away, rewrites shed them over time), time
  * travel still serves pre-drop versions, and the dropped NAME is
  * retired forever (name-matched reads from pre-drop files would
  * resurrect stale values — the field-id-free engine's honest answer
  * to Iceberg's field ids).
  */
class AlterDropColumnSpec extends AnyFunSuite {

  private val wh = java.nio.file.Files
    .createTempDirectory("gdrop_wh").toString
  spark.conf.set("spark.sql.catalog.gdrop", "graft.sources.GraftCatalog")
  spark.conf.set("spark.sql.catalog.gdrop.warehouse", wh)

  spark.sql("CREATE TABLE gdrop.default.t (k BIGINT, v BIGINT, " +
    "note STRING, meta STRUCT<a: BIGINT, b: STRING>) USING graft " +
    "TBLPROPERTIES ('key'='k','nbuckets'='2','statscols'='v,note')")
  spark.sql("INSERT INTO gdrop.default.t " +
    "SELECT id, id * 2, concat('n', id), " +
    "named_struct('a', id, 'b', 'x') FROM range(0, 100)")

  private def dir = s"$wh/default/t"

  test("top-level DROP is metadata-only; reads, writes, time travel") {
    val before = PoolJsonSink.readManifest(dir).get
    spark.sql("ALTER TABLE gdrop.default.t DROP COLUMN note")
    val after = PoolJsonSink.readManifest(dir).get
    assert(after.version == before.version + 1)
    assert(after.files.toSet == before.files.toSet, "no data rewrite")
    assert(after.droppedCols.contains("note"))
    // statscols pruned in the same commit
    assert(after.statsCols == Seq("v"))
    assert(spark.table("gdrop.default.t").columns.toSeq ==
      Seq("k", "v", "meta"))
    // writes take the new schema
    spark.sql("INSERT INTO gdrop.default.t " +
      "SELECT id, 0, named_struct('a', id, 'b', 'y') " +
      "FROM range(100, 110)")
    assert(spark.sql("SELECT count(*) FROM gdrop.default.t")
      .collect().head.getLong(0) == 110L)
    // time travel serves the pre-drop schema WITH the column
    val old = spark.sql(s"SELECT note FROM gdrop.default.t " +
      s"VERSION AS OF ${before.version} WHERE k = 7")
    assert(old.collect().head.getString(0) == "n7")
  }

  test("nested DROP reaches inside structs") {
    spark.sql("ALTER TABLE gdrop.default.t DROP COLUMN meta.b")
    val r = spark.sql("SELECT meta FROM gdrop.default.t WHERE k = 7")
      .collect().head.getStruct(0)
    assert(r.schema.fieldNames.toSeq == Seq("a") && r.getLong(0) == 7L)
  }

  test("a dropped name can never be re-added") {
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE gdrop.default.t ADD COLUMN note BIGINT")
    }
    assert(e.getMessage.contains("cannot be reused"))
  }

  test("the merge key and split column refuse to drop") {
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE gdrop.default.t DROP COLUMN k")
    }
    assert(e.getMessage.contains("merge key"))
    spark.sql("ALTER TABLE gdrop.default.t SET TBLPROPERTIES " +
      "('splitcol'='v')")
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE gdrop.default.t DROP COLUMN v")
    }
    assert(e2.getMessage.contains("split column"))
  }

  test("IF EXISTS tolerates a missing column; plain DROP does not") {
    spark.sql("ALTER TABLE gdrop.default.t DROP COLUMN IF EXISTS ghost")
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE gdrop.default.t DROP COLUMN ghost")
    }
    // Spark's analyzer rejects the unresolved column before the
    // catalog sees it — either message is the right refusal
    assert(e.getMessage.contains("no such column") ||
      e.getMessage.contains("cannot be resolved"))
  }
}
