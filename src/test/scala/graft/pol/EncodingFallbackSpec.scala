package graft.pol

import java.nio.file.Files
import java.nio.charset.StandardCharsets
import org.scalatest.funsuite.AnyFunSuite
import graft.QueryHarness.spark

/** S3 — per-file multi-encoding read: utf-8 with BOM, clean utf-8 and
  * latin-1 files in one scan, each decoded with the reference's
  * fallback chain.
  */
class EncodingFallbackSpec extends AnyFunSuite {

  test("utf-8, BOM and latin-1 files decode in one scan") {
    val dir = Files.createTempDirectory("enc")
    Files.write(dir.resolve("Pool_0001_1.pol"),
      "5 TB1\n7 TB2\n".getBytes(StandardCharsets.UTF_8))
    Files.write(dir.resolve("Pool_0001_2.pol"),
      ("\uFEFF" + "9 TB1\n").getBytes(StandardCharsets.UTF_8))
    // latin-1: 0xE9 = é in the type code, invalid as utf-8
    Files.write(dir.resolve("Pool_0001_3.pol"),
      Array[Byte]('1', '1', ' ', 'T', 0xE9.toByte, '1', '\n'))

    val parsed = PolParser.parse(
      PolParser.readRawWithEncodingFallback(spark, dir.toString))
    val rows = parsed.select("game_win", "type_code", "file_name")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
    // Reference parity: strict utf-8 succeeds on the BOM'd file, the
    // ﻿ stays on line 1, so '﻿9' fails int() and is DROPPED —
    // the 9 must NOT appear.
    assert(rows.map(_._1).toSeq == Seq(5L, 7L, 11L))
    // latin-1 type code decoded, not replaced
    assert(rows.find(_._1 == 11L).get._2 == "Té1")
  }

  test("fallback path produces identical results to text source on clean input") {
    val a = PolParser.read(spark, "src/test/resources/pol/malformed.pol")
      .select("game_win").collect().map(_.getLong(0)).toSeq
    val b = PolParser.parse(PolParser.readRawWithEncodingFallback(
        spark, "src/test/resources/pol/malformed.pol"))
      .select("game_win").collect().map(_.getLong(0)).toSeq
    assert(a == b)
  }
}
