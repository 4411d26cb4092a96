package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Pol-corpus generator: `PolCorpusGen <nFiles> <linesPerFile> <outDir>`.
  *
  * Writes nFiles deterministic `.pol` files (two-column `win TYPE` line
  * format, win distribution roughly matching the reference samples:
  * ~80% zeros, a long tail of wins) named `Pool_<id>_<type>.pol` under
  * outDir/<folder>/ — the input for end-to-end PolMain throughput runs
  * beyond the 29-file reference sample corpus. Generation is
  * hash-derived per (file, line): no RNG state, identical corpus at any
  * parallelism.
  */
object PolCorpusGen {
  private def lcg(x: Long): Long = x * 6364136223846793005L + 1442695040888963407L

  def main(args: Array[String]): Unit = {
    val nFiles = args(0).toInt
    val linesPerFile = args(1).toInt
    val outDir = args(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val types = Array("TB1", "TB2", "TB3", "TF1", "TF2")
    val bc = spark.sparkContext.broadcast((linesPerFile, types))
    spark.sparkContext.parallelize(0 until nFiles, math.min(nFiles, 64))
      .foreach { f =>
        val (lines, ts) = bc.value
        val folder = Paths.get(outDir, s"${4000 + f % 8}")
        Files.createDirectories(folder)
        val poolType = 100 + f % 40
        val file = folder.resolve(f"Pool_${4000 + f}%04d_${poolType}.pol")
        val w = Files.newBufferedWriter(file)
        var i = 0
        while (i < lines) {
          var st = lcg(f.toLong << 32 | i)
          val u = (st >>> 40).toInt & 0xFFFF
          // ~80% zeros; tail: win = (u % 500) * 5
          val win = if (u % 5 != 0) 0 else (lcg(st) >>> 48).toInt % 2500
          st = lcg(st)
          w.write(s"${math.abs(win)} ${ts(math.abs((st >>> 33).toInt) % ts.length)}\n")
          i += 1
        }
        w.close()
      }
    println(s"wrote $nFiles files x $linesPerFile lines under $outDir")
    spark.stop()
  }
}
