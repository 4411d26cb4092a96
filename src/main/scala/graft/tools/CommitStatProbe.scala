package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Wide-commit footer-stat harvest probe (round-13, verdict item 4):
  * `CommitStatProbe [nFiles] [reps]` stages `nFiles` small parquet
  * files, then times [[graft.pol.PoolJsonSink.footerStats]] (the
  * bounded-pool implementation shipping in the commit path) against
  * an inline sequential open-and-read loop over the same files — the
  * shape the commit path had before round 13. Harvest results are
  * checked identical.
  */
object CommitStatProbe {
  def main(args: Array[String]): Unit = {
    val nFiles = if (args.length > 0) args(0).toInt else 256
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = java.nio.file.Files
      .createTempDirectory("commitstatprobe").toFile
    val dataDir = new java.io.File(dir, "data"); dataDir.mkdirs()
    spark.range(0, nFiles * 100L)
      .select(col("id").as("k"), (col("id") * 7 % 1000).as("v"))
      .repartition(nFiles, col("k"))
      .write.mode("overwrite").parquet(dataDir + "/stage")
    val rels = new java.io.File(dataDir, "stage").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f =>
        s"data/stage/${f.getName}").toSeq.sorted
    println(s"staged files: ${rels.size}")

    val conf = spark.sessionState.newHadoopConf()
    def sequentialHarvest(): Int = {
      import scala.jdk.CollectionConverters._
      rels.map { rel =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(s"$dir/$rel"), conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getFooter.getBlocks.asScala.map(_.getRowCount).sum
        finally r.close()
      }.size
    }

    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val seq = sequentialHarvest()
      val t1 = System.nanoTime()
      val par = graft.pol.PoolJsonSink.footerStats(
        spark, dir.toString, rels, Seq("k", "v"))
      val t2 = System.nanoTime()
      println(f"rep$i sequential ${(t1 - t0) / 1e9}%7.3f s ($seq files)  " +
        f"pooled ${(t2 - t1) / 1e9}%7.3f s (${par.size} files, " +
        s"cols=${par.values.headOption.map(_.keySet.toSeq.sorted).getOrElse(Nil)})")
    }
    spark.stop()
  }
}
