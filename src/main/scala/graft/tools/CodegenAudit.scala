package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{FilterExec, InputAdapter, ProjectExec, SparkPlan, WholeStageCodegenExec}

/** Codegen-fallback audit: `CodegenAudit <sfDir> [query ...]`.
  *
  * Round 7's n10 regression (23.4 s for a 400k-row map-only stage)
  * was a PROJECTION FALLING OUT OF WHOLE-STAGE CODEGEN — the third
  * time this codebase hit the same ~20×-per-row cliff (n9's inlined
  * subspace slices and d5's nested lambdas were rounds 5–6). The
  * cliff is invisible in `explain()` unless you know to look for
  * Project/Filter nodes OUTSIDE `WholeStageCodegen` spans, so this
  * tool walks every catalog query's physical plan and prints exactly
  * those nodes with their expression-tree sizes. Interpreted rows
  * are not automatically bugs — higher-order functions (zip_with,
  * transform, aggregate) are CodegenFallback by design and fine on
  * SMALL relations — the report exists so a big expression tree on a
  * corpus-sized input is a decision, not an accident.
  *
  * AQE is disabled here (audit wants the full static plan, not the
  * first stage); expression size = number of nodes in the projection
  * /condition trees, the rough proxy for per-row interpretation cost.
  */
object CodegenAudit {

  private case class Hit(node: String, exprNodes: Int, detail: String)

  private def exprSize(e: org.apache.spark.sql.catalyst.expressions.Expression): Int =
    1 + e.children.map(exprSize).sum

  private def walk(p: SparkPlan, inCodegen: Boolean): Seq[Hit] = p match {
    case w: WholeStageCodegenExec => w.children.flatMap(walk(_, inCodegen = true))
    case i: InputAdapter => i.children.flatMap(walk(_, inCodegen = false))
    case pr: ProjectExec if !inCodegen =>
      Hit("Project", pr.projectList.map(exprSize).sum,
        pr.projectList.map(_.name).take(8).mkString(",")) +:
        pr.children.flatMap(walk(_, inCodegen = false))
    case f: FilterExec if !inCodegen =>
      Hit("Filter", exprSize(f.condition), f.condition.sql.take(80)) +:
        f.children.flatMap(walk(_, inCodegen = false))
    case other =>
      // membership in a span only changes at its boundaries:
      // WholeStageCodegenExec enters, InputAdapter leaves. Every
      // other node PROPAGATES the flag — the round-7 version reset
      // it to false here, which marked anything below a
      // Project/Filter/Join inside a span as interpreted (≈70
      // queries of false positives masking the ~6 real hits).
      other.children.flatMap(walk(_, inCodegen))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = if (args.length > 1) args.drop(1).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    var flagged = 0
    names.foreach { q =>
      try {
        val df = graft.SparkEntry.queries(q)(spark, sfDir)
        val hits = walk(df.queryExecution.executedPlan, inCodegen = false)
          .filter(_.exprNodes >= 8) // trivial aliases are noise
          .sortBy(-_.exprNodes)
        if (hits.nonEmpty) {
          flagged += 1
          println(s"$q:")
          hits.take(6).foreach(h =>
            println(f"  INTERPRETED ${h.node}%-8s exprNodes=${h.exprNodes}%-6d ${h.detail}"))
        }
      } catch {
        case e: Throwable =>
          println(s"$q: audit failed: ${e.getMessage.linesIterator.next()}")
      }
    }
    println(s"== $flagged/${names.size} queries carry a non-trivial " +
      "interpreted Project/Filter ==")
    spark.stop()
  }
}
