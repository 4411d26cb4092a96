package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import scala.sys.process._

import org.scalatest.funsuite.AnyFunSuite

import graft.QueryHarness.spark

/** S2's LITERAL mode: discovery via `git diff --name-only`, the exact
  * reference mechanism (`etl/extract.py:161-211`) — changed and added
  * `.pol` files under the samples subdir are returned, deleted paths
  * and non-.pol files are not, and an empty diff falls back to the
  * full scan (`etl/main.py:82-85`).
  */
class GitChangedFilesSpec extends AnyFunSuite {
  private val lookup = "src/test/resources/lookup/game_lookup.csv"

  private def sh(cwd: Path, cmd: String*): Unit = {
    val code = Process(cmd.toSeq, cwd.toFile).!(ProcessLogger(_ => ()))
    assert(code == 0, s"command failed: ${cmd.mkString(" ")}")
  }

  private def write(repo: Path, rel: String, body: String): Unit = {
    val p = repo.resolve(rel)
    Files.createDirectories(p.getParent)
    Files.write(p, body.getBytes(StandardCharsets.UTF_8))
  }

  private def initRepo(): Path = {
    val repo = Files.createTempDirectory("gitchg")
    sh(repo, "git", "init", "-q", "-b", "main")
    sh(repo, "git", "config", "user.email", "spec@example.com")
    sh(repo, "git", "config", "user.name", "spec")
    repo
  }

  test("git diff discovery: modified + added, not deleted, not non-pol") {
    val repo = initRepo()
    write(repo, "samples/pools2/0300/Pool_0300_395.pol", "5 TB1\n")
    write(repo, "samples/pools2/0301/Pool_0301_1.pol", "9 TB1\n")
    write(repo, "samples/pools2/gone/Pool_0042_2.pol", "1 TB1\n")
    write(repo, "README.md", "not a pool\n")
    sh(repo, "git", "add", "-A")
    sh(repo, "git", "commit", "-q", "-m", "base")

    write(repo, "samples/pools2/0300/Pool_0300_395.pol", "5 TB1\n7 TB1\n")
    write(repo, "samples/pools2/0302/Pool_0302_3.pol", "4 TB1\n")
    write(repo, "README.md", "still not a pool\n")
    Files.delete(repo.resolve("samples/pools2/gone/Pool_0042_2.pol"))
    sh(repo, "git", "add", "-A")
    sh(repo, "git", "commit", "-q", "-m", "change")

    val got = ChangedFiles.gitChangedFiles(repo.toString).sorted
    assert(got == Seq(
      "samples/pools2/0300/Pool_0300_395.pol",
      "samples/pools2/0302/Pool_0302_3.pol"))
  }

  test("runGit processes exactly the diffed files; empty diff = full scan") {
    val repo = initRepo()
    write(repo, "samples/pools2/0300/Pool_0300_395.pol", "5 TB1\n7 TB1\n")
    write(repo, "samples/pools2/0301/Pool_0301_1.pol", "9 TB1\n")
    sh(repo, "git", "add", "-A")
    sh(repo, "git", "commit", "-q", "-m", "base")
    write(repo, "samples/pools2/0301/Pool_0301_1.pol", "9 TB1\n11 TB1\n")
    sh(repo, "git", "add", "-A")
    sh(repo, "git", "commit", "-q", "-m", "modify one")

    val out = repo.resolve("all_pools_data.json")
    val ts = Some("2026-01-01T00:00:00+00:00")
    // only the modified file is reprocessed
    assert(ChangedFiles.runGit(spark, repo.toString, "samples/pools2",
      lookup, out, processedAt = ts) == 1)
    val doc = Files.readString(out)
    assert(doc.contains("\"Pool_0301_1.pol\""))
    assert(!doc.contains("\"Pool_0300_395.pol\""))

    // diff range with no .pol changes → reference fallback: full scan
    write(repo, "README.md", "docs only\n")
    sh(repo, "git", "add", "-A")
    sh(repo, "git", "commit", "-q", "-m", "docs")
    assert(ChangedFiles.runGit(spark, repo.toString, "samples/pools2",
      lookup, out, processedAt = ts) == 2)
    val full = Files.readString(out)
    assert(full.contains("\"Pool_0300_395.pol\""))
  }
}
