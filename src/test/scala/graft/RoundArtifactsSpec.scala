package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The round evidence chain's self-defense: stale-verdict detection
  * (round 6 — judge died, round-3 verdict beside round-5 artifacts) and
  * empty-artifact detection (round 14 — the driver's CORRECTNESS
  * capture hiccuped to `{}` and the round's hard signal vanished). */
class RoundArtifactsSpec extends AnyFunSuite {

  /** Run warnIfStale against a synthetic repo root, capturing stderr. */
  private def warnings(files: Map[String, String]): String = {
    val dir = Files.createTempDirectory("ra").toFile
    files.foreach { case (name, body) =>
      Files.writeString(new java.io.File(dir, name).toPath, body)
    }
    val buf = new java.io.ByteArrayOutputStream()
    val old = System.err
    System.setErr(new java.io.PrintStream(buf, true, "UTF-8"))
    try RoundArtifacts.warnIfStale(dir.getAbsolutePath)
    finally System.setErr(old)
    buf.toString("UTF-8")
  }

  test("intact chain: verdict for N-1 beside CORRECTNESS_rN is silent") {
    val out = warnings(Map(
      "VERDICT.md" -> "# VERDICT — round 13",
      "CORRECTNESS_r14.json" -> """{"a":{"hash_match":true}}"""))
    assert(out.isEmpty, out)
  }

  test("stale verdict (two+ rounds behind) warns") {
    val out = warnings(Map(
      "VERDICT.md" -> "# VERDICT — round 3",
      "CORRECTNESS_r05.json" -> """{"a":{"hash_match":true}}"""))
    assert(out.contains("STALE"), out)
  }

  test("empty newest CORRECTNESS artifact warns and asks for a self-check") {
    val out = warnings(Map(
      "VERDICT.md" -> "# VERDICT — round 14",
      "CORRECTNESS_r14.json" -> "{}"))
    assert(out.contains("EMPTY"), out)
    assert(out.contains("CORRECTNESS_SELF_r14.json"), out)
    assert(out.contains("COMMIT"), out)
  }

  test("empty driver artifact with a committed self-check names it") {
    val out = warnings(Map(
      "VERDICT.md" -> "# VERDICT — round 14",
      "CORRECTNESS_r14.json" -> "{}",
      "CORRECTNESS_SELF_r14.json" -> """{"a":{"hash_match":true}}"""))
    assert(out.contains("EMPTY"), out)
    assert(out.contains("Use the committed self-check"), out)
  }

  test("non-empty newest artifact does not trigger the empty warning") {
    val out = warnings(Map(
      "VERDICT.md" -> "# VERDICT — round 14",
      "CORRECTNESS_r13.json" -> "{}", // an OLD empty artifact is history
      "CORRECTNESS_r14.json" -> """{"a":{"hash_match":true}}"""))
    assert(!out.contains("EMPTY"), out)
  }
}
