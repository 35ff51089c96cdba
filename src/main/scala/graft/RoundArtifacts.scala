package graft

/** Round-artifact staleness check, run at the top of Verify and Bench.
  *
  * The builder steers each round by VERDICT.md; the round-6 incident
  * (judge session died before writing it) left a round-3 verdict beside
  * a round-5 CORRECTNESS artifact and the whole round was spent on
  * nothing. The relationship that holds when the chain is intact:
  * VERDICT.md's round header >= (max N of CORRECTNESS_r{N}.json) - 1 —
  * the verdict judging round N lands next to CORRECTNESS_r{N}. Anything
  * older means the verdict is stale and the round log should say so
  * loudly where the builder (and the judge) will see it.
  */
object RoundArtifacts {

  def warnIfStale(repoRoot: String = "."): Unit = try {
    val dir = new java.io.File(repoRoot)
    val corr = Option(dir.list()).getOrElse(Array.empty[String])
      .flatMap { n =>
        "^CORRECTNESS_r(\\d+)\\.json$".r.findFirstMatchIn(n)
          .map(_.group(1).toInt)
      }
    val verdict = new java.io.File(dir, "VERDICT.md")
    if (corr.nonEmpty && verdict.isFile) {
      val head = {
        val src = scala.io.Source.fromFile(verdict)
        try src.getLines().take(3).mkString("\n") finally src.close()
      }
      "round\\s+(\\d+)".r.findFirstMatchIn(head).map(_.group(1).toInt) match {
        case Some(vr) if vr < corr.max - 1 =>
          System.err.println(
            s"[round-artifacts] WARNING: VERDICT.md is round $vr but " +
              f"CORRECTNESS_r${corr.max}%02d exists — the verdict is " +
              "STALE (judge session likely died); steer by the newest " +
              "CORRECTNESS/BENCH artifacts, not VERDICT.md")
        case None =>
          System.err.println(
            "[round-artifacts] WARNING: VERDICT.md has no parseable " +
              "round header")
        case _ => ()
      }
    }
  } catch { case _: Throwable => () } // diagnostics must never break a run
}
