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
  *
  * Round 14 added a second failure mode: the driver's artifact ARRIVED
  * but EMPTY (`CORRECTNESS_r14.json` = `{}`, `BENCH_r14.json`
  * `"parsed": null`) — the capture hiccuped and the round's hard
  * correctness signal silently vanished. The check now also flags an
  * empty newest CORRECTNESS artifact and points at the committed
  * self-check (`CORRECTNESS_SELF_r{N}.json`, written by
  * `scripts/oracle_check.py --json`) as the surviving evidence.
  */
object RoundArtifacts {

  def warnIfStale(repoRoot: String = "."): Unit = try {
    val dir = new java.io.File(repoRoot)
    val corr = Option(dir.list()).getOrElse(Array.empty[String])
      .flatMap { n =>
        "^CORRECTNESS_r(\\d+)\\.json$".r.findFirstMatchIn(n)
          .map(_.group(1).toInt)
      }
    if (corr.nonEmpty) {
      val newest = new java.io.File(dir,
        f"CORRECTNESS_r${corr.max}%02d.json")
      val body =
        try java.nio.file.Files.readString(newest.toPath).trim
        catch { case _: Throwable => "" }
      if (body.isEmpty || body == "{}") {
        val self = new java.io.File(dir,
          f"CORRECTNESS_SELF_r${corr.max}%02d.json")
        System.err.println(
          s"[round-artifacts] WARNING: ${newest.getName} is EMPTY — the " +
            "driver's correctness capture hiccuped; the round's hard " +
            "signal is missing. " +
            (if (self.isFile)
              s"Use the committed self-check ${self.getName} instead."
            else
              "Run scripts/oracle_check.py --json CORRECTNESS_SELF_" +
                f"r${corr.max}%02d.json over a fresh graft.Verify dump " +
                "and COMMIT it so the round stays verifiable."))
      }
    }
    val verdict = new java.io.File(dir, "VERDICT.md")
    if (corr.nonEmpty && verdict.isFile) {
      val head = {
        // explicit lenient UTF-8: the default-charset Source.fromFile
        // threw MalformedInputException on the verdict's em-dashes
        // under a non-UTF-8 locale and the outer catch silently ate
        // the whole staleness check
        val codec = scala.io.Codec.UTF8
          .onMalformedInput(java.nio.charset.CodingErrorAction.REPLACE)
        val src = scala.io.Source.fromFile(verdict)(codec)
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
