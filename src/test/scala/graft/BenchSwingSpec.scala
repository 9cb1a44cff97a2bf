package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench artifact's prior-round memory: parse last run's per-query
  * times (full map, or a truncated driver-capture tail), gate on scale
  * factor, and classify a >2x swing as environmental noise vs a real
  * regression — so a host-noise window (r10's q139 shipping 10 s that
  * re-measured 3.9 s) can never read as a silent regression, and a real
  * regression can never hide as assumed noise. */
class BenchSwingSpec extends AnyFunSuite {

  private val fullBody =
    """{"metric":"total","value":147.541,"unit":"sec","sf":"/root/testdata/sf0.1",""" +
    """"queries":{"q01_pricing_summary":{"t":0.414,"gc_ms":0,"heap_mb":70},""" +
    """"q139_triangle_census":{"t":3.933,"gc_ms":28,"heap_mb":83}}}"""

  test("driver last-line capture: headline survives as the final parseable line of a 2000-char tail") {
    // The r15 contract (build.sbt StdoutOutput + showSuccess=false +
    // the post-spark.stop() compact print): process stdout ends with
    //   <compact>\n<big per-query line>\n<compact>\n
    // so the LAST non-empty line of the final 2000 chars is a bare
    // parseable headline object — even if a future sbt version sneaks
    // an epilogue back in, the parse must only have to skip trailing
    // non-JSON lines, never reassemble a split object.
    val compact = """{"metric":"total","value":146.785,"unit":"sec","sf":"/root/testdata/sf0.1","n_queries":192,"value_best":144.471,"gc_sec":2.847,"box_factor":1.667,"box_factor_end":1.026,"family_prime_sec":26.441,"family_primes":10,"worst5":{"q188":5.358,"q132":4.836}}"""
    val big = "{\"metric\":\"total\"," +
      (1 to 192).map(i => s""""q$i":0.${100 + i}""").mkString(",") + "}"
    def lastJson(stdout: String): Option[String] = {
      val tail = stdout.takeRight(2000)
      tail.split('\n').reverseIterator.map(_.trim)
        .find(l => l.startsWith("{") && l.endsWith("}"))
    }
    // our emission order: the headline IS the last line
    val ours = s"$compact\n$big\n$compact\n"
    assert(lastJson(ours).contains(compact))
    // robustness: a simulated sbt epilogue after the headline still
    // leaves the headline as the last complete JSON line in the tail
    val withEpilogue = ours + "[success] Total time: 261 s (04:21)\n"
    assert(lastJson(withEpilogue).contains(compact))
  }

  test("parsePriorFull reads full-name times when sf matches") {
    val m = Bench.parsePriorFull(fullBody, "/root/testdata/sf0.1")
    assert(m == Map("q01_pricing_summary" -> 0.414, "q139_triangle_census" -> 3.933))
  }

  test("parsePriorFull rejects a prior taken at a different scale factor") {
    assert(Bench.parsePriorFull(fullBody, "/root/testdata/sf0.01").isEmpty)
    assert(Bench.parsePriorFull("", "/root/testdata/sf0.1").isEmpty)
  }

  test("parsePriorFull matches sf by tag when the prior ran from a different root") {
    val moved = fullBody.replace("/root/testdata/sf0.1", "/mnt/data/sf0.1")
    assert(Bench.parsePriorFull(moved, "/root/testdata/sf0.1").nonEmpty)
  }

  test("parsePriorTail reads the real artifact shape: tail is a JSON string with escaped quotes") {
    // verbatim prefix shape of BENCH_r11.json: the "tail" field is a
    // JSON string, so every quote inside it is backslash-escaped
    val art = "{\n  \"n\": 11,\n  \"rc\": 0,\n  \"sf\": 0.1,\n  \"tail\": " +
      "\"\\\"q108\\\":2.384,\\\"q109\\\":1.358,\\\"q10\\\":1.083,\\\"q139\\\":9.969,\\\"q11"
    val m = Bench.parsePriorTail(art, "/root/testdata/sf0.1")
    assert(m("q139") == 9.969 && m("q10") == 1.083 && m("q108") == 2.384)
    assert(!m.contains("q11"), "the cut-off pair must not produce a bogus entry")
  }

  test("parsePriorTail also salvages a bare (unescaped) stdout capture") {
    val tail = """"sf": 0.1, "tail": ","q108":2.384,"q109":1.358,"q10":1.083,"q139":9.969,"q11"""
    val m = Bench.parsePriorTail(tail, "/root/testdata/sf0.1")
    assert(m("q139") == 9.969 && m("q10") == 1.083 && m("q108") == 2.384)
    assert(!m.contains("q11"), "the cut-off pair must not produce a bogus entry")
  }

  test("parsePriorTail gates on the bare-number sf (0.1 prior never compares to 0.01 run)") {
    val tail = """"sf": 0.1, "q139":9.969"""
    assert(Bench.parsePriorTail(tail, "/root/testdata/sf0.01").isEmpty)
  }

  test("parsePriorTail sf gate anchors the digits: a 0.15 prior never drives a 0.1 run") {
    val tail = """"sf": 0.15, "tail": "\"q139\":9.969""""
    assert(Bench.parsePriorTail(tail, "/root/testdata/sf0.1").isEmpty)
    assert(Bench.parsePriorTail(""""sf": 0.125, "q139":9.969""",
      "/root/testdata/sf0.1").isEmpty)
  }

  test("swing verdicts: rerun inside 2x prior is noise; both runs slow is a regression") {
    assert(Bench.swingVerdict(9.97, 3.29, 3.74) == "noise")     // r10's q139
    assert(Bench.swingVerdict(9.97, 9.80, 3.74) == "regression") // real plan change
    assert(Bench.swingVerdict(9.97, -1.0, 3.74) == "regression") // rerun errored: t1 rules
    assert(Bench.swingVerdict(7.40, 8.10, 3.74) == "noise")      // t1 itself within 2x
  }

  test("sentinel baseline parses from bench_full.json and gates on sf") {
    val body = """{"metric":"total","value":1.0,"sf":"/root/testdata/sf0.1",""" +
      """"box_factor":1.000,"sentinel_observed":{"q01_pricing_summary":0.520},""" +
      """"sentinel_baseline":{"q01_pricing_summary":0.414,"q03_top_revenue":0.702}}"""
    val m = Bench.parseSentinelBaseline(body, "/root/testdata/sf0.1")
    assert(m == Map("q01_pricing_summary" -> 0.414, "q03_top_revenue" -> 0.702))
    assert(Bench.parseSentinelBaseline(body, "/root/testdata/sf0.01").isEmpty,
      "a baseline from another scale factor must not calibrate this run")
    assert(Bench.parseSentinelBaseline("", "/root/testdata/sf0.1").isEmpty)
    // a prior file WITHOUT the field (pre-r13 shape) yields no baseline
    assert(Bench.parseSentinelBaseline(fullBody, "/root/testdata/sf0.1").isEmpty)
  }

  test("boxFactor: geometric mean of sentinel ratios, clamped to [1, 8]") {
    val base = Map("a" -> 1.0, "b" -> 2.0)
    assert(Bench.boxFactor(Map("a" -> 2.0, "b" -> 4.0), base) == 2.0) // uniform 2x window
    assert(Bench.boxFactor(Map("a" -> 1.0, "b" -> 8.0), base) == 2.0) // gmean(1,4)=2
    assert(Bench.boxFactor(Map("a" -> 0.5, "b" -> 1.0), base) == 1.0) // fast box never shrinks priors
    assert(Bench.boxFactor(Map("a" -> 100.0), base) == 8.0)           // cap: don't normalize garbage
    assert(Bench.boxFactor(Map("a" -> 2.0), Map.empty) == 1.0)        // first run: no baseline
    assert(Bench.boxFactor(Map.empty, base) == 1.0)
    assert(Bench.boxFactor(Map("a" -> 2.0), Map("a" -> 0.0)) == 1.0)  // zero baseline ignored
  }

  test("a uniformly slowed window yields ZERO false regressions once the factor applies") {
    // the r12 episode in miniature: quiet-box priors, every query
    // (including untouched ones) measuring ~2.5x slow, sentinels too
    val priors = Map("q139" -> 3.74, "q15" -> 0.82, "q159" -> 3.85)
    val slowdown = 2.5
    val factor = Bench.boxFactor(
      Map("q01" -> 0.414 * slowdown, "q03" -> 0.702 * slowdown),
      Map("q01" -> 0.414, "q03" -> 0.702))
    assert(math.abs(factor - slowdown) < 1e-9)
    priors.foreach { case (q, p) =>
      val t1 = p * slowdown; val t2 = p * slowdown * 0.95
      assert(Bench.swingVerdict(t1, t2, p, factor) == "noise",
        s"$q: untouched code on a slow box must not read as regression")
    }
    // while a REAL 5x plan regression still fires through a 2.5x window:
    // 5x-of-prior measured on a 2.5x box = 12.5x raw > 2 * 2.5 normalized
    assert(Bench.swingVerdict(3.74 * 12.5, 3.74 * 12.5, 3.74, factor) == "regression")
  }

  test("mid-run degradation: judging by the WORSE of start/end factors clears late-run inflation") {
    // the r13 live episode: quiet start (factor 1.0), a co-tenant ramps
    // mid-run, end sentinels measure 2.4x — late-run queries inflated
    // ~2.4x must judge against the end factor, not the start's 1.0
    val base = Map("q01" -> 0.4, "q03" -> 2.0)
    val startF = Bench.boxFactor(Map("q01" -> 0.41, "q03" -> 1.98), base)
    val endF = Bench.boxFactor(Map("q01" -> 0.96, "q03" -> 4.8), base)
    val judge = math.max(startF, endF)
    assert(startF < 1.05 && endF > 2.3)
    assert(Bench.swingVerdict(t1 = 2.0, t2 = 1.9, prior = 0.8, factor = judge) == "noise",
      "a 2.4x-inflated late-run query must not read as regression")
    assert(Bench.swingVerdict(t1 = 2.0, t2 = 1.9, prior = 0.8, factor = startF) == "regression",
      "(the start-only factor would have false-flagged it)")
  }

  test("probeCommand keeps add-opens/heap/-D args and drops everything else") {
    val jvmArgs = Seq(
      "--add-opens", "java.base/java.lang=ALL-UNNAMED",
      "--add-opens=java.base/java.nio=ALL-UNNAMED",
      "-Xmx16g", "-Dspark.ui.enabled=false",
      "-javaagent:/opt/sbt/agent.jar", "-XX:+UseG1GC", "-classpath", "/ignored")
    val cmd = Bench.probeCommand("/opt/jdk", jvmArgs, "/cp/a.jar:/cp/b.jar")
    assert(cmd.head == "/opt/jdk/bin/java")
    assert(cmd.containsSlice(Seq("--add-opens", "java.base/java.lang=ALL-UNNAMED")))
    assert(cmd.contains("--add-opens=java.base/java.nio=ALL-UNNAMED"))
    assert(cmd.contains("-Xmx16g") && cmd.contains("-Dspark.ui.enabled=false"))
    assert(!cmd.exists(_.startsWith("-javaagent")), "agent flags must not leak into the probe")
    assert(!cmd.contains("-XX:+UseG1GC") && !cmd.contains("/ignored"))
    assert(cmd.takeRight(3) == Seq("-cp", "/cp/a.jar:/cp/b.jar", "graft.Bench"))
  }

  test("probe output parse: -1 failure sentinel is NO measurement, never a fast run") {
    // healthy child
    assert(Bench.parseProbeOutput("warmup noise\nPROBE q84_dup_clusters 2.341\n")
      .contains(2.341))
    // crashed timed run: the child prints the sentinel; the parent must
    // treat the fork as failed — a 'fast' -1 would let a broken fork
    // reclassify a genuine regression as noise (the r13 ADVICE finding)
    assert(Bench.parseProbeOutput("PROBE q84_dup_clusters -1.000\n").isEmpty)
    // no PROBE line at all (fork died before printing)
    assert(Bench.parseProbeOutput("OutOfMemoryError\n").isEmpty)
  }

  test("value_norm: damped-exponent normalization lands within 10% of measured quiet totals") {
    // The r16 calibration pairs (contended driver run + quiet-window
    // ground truth on the same frozen tree) are the fit's truth set; a
    // future β change that breaks EITHER round's reproduction fails
    // here. Linear division (β=1) read 85.6 for a measured 126.2 in
    // r16 — the exact over-correction this fit closes.
    val r15 = Bench.valueNorm(163.263, 1.486, 1.204) // quiet truth: 141.99
    assert(math.abs(r15 - 141.99) / 141.99 < 0.10, s"r15 norm=$r15")
    val r16 = Bench.valueNorm(162.1, 2.351, 1.527) // quiet truth: 126.21
    assert(math.abs(r16 - 126.21) / 126.21 < 0.10, s"r16 norm=$r16")
    // a quiet window normalizes to itself
    assert(Bench.valueNorm(142.0, 1.0, 1.0) == 142.0)
    // degenerate (hand-edited) sub-1 factors never INFLATE the number
    assert(Bench.valueNorm(100.0, 0.5, 0.25) == 100.0)
    // the definitive-artifact gate constants the wait loop runs on
    assert(Bench.QuietFactorGate == 1.2 && Bench.MaxQuietWaits == 5)
  }

  test("noisy flag: exhausted wait gate + loud start sentinel, or a >2x end sentinel") {
    // r16's committed artifact: gate exhausted (300 s), start 2.351 —
    // downstream tooling must see noisy=true instead of eyeballing it
    assert(Bench.noisyFlag(300, 2.351, 1.527))
    // r15's committed artifact: no wait (pre-gate round), 1.486 start —
    // the gate never ran out, so the flag stays down (value_norm covers it)
    assert(!Bench.noisyFlag(0, 1.486, 1.204))
    // quiet run
    assert(!Bench.noisyFlag(0, 1.0, 1.009))
    // mid-run co-tenant ramp: quiet start, >2x end
    assert(Bench.noisyFlag(0, 1.0, 2.4))
    // waited but the window QUIETED before the budget ran out
    assert(!Bench.noisyFlag(120, 1.05, 1.1))
  }

  test("committed quiet artifact (BENCH_QUIET_r*.json) keeps the compact headline schema") {
    // the schema contract for BENCH_QUIET artifacts: one compact JSON
    // object with the headline fields cross-round tooling reads — the
    // same shape Bench prints as its first/last stdout line
    val committed = new java.io.File(".").listFiles()
      .filter(f => f.getName.matches("BENCH_QUIET_r\\d+\\.json"))
    committed.foreach { f =>
      val body = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8").trim
      assert(body.startsWith("{") && body.endsWith("}"), f.getName)
      for (field <- Seq("\"metric\":\"total\"", "\"value\":", "\"value_norm\":",
          "\"n_queries\":", "\"box_factor\":", "\"box_factor_end\":",
          "\"noisy\":", "\"sf\":", "\"worst5\":"))
        assert(body.contains(field), s"${f.getName} missing $field")
      // the artifact's whole point: it was taken on a quiet window
      val bf = raw""""box_factor":([0-9.]+)""".r.findFirstMatchIn(body).get.group(1).toDouble
      assert(bf <= 1.05, s"${f.getName} box_factor $bf — not a quiet-window artifact")
      assert(body.contains("\"noisy\":false"), s"${f.getName} flagged noisy")
      // r18+ artifacts (r17 VERDICT #7): the FILE carries the full
      // per-query map — full query names, one number each, count
      // agreeing with n_queries — so a single query's cross-round
      // adjudication never again depends on it making worst5
      val round = f.getName.replaceAll("[^0-9]", "").toInt
      if (round >= 18) {
        val qm = raw""""queries":\{([^}]*)\}""".r.findFirstMatchIn(body)
        assert(qm.isDefined, s"${f.getName} missing the per-query map")
        val entries = qm.get.group(1).split(',').filter(_.nonEmpty)
        val n = raw""""n_queries":(\d+)""".r.findFirstMatchIn(body).get.group(1).toInt
        assert(entries.length == n,
          s"${f.getName} queries map has ${entries.length} entries, n_queries=$n")
        assert(entries.forall(_.matches(""""q\d+[a-z0-9_]*":\d+\.\d+""")),
          s"${f.getName} queries map must be full-name -> seconds")
      }
    }
  }

  test("last-run per-query artifact (bench_perq_last_c*.json) is driver-parsable on its own") {
    // r18 VERDICT #2: the driver's 2000-char stdout tail cannot carry a
    // 206-entry map, so EVERY unfiltered run writes the full map to
    // bench_perq_last_c<cpus>.json — unconditionally (noise rides
    // inside as box_factor/noisy, unlike the quiet-gated artifact).
    // This pins the schema a cross-round/scaling consumer needs: the
    // headline fields, the window-quality fields, and a per-query map
    // whose entry count equals n_queries.
    val written = new java.io.File(".").listFiles()
      .filter(f => f.getName.matches("bench_perq_last_c\\d+\\.json"))
    written.foreach { f =>
      val body = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8").trim
      assert(body.startsWith("{") && body.endsWith("}"), f.getName)
      for (field <- Seq("\"metric\":\"total\"", "\"value\":", "\"n_queries\":",
          "\"box_factor\":", "\"box_factor_end\":", "\"noisy\":", "\"sf\":"))
        assert(body.contains(field), s"${f.getName} missing $field")
      val qm = raw""""queries":\{([^}]*)\}""".r.findFirstMatchIn(body)
      assert(qm.isDefined, s"${f.getName} missing the per-query map")
      val entries = qm.get.group(1).split(',').filter(_.nonEmpty)
      val n = raw""""n_queries":(\d+)""".r.findFirstMatchIn(body).get.group(1).toInt
      assert(entries.length == n,
        s"${f.getName} queries map has ${entries.length} entries, n_queries=$n")
      assert(entries.forall(_.matches(""""q\d+[a-z0-9_]*":\d+\.\d+""")),
        s"${f.getName} queries map must be full-name -> seconds")
    }
  }

  test("probe -2 marks a regression verdict whose probe budget was exhausted") {
    val exhausted = Bench.swingEntry("q51", 4.2, 4.1, 1.0, -2.0, "regression")
    assert(exhausted.contains("\"probe\":-2.000"), exhausted)
    assert(exhausted.contains("\"verdict\":\"regression\""), exhausted)
  }

  test("swing entry distinguishes not-escalated (null) from failed forks (-1)") {
    // never escalated: the rerun already adjudicated — probe is null,
    // NOT -1, so an artifact reader can't mistake "not needed" for
    // "three forks failed" (the r15 q158 misread)
    val idle = Bench.swingEntry("q158", 5.429, 3.974, 2.022, Double.NaN, "noise")
    assert(idle.contains("\"probe\":null"), idle)
    // escalated and every fork failed: -1 stays, verdict untouched
    val broken = Bench.swingEntry("q158", 5.429, 5.1, 2.022, -1.0, "regression")
    assert(broken.contains("\"probe\":-1.000"), broken)
    // escalated with a healthy median: the number ships
    val ok = Bench.swingEntry("q158", 5.429, 5.1, 2.022, 2.016, "noise")
    assert(ok.contains("\"probe\":2.016"), ok)
    // all three remain parseable JSON fragments
    Seq(idle, broken, ok).foreach { e =>
      val json = "{" + e + "}"
      assert(json.count(_ == '{') == json.count(_ == '}'), json)
    }
  }
}
