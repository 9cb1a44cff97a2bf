package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every registered query on SPARK_GRAFT_SF_DIR,
  * one JSON line on stdout. A small untimed warmup first so JVM/codegen
  * startup isn't attributed to whichever query happens to run first.
  *
  * The artifact is self-diagnosing: it records its own conditions (heap
  * max, cpu count, SPARK_DRIVER_MEM) and per-query GC time + post-sweep
  * heap, and any query slower than 3x the suite median gets an automatic
  * second timed run with both times reported — so a one-off environmental
  * stall (cold page cache, concurrent activity) is distinguishable from a
  * real plan regression without a manual rerun.
  */
object Bench {
  private def gcMillis(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).sum
  }

  /** Prior-run per-query seconds, for the swing gate: prefer the full
    * map this main wrote last run (`bench_full.json` in cwd — survives
    * across rounds in the repo workspace), else best-effort re-parse of
    * the newest driver artifact's truncated stdout tail (qNN-prefix
    * keys). Only a prior taken at the SAME scale factor is comparable,
    * so both paths gate on the sf recorded in the artifact. No JSON dep
    * in main: regex extraction over the flat shapes this file emits. */
  /** Extract per-query seconds from a prior `bench_full.json` body —
    * full-name keys — provided its recorded sf matches. */
  private[graft] def parsePriorFull(full: String, sfDir: String): Map[String, Double] = {
    val sfTag = sfDir.split('/').last // "sf0.1"
    val priorSf = raw""""sf":"([^"]+)"""".r.findFirstMatchIn(full).map(_.group(1))
    if (priorSf.exists(p => p == sfDir || p.split('/').last == sfTag))
      raw""""(q[0-9]+[a-z]?_[a-z0-9_]+)":\{"t":([0-9.]+)""".r
        .findAllMatchIn(full).map(m => m.group(1) -> m.group(2).toDouble).toMap
    else Map.empty
  }

  /** Extract per-query seconds from a driver BENCH_r artifact (qNN
    * prefix keys; the captured stdout tail may be truncated mid-line —
    * whatever pairs survive are still usable priors). The artifact's
    * "tail" field is a JSON STRING, so its quotes arrive
    * backslash-escaped (`\"q103\":1.441`) — the key regex accepts both
    * the escaped and bare forms. The driver records sf as a bare
    * number; the gate compares digits, anchored so a 0.1 run never
    * accepts a 0.15 prior. */
  private[graft] def parsePriorTail(s: String, sfDir: String): Map[String, Double] = {
    val digits = java.util.regex.Pattern.quote(sfDir.split('/').last.stripPrefix("sf"))
    // anchor rejects a following digit OR '.', so an integer-sf run
    // (sf1) never accepts a fractional prior (1.5)
    if (raw""""sf"\s*:\s*$digits(?![0-9.])""".r.findFirstIn(s).isEmpty) Map.empty
    else raw"""\\?"(q[0-9]+[a-z]?)\\?":([0-9.]+)""".r
      .findAllMatchIn(s).map(m => m.group(1) -> m.group(2).toDouble).toMap
  }

  /** "noise" when the best observed run is back inside 2x prior (a
    * one-off environmental window); "regression" when even the rerun is
    * slow. t2 < 0 means the rerun itself errored — judge on t1 alone. */
  private[graft] def swingVerdict(t1: Double, t2: Double, prior: Double): String = {
    val best = if (t2 >= 0) math.min(t1, t2) else t1
    if (best <= 2 * prior) "noise" else "regression"
  }

  private[graft] def loadPrior(sfDir: String): Map[String, Double] = {
    import scala.jdk.CollectionConverters._
    def read(p: java.nio.file.Path): String =
      try new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      catch { case _: Throwable => "" }
    val fromFull = parsePriorFull(read(java.nio.file.Paths.get("bench_full.json")), sfDir)
    if (fromFull.nonEmpty) return fromFull
    // fallback: newest BENCH_r*.json tail (driver capture, may be cut);
    // newest by the PARSED round number — lexicographic puts r100
    // before r11
    // round digits capped at 9 so the toLong can never throw and nuke
    // the whole listing (an unparsable stray name just doesn't match)
    val benches =
      try java.nio.file.Files.list(java.nio.file.Paths.get(".")).iterator().asScala
        .filter(_.getFileName.toString.matches("BENCH_r\\d{1,9}\\.json")).toSeq
        .sortBy(_.getFileName.toString.replaceAll("[^0-9]", "").toLong)
      catch { case _: Throwable => Seq.empty }
    benches.lastOption.map(p => parsePriorTail(read(p), sfDir)).getOrElse(Map.empty)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warmup: touch every table scan + exercise codegen/shuffle machinery.
    val t = Tables(spark, sfDir)
    Seq(t.lineitem, t.orders, t.customer, t.events, t.documents, t.embeddings)
      .foreach(df => df.limit(1).count())
    SparkEntry.queries.get("q01_pricing_summary").foreach(f => f(spark, sfDir).count())

    // Input sanity gate (the r7 q18=0.034s lesson): a physical-type or
    // schema drift that empties a table — or nulls the event-time
    // column every event-time query filters on — silently DEFLATES the
    // numbers instead of failing them. A benchmark that can quietly
    // measure nothing is worse than one that crashes: fail fast, so the
    // driver records an error, never a fake-fast total.
    {
      import org.apache.spark.sql.functions.col
      val checks: Seq[(String, Long)] = Seq(
        "lineitem" -> t.lineitem.count(),
        "orders" -> t.orders.count(),
        "events" -> t.events.count(),
        "events.ts non-null" -> t.events.filter(col("ts").isNotNull).count(),
        "documents" -> t.documents.count(),
        "embeddings" -> t.embeddings.count())
      val degenerate = checks.filter(_._2 == 0L)
      require(degenerate.isEmpty,
        s"degenerate bench input at $sfDir — empty: " +
          degenerate.map(_._1).mkString(", ") +
          " (a no-op load would deflate every dependent query's time)")
      // ts must also be a real TIMESTAMP after normalization, or the
      // event-time queries degrade to no-op casts
      require(t.events.schema("ts").dataType ==
        org.apache.spark.sql.types.TimestampType,
        s"events.ts normalized to ${t.events.schema("ts").dataType}, expected TIMESTAMP")
    }

    // Isolation (untimed — the metric is the sum of per-query dt): drop
    // everything a query left behind so leftovers can't distort a later
    // query's memory budget. Three layers, because each covers storage
    // the others can't reach:
    //  - clearCache(): Dataset persists registered in the CacheManager
    //    (e.g. allPairsJaccardOn's MEMORY_AND_DISK corpus);
    //  - getPersistentRDDs sweep: RDD-level persists the CacheManager
    //    never sees — localCheckpoint() blocks (ConnectedComponents'
    //    final labels generation) live here;
    //  - System.gc(): broadcasts/shuffle state free via the weak-ref
    //    ContextCleaner, which only runs when the JVM collects — 113
    //    queries accumulate enough to age the heap otherwise (the
    //    round-4 in-run-vs-isolated 3x drift on heavy queries).
    def sweep(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
    }

    val rt = Runtime.getRuntime
    // timed run + untimed sweep; returns (sec, gcMsDuringRun, heapMbAfterSweep)
    def runOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : (Double, Long, Long) = {
      val gc0 = gcMillis()
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      val gcd = gcMillis() - gc0
      sweep()
      (dt, gcd, (rt.totalMemory() - rt.freeMemory()) / (1024 * 1024))
    }

    // Optional comma-separated query filter for local iteration, e.g.
    // SPARK_GRAFT_QUERIES=q61,q78 — driver runs unfiltered. Matches the
    // full name or the qNNN id (exact, so "q11" never selects q110_*).
    val filter = sys.env.get("SPARK_GRAFT_QUERIES").map(_.split(',').map(_.trim).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (n, _) =>
      filter.forall(f => f.contains(n) || f.contains(n.takeWhile(_ != '_')))
    }
    val results = selected.map { case (name, fn) => name -> runOnce(fn) }

    // Outlier re-run: any query slower than 3x the suite median (with a
    // 2.5 s floor — the suite median is ~0.5 s of scheduling overhead,
    // and sub-3 s queries aren't the anomaly class) runs a second time,
    // timed — if t2 ~= median-scale, the first number was environmental
    // (cold cache, concurrent load, GC debt), not a plan property.
    val times = results.map(_._2._1).sorted
    val median = if (times.isEmpty) 0.0 else times(times.length / 2)
    val outlierCut = math.max(3 * median, 2.5)
    val medianRerun: Map[String, Double] = results.collect {
      case (name, (dt, _, _)) if median > 0 && dt > outlierCut =>
        name -> selected.collectFirst { case (`name`, fn) => runOnce(fn)._1 }.getOrElse(-1.0)
    }.toMap

    // Prior-round memory (the r10 q139 lesson: a 10 s noise-window
    // number shipped as the headline because the auto-rerun had nothing
    // to compare against). Any query >2x its prior-run time — even if
    // it ducked the 3x-median cut — gets a rerun, and the swing ships
    // with both times, the prior, and a verdict: "noise" when the best
    // observed run is back inside 2x prior (a one-off environmental
    // window), "regression" when even the rerun is slow (a real plan
    // change that must not hide as assumed noise). Sub-second queries
    // are below the scheduling-jitter floor and never flagged.
    val prior = loadPrior(sfDir)
    def priorOf(name: String): Option[Double] =
      prior.get(name).orElse(prior.get(name.takeWhile(_ != '_'))).filter(_ > 0)
    val swungNames = results.collect {
      case (name, (dt, _, _))
        if dt > 1.0 && priorOf(name).exists(p => dt > 2 * p) => name
    }
    val swingRerun: Map[String, Double] = swungNames
      .filterNot(medianRerun.contains)
      .map(name => name ->
        selected.collectFirst { case (`name`, fn) => runOnce(fn)._1 }.getOrElse(-1.0))
      .toMap
    val rerun = medianRerun ++ swingRerun
    val swings: Seq[(String, (Double, Double, Double, String))] = swungNames.map { name =>
      val t1 = results.collectFirst { case (`name`, (dt, _, _)) => dt }.getOrElse(-1.0)
      val t2 = rerun.getOrElse(name, -1.0)
      val p = priorOf(name).getOrElse(-1.0)
      name -> (t1, t2, p, swingVerdict(t1, t2, p))
    }

    def f3(v: Double): String = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val total = results.map(_._2._1).sum
    // total with each outlier's time replaced by its best observed run —
    // the environment-independent number when t2 << t1 (one-off stall)
    val totalAdj = results.map { case (k, (dt, _, _)) =>
      rerun.get(k).filter(_ >= 0).map(math.min(dt, _)).getOrElse(dt)
    }.sum
    val gcSec = results.map(_._2._2).sum / 1000.0
    val env = s""""env":{"driver_mem":"${sys.env.getOrElse("SPARK_DRIVER_MEM", "default")}"""" +
      s""","cpus":"$cpus","procs":${rt.availableProcessors()}""" +
      s""","heap_max_mb":${rt.maxMemory() / (1024 * 1024)}}"""
    val rerunJson = rerun.toSeq.sortBy(_._1).map { case (k, t2) =>
      val t1 = results.collectFirst { case (`k`, (dt, _, _)) => dt }.getOrElse(-1.0)
      "\"" + k.takeWhile(_ != '_') + "\":{\"t1\":" + f3(t1) + ",\"t2\":" + f3(t2) + "}"
    }.mkString("{", ",", "}")
    val swingsJson = swings.sortBy(_._1).map { case (k, (t1, t2, p, verdict)) =>
      "\"" + k.takeWhile(_ != '_') + "\":{\"t1\":" + f3(t1) + ",\"t2\":" + f3(t2) +
        ",\"prior\":" + f3(p) + ",\"verdict\":\"" + verdict + "\"}"
    }.mkString("{", ",", "}")

    // Full-name per-query map goes to a file (capture-size-proof);
    // stdout gets ONE compact line — query keys truncated to their qNN
    // prefix — small enough (~2 KB for 113 queries) that a tail capture
    // of the run log retains the whole line, headline first.
    val full = results.map { case (k, (dt, gc, heap)) =>
      "\"" + k + "\":{\"t\":" + f3(dt) + ",\"gc_ms\":" + gc + ",\"heap_mb\":" + heap + "}"
    }.mkString("{", ",", "}")
    val fullLine = s"""{"metric":"total","value":${f3(total)},"unit":"sec","sf":"$sfDir"""" +
      s""","n_queries":${results.size},"value_best":${f3(totalAdj)},"gc_sec":${f3(gcSec)},$env,"rerun":$rerunJson,"swings":$swingsJson,"queries":$full}"""
    try java.nio.file.Files.write(java.nio.file.Paths.get("bench_full.json"),
      (fullLine + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () }
    val qs = results.map { case (k, (dt, _, _)) => "\"" + k.takeWhile(_ != '_') + "\":" + f3(dt) }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","sf":"$sfDir","n_queries":${results.size},"value_best":${f3(totalAdj)},"gc_sec":${f3(gcSec)},$env,"rerun":$rerunJson,"swings":$swingsJson,"queries":$qs}""")
    System.out.flush()
    Thread.sleep(200) // let stdout drain before shutdown log noise
    spark.stop()
  }
}
