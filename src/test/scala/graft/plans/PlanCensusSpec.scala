package graft.plans

import graft.{SparkEntry, SparkSpecBase}

/** Registry-wide plan-shape census: EVERY query's optimized logical
  * plan is pinned against a recorded golden shape
  * (`src/test/resources/plan_census.tsv`), so a Spark upgrade, an AQE
  * behavior change, or an accidental edit can't silently regress a
  * plan the bench wouldn't catch under host noise. The targeted gates
  * in [[PlanShapeSpec]] assert WHY individual shapes matter; this
  * census asserts that NOTHING moves unnoticed.
  *
  * The recorded shape per query:
  *  - leaf histogram: parquet/file scans by table name (scan count —
  *    "q178 reads documents ONCE" is `documents=1`), persisted-cache
  *    leaves (`cache=N`), local/driver relations (`local=N`)
  *  - logical node counts that encode scale properties: `cross` (Join
  *    Cross — 1-row scalar broadcasts legitimately cross-join; the
  *    COUNT is pinned so a corpus-level cartesian can't hide behind
  *    them), `expand` (Expand — the count-distinct/grouping-sets
  *    blowup the q178 family avoids), `window`, `generate` (explodes),
  *    `join` (total)
  *
  * The census is computed on a cleared cache, at the spec SF, in
  * registry order — deterministic for a fixed Spark version. To
  * re-record after an INTENTIONAL plan change:
  *   GRAFT_REGEN_PLAN_CENSUS=1 sbt "testOnly graft.plans.PlanCensusSpec"
  * then review the diff of plan_census.tsv like any other code change.
  */
class PlanCensusSpec extends SparkSpecBase {

  private val censusPath = java.nio.file.Paths.get("src/test/resources/plan_census.tsv")

  private def shapeOf(name: String): String = {
    spark.catalog.clearCache()
    val df = SparkEntry.queries(name)(spark, sfDir)
    val lp = df.queryExecution.optimizedPlan
    val leafCounts = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    lp.collectLeaves().foreach {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        val table = lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.headOption
              .map(_.getName.replaceAll("\\.[A-Za-z0-9]+$", ""))
              .getOrElse("file")
          case other => other.getClass.getSimpleName
        }
        leafCounts(table) += 1
      case l =>
        l.getClass.getSimpleName match {
          case "InMemoryRelation"            => leafCounts("cache") += 1
          case "LocalRelation" | "OneRowRelation" | "LogicalRDD" => leafCounts("local") += 1
          case "Range"                       => leafCounts("range") += 1
          case other                         => leafCounts(other) += 1
        }
    }
    var cross, joins, expand, window, generate = 0
    lp.foreach { n =>
      n.getClass.getSimpleName match {
        case "Join" =>
          joins += 1
          if (n.toString.startsWith("Join Cross")) cross += 1
        case "Expand"   => expand += 1
        case "Window"   => window += 1
        case "Generate" => generate += 1
        case _          =>
      }
    }
    val leaves = leafCounts.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString(",")
    s"leaves[$leaves] join=$joins cross=$cross expand=$expand window=$window generate=$generate"
  }

  test("every registry query matches its recorded plan shape") {
    val regen = sys.env.contains("GRAFT_REGEN_PLAN_CENSUS")
    val recorded: Map[String, String] =
      if (java.nio.file.Files.exists(censusPath))
        scala.io.Source.fromFile(censusPath.toFile, "UTF-8").getLines()
          .filter(_.nonEmpty).map { line =>
            val Array(n, s) = line.split("\t", 2); n -> s
          }.toMap
      else Map.empty

    val names = SparkEntry.registry.map(_.name) // registry order: deterministic
    val current = names.map(n => n -> shapeOf(n))

    if (regen) {
      val body = current.map { case (n, s) => s"$n\t$s" }.mkString("", "\n", "\n")
      java.nio.file.Files.createDirectories(censusPath.getParent)
      java.nio.file.Files.write(censusPath, body.getBytes("UTF-8"))
      info(s"recorded ${current.size} plan shapes to $censusPath")
    } else {
      assert(recorded.nonEmpty,
        s"no recorded census at $censusPath — run with GRAFT_REGEN_PLAN_CENSUS=1 once")
      val problems = current.flatMap { case (n, s) =>
        recorded.get(n) match {
          case None => Some(s"$n: NOT RECORDED (new query? regen the census)")
          case Some(r) if r != s => Some(s"$n: shape drifted\n  recorded: $r\n  current:  $s")
          case _ => None
        }
      } ++ recorded.keys.filterNot(names.contains)
        .map(n => s"$n: recorded but no longer registered (regen the census)")
      assert(problems.isEmpty,
        s"${problems.size} plan-shape drift(s):\n" + problems.mkString("\n"))
    }
  }
}
