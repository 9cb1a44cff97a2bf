package graft.sources

import java.nio.file.{Files, Paths}

import graft.Tables
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed persistence of the `documents` corpus (r16 VERDICT #4; the
  * SCALE.md "repeated-join keys → bucketing" prescription made real):
  * pipelines that re-join the corpus on `doc_id` across passes —
  * snapshot reconciliation (q166), and at cluster scale any
  * base-vs-delta ingest loop — pay one hash exchange of the FULL
  * corpus per pass when reading plain parquet. Persisting the corpus
  * `bucketBy(N, "doc_id")` once makes every subsequent doc_id
  * equi-join between reads of the table exchange-free: the scan itself
  * reports hash-partitioned output, so a corpus-vs-corpus sort-merge
  * join plans with NO shuffle under either child (BucketedJoinSpec
  * gates the plan).
  *
  * Ensure-once semantics: the table is written a single time per
  * (corpus content, bucket count) and reused across queries, sessions,
  * and JVMs —
  *  - freshness is keyed by a CONTENT STAMP (file names/sizes/mtimes of
  *    the source parquet) stored beside the table, so a regenerated
  *    corpus rebuilds the layout instead of silently serving stale
  *    rows, while an unchanged corpus never rewrites;
  *  - a new JVM whose in-memory catalog lacks the table re-registers
  *    the existing files as an external bucketed table (bucket ids ride
  *    the file names), paying a metadata DDL, not a write;
  *  - the table name is STABLE for a given (corpus dir, bucket count)
  *    — no stamp hash in the name — so plan-census leaf histograms stay
  *    deterministic across data regenerations.
  *
  * At 100 TB this is the standard "materialize the prepared corpus
  * once per campaign" step: one bounded write buys exchange-freedom
  * for every downstream doc_id pass.
  */
object BucketedCorpus {

  private val Root = "/tmp/graft_bucketed"

  /** Content stamp of the source corpus: names/sizes/mtimes of the
    * parquet file(s). Cheap (metadata only), and any regeneration —
    * even same-size — bumps mtime. */
  private def stamp(dir: String): String = {
    val f = new java.io.File(dir, "documents.parquet")
    val parts =
      if (f.isDirectory)
        f.listFiles().map(x => s"${x.getName}:${x.length}:${x.lastModified}").sorted
      else Array(s"${f.getName}:${f.length}:${f.lastModified}")
    parts.mkString("|")
  }

  private def tag(dir: String): String =
    dir.split('/').filter(_.nonEmpty).last.replaceAll("[^A-Za-z0-9_]", "p")

  /** The documents corpus as a doc_id-bucketed table (ensure-once).
    * Bucket count follows the session's shuffle partitioning so the
    * bucketed scan's parallelism matches the rest of the plan. */
  def documents(spark: SparkSession, dir: String): DataFrame = synchronized {
    val buckets = spark.sessionState.conf.numShufflePartitions
    val name = s"docs_by_docid_${tag(dir)}_b$buckets"
    val path = s"$Root/$name"
    val stampPath = Paths.get(s"$path.stamp")
    val want = stamp(dir)
    val fresh = Files.exists(stampPath) &&
      new String(Files.readAllBytes(stampPath), "UTF-8") == want &&
      new java.io.File(path, "_SUCCESS").exists()
    if (!fresh) {
      new java.io.File(Root).mkdirs()
      spark.sql(s"DROP TABLE IF EXISTS $name")
      Tables(spark, dir).documents.write
        .bucketBy(buckets, "doc_id").sortBy("doc_id")
        .mode(SaveMode.Overwrite)
        .option("path", path)
        .saveAsTable(name)
      Files.write(stampPath, want.getBytes("UTF-8"))
    } else if (!spark.catalog.tableExists(name)) {
      // files are current but this JVM's in-memory catalog has never
      // seen them: re-register as an external bucketed table (bucket
      // ids are encoded in the file names Spark wrote)
      val schema = spark.read.parquet(path).schema
      val cols = schema.fields
        .map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ")
      spark.sql(s"CREATE TABLE $name ($cols) USING PARQUET " +
        s"CLUSTERED BY (doc_id) SORTED BY (doc_id) INTO $buckets BUCKETS " +
        s"LOCATION '$path'")
    }
    spark.table(name)
  }
}
