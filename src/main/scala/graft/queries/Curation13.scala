package graft.queries

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Thirteenth curation batch: dataset-release hygiene stages downstream
  * of the q172 hash split — the train/test leakage audit every
  * benchmark-credible corpus release runs (do duplicate clusters
  * straddle the split?), the mojibake/encoding-anomaly repair census a
  * web crawl needs before tokenization (UTF-8-as-Latin-1 double
  * encodings, Windows-1252 smart quotes, replacement chars, NBSP), and
  * the context-length packing-efficiency curve that picks the sequence
  * length a training run should pack to.
  *
  * Reference scope note: the reference pipeline framework
  * (/root/reference/motorway) has no relational curation surface —
  * these extend the engine along SURVEY §2's "LLM-data-pipeline" axis,
  * with every query oracle-gated against DuckDB.
  */
object Curation13 {

  private def q(name: String, oracle: String)(f: (SparkSession, String) => DataFrame) =
    GraftQuery(name, f, Some(oracle))

  /** The q172 split rule, shared verbatim by every query that audits
    * the split: first 2 hex chars of md5(doc_id:source), 13/13/230 of
    * 256 buckets → val/test/train. */
  private[graft] def splitCol(docId: Column, source: Column): Column = {
    val h = substring(md5(concat(docId.cast("string"), lit(":"), source)), 1, 2)
    when(h < "0d", "val").when(h < "1a", "test").otherwise("train")
  }
  private[queries] val splitSqlExpr =
    "CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':' || source), 1, 2) < '0d'" +
      " THEN 'val'" +
      " WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':' || source), 1, 2) < '1a'" +
      " THEN 'test' ELSE 'train' END"

  // -- q174: train/test split leakage audit ------------------------------
  // A hash split is only leak-free at the GRAIN it hashes: near-identical
  // documents land in different splits whenever their ids differ, so a
  // release audit groups the corpus by content fingerprint and asks
  // which duplicate clusters straddle the split. The synthetic corpus
  // has no natural duplicates at the gate SFs, so — per the
  // q120/q165/q170 augmentation discipline — duplicate clusters are
  // DERIVED deterministically in both engines: docs with
  // doc_id % 25 ∈ {0, 7, 13} adopt the text of their bucket leader
  // (doc_id − doc_id % 25; left join, own text if the leader id is
  // absent), everyone else keeps their own text. Output: per split-set
  // census of duplicate groups (split_set = '+'-joined sorted distinct
  // splits — 'test+train' means contaminated).
  //
  // Scale: the adopt join is an EQUI-join on the leader id (stats pick
  // broadcast vs shuffle); the fingerprint census is one hash shuffle
  // on md5 (never carries text past the projection); the split-set
  // census runs over dup groups only. No pair space anywhere.
  val q174 = q("q174_split_leakage",
    s"""WITH lead AS (SELECT doc_id AS lid, text AS ltext FROM documents
      |              WHERE doc_id % 25 = 0),
      |adopt AS (SELECT d.doc_id, d.source, coalesce(l.ltext, d.text) AS content
      |          FROM documents d
      |          LEFT JOIN lead l ON d.doc_id - (d.doc_id % 25) = l.lid
      |          WHERE d.doc_id % 25 IN (0, 7, 13)),
      |keep AS (SELECT doc_id, source, text AS content FROM documents
      |         WHERE doc_id % 25 NOT IN (0, 7, 13)),
      |u AS (SELECT * FROM adopt UNION ALL SELECT * FROM keep),
      |f AS (SELECT md5(content) AS fp, $splitSqlExpr AS split FROM u),
      |g AS (SELECT fp, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |        string_agg(DISTINCT split, '+' ORDER BY split) AS split_set
      |      FROM f GROUP BY fp)
      |SELECT split_set, CAST(COUNT(*) AS BIGINT) AS n_groups,
      |  CAST(SUM(n_docs) AS BIGINT) AS n_docs,
      |  (split_set LIKE '%+%') AS cross_split
      |FROM g WHERE n_docs > 1 GROUP BY split_set ORDER BY split_set""".stripMargin) {
    (s, dir) =>
    val docs = Tables(s, dir).documents
    val leaders = docs.where(col("doc_id") % 25 === 0)
      .select(col("doc_id").as("lid"), col("text").as("ltext"))
    val adoptSet = (col("doc_id") % 25).isin(0, 7, 13)
    val adopt = docs.where(adoptSet)
      .join(leaders, docs("doc_id") - (docs("doc_id") % 25) === leaders("lid"), "left")
      .select(col("doc_id"), col("source"),
        coalesce(col("ltext"), col("text")).as("content"))
    val keep = docs.where(!adoptSet)
      .select(col("doc_id"), col("source"), col("text").as("content"))
    adopt.unionAll(keep)
      .select(md5(col("content")).as("fp"),
        splitCol(col("doc_id"), col("source")).as("split"))
      .groupBy("fp")
      .agg(count(lit(1)).as("n_docs"),
        array_join(array_sort(collect_set(col("split"))), "+").as("split_set"))
      .where(col("n_docs") > 1)
      .groupBy("split_set")
      .agg(count(lit(1)).as("n_groups"), sum(col("n_docs")).as("n_docs"))
      .select(col("split_set"), col("n_groups"), col("n_docs"),
        col("split_set").contains("+").as("cross_split"))
      .orderBy("split_set")
  }

  // -- q175: mojibake / encoding-anomaly repair census -------------------
  // Web crawls arrive with UTF-8 read as Latin-1 ('Ã©' where 'é' was
  // meant), Windows-1252 smart quotes surviving as 'â€™', U+FFFD
  // replacement chars from invalid byte sequences, and NBSPs where
  // tokenizers expect spaces. The corpus is clean synthetic prose, so
  // the anomalies are DERIVED deterministically in both engines
  // (hash-mod classes gain one marker each); the stage detects each
  // class, repairs (un-double-encode, strip U+FFFD, NBSP→space), and
  // emits a per-source census including the post-repair re-scan (must
  // be anomaly-free).
  //
  // Scale: per-row detect/repair over one scan, one partial-agg shuffle
  // keyed by source — |sources| rows out. No text leaves the map stage.
  private val nbsp = " "
  private val repl = "�"
  private val dirty175Sql =
    "text || (CASE WHEN doc_id % 9 = 2 THEN ' caffÃ©' ELSE '' END)" +
      " || (CASE WHEN doc_id % 9 = 4 THEN ' donâ€™t' ELSE '' END)" +
      s" || (CASE WHEN doc_id % 9 = 6 THEN ' bad${repl}token' ELSE '' END)" +
      s" || (CASE WHEN doc_id % 9 = 8 THEN ' non${nbsp}break' ELSE '' END)"
  val q175 = q("q175_mojibake_census",
    s"""WITH d AS (SELECT doc_id, source, $dirty175Sql AS dirty FROM documents),
      |r AS (SELECT source, dirty,
      |        replace(replace(replace(replace(dirty,
      |          'Ã©', 'é'), 'â€™', '’'), '$repl', ''), '$nbsp', ' ') AS repaired
      |      FROM d)
      |SELECT source,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(CASE WHEN contains(dirty, 'Ã') THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_latin1,
      |  CAST(SUM(CASE WHEN contains(dirty, 'â€') THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_win1252,
      |  CAST(SUM(CASE WHEN contains(dirty, '$repl') THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_replchar,
      |  CAST(SUM(CASE WHEN contains(dirty, '$nbsp') THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_nbsp,
      |  CAST(SUM(CASE WHEN contains(dirty, 'Ã') OR contains(dirty, 'â€')
      |        OR contains(dirty, '$repl') OR contains(dirty, '$nbsp')
      |        THEN 1 ELSE 0 END) AS BIGINT) AS n_any,
      |  CAST(SUM(len(dirty) - len(repaired)) AS BIGINT) AS chars_delta,
      |  CAST(SUM(CASE WHEN contains(repaired, 'Ã') OR contains(repaired, 'â€')
      |        OR contains(repaired, '$repl') OR contains(repaired, '$nbsp')
      |        THEN 1 ELSE 0 END) AS BIGINT) AS n_still_dirty
      |FROM r GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
    val dirty = concat(col("text"),
      when(col("doc_id") % 9 === 2, lit(" caffÃ©")).otherwise(lit("")),
      when(col("doc_id") % 9 === 4, lit(" donâ€™t")).otherwise(lit("")),
      when(col("doc_id") % 9 === 6, lit(s" bad${repl}token")).otherwise(lit("")),
      when(col("doc_id") % 9 === 8, lit(s" non${nbsp}break")).otherwise(lit("")))
    def anomaly(c: Column): Column =
      c.contains("Ã") || c.contains("â€") || c.contains(repl) || c.contains(nbsp)
    def cnt(c: Column): Column = sum(when(c, 1L).otherwise(0L))
    val repaired = replace(replace(replace(replace(col("dirty"),
      lit("Ã©"), lit("é")), lit("â€™"), lit("’")), lit(repl), lit("")),
      lit(nbsp), lit(" "))
    Tables(s, dir).documents
      .select(col("source"), dirty.as("dirty"))
      .withColumn("repaired", repaired)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        cnt(col("dirty").contains("Ã")).as("n_latin1"),
        cnt(col("dirty").contains("â€")).as("n_win1252"),
        cnt(col("dirty").contains(repl)).as("n_replchar"),
        cnt(col("dirty").contains(nbsp)).as("n_nbsp"),
        cnt(anomaly(col("dirty"))).as("n_any"),
        sum(length(col("dirty")).cast(LongType) - length(col("repaired")))
          .as("chars_delta"),
        cnt(anomaly(col("repaired"))).as("n_still_dirty"))
      .orderBy("source")
  }

  // -- q176: context-length packing-efficiency curve ---------------------
  // Before a training run commits to a sequence length, the release
  // measures what each candidate context costs on THIS corpus under
  // one-document-per-sequence batching: documents longer than C lose
  // their tail (tokens_truncated), shorter ones waste pad slots
  // (tokens_padded); utilization = kept / (C · n_docs). The q110 packer
  // fixes the waste — this curve is how the context it packs to gets
  // CHOSEN. Whitespace token counts (the q23 convention).
  //
  // Scale: ONE corpus scan into a single partial-aggregated census row
  // (all four contexts' measures as conditional sums — no 4× row
  // blowup, no join); the per-context rows then explode from that one
  // row. Utilization divisions see exact integer operands (≤2⁵³).
  private val contexts = Seq(32L, 64L, 96L, 128L)
  val q176 = q("q176_packing_curve", {
    val measures = contexts.map { c =>
      s"""    CAST(SUM(CASE WHEN n <= $c THEN 1 ELSE 0 END) AS BIGINT) AS fit$c,
        |    CAST(SUM(LEAST(n, $c)) AS BIGINT) AS kept$c,
        |    CAST(SUM(CASE WHEN n < $c THEN $c - n ELSE 0 END) AS BIGINT) AS pad$c,
        |    CAST(SUM(CASE WHEN n > $c THEN n - $c ELSE 0 END) AS BIGINT) AS trunc$c""".stripMargin
    }.mkString(",\n")
    val rows = contexts.map { c =>
      s"""SELECT CAST($c AS BIGINT) AS context, nd AS n_docs, fit$c AS docs_fit,
        |  nd - fit$c AS docs_trunc, kept$c AS tokens_kept, pad$c AS tokens_padded,
        |  trunc$c AS tokens_truncated,
        |  CAST(round(CAST(kept$c AS DOUBLE) * 10000 / ($c * nd)) AS BIGINT) / 10000.0
        |    AS utilization FROM a""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH l AS (SELECT len(string_split(text, ' ')) AS n FROM documents),
      |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd,
      |$measures
      |  FROM l)
      |$rows
      |ORDER BY context""".stripMargin
  }) { (s, dir) =>
    val n = size(split(col("text"), " ")).cast(LongType)
    val perCtx = contexts.flatMap { c =>
      Seq(
        sum(when(col("n") <= c, 1L).otherwise(0L)).as(s"fit$c"),
        sum(least(col("n"), lit(c))).as(s"kept$c"),
        sum(when(col("n") < c, lit(c) - col("n")).otherwise(0L)).as(s"pad$c"),
        sum(when(col("n") > c, col("n") - c).otherwise(0L)).as(s"trunc$c"))
    }
    val one = Tables(s, dir).documents
      .select(n.as("n"))
      .agg(count(lit(1)).cast(LongType).as("nd"), perCtx: _*)
    val rows = array(contexts.map { c =>
      struct(
        lit(c).as("context"), col("nd").as("n_docs"), col(s"fit$c").as("docs_fit"),
        (col("nd") - col(s"fit$c")).as("docs_trunc"),
        col(s"kept$c").as("tokens_kept"), col(s"pad$c").as("tokens_padded"),
        col(s"trunc$c").as("tokens_truncated"),
        (round(col(s"kept$c").cast(DoubleType) * 10000 / (lit(c) * col("nd")))
          .cast(LongType) / 10000.0).as("utilization"))
    }: _*)
    one.select(explode(rows).as("r")).select(col("r.*")).orderBy("context")
  }

  val all: Seq[GraftQuery] = Seq(q174, q175, q176)
}
