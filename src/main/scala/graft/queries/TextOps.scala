package graft.queries

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** Text operators: the motorway word-count topology in batch form
  * (tokenize ≙ `tests/sample_pipeline.py:41-45`, grouped count ≙
  * `tests/sample_pipeline.py:48-56`, dict-pivot ≙ `examples/database.py`
  * WordToDictIntersection) plus the training-data-pipeline text suite:
  * quality scoring, token stats, language-ID, fingerprinting.
  *
  * Scale: all are single-shuffle groupBys (partial+final agg) or pure
  * map-side column work — no driver-side state, no collect().
  */
object TextOps {

  private[queries] def toks(c: Column): Column = split(c, " ")

  // -- q20: word count (tokenize + grouped count) -----------------------
  val q20 = GraftQuery("q20_wordcount", (s, dir) => {
    Tables(s, dir).documents
      .select(explode(toks(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy("word")
  }, Some(
    """SELECT word, COUNT(*) AS cnt
      |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      |GROUP BY word ORDER BY word""".stripMargin))

  // -- q21: dict pivot (map build + explode back to rows) ---------------
  // Exercises MapType end-to-end: per-lang word→count map, then explode.
  val q21 = GraftQuery("q21_pivot_map", (s, dir) => {
    val counts = Tables(s, dir).documents
      .select(col("lang"), explode(toks(col("text"))).as("word"))
      .groupBy("lang", "word").agg(count(lit(1)).as("n"))
    counts
      .groupBy("lang")
      .agg(map_from_entries(collect_list(struct(col("word"), col("n")))).as("wc"))
      .select(col("lang"), explode(col("wc")).as(Seq("word", "cnt")))
      .orderBy("lang", "word")
  }, Some(
    """SELECT lang, word, COUNT(*) AS cnt
      |FROM (SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents)
      |GROUP BY lang, word ORDER BY lang, word""".stripMargin))

  // -- q22: per-document quality scoring --------------------------------
  // Ratios are int/int in IEEE double → bit-identical across engines.
  val q22 = GraftQuery("q22_text_quality", (s, dir) => {
    val d = Tables(s, dir).documents
    val t = toks(col("text"))
    val stop = array(TextAnalysis.StopWords.map(lit): _*)
    d.select(
      col("doc_id"),
      length(col("text")).as("n_chars_actual"),
      size(t).as("n_tokens"),
      (size(filter(t, w => array_contains(stop, w))).cast("double") /
        size(t).cast("double")).as("stop_ratio"),
      (length(regexp_replace(col("text"), "[a-z0-9 ]", "")).cast("double") /
        length(col("text")).cast("double")).as("punct_ratio"),
      (size(array_distinct(t)).cast("double") /
        size(t).cast("double")).as("distinct_ratio"))
      .orderBy("doc_id")
  }, Some(
    s"""SELECT doc_id,
       |  CAST(length(text) AS INTEGER) AS n_chars_actual,
       |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
       |  CAST(len(list_filter(string_split(text, ' '), w -> ${TextAnalysis.stopListSql("w")})) AS DOUBLE)
       |    / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stop_ratio,
       |  CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE)
       |    / CAST(length(text) AS DOUBLE) AS punct_ratio,
       |  CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
       |    / CAST(len(string_split(text, ' ')) AS DOUBLE) AS distinct_ratio
       |FROM documents ORDER BY doc_id""".stripMargin))

  // -- q23: corpus token statistics per language ------------------------
  val q23 = GraftQuery("q23_token_stats", (s, dir) => {
    val d = Tables(s, dir).documents
    d.select(col("lang"), size(toks(col("text"))).cast("long").as("nt"))
      .groupBy("lang")
      .agg(
        sum(col("nt")).as("total_tokens"),
        (sum(col("nt")).cast("double") / count(lit(1))).as("avg_tokens"),
        count(lit(1)).as("n_docs"))
      .orderBy("lang")
  }, Some(
    """SELECT lang,
      |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
      |  CAST(SUM(len(string_split(text, ' '))) AS DOUBLE) / COUNT(*) AS avg_tokens,
      |  COUNT(*) AS n_docs
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin))

  // -- q24: language identification (stopword-profile heuristic) --------
  // The native kernel's scoring (token hits in per-language function-word
  // profiles + 0.5 × char-bigram profile hits, argmax with (score desc,
  // lang) tie-break) is mirrored literally in the oracle: both sides are
  // integer-ratio divisions and one multiply-add in the same IEEE order,
  // so scores — and hence the argmax — are bit-identical.
  val q24 = GraftQuery("q24_langid", (s, dir) => {
    Tables(s, dir).documents
      .select(col("doc_id"), col("lang").as("labeled_lang"),
        graft.functions.expr.TextExpressions.langId(col("text")).as("pred"))
      .select(col("doc_id"), col("labeled_lang"),
        col("pred.lang").as("pred_lang"), col("pred.confidence").as("confidence"))
      .orderBy("doc_id")
  }, Some(
    """WITH profiles(plang, words, bgl) AS (VALUES
      |  ('en', ['the','a','and','of','is','to','in','that','it','for'],
      |         ['th','he','in','er','an','ng']),
      |  ('de', ['der','die','das','und','ist','nicht','ein','zu','mit','von'],
      |         ['ch','ei','en','ie','sc','tz']),
      |  ('es', ['el','la','los','de','que','y','en','un','una','es'],
      |         ['ll','os','as','ci','ón','qu']),
      |  ('fr', ['le','les','des','de','et','est','un','une','dans','que'],
      |         ['ou','au','eu','oi','ai','qu']),
      |  ('zh', [], [])),
      |d AS (SELECT doc_id, lang AS labeled_lang, text, string_split(text, ' ') AS t,
      |        CASE WHEN length(text) >= 2
      |             THEN list_transform(range(1, length(text)), i -> text[i:i+1])
      |             ELSE [text] END AS bg
      |      FROM documents),
      |sc AS (SELECT doc_id, labeled_lang, plang,
      |         CAST(len(list_filter(t, w -> list_contains(words, w))) AS DOUBLE) / len(t)
      |         + 0.5 * (CAST(len(list_filter(bg, x -> list_contains(bgl, x))) AS DOUBLE)
      |                  / greatest(1, len(bg))) AS score
      |       FROM d CROSS JOIN profiles),
      |r AS (SELECT doc_id, labeled_lang, plang, score,
      |        row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, plang) AS rk
      |      FROM sc)
      |SELECT doc_id, labeled_lang,
      |  CASE WHEN score = 0.0 THEN 'und' ELSE plang END AS pred_lang,
      |  CASE WHEN score = 0.0 THEN 0.0 ELSE least(1.0, score) END AS confidence
      |FROM r WHERE rk = 1 ORDER BY doc_id""".stripMargin))

  // -- q25: document fingerprint (md5, content-hash identity) -----------
  val q25 = GraftQuery("q25_fingerprint_md5", (s, dir) => {
    Tables(s, dir).documents
      .select(col("doc_id"), md5(col("text")).as("fp"))
      .orderBy("doc_id")
  }, Some(
    "SELECT doc_id, md5(text) AS fp FROM documents ORDER BY doc_id"))

  // -- q26: winnowing fingerprint (k-gram hashes + window minima) -------
  // Schleimer/Wilkerson/Aiken "Winnowing" (SIGMOD'03) — the standard
  // local-fingerprint scheme for near-dup detection at corpus scale.
  // The k-gram hash is QueryDsl.crossHash60 and the window selection a
  // native kernel (winnowSelect), so the ENTIRE fingerprint — hash
  // values included — is mirrored in the DuckDB oracle: the selection
  // logic (rightmost window minima, consecutive-pick dedupe) is proved
  // cross-engine, not just row counts. Per-row, zero shuffles.
  val q26 = GraftQuery("q26_fingerprint_winnow", (s, dir) => {
    import graft.QueryDsl.crossHash60
    val n = length(col("text")) - 7
    val grams = when(n >= 1,
      transform(sequence(lit(1), n), i => crossHash60(col("text").substr(i, lit(8)))))
      .otherwise(array().cast("array<bigint>"))
    Tables(s, dir).documents
      .select(col("doc_id"),
        graft.functions.expr.TextExpressions.winnowSelect(grams, window = 4).as("fps"))
      .select(col("doc_id"), size(col("fps")).as("n_fps"),
        col("fps").getItem(0).as("first_fp"))
      .orderBy("doc_id")
  }, Some(
    """WITH d AS (SELECT doc_id, text, length(text) - 7 AS n FROM documents),
      |h AS (SELECT doc_id, n,
      |        CASE WHEN n >= 1 THEN list_transform(range(1, n + 1),
      |               i -> CAST(concat('0x', substr(md5(substr(text, CAST(i AS INTEGER), 8)), 1, 15)) AS BIGINT))
      |             ELSE CAST([] AS BIGINT[]) END AS H
      |      FROM d),
      |sel AS (SELECT doc_id, n, H,
      |         CASE
      |           WHEN n < 1 THEN CAST([] AS BIGINT[])
      |           WHEN n <= 4 THEN [list_min(H)]
      |           ELSE list_transform(
      |                  list_sort(list_distinct(list_transform(range(0, n - 3),
      |                    i -> list_max(list_transform(range(i + 1, i + 5),
      |                           j -> CASE WHEN H[j] = list_min(H[i+1:i+4]) THEN j END))))),
      |                  p -> H[p])
      |         END AS fps
      |       FROM h)
      |SELECT doc_id, CAST(len(fps) AS INTEGER) AS n_fps, fps[1] AS first_fp
      |FROM sel ORDER BY doc_id""".stripMargin))

  // -- q36: custom typed Aggregator (dict-merge, two-phase) -------------
  // The reference's dict-union AggregateIntersection
  // (`examples/intersections.py:34-42`) as a real partial+final Spark
  // aggregate: per-doc token-count maps merged per language by
  // [[graft.functions.MapMergeAggregator]], then argmax over the merged
  // map. Output is oracle-checkable against plain SQL.
  val q36 = GraftQuery("q36_agg_merge_top_word", (s, dir) => {
    import s.implicits._
    val perDoc = Tables(s, dir).documents
      .select(col("lang"), col("text")).as[(String, String)]
      .map { case (lang, text) =>
        // one-pass count map (r18): groupBy(identity) materialized an
        // Array[String] PER DISTINCT WORD before counting — same
        // Map[String, Long] result, far less allocation in the typed
        // hot loop (the Aggregator input contract is unchanged)
        val counts = scala.collection.mutable.HashMap.empty[String, Long]
        val toks = text.split(" ")
        var i = 0
        while (i < toks.length) {
          counts.updateWith(toks(i)) { c => Some(c.getOrElse(0L) + 1L) }
          i += 1
        }
        (lang, counts.toMap)
      }
    perDoc.groupByKey(_._1)
      .mapValues(_._2)
      .agg(new graft.functions.MapMergeAggregator().toColumn.name("merged"))
      .map { case (lang, merged) =>
        val (w, n) = merged.toSeq.minBy { case (word, cnt) => (-cnt, word) }
        (lang, w, n)
      }
      .toDF("lang", "top_word", "top_count")
      .orderBy("lang")
  }, Some(
    """WITH wc AS (SELECT lang, word, COUNT(*) AS n
      |            FROM (SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents)
      |            GROUP BY 1, 2),
      |r AS (SELECT lang, word, n,
      |        row_number() OVER (PARTITION BY lang ORDER BY n DESC, word) AS rk
      |      FROM wc)
      |SELECT lang, word AS top_word, n AS top_count FROM r WHERE rk = 1
      |ORDER BY lang""".stripMargin))

  // -- q40: BPE-ish subword token counting ------------------------------
  // Word-boundary regex segmentation (letters / digits / punctuation
  // runs — the GPT-2-style pre-tokenizer shape) vs whitespace tokens;
  // the ratio is the subword-expansion factor used for token budgeting
  // in training-data pipelines.
  val q40 = GraftQuery("q40_bpe_tokens", (s, dir) => {
    val pat = "[a-z]+|[0-9]+|[^a-z0-9\\s]+"
    Tables(s, dir).documents.select(
      col("doc_id"),
      size(toks(col("text"))).as("ws_tokens"),
      size(regexp_extract_all(col("text"), lit(pat), lit(0))).as("bpe_tokens"),
      (size(regexp_extract_all(col("text"), lit(pat), lit(0))).cast("double") /
        size(toks(col("text"))).cast("double")).as("expansion"))
      .orderBy("doc_id")
  }, Some(
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS INTEGER) AS ws_tokens,
      |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]+')) AS INTEGER) AS bpe_tokens,
      |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]+')) AS DOUBLE) /
      |    CAST(len(string_split(text, ' ')) AS DOUBLE) AS expansion
      |FROM documents ORDER BY doc_id""".stripMargin))

  // -- q53: PII-style redaction (regex scrubbing) -----------------------
  // The scrubbing pass every training pipeline runs before tokenizing:
  // here numeric sequences in the semi-structured payload are masked.
  val q53 = GraftQuery("q53_redact", (s, dir) => {
    Tables(s, dir).events.select(
      col("event_id"),
      regexp_replace(col("props"), "[0-9]+", "<NUM>").as("props_redacted"),
      (length(col("props")) - length(regexp_replace(col("props"), "[0-9]", ""))).as("digits_removed"))
      .orderBy("event_id")
  }, Some(
    """SELECT event_id,
      |  regexp_replace(props, '[0-9]+', '<NUM>', 'g') AS props_redacted,
      |  CAST(length(props) - length(regexp_replace(props, '[0-9]', '', 'g')) AS INTEGER) AS digits_removed
      |FROM events ORDER BY event_id""".stripMargin))

  // -- q54: context chunking (token windows with overlap) ---------------
  // Fixed-size overlapping token windows (size 20, stride 10) — the
  // chunking step that turns documents into training contexts. One
  // explode per window start; no per-doc driver logic.
  val q54 = GraftQuery("q54_chunking", (s, dir) => {
    val t = toks(col("text"))
    Tables(s, dir).documents
      .select(col("doc_id"), t.as("t"))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(1), size(col("t")), lit(10)),
          i => array_join(slice(col("t"), i, lit(20)), " "))).as(Seq("chunk_idx", "chunk")))
      .orderBy("doc_id", "chunk_idx")
  }, Some(
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |c AS (SELECT doc_id,
      |        list_transform(range(1, len(t) + 1, 10),
      |                       i -> array_to_string(list_slice(t, i, i + 19), ' ')) AS chunks
      |      FROM d)
      |SELECT doc_id,
      |  CAST(unnest(range(0, len(chunks))) AS INTEGER) AS chunk_idx,
      |  unnest(chunks) AS chunk
      |FROM c ORDER BY doc_id, chunk_idx""".stripMargin))

  val all: Seq[GraftQuery] = Seq(q20, q21, q22, q23, q24, q25, q26, q36, q40, q53, q54)
}
