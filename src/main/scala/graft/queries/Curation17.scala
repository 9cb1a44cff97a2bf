package graft.queries

import graft.{GraftQuery, Tables}
import graft.QueryDsl.{crossHash60, crossHash60Sql}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Seventeenth curation batch: the URL/domain-level source gate — the
  * one standard curation filter the registry still lacked (r14 VERDICT
  * #5). C4 drops documents from a badword blocklist, RefinedWeb §3.1
  * filters by URL against a curated blocklist of domains with an
  * allowlist override; the operator here is that gate's census:
  * registered-domain extraction over the q169-derived URLs, a
  * deterministic hash-derived block/allow list (the derived-corpus
  * discipline — the corpus ships no real blocklist, so membership is a
  * closed-form function both engines compute identically), and the
  * per-source blocked/allowlisted/kept bill a release review reads.
  *
  * Registered-domain extraction is the public-suffix rule reduced to
  * the fixture's suffix set: hosts end in a single-label suffix
  * (.com/.org/.net → registrable = last 2 labels) or the multi-label
  * `.co.uk` (registrable = last 3 labels) — the exact distinction a
  * real PSL lookup makes, expressed as one anchored regex shared
  * VERBATIM between Spark (java.util.regex) and DuckDB (RE2), per the
  * q120/q169 common-dialect discipline. A full implementation swaps
  * the two-alternative regex for the PSL table broadcast as a map-side
  * lookup; the plan shape is unchanged.
  *
  * Scale: URL derive + canonicalize + host/domain extract + hash-list
  * membership are all per-row map-side expressions in the scan stage;
  * the shuffle ships (source, regdom, verdict) short strings into one
  * aggregate; output is |sources| rows. No broadcast needed because
  * the lists are closed-form — with a real PSL/blocklist both are
  * small dimension tables that BROADCAST (never shuffle the corpus).
  */
object Curation17 {

  private def q(name: String, oracle: String)(f: (SparkSession, String) => DataFrame) =
    GraftQuery(name, f, Some(oracle))

  // -- q195: domain blocklist/allowlist gate census -----------------------
  // URL fixture: richer hosts than q169's (83 registrable names x 4
  // suffixes incl. co.uk, cdn./blog. subdomains) so registered-domain
  // extraction has real work; the q169 canonicalizer chain strips
  // scheme/www/utm/fragment first. List membership is hash-derived
  // with salted keys: block:<regdom> (~20% of domains), allow:<regdom>
  // (~14% override) — the allowlist WINS, the C4/RefinedWeb posture.

  /** The derived raw URL: q169's variation dressing over a host with
    * subdomain + 83 names + 4 public suffixes. */
  private[graft] def deriveUrl(docId: Column, source: Column): Column =
    concat(
      when(docId % 2 === 0, lit("HTTPS://www.")).otherwise(lit("http://")),
      when(docId % 6 === 0, lit("cdn.")).otherwise(
        when(docId % 6 === 1, lit("blog.")).otherwise(lit(""))),
      lit("host"), (docId % 83).cast("string"), lit("."),
      when(docId % 7 === 0, lit("co.uk")).otherwise(
        when(docId % 7 === 1, lit("org")).otherwise(
          when(docId % 7 === 2, lit("net")).otherwise(lit("com")))),
      lit("/"), source, lit("/p"), (docId % 29).cast("string"),
      when(docId % 4 === 0, lit("?utm_source=feed")).otherwise(lit("")),
      when(docId % 5 === 0, lit("#frag")).otherwise(lit("")))

  private val urlSql =
    "(CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://www.' ELSE 'http://' END)" +
      " || (CASE WHEN doc_id % 6 = 0 THEN 'cdn.' WHEN doc_id % 6 = 1 THEN 'blog.' ELSE '' END)" +
      " || 'host' || CAST(doc_id % 83 AS VARCHAR) || '.'" +
      " || (CASE WHEN doc_id % 7 = 0 THEN 'co.uk' WHEN doc_id % 7 = 1 THEN 'org'" +
      "          WHEN doc_id % 7 = 2 THEN 'net' ELSE 'com' END)" +
      " || '/' || source || '/p' || CAST(doc_id % 29 AS VARCHAR)" +
      " || (CASE WHEN doc_id % 4 = 0 THEN '?utm_source=feed' ELSE '' END)" +
      " || (CASE WHEN doc_id % 5 = 0 THEN '#frag' ELSE '' END)"

  /** Registrable-domain regex (see class doc): the co.uk alternative
    * must come first so the multi-label suffix claims 3 labels. */
  private val RegDomRe = "([^.]+\\.co\\.uk|[^.]+\\.[^.]+)$"
  private val HostRe = "^[^/]+"

  /** Registered domain of a canonical URL — host (everything before
    * the first `/`) reduced to its registrable suffix-plus-one. */
  private[graft] def registeredDomain(canonUrl: Column): Column =
    regexp_extract(regexp_extract(canonUrl, HostRe, 0), RegDomRe, 1)

  /** Hash-derived list membership, salted per list so block and allow
    * draws are independent. */
  private[graft] def inBlocklist(regdom: Column): Column =
    crossHash60(concat(lit("block:"), regdom)) % 5 === 0
  private[graft] def inAllowlist(regdom: Column): Column =
    crossHash60(concat(lit("allow:"), regdom)) % 7 === 0

  val q195 = q("q195_domain_blocklist",
    s"""WITH u AS (SELECT doc_id, source, $urlSql AS url FROM documents),
      |c AS (SELECT doc_id, source,
      |        regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      |          regexp_replace(regexp_replace(url,
      |          '^(?i)https?://(www\\.)?', '', 'g'), '#.*$$', '', 'g'),
      |          '&utm_[a-z]+=[^&#]*', '', 'g'), '\\?utm_[a-z]+=[^&#]*&', '?', 'g'),
      |          '\\?utm_[a-z]+=[^&#]*$$', '', 'g'), '/$$', '', 'g') AS canon
      |      FROM u),
      |d AS (SELECT doc_id, source,
      |        regexp_extract(regexp_extract(canon, '$HostRe', 0), '$RegDomRe', 1)
      |          AS regdom
      |      FROM c),
      |v AS (SELECT source, regdom,
      |        (${crossHash60Sql("'block:' || regdom")} % 5 = 0) AS blocked,
      |        (${crossHash60Sql("'allow:' || regdom")} % 7 = 0) AS allowed
      |      FROM d)
      |SELECT source,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(CASE WHEN blocked AND NOT allowed THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_blocked_docs,
      |  CAST(SUM(CASE WHEN blocked AND allowed THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_allowlisted_docs,
      |  CAST(SUM(CASE WHEN NOT blocked OR allowed THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_kept_docs,
      |  CAST(COUNT(DISTINCT CASE WHEN blocked AND NOT allowed THEN regdom END)
      |    AS BIGINT) AS n_blocked_domains
      |FROM v GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
    val docs = Tables(s, dir).documents.select(col("doc_id"), col("source"))
    val v = docs
      .select(col("source"),
        registeredDomain(Curation11.canonUrlExpr(
          deriveUrl(col("doc_id"), col("source")))).as("regdom"))
      .select(col("source"), col("regdom"),
        inBlocklist(col("regdom")).as("blocked"),
        inAllowlist(col("regdom")).as("allowed"))
    v.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("blocked") && !col("allowed"), 1L).otherwise(0L))
          .as("n_blocked_docs"),
        sum(when(col("blocked") && col("allowed"), 1L).otherwise(0L))
          .as("n_allowlisted_docs"),
        sum(when(!col("blocked") || col("allowed"), 1L).otherwise(0L))
          .as("n_kept_docs"),
        countDistinct(when(col("blocked") && !col("allowed"), col("regdom")))
          .as("n_blocked_domains"))
      .orderBy("source")
  }

  // -- q196: document-grain near-dup purge APPLIED -------------------------
  // The release action q136 only PLANS: every document gets its
  // keep/drop verdict and canonical remap — q189's "purge applied"
  // emission one level up, at document grain. Keep ⟺ the doc IS its
  // cluster's canonical (longest member, ties to smaller id — q136's
  // rule; singletons are their own canonical). Dropped docs carry the
  // canonical_id a reference remapper rewrites to; kept docs carry a
  // 60-bit content fingerprint so the emitted corpus pins WHICH text
  // survived, not just how many rows.
  //
  // Scale shape: the text fingerprint is computed MAP-SIDE in the scan
  // projection (text never shuffles — only doc_id/n_chars/fp ride the
  // joins); q84's prefix-filtered pair space feeds connected
  // components; the canonical argmax is the q136 struct-max (no
  // window); then two doc/cluster-keyed LEFT equi-joins against the
  // doc-grain metadata. Output is corpus-grain but column-narrow.
  // Oracle: q136's recursive-CTE clustering + window argmax, LEFT
  // joined back to all documents.
  val q196 = q("q196_neardup_purge_apply",
    s"""WITH RECURSIVE d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |s AS MATERIALIZED (SELECT doc_id,
      |        CASE WHEN len(t) >= 4
      |             THEN list_distinct(list_transform(range(1, len(t) - 2),
      |                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]))
      |             ELSE list_distinct(t) END AS sh
      |      FROM d),
      |p AS MATERIALIZED (SELECT a.doc_id AS a_id, b.doc_id AS b_id
      |      FROM s a JOIN s b ON a.doc_id < b.doc_id
      |      WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
      |            CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) >= 0.5),
      |e AS MATERIALIZED (SELECT a_id AS u, b_id AS v FROM p UNION ALL SELECT b_id, a_id FROM p),
      |r AS (SELECT u AS node, u AS reach FROM e
      |      UNION
      |      SELECT r.node, e.v FROM r JOIN e ON r.reach = e.u),
      |c AS (SELECT node AS doc_id, min(reach) AS cluster_id FROM r GROUP BY 1),
      |m AS (SELECT c.cluster_id, c.doc_id, documents.n_chars
      |      FROM c JOIN documents USING (doc_id)),
      |b AS (SELECT cluster_id, doc_id,
      |        row_number() OVER (PARTITION BY cluster_id
      |          ORDER BY n_chars DESC, doc_id) AS rk FROM m),
      |cn AS (SELECT cluster_id, doc_id AS cluster_canonical FROM b WHERE rk = 1),
      |sz AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_members FROM m GROUP BY 1)
      |SELECT doc.doc_id,
      |  coalesce(c.cluster_id, doc.doc_id) AS cluster_id,
      |  coalesce(sz.n_members, 1) AS n_members,
      |  coalesce(cn.cluster_canonical, doc.doc_id) AS canonical_id,
      |  (coalesce(cn.cluster_canonical, doc.doc_id) = doc.doc_id) AS keep,
      |  CASE WHEN coalesce(cn.cluster_canonical, doc.doc_id) = doc.doc_id
      |       THEN ${crossHash60Sql("doc.text")} ELSE 0 END AS text_fp
      |FROM documents doc
      |LEFT JOIN c ON doc.doc_id = c.doc_id
      |LEFT JOIN cn ON c.cluster_id = cn.cluster_id
      |LEFT JOIN sz ON c.cluster_id = sz.cluster_id
      |ORDER BY doc.doc_id""".stripMargin) { (s, dir) =>
    val edges = Dedup.allPairsJaccard(s, dir, 0.5).select(col("a_id"), col("b_id"))
    val clusters = graft.operators.ConnectedComponents.minLabelPropagation(edges)
      .select(col("node").as("doc_id"), col("comp").as("cluster_id"))
    // fingerprint in the scan projection: text never leaves the map side
    val meta = Tables(s, dir).documents
      .select(col("doc_id"), col("n_chars"), crossHash60(col("text")).as("fp"))
    val canon = clusters
      .join(meta.select(col("doc_id"), col("n_chars")), Seq("doc_id"))
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("n_members_c"),
        max(struct(col("n_chars"), (-col("doc_id")).as("neg_id"))).as("best"))
      .select(col("cluster_id"), col("n_members_c"),
        (-col("best.neg_id")).cast("long").as("cluster_canonical"))
    meta.join(clusters, Seq("doc_id"), "left")
      .join(canon, Seq("cluster_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"),
        coalesce(col("n_members_c"), lit(1L)).as("n_members"),
        coalesce(col("cluster_canonical"), col("doc_id")).as("canonical_id"),
        (coalesce(col("cluster_canonical"), col("doc_id")) === col("doc_id"))
          .as("keep"),
        when(coalesce(col("cluster_canonical"), col("doc_id")) === col("doc_id"),
          col("fp")).otherwise(lit(0L)).as("text_fp"))
      .orderBy("doc_id")
  }

  // -- q204: encoding-damage census + repair bill (ftfy pass) --------------
  // The encoding-hygiene gate every web-scale pipeline runs before
  // training (ftfy's fix_text, Dolma's unicode scrubbers): detect
  // UTF-8-read-as-Latin-1 mojibake sequences ('Ã' followed by a
  // Latin-1 supplement continuation char — the signature of a
  // double-decoded 'é'-class code point), U+FFFD replacement
  // characters (lossy transcodes), and C0 control characters
  // (tab/LF/CR excluded), then bill per source how many documents are
  // dirty, how many artifacts of each class, and how many characters
  // the repair pass removes. The corpus is clean ASCII, so — the
  // q184 derived-corpus discipline — damage is injected by a
  // closed-form doc_id rule shared VERBATIM by both engines
  // (%11=3 mojibake via replace-all, %11=7 U+FFFD runs, %11=5 BEL
  // runs), and the DETECTORS/repairers run on the derived text with no
  // knowledge of the rule. Repair order is fixed (mojibake fix, then
  // FFFD strip, then control strip) so chars_repaired is well-defined.
  // Regexes stay in the Java-regex ∩ RE2 common subset (literal BMP
  // chars in classes, \x{..} escapes — no lookaround).
  //
  // Scale: pure map-side per-row regex work on ONE corpus scan
  // (codegen'd RegExpCount/RegExpReplace), then a source-keyed
  // aggregate. No shuffle beyond the final group-by.
  private val MojiRe = "Ã[ -¿]"
  private val FffdRe = "�"
  // NUL included (r15 ADVICE: the class is billed as "C0 controls,
  // tab/LF/CR excluded" — starting at \x{01} silently under-reported
  // NUL-bearing real corpora). ONE string drives both engines, so the
  // detector and the oracle move together by construction.
  private[graft] val CtrlRe = "[\\x{00}-\\x{08}\\x{0B}\\x{0C}\\x{0E}-\\x{1F}]"

  /** The damage injection — one SQL fragment, evaluated by BOTH
    * engines (Spark via expr(), DuckDB verbatim). */
  private val InjectSql =
    """CASE WHEN doc_id % 11 = 3 THEN replace(text, 'e', 'Ã©')
      |     WHEN doc_id % 11 = 7
      |       THEN text || ' ' || repeat('�', CAST(1 + doc_id % 3 AS INT))
      |     WHEN doc_id % 11 = 5
      |       THEN text || repeat(chr(7), CAST(1 + doc_id % 2 AS INT))
      |     ELSE text END""".stripMargin

  val q204 = q("q204_mojibake_census",
    s"""WITH d AS (SELECT doc_id, source, $InjectSql AS content FROM documents),
      |m AS (SELECT source,
      |    CAST(len(regexp_extract_all(content, '$MojiRe')) AS BIGINT) AS n_moji,
      |    CAST(len(regexp_extract_all(content, '$FffdRe')) AS BIGINT) AS n_fffd,
      |    CAST(len(regexp_extract_all(content, '$CtrlRe')) AS BIGINT) AS n_ctrl,
      |    CAST(len(content) AS BIGINT)
      |      - CAST(len(regexp_replace(regexp_replace(regexp_replace(content,
      |          'Ã©', 'é', 'g'),
      |          '$FffdRe', '', 'g'),
      |          '$CtrlRe', '', 'g')) AS BIGINT) AS chars_cut
      |  FROM d)
      |SELECT source,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(CASE WHEN n_moji + n_fffd + n_ctrl > 0 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_docs_dirty,
      |  CAST(sum(n_moji) AS BIGINT) AS n_mojibake,
      |  CAST(sum(n_fffd) AS BIGINT) AS n_replacement,
      |  CAST(sum(n_ctrl) AS BIGINT) AS n_control,
      |  CAST(sum(chars_cut) AS BIGINT) AS chars_repaired
      |FROM m GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
    val d = Tables(s, dir).documents
      .select(col("doc_id"), col("source"), expr(InjectSql).as("content"))
    val m = d.select(col("source"),
      regexp_count(col("content"), lit(MojiRe)).cast("long").as("n_moji"),
      regexp_count(col("content"), lit(FffdRe)).cast("long").as("n_fffd"),
      regexp_count(col("content"), lit(CtrlRe)).cast("long").as("n_ctrl"),
      (length(col("content")) -
        length(regexp_replace(regexp_replace(regexp_replace(col("content"),
          "Ã©", "é"), FffdRe, ""), CtrlRe, "")))
        .cast("long").as("chars_cut"))
    m.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_moji") + col("n_fffd") + col("n_ctrl") > 0, 1L)
          .otherwise(0L)).as("n_docs_dirty"),
        sum(col("n_moji")).as("n_mojibake"),
        sum(col("n_fffd")).as("n_replacement"),
        sum(col("n_ctrl")).as("n_control"),
        sum(col("chars_cut")).as("chars_repaired"))
      .orderBy("source")
  }

  val all: Seq[GraftQuery] = Seq(q195, q196, q204)
}
