package graft.queries

import graft.{GraftQuery, Tables}
import graft.QueryDsl.crossHash60
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** Sixteenth curation batch: the intra-document REPETITION half of the
  * Gopher quality suite (Rae et al. 2021 §A1.1) that q170/q72 did not
  * cover — duplicate-line and duplicate-paragraph fractions (by count
  * and by character share) and top-2/3/4-gram character shares — plus
  * corpus-wide LINE-grain exact deduplication (the RefinedWeb/Falcon
  * line-dedup pass; Penedo et al. 2023 §3.3), which reuses q183's
  * no-pair-space census shape one level up from token grain.
  *
  * Reference scope note: the reference pipeline framework
  * (/root/reference/motorway) has no relational curation surface —
  * these extend the engine along SURVEY §2's "LLM-data-pipeline" axis,
  * with every query oracle-gated against DuckDB.
  *
  * Scale shapes:
  *  - q185/q186 are per-row map-side kernels (split + higher-order
  *    functions, no shuffle before the display sort) — the same class
  *    as q170, and shared with [[graft.streaming.StreamingQualityGate]]
  *    so the live gate scores the identical signals.
  *  - q187 is ONE line-grain explode shipping a 60-bit hash + a length
  *    per line (never the line string past the map stage), a
  *    vocabulary-grain census, a hash equi-join back, and a per-doc
  *    window over COVERED lines only — no pair space, no corpus×corpus
  *    join, exactly q183's discipline at line grain.
  */
object Curation16 {

  private def q(name: String, oracle: String)(f: (SparkSession, String) => DataFrame) =
    GraftQuery(name, f, Some(oracle))

  /** Tokens per derived line / paragraph. The corpus has no newlines
    * (clean synthetic prose), so the line/paragraph structure is
    * DERIVED deterministically in both engines — fixed-width token
    * chunks — per the q120/q165/q169/q170 augmentation discipline. */
  val LineTokens = 4
  val ParaTokens = 12

  /** Fixed-width token chunking as a Column: tokens [i·k+1, i·k+k] per
    * chunk, last chunk clamped — identical to the DuckDB slice
    * `w[i*k+1 : i*k+k]`. `w` must be non-empty (split of any string is). */
  // codegen-native strided chunks (see TextKernels.chunkJoin): exact
  // twin of the transform(sequence, concat_ws(slice)) HOF it replaces
  private def chunk(w: Column, k: Int): Column =
    graft.functions.expr.TextExpressions.chunkJoin(w, k)

  private val emptyStr = array().cast("array<string>")

  /** The derived LINE list for a doc: 4-token chunks plus the
    * deterministic duplicate injections (hash-mod classes of docs gain
    * repeated lines) that make the duplicate-line rules a real detector
    * test on clean synthetic prose. Shared verbatim by q185, q187's
    * spec brute force, and the streaming gate. */
  private[graft] def derivedLines(w: Column, docId: Column): Column = {
    val base = chunk(w, LineTokens)
    val inj = concat(
      when(docId % 3 === 0, array(element_at(base, 2))).otherwise(emptyStr),
      when(docId % 5 === 0, array(element_at(base, 1), element_at(base, 3)))
        .otherwise(emptyStr),
      when(docId % 7 === 0, array(element_at(base, 1), element_at(base, 1)))
        .otherwise(emptyStr))
    when(size(base) >= 3, concat(base, inj)).otherwise(base)
  }

  /** The derived PARAGRAPH list: 12-token chunks plus duplicate
    * injections on independent hash-mod classes. */
  private[graft] def derivedParas(w: Column, docId: Column): Column = {
    val base = chunk(w, ParaTokens)
    val inj = concat(
      when(docId % 4 === 0, array(element_at(base, 1))).otherwise(emptyStr),
      when(docId % 11 === 0, array(element_at(base, 2), element_at(base, 2)))
        .otherwise(emptyStr))
    when(size(base) >= 2, concat(base, inj)).otherwise(base)
  }

  private def sumLen(arr: Column): Column =
    aggregate(arr, lit(0L), (a, x) => a + length(x).cast(LongType))

  /** Scaled-integer ratio — round(num·10⁴/den) at scale 0 — the
    * cross-engine float discipline documented at q170: decimal halves
    * at scale 0 are exactly representable doubles, so Spark and DuckDB
    * round identically; rule thresholds compare the integer forms.
    * The denominator is clamped to ≥1 (the greatest(1, len) discipline
    * from q190): an empty-text doc has sumLen([""]) = 0 and
    * length(text) = 0, where an unguarded divide is a cross-engine
    * CRASH divergence — Spark's non-ANSI cast turns the NaN into 0
    * while DuckDB errors on CAST(NaN AS BIGINT). With the clamp both
    * engines yield 0 (the numerator is 0 whenever the true denominator
    * is), identical to Spark's old value on every row. */
  private def scaled(num: Column, den: Column): Column =
    round(num.cast(DoubleType) * 10000 / greatest(lit(1L), den)).cast(LongType)

  /** Appends the duplicate-line/paragraph signal columns (`n_lines`,
    * `dlf_l`, `dlcf_l`, `n_paras`, `dpf_l`, `dpcf_l` — scaled-integer
    * fractions ×10⁴) plus the `rep_keep_lp` verdict to any relation
    * carrying a text column. Duplicate counting is the standard
    * first-occurrence-keeps semantics (count k>1 contributes k−1
    * elements and their characters), so both counts fall out of
    * `array_distinct`: dup = n − n_distinct, dupChars = Σlen − Σlen
    * (distinct). All per-row higher-order functions: map-side, no
    * shuffle. Gopher §A1.1 thresholds: dup-line ≤0.30, dup-para ≤0.30,
    * dup-line-chars ≤0.20, dup-para-chars ≤0.20. */
  private[graft] def withDupLineParaSignals(df: DataFrame, text: Column,
      docId: Column): DataFrame = {
    val w = col("_rep_w")
    val lines = col("_rep_lines")
    val paras = col("_rep_paras")
    df.withColumn("_rep_w", split(text, " "))
      .withColumn("_rep_lines", derivedLines(w, docId))
      .withColumn("_rep_paras", derivedParas(w, docId))
      .withColumn("n_lines", size(lines).cast(LongType))
      .withColumn("dlf_l",
        scaled(size(lines) - size(array_distinct(lines)), size(lines)))
      .withColumn("dlcf_l",
        scaled(sumLen(lines) - sumLen(array_distinct(lines)), sumLen(lines)))
      .withColumn("n_paras", size(paras).cast(LongType))
      .withColumn("dpf_l",
        scaled(size(paras) - size(array_distinct(paras)), size(paras)))
      .withColumn("dpcf_l",
        scaled(sumLen(paras) - sumLen(array_distinct(paras)), sumLen(paras)))
      .withColumn("rep_keep_lp",
        col("dlf_l") <= 3000 && col("dpf_l") <= 3000 &&
          col("dlcf_l") <= 2000 && col("dpcf_l") <= 2000)
      .drop("_rep_w", "_rep_lines", "_rep_paras")
  }

  /** Characters claimed by the single most-frequent word n-gram:
    * count(top) × len(top), where top maximizes (count, char length)
    * lexicographically — the deterministic tie-break both engines
    * share (the paper's Counter.most_common leaves ties ambiguous).
    * Computed IN-ROW: sort the gram array, one linear fold tracking
    * the current run and the best (count, len) — O(P log P) per doc,
    * map-side, no shuffle. Docs shorter than n score 0. */
  private[graft] def topGramCharLen(w: Column, n: Int): Column = {
    val grams = when(size(w) >= n,
      transform(sequence(lit(0), size(w) - n),
        i => concat_ws(" ", slice(w, i + 1, lit(n))))).otherwise(emptyStr)
    aggregate(
      array_sort(grams),
      struct(lit("").as("cur"), lit(0L).as("run"),
        lit(0L).as("bc"), lit(0L).as("bl")),
      (acc, g) => {
        val run2 = when(acc("cur") === g, acc("run") + 1L).otherwise(lit(1L))
        val glen = length(g).cast(LongType)
        val better = run2 > acc("bc") ||
          (run2 === acc("bc") && glen > acc("bl"))
        struct(g.as("cur"), run2.as("run"),
          when(better, run2).otherwise(acc("bc")).as("bc"),
          when(better, glen).otherwise(acc("bl")).as("bl"))
      },
      acc => acc("bc") * acc("bl"))
  }

  /** Appends `top2_l`/`top3_l`/`top4_l` (scaled-integer top-n-gram
    * character shares ×10⁴ of the doc's character count) plus the
    * `rep_keep_ng` verdict. Gopher §A1.1 thresholds: top-2-gram ≤0.20,
    * top-3-gram ≤0.18, top-4-gram ≤0.16. Map-side. */
  private[graft] def withTopGramSignals(df: DataFrame, text: Column): DataFrame = {
    val w = col("_tg_w")
    df.withColumn("_tg_w", split(text, " "))
      .withColumn("top2_l", scaled(topGramCharLen(w, 2), length(text)))
      .withColumn("top3_l", scaled(topGramCharLen(w, 3), length(text)))
      .withColumn("top4_l", scaled(topGramCharLen(w, 4), length(text)))
      .withColumn("rep_keep_ng",
        col("top2_l") <= 2000 && col("top3_l") <= 1800 && col("top4_l") <= 1600)
      .drop("_tg_w")
  }

  /** The full repetition verdict (q185 ∧ q186) as one map-side kernel —
    * shared with [[graft.streaming.StreamingQualityGate]] so the live
    * gate and the batch censuses agree by construction. */
  private[graft] def withRepetitionSignals(df: DataFrame, text: Column,
      docId: Column): DataFrame =
    withTopGramSignals(withDupLineParaSignals(df, text, docId), text)
      .withColumn("rep_keep", col("rep_keep_lp") && col("rep_keep_ng"))

  // Shared DuckDB fragments for the derived segmentation — the exact
  // mirror of derivedLines/derivedParas (1-based inclusive list slices;
  // the injections guard on the chunk count like the Column kernel).
  // NOTE: these fragments are interpolated into oracles that ALSO call
  // stripMargin, so no continuation line may start with `|` (the outer
  // strip would eat it) — the list-concat `||` sits at line ends.
  private val linesSql =
    s"""CASE WHEN len(l0) >= 3 THEN l0 ||
      |  (CASE WHEN doc_id % 3 = 0 THEN [l0[2]] ELSE [] END) ||
      |  (CASE WHEN doc_id % 5 = 0 THEN [l0[1], l0[3]] ELSE [] END) ||
      |  (CASE WHEN doc_id % 7 = 0 THEN [l0[1], l0[1]] ELSE [] END)
      |ELSE l0 END""".stripMargin
  private val parasSql =
    s"""CASE WHEN len(p0) >= 2 THEN p0 ||
      |  (CASE WHEN doc_id % 4 = 0 THEN [p0[1]] ELSE [] END) ||
      |  (CASE WHEN doc_id % 11 = 0 THEN [p0[2], p0[2]] ELSE [] END)
      |ELSE p0 END""".stripMargin
  private def chunkSql(k: Int): String =
    s"""list_transform(range(CAST(floor((len(w) - 1) / $k.0) AS BIGINT) + 1),
      |    i -> array_to_string(w[i*$k+1 : i*$k+$k], ' '))""".stripMargin
  private val sumLenSql = (l: String) =>
    s"CAST(coalesce(list_sum(list_transform($l, x -> len(x))), 0) AS BIGINT)"

  // -- q185: Gopher duplicate-line / duplicate-paragraph fractions ------
  // Rae et al. 2021 §A1.1's most-used repetition filters: the fraction
  // of lines (paragraphs) that are repeats of an earlier line
  // (paragraph) in the same document, by count and by character share.
  // Line/paragraph structure is derived (see LineTokens); duplicate
  // injections on hash-mod doc classes make the rules fire both ways.
  //
  // Scale: per-row map-side signals over one scan — no shuffle, no
  // Generate; duplicate counting is array_distinct inside the row.
  val q185 = q("q185_gopher_dup_lines",
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |c0 AS (SELECT doc_id, ${chunkSql(LineTokens)} AS l0,
      |               ${chunkSql(ParaTokens)} AS p0 FROM d),
      |seg AS (SELECT doc_id, $linesSql AS lines, $parasSql AS paras FROM c0),
      |sig AS (SELECT doc_id,
      |    CAST(len(lines) AS BIGINT) AS n_lines,
      |    CAST(round(CAST(len(lines) - len(list_distinct(lines)) AS DOUBLE)
      |          * 10000 / greatest(1, len(lines))) AS BIGINT) AS dlf_l,
      |    CAST(round(CAST(${sumLenSql("lines")} - ${sumLenSql("list_distinct(lines)")} AS DOUBLE)
      |          * 10000 / greatest(1, ${sumLenSql("lines")})) AS BIGINT) AS dlcf_l,
      |    CAST(len(paras) AS BIGINT) AS n_paras,
      |    CAST(round(CAST(len(paras) - len(list_distinct(paras)) AS DOUBLE)
      |          * 10000 / greatest(1, len(paras))) AS BIGINT) AS dpf_l,
      |    CAST(round(CAST(${sumLenSql("paras")} - ${sumLenSql("list_distinct(paras)")} AS DOUBLE)
      |          * 10000 / greatest(1, ${sumLenSql("paras")})) AS BIGINT) AS dpcf_l
      |  FROM seg)
      |SELECT doc_id, n_lines,
      |  dlf_l / 10000.0 AS dup_line_frac,
      |  dlcf_l / 10000.0 AS dup_line_char_frac,
      |  n_paras,
      |  dpf_l / 10000.0 AS dup_para_frac,
      |  dpcf_l / 10000.0 AS dup_para_char_frac,
      |  (dlf_l <= 3000 AND dpf_l <= 3000 AND dlcf_l <= 2000
      |   AND dpcf_l <= 2000) AS keep
      |FROM sig ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val sig = withDupLineParaSignals(
      Tables(s, dir).documents.select(col("doc_id"), col("text")),
      col("text"), col("doc_id"))
    sig.select(col("doc_id"), col("n_lines"),
        (col("dlf_l") / 10000.0).as("dup_line_frac"),
        (col("dlcf_l") / 10000.0).as("dup_line_char_frac"),
        col("n_paras"),
        (col("dpf_l") / 10000.0).as("dup_para_frac"),
        (col("dpcf_l") / 10000.0).as("dup_para_char_frac"),
        col("rep_keep_lp").as("keep"))
      .orderBy("doc_id")
  }

  // -- q186: Gopher top-2/3/4-gram character shares ----------------------
  // The character share of the single most-frequent word n-gram, for
  // n = 2, 3, 4 — the Gopher "top n-gram" repetition rules. The small
  // synthetic vocabulary repeats n-grams naturally, so no derived dirt
  // is needed. The DuckDB argmax packs (count, len) into count·10⁵+len
  // (gram char length < 10⁵ at every test SF — the engine-side fold
  // has no such bound) and unpacks the product.
  //
  // Scale: the Spark side is an IN-ROW sorted fold — map-side, no
  // shuffle, no Generate; the gram strings never leave the row.
  private def topSqlCte(n: Int): String =
    s"""g$n AS (SELECT doc_id, unnest(CASE WHEN len(w) >= $n THEN
      |    list_transform(range(len(w) - $n + 1),
      |      i -> array_to_string(w[i+1 : i+$n], ' ')) ELSE [] END) AS g FROM d),
      |m$n AS (SELECT doc_id, max(cl) AS m FROM
      |    (SELECT doc_id, count(*) * 100000 + len(g) AS cl
      |     FROM g$n GROUP BY doc_id, g) GROUP BY doc_id)""".stripMargin
  val q186 = q("q186_gopher_top_ngram",
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w,
      |             len(text) AS nc FROM documents),
      |${topSqlCte(2)},
      |${topSqlCte(3)},
      |${topSqlCte(4)},
      |sig AS (SELECT d.doc_id, CAST(len(d.w) AS BIGINT) AS n_words,
      |    CAST(round(CAST(coalesce((m2.m // 100000) * (m2.m % 100000), 0) AS DOUBLE)
      |          * 10000 / greatest(1, d.nc)) AS BIGINT) AS top2_l,
      |    CAST(round(CAST(coalesce((m3.m // 100000) * (m3.m % 100000), 0) AS DOUBLE)
      |          * 10000 / greatest(1, d.nc)) AS BIGINT) AS top3_l,
      |    CAST(round(CAST(coalesce((m4.m // 100000) * (m4.m % 100000), 0) AS DOUBLE)
      |          * 10000 / greatest(1, d.nc)) AS BIGINT) AS top4_l
      |  FROM d LEFT JOIN m2 ON d.doc_id = m2.doc_id
      |         LEFT JOIN m3 ON d.doc_id = m3.doc_id
      |         LEFT JOIN m4 ON d.doc_id = m4.doc_id)
      |SELECT doc_id, n_words,
      |  top2_l / 10000.0 AS top2_share,
      |  top3_l / 10000.0 AS top3_share,
      |  top4_l / 10000.0 AS top4_share,
      |  (top2_l <= 2000 AND top3_l <= 1800 AND top4_l <= 1600) AS keep
      |FROM sig ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val sig = withTopGramSignals(
      Tables(s, dir).documents.select(col("doc_id"), col("text")),
      col("text"))
      .withColumn("n_words", size(split(col("text"), " ")).cast(LongType))
    sig.select(col("doc_id"), col("n_words"),
        (col("top2_l") / 10000.0).as("top2_share"),
        (col("top3_l") / 10000.0).as("top3_share"),
        (col("top4_l") / 10000.0).as("top4_share"),
        col("rep_keep_ng").as("keep"))
      .orderBy("doc_id")
  }

  // -- q187: corpus-wide line-grain exact dedup (RefinedWeb §3.3) --------
  // Remove every LINE whose exact text occurs ≥2 times corpus-wide —
  // the RefinedWeb/Falcon line-dedup release pass, a distinct grain
  // from q132 (gram document-frequency boilerplate) and q183 (≥50-token
  // substrings). Per source: documents affected, lines and characters
  // the purge removes, and the number of maximal removed RUNS of
  // consecutive lines (the spans a surgical purge would cut).
  //
  // The derived line structure is q185's chunking WITHOUT the
  // within-doc injections (cross-doc duplicates are what this pass
  // hunts; the small vocabulary produces them naturally) plus one
  // deterministic cross-doc injection — docs ≡0 mod 17 append a fixed
  // sentinel line — so the detector provably fires at every SF.
  //
  // Scale: ONE line-grain explode shipping a 60-bit hash + a length
  // per line (the line string dies at the map stage); census at
  // vocabulary grain (distinct line hashes); covered positions come
  // back via a hash equi-join; the run census is a lag window over
  // COVERED lines only (duplicated-text grain, orders below the
  // corpus); the bill is a source-keyed aggregate. No pair space — two
  // docs sharing a line never meet in a join.
  val SentinelLine = "the fast spark batch"
  val q187 = q("q187_line_dedup",
    s"""WITH d AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
      |c0 AS (SELECT doc_id, source, ${chunkSql(LineTokens)} AS l0 FROM d),
      |seg AS (SELECT doc_id, source,
      |          l0 || (CASE WHEN doc_id % 17 = 0 THEN ['$SentinelLine'] ELSE [] END) AS lines
      |        FROM c0),
      |ex AS (SELECT doc_id, source, s.lpos AS lpos, s.llen AS llen, s.gh AS gh
      |       FROM (SELECT doc_id, source,
      |               unnest(list_transform(range(len(lines)),
      |                 i -> {'lpos': i, 'llen': len(lines[i+1]),
      |                       'gh': CAST(concat('0x', substr(md5(lines[i+1]), 1, 15)) AS BIGINT)})) AS s
      |             FROM seg)),
      |c AS (SELECT gh FROM ex GROUP BY gh HAVING COUNT(*) >= 2),
      |cov AS (SELECT ex.doc_id, ex.source, ex.lpos, ex.llen,
      |          lag(ex.lpos) OVER (PARTITION BY ex.doc_id ORDER BY ex.lpos) AS prev
      |        FROM ex JOIN c USING (gh)),
      |per AS (SELECT doc_id, source,
      |          CAST(COUNT(*) AS BIGINT) AS rm_lines,
      |          CAST(SUM(llen) AS BIGINT) AS rm_chars,
      |          CAST(SUM(CASE WHEN prev IS NULL OR lpos > prev + 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_runs
      |        FROM cov GROUP BY doc_id, source)
      |SELECT seg.source,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(CASE WHEN per.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_affected,
      |  CAST(SUM(len(seg.lines)) AS BIGINT) AS total_lines,
      |  CAST(SUM(coalesce(per.rm_lines, 0)) AS BIGINT) AS removed_lines,
      |  CAST(SUM(coalesce(per.rm_chars, 0)) AS BIGINT) AS removed_chars,
      |  CAST(SUM(coalesce(per.n_runs, 0)) AS BIGINT) AS n_runs
      |FROM seg LEFT JOIN per ON seg.doc_id = per.doc_id
      |GROUP BY seg.source ORDER BY seg.source""".stripMargin) { (s, dir) =>
    val w = split(col("text"), " ")
    val lines0 = chunk(w, LineTokens)
    val seg = Tables(s, dir).documents.select(col("doc_id"), col("source"),
      concat(lines0,
        when(col("doc_id") % 17 === 0, array(lit(SentinelLine)))
          .otherwise(emptyStr)).as("lines"))
    val ex = seg
      .select(col("doc_id"), col("source"),
        posexplode(col("lines")).as(Seq("lpos", "line")))
      .select(col("doc_id"), col("source"), col("lpos"),
        length(col("line")).cast(LongType).as("llen"),
        crossHash60(col("line")).as("gh"))
    val census = ex.groupBy("gh").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2).select("gh")
    val byDoc = Window.partitionBy("doc_id").orderBy("lpos")
    val cov = ex.join(census, "gh")
      .withColumn("prev", lag(col("lpos"), 1).over(byDoc))
    val per = cov.groupBy("doc_id", "source").agg(
      count(lit(1)).as("rm_lines"),
      sum(col("llen")).as("rm_chars"),
      sum(when(col("prev").isNull || col("lpos") > col("prev") + 1, 1L)
        .otherwise(0L)).as("n_runs"))
    seg.select(col("doc_id"), col("source"), size(col("lines")).as("nl"))
      .join(per.drop("source"), Seq("doc_id"), "left")
      .groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("rm_lines").isNotNull, 1L).otherwise(0L)).as("n_affected"),
        sum(col("nl").cast(LongType)).as("total_lines"),
        sum(coalesce(col("rm_lines"), lit(0L))).as("removed_lines"),
        sum(coalesce(col("rm_chars"), lit(0L))).as("removed_chars"),
        sum(coalesce(col("n_runs"), lit(0L))).as("n_runs"))
      .orderBy("source")
  }

  // -- q188: Gopher duplicate-n-gram character fractions (n = 5..10) ----
  // The last of Rae et al. 2021 §A1.1's repetition filters: for each
  // n in 5..10, the fraction of document CHARACTERS lying inside some
  // n-gram window whose gram occurs ≥2 times in the SAME document
  // (character coverage by duplicated n-grams — each character counted
  // once however many windows cover it). Thresholds: 0.15/0.14/0.13/
  // 0.12/0.11/0.10. Clean synthetic prose rarely repeats ≥5-grams
  // within one doc, so — the derived-corpus discipline — hash-mod doc
  // classes append a repeat of their own opening span (12 or 20
  // tokens), which duplicates every n ≤ span n-gram inside it.
  //
  // Scale shape (r16): a MAP-ONLY per-doc kernel — no Generate, no
  // token-grain exchange, no joins; the only exchange left is the
  // display orderBy (plan-gated). Through r15 this was a token-grain
  // explode + one doc-keyed exchange + 12 window sorts (6 duplicate
  // censuses + 6 coverage windows), on the rationale that in-row
  // duplicate marking costs O(P²) in SQL expressions; the typed
  // [[dupNgramKernel]] removes that limit with a per-doc hash map
  // (O(P·6) time, O(P) memory — bounded by the document the row
  // already holds), which is also the shape that survives 100 TB
  // best: zero shuffle bytes at token grain.
  private val DupNs = 5 to 10
  private val DupNgramKeepScaled = Map(5 -> 1500L, 6 -> 1400L, 7 -> 1300L,
    8 -> 1200L, 9 -> 1100L, 10 -> 1000L)

  // The q188 derived corpus (inlined in [[dupNgramKernel]], mirrored in
  // the oracle): docs ≡0 mod 6 re-append their first 12 tokens, ≡0 mod
  // 11 their first 20, and ≡0 mod 7 their first SEVEN — a span that
  // duplicates 5/6/7-grams but no ≥8-gram, so the per-n signals
  // genuinely diverge (a repeated span of length s covers exactly its
  // s tokens for EVERY n ≤ s, so without the short span all six
  // fractions would be identical per doc).

  private def dupNgramOracle: String = {
    val ghFields = DupNs.map(n =>
      s"""'gh$n': CASE WHEN i + $n <= len(w) THEN CAST(concat('0x',
        substr(md5(array_to_string(w[i+1 : i+$n], ' ')), 1, 15)) AS BIGINT)
        ELSE NULL END""").mkString(",\n          ")
    val ghSel = DupNs.map(n => s"s.gh$n AS gh$n").mkString(", ")
    val dupCols = DupNs.map(n =>
      s"(gh$n IS NOT NULL AND count(*) OVER (PARTITION BY doc_id, gh$n) >= 2) AS dup$n")
      .mkString(",\n        ")
    val covCols = DupNs.map(n =>
      s"""max(CASE WHEN dup$n THEN 1 ELSE 0 END) OVER (PARTITION BY doc_id
        ORDER BY pos ROWS BETWEEN ${n - 1} PRECEDING AND CURRENT ROW) AS cov$n""")
      .mkString(",\n        ")
    val fracCols = DupNs.map(n =>
      s"""CAST(round(SUM(CASE WHEN cov$n = 1 THEN wlen ELSE 0 END) * 10000.0
        / SUM(wlen)) AS BIGINT) AS d${n}_l""").mkString(",\n        ")
    val outCols = DupNs.map(n => s"d${n}_l / 10000.0 AS dup${n}_share").mkString(", ")
    val keepSql = DupNs.map(n => s"d${n}_l <= ${DupNgramKeepScaled(n)}").mkString(" AND ")
    s"""WITH d0 AS (SELECT doc_id, string_split(text, ' ') AS t0 FROM documents),
      |d AS (SELECT doc_id, t0 ||
      |        (CASE WHEN doc_id % 6 = 0 AND len(t0) >= 12 THEN t0[1:12] ELSE [] END) ||
      |        (CASE WHEN doc_id % 11 = 0 AND len(t0) >= 20 THEN t0[1:20] ELSE [] END) ||
      |        (CASE WHEN doc_id % 7 = 0 AND len(t0) >= 7 THEN t0[1:7] ELSE [] END) AS w
      |      FROM d0),
      |tok AS (SELECT doc_id, s.pos AS pos, s.wlen AS wlen, $ghSel
      |        FROM (SELECT doc_id, unnest(list_transform(range(len(w)),
      |            i -> {'pos': i, 'wlen': len(w[i+1]),
      |          $ghFields})) AS s FROM d)),
      |f AS (SELECT doc_id, pos, wlen,
      |        $dupCols
      |      FROM tok),
      |c AS (SELECT doc_id, wlen,
      |        $covCols
      |      FROM f),
      |sig AS (SELECT doc_id,
      |        $fracCols
      |      FROM c GROUP BY doc_id)
      |SELECT doc_id, $outCols,
      |  ($keepSql) AS keep
      |FROM sig ORDER BY doc_id""".stripMargin
  }

  /** The fused per-doc output: scaled coverage fractions for n = 5..10
    * (×10⁴, the cross-engine integer form). */
  private[graft] final case class DupNgramSig(doc_id: Long, d5_l: Long,
      d6_l: Long, d7_l: Long, d8_l: Long, d9_l: Long, d10_l: Long)

  /** Fused duplicate-n-gram kernel (r15 VERDICT #3): ALL six coverage
    * fractions from one in-row pass. The pre-r16 dataflow exploded to
    * token grain and ran 6 census windows + 6 coverage windows — 12
    * sorts over the token grain on one exchange; the registry's most
    * expensive query. A per-doc hash map makes the duplicate census
    * O(P) per n (the windowed-SQL formulation was kept OUT of the row
    * because SQL expressions have no per-doc map, making in-row
    * duplicate marking O(P²) — the scaladoc's original rationale; a
    * typed kernel has no such limit), so the whole query is now
    * MAP-ONLY: no Generate, no token-grain exchange, no sorts except
    * the display orderBy. Memory per row is O(P) token refs + the gram
    * count map — bounded by the document itself, which the row already
    * holds.
    *
    * Bit-equality with the oracle (and the pre-fusion plan) rests on:
    * `split(" ", -1)` ≙ Spark `split`/DuckDB `string_split` (trailing
    * empties kept); code-point token lengths ≙ `length()`/`len()`;
    * [[graft.QueryDsl.crossHash60Jvm]] ≙ the md5 gram hash; and
    * HALF_UP rounding of the same IEEE quotient ≙ Spark `round` /
    * DuckDB `round`. Curation16Spec pins kernel ≡ windowed-SQL
    * equality on the fixture corpus. */
  private[graft] def dupNgramKernel(docId: Long, text: String): DupNgramSig = {
    val t0 = text.split(" ", -1)
    val w: Array[String] = {
      val b = Array.newBuilder[String]
      b ++= t0
      if (docId % 6 == 0 && t0.length >= 12) b ++= t0.take(12)
      if (docId % 11 == 0 && t0.length >= 20) b ++= t0.take(20)
      if (docId % 7 == 0 && t0.length >= 7) b ++= t0.take(7)
      b.result()
    }
    val p = w.length
    val wlen = new Array[Long](p)
    var totalW = 0L
    var i = 0
    while (i < p) {
      val l = w(i).codePointCount(0, w(i).length).toLong
      wlen(i) = l; totalW += l; i += 1
    }
    val ds = new Array[Long](DupNs.size)
    val sb = new java.lang.StringBuilder
    var ni = 0
    while (ni < DupNs.size) {
      val n = DupNs.start + ni
      val nGrams = p - n + 1
      var covSum = 0L
      if (nGrams > 0) {
        val gh = new Array[Long](nGrams)
        val counts = new java.util.HashMap[java.lang.Long, Integer](nGrams * 2)
        var g = 0
        while (g < nGrams) {
          sb.setLength(0)
          var k = 0
          while (k < n) { if (k > 0) sb.append(' '); sb.append(w(g + k)); k += 1 }
          val h = graft.QueryDsl.crossHash60Jvm(sb.toString)
          gh(g) = h
          counts.merge(h, 1, (a, b) => Integer.valueOf(a.intValue + b.intValue))
          g += 1
        }
        // position pos is covered iff some DUPLICATED window start lies
        // in [pos-n+1, pos] — the ROWS (n-1) PRECEDING sliding max,
        // computed streaming via the last duplicated start seen
        var lastDup = Int.MinValue
        var pos = 0
        while (pos < p) {
          if (pos < nGrams && counts.get(gh(pos)).intValue >= 2) lastDup = pos
          if (lastDup >= pos - n + 1) covSum += wlen(pos)
          pos += 1
        }
      }
      // Spark round(double) ≙ BigDecimal.valueOf + HALF_UP; an empty
      // doc's 0/0 is NaN, which Spark's long cast sends to 0
      ds(ni) =
        if (totalW == 0L) 0L
        else java.math.BigDecimal.valueOf(covSum * 10000.0 / totalW)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
      ni += 1
    }
    DupNgramSig(docId, ds(0), ds(1), ds(2), ds(3), ds(4), ds(5))
  }

  val q188 = q("q188_gopher_dup_ngrams", dupNgramOracle) { (s, dir) =>
    import s.implicits._
    val sig = Tables(s, dir).documents
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, tx) => dupNgramKernel(id, tx) }
      .toDF()
    val keep = DupNs.map(n => col(s"d${n}_l") <= DupNgramKeepScaled(n)).reduce(_ && _)
    sig.select((col("doc_id") +:
        DupNs.map(n => (col(s"d${n}_l") / 10000.0).as(s"dup${n}_share")).toSeq) :+
        keep.as("keep"): _*)
      .orderBy("doc_id")
  }

  // -- q189: line-grain purge APPLIED (cleaned-corpus emission) ----------
  // q187 is the purge BILL; this is the ACTION: every line whose exact
  // text occurs ≥2 times corpus-wide is removed and each document's
  // cleaned text re-assembled from its surviving lines in order — the
  // output a release pipeline actually ships. Same derived line
  // structure and census as q187 (Curation16Spec pins removal-count
  // agreement between the two), and the oracle compares the CLEANED
  // TEXT string per document, so any ordering or reassembly slip
  // hash-fails.
  //
  // Scale: the census side is duplicated-vocabulary-sized and rides a
  // hash anti-join (AQE broadcasts it when small); the line STRINGS
  // ship through exactly one explode + one doc-keyed reassembly
  // aggregate — unavoidable, the cleaned corpus IS the output. Docs
  // losing every line survive as empty strings via the doc-grain left
  // join (an inner shape would silently drop fully-purged docs).
  val q189 = q("q189_line_purge_apply",
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |c0 AS (SELECT doc_id, ${chunkSql(LineTokens)} AS l0 FROM d),
      |seg AS (SELECT doc_id,
      |          l0 || (CASE WHEN doc_id % 17 = 0 THEN ['$SentinelLine'] ELSE [] END) AS lines
      |        FROM c0),
      |ex AS (SELECT doc_id, s.lpos AS lpos, s.line AS line,
      |         CAST(concat('0x', substr(md5(s.line), 1, 15)) AS BIGINT) AS gh
      |       FROM (SELECT doc_id,
      |               unnest(list_transform(range(len(lines)),
      |                 i -> {'lpos': i, 'line': lines[i+1]})) AS s
      |             FROM seg)),
      |c AS (SELECT gh FROM ex GROUP BY gh HAVING COUNT(*) >= 2),
      |kept AS (SELECT ex.doc_id, ex.lpos, ex.line
      |         FROM ex ANTI JOIN c USING (gh)),
      |per AS (SELECT doc_id,
      |          CAST(COUNT(*) AS BIGINT) AS n_kept,
      |          string_agg(line, ' ' ORDER BY lpos) AS clean_text
      |        FROM kept GROUP BY doc_id)
      |SELECT seg.doc_id,
      |  CAST(coalesce(per.n_kept, 0) AS BIGINT) AS n_kept,
      |  CAST(len(seg.lines) - coalesce(per.n_kept, 0) AS BIGINT) AS n_removed,
      |  coalesce(per.clean_text, '') AS clean_text
      |FROM seg LEFT JOIN per ON seg.doc_id = per.doc_id
      |ORDER BY seg.doc_id""".stripMargin) { (s, dir) =>
    val w = split(col("text"), " ")
    val lines0 = chunk(w, LineTokens)
    val seg = Tables(s, dir).documents.select(col("doc_id"),
      concat(lines0,
        when(col("doc_id") % 17 === 0, array(lit(SentinelLine)))
          .otherwise(emptyStr)).as("lines"))
    val ex = seg
      .select(col("doc_id"), posexplode(col("lines")).as(Seq("lpos", "line")))
      .withColumn("gh", crossHash60(col("line")))
    val census = ex.groupBy("gh").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2).select("gh")
    val per = ex.join(census, Seq("gh"), "left_anti")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(" ",
          transform(array_sort(collect_list(struct(col("lpos"), col("line")))),
            kv => kv("line"))).as("clean_text"))
    seg.select(col("doc_id"), size(col("lines")).cast(LongType).as("n_lines"))
      .join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_lines") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
      .orderBy("doc_id")
  }

  // -- q190: per-paragraph language-consistency census --------------------
  // CCNet (Wenzek et al. 2020) runs language-ID at PARAGRAPH grain and
  // drops or splits documents whose paragraphs disagree — the doc-grain
  // q24 verdict hides a mixed-language document entirely. Paragraphs
  // are the q185 12-token derived segmentation; docs ≡0 mod 9 gain one
  // injected German-function-word paragraph (the derived-corpus
  // discipline) so mixed documents provably exist at every SF. Each
  // paragraph is scored by the SAME native langid kernel as q24 (the
  // oracle mirrors its profile scoring literally, per q24's scaladoc);
  // the census reports the per-doc dominant language (majority vote,
  // (count desc, lang) tie-break) and the consistency fraction.
  //
  // Scale: langid is map-side on the paragraph explode — only (doc_id,
  // predicted-lang) pairs reach the shuffle, never paragraph text; the
  // count relation is doc×lang grain (≤ |profiles|+1 rows per doc), so
  // the argmax window and totals are census-sized.
  val GermanPara = "der die das und ist nicht ein zu mit von so da"
  val q190 = q("q190_paragraph_langid",
    s"""WITH profiles(plang, words, bgl) AS (VALUES
      |  ('en', ['the','a','and','of','is','to','in','that','it','for'],
      |         ['th','he','in','er','an','ng']),
      |  ('de', ['der','die','das','und','ist','nicht','ein','zu','mit','von'],
      |         ['ch','ei','en','ie','sc','tz']),
      |  ('es', ['el','la','los','de','que','y','en','un','una','es'],
      |         ['ll','os','as','ci','ón','qu']),
      |  ('fr', ['le','les','des','de','et','est','un','une','dans','que'],
      |         ['ou','au','eu','oi','ai','qu']),
      |  ('zh', [], [])),
      |d0 AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |c0 AS (SELECT doc_id, ${chunkSql(ParaTokens)} AS p0 FROM d0),
      |seg AS (SELECT doc_id,
      |          p0 || (CASE WHEN doc_id % 9 = 0 THEN ['$GermanPara'] ELSE [] END) AS paras
      |        FROM c0),
      |p AS (SELECT doc_id, unnest(paras) AS para FROM seg),
      |pt AS (SELECT doc_id, para, string_split(para, ' ') AS t,
      |         CASE WHEN length(para) >= 2
      |              THEN list_transform(range(1, length(para)), i -> para[i:i+1])
      |              ELSE [para] END AS bg
      |       FROM p),
      |sc AS (SELECT doc_id, para, plang,
      |         CAST(len(list_filter(t, x -> list_contains(words, x))) AS DOUBLE) / len(t)
      |         + 0.5 * (CAST(len(list_filter(bg, x -> list_contains(bgl, x))) AS DOUBLE)
      |                  / greatest(1, len(bg))) AS score
      |       FROM pt CROSS JOIN profiles),
      |r AS (SELECT doc_id, para, plang, score,
      |        row_number() OVER (PARTITION BY doc_id, para ORDER BY score DESC, plang) AS rk
      |      FROM sc),
      |pl AS (SELECT doc_id,
      |         CASE WHEN score = 0.0 THEN 'und' ELSE plang END AS plang
      |       FROM r WHERE rk = 1),
      |cnt AS (SELECT doc_id, plang, CAST(COUNT(*) AS BIGINT) AS c
      |        FROM pl GROUP BY doc_id, plang),
      |dom AS (SELECT doc_id, plang, c,
      |          row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, plang) AS rk,
      |          CAST(SUM(c) OVER (PARTITION BY doc_id) AS BIGINT) AS n_paras
      |        FROM cnt)
      |SELECT doc_id, n_paras, plang AS dominant_lang, c AS n_dominant,
      |  CAST(round(CAST(c AS DOUBLE) * 10000 / n_paras) AS BIGINT) / 10000.0 AS consistency,
      |  (c < n_paras) AS mixed
      |FROM dom WHERE rk = 1 ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val w = split(col("text"), " ")
    val paras = concat(chunk(w, ParaTokens),
      when(col("doc_id") % 9 === 0, array(lit(GermanPara))).otherwise(emptyStr))
    val perPara = Tables(s, dir).documents
      .select(col("doc_id"), explode(paras).as("para"))
      .select(col("doc_id"),
        graft.functions.expr.TextExpressions.langId(col("para")).as("pred"))
      .select(col("doc_id"), col("pred.lang").as("plang"))
    val cnt = perPara.groupBy("doc_id", "plang").agg(count(lit(1)).as("c"))
    // r19: dominant-lang argmax as a struct-MIN aggregate, not a
    // row_number window + a second sum window over the same partition
    // (the q123 vote-argmax move, adapted to a STRING tie-break):
    // lexicographic min of (-c, plang) is most paragraphs first, ties
    // to the SMALLEST lang — exactly the window's ORDER BY c DESC,
    // plang rk=1 row — and n_paras rides the same hash aggregate with
    // map-side partials instead of a partition-wide sort + two window
    // passes. Integers throughout; same single doc-keyed exchange.
    val dom = cnt.groupBy("doc_id")
      .agg(min(struct((-col("c")).as("nc"), col("plang"))).as("m"),
        sum(col("c")).as("n_paras"))
      .select(col("doc_id"), col("n_paras"),
        col("m.plang").as("plang"), (-col("m.nc")).as("c"))
    dom
      .select(col("doc_id"), col("n_paras"),
        col("plang").as("dominant_lang"), col("c").as("n_dominant"),
        (round(col("c").cast(DoubleType) * 10000 / col("n_paras")).cast(LongType)
          / 10000.0).as("consistency"),
        (col("c") < col("n_paras")).as("mixed"))
      .orderBy("doc_id")
  }

  // -- q191: CCNet head/middle/tail fluency bucketing ---------------------
  // CCNet's signature mixing move (Wenzek et al. 2020 §4.3): rank each
  // source's documents by LM fluency, cut into terciles (head = most
  // fluent), and bill tokens per bucket — the plan a mixture then
  // samples from ("keep head+middle" is the standard recipe). Fluency
  // is q101's transcendental-free corpus-bigram score (avg conditional
  // probability; its determinism argument lives at q101), so the
  // tercile ORDER — (avg_p DESC, doc_id) — is bit-identical in both
  // engines and ntile is exact. Bucket stats stay order-free (counts,
  // sums of integers, min/max of the score); no mean-of-doubles.
  //
  // Scale: the fluency relation is doc-grain (q101's shape: bigram LM
  // broadcasts, corpus read once); the tercile window is ONE exchange
  // on source; the census rides that partitioning.
  //
  // Domain note (ADVICE r14): a document with FEWER THAN 2 TOKENS has
  // no bigrams, no fluency score, and is EXCLUDED from the census by
  // the inner join against the fluency relation — in both engines, so
  // the oracle agrees. The test corpora contain no such docs, which is
  // the only reason the spec's doc-conservation assertion holds; on a
  // corpus with degenerate docs the n_docs sum dropping below the
  // corpus count is this documented exclusion, not a conservation bug
  // (CCNet itself cannot score a doc its LM sees zero n-grams for —
  // route such docs to a worst-bucket policy upstream if they must be
  // billed).
  val q191 = q("q191_fluency_buckets",
    """WITH d AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
      |bg AS (SELECT doc_id,
      |         unnest(list_transform(range(1, len(t)), i -> t[i])) AS w1,
      |         unnest(list_transform(range(1, len(t)), i -> t[i+1])) AS w2
      |       FROM d WHERE len(t) >= 2),
      |bc AS (SELECT w1, w2, COUNT(*) AS n FROM bg GROUP BY 1, 2),
      |uc AS (SELECT w1, w2, n, CAST(SUM(n) OVER (PARTITION BY w1) AS BIGINT) AS ctx_n FROM bc),
      |term AS (SELECT doc_id, CAST(n AS DOUBLE) / CAST(ctx_n AS DOUBLE) AS p
      |         FROM bg JOIN uc USING (w1, w2)),
      |fl AS (SELECT doc_id,
      |         CAST(SUM(CAST(round(p, 9) AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*) AS avg_p
      |       FROM term GROUP BY doc_id),
      |ranked AS (SELECT d.source, d.doc_id, CAST(len(d.t) AS BIGINT) AS n_tokens,
      |             fl.avg_p,
      |             ntile(3) OVER (PARTITION BY d.source
      |                            ORDER BY fl.avg_p DESC, d.doc_id) AS bucket
      |           FROM d JOIN fl ON d.doc_id = fl.doc_id)
      |SELECT source, CAST(bucket AS BIGINT) AS bucket,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
      |  min(avg_p) AS min_fluency,
      |  max(avg_p) AS max_fluency
      |FROM ranked GROUP BY source, bucket
      |ORDER BY source, bucket""".stripMargin) { (s, dir) =>
    val fl = Curation.bigramFluency(s, dir).select(col("doc_id"), col("avg_p"))
    val meta = Tables(s, dir).documents.select(col("doc_id"), col("source"),
      size(split(col("text"), " ")).cast(LongType).as("n_tokens"))
    val ranked = meta.join(fl, Seq("doc_id"))
      .withColumn("bucket",
        ntile(3).over(Window.partitionBy("source")
          .orderBy(col("avg_p").desc, col("doc_id"))).cast(LongType))
    ranked.groupBy("source", "bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        min(col("avg_p")).as("min_fluency"),
        max(col("avg_p")).as("max_fluency"))
      .orderBy("source", "bucket")
  }

  // -- q192: per-source token-budget sampler (mixture execution) ----------
  // The step that turns mixture WEIGHTS into an actual dataset (the
  // Dolma/Pile release recipe): each source gets a token budget
  // (weight × its total tokens; weights derived deterministically from
  // the source-name hash so both engines agree), its documents are
  // ordered by a reproducible uniform shuffle (crossHash60 of doc_id —
  // the q99 discipline: same corpus + same weights ⇒ same sample, any
  // engine, any cluster), and the sample is the maximal prefix whose
  // cumulative token count fits the budget. The census bills each
  // source (kept docs/tokens, utilization) plus a doc_id-sum checksum
  // that pins the exact MEMBERSHIP of the sample, not just its size.
  //
  // Scale: one scan projecting (source, n_tokens, hash) — text never
  // leaves the row — then ONE source-keyed exchange carries the
  // cumulative-sum window, the per-source total (unbounded frame on
  // the same partitioning), and the census aggregate. All arithmetic
  // is integer or same-operand IEEE (weight×total multiplies identical
  // doubles in both engines), so the cut — and hence the checksum —
  // is exact.
  val q192 = q("q192_token_budget_sample", {
    val hDoc = graft.QueryDsl.crossHash60Sql("doc_id")
    val hSrc = graft.QueryDsl.crossHash60Sql("source")
    s"""WITH d AS (SELECT doc_id, source,
      |        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |        $hDoc AS h FROM documents),
      |r AS (SELECT doc_id, source, n_tokens,
      |        CAST(($hSrc % 5 + 3) AS DOUBLE) / 10.0 AS w,
      |        SUM(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |        SUM(n_tokens) OVER (PARTITION BY source) AS total
      |      FROM d),
      |k AS (SELECT *, CAST(round(w * CAST(total AS DOUBLE)) AS BIGINT) AS budget,
      |        (cum <= CAST(round(w * CAST(total AS DOUBLE)) AS BIGINT)) AS kept
      |      FROM r)
      |SELECT source,
      |  CAST(max(budget) AS BIGINT) AS budget,
      |  CAST(max(total) AS BIGINT) AS total_tokens,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  CAST(SUM(CASE WHEN kept THEN n_tokens ELSE 0 END) AS BIGINT) AS tokens_kept,
      |  CAST(round(CAST(SUM(CASE WHEN kept THEN n_tokens ELSE 0 END) AS DOUBLE)
      |       * 10000 / max(budget)) AS BIGINT) / 10000.0 AS utilization,
      |  CAST(SUM(CASE WHEN kept THEN doc_id ELSE 0 END) AS BIGINT) AS kept_id_sum
      |FROM k GROUP BY source ORDER BY source""".stripMargin
  }) { (s, dir) =>
    val d = Tables(s, dir).documents.select(col("doc_id"), col("source"),
      size(split(col("text"), " ")).cast(LongType).as("n_tokens"),
      crossHash60(col("doc_id")).as("h"))
    val bySrc = Window.partitionBy("source")
    val r = d
      .withColumn("w",
        (pmod(crossHash60(col("source")), lit(5L)) + 3L).cast(DoubleType) / 10.0)
      .withColumn("cum", sum(col("n_tokens"))
        .over(bySrc.orderBy(col("h"), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("total", sum(col("n_tokens")).over(bySrc))
      .withColumn("budget",
        round(col("w") * col("total").cast(DoubleType)).cast(LongType))
      .withColumn("kept", col("cum") <= col("budget"))
    r.groupBy("source")
      .agg(max(col("budget")).as("budget"),
        max(col("total")).as("total_tokens"),
        count(lit(1)).as("n_docs"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("kept"), col("n_tokens")).otherwise(0L)).as("tokens_kept"),
        (round(sum(when(col("kept"), col("n_tokens")).otherwise(0L))
            .cast(DoubleType) * 10000 / max(col("budget"))).cast(LongType)
          / 10000.0).as("utilization"),
        sum(when(col("kept"), col("doc_id")).otherwise(0L)).as("kept_id_sum"))
      .orderBy("source")
  }

  val all: Seq[GraftQuery] = Seq(q185, q186, q187, q188, q189, q190, q191, q192)
}
