package graft.queries

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Sixth corpus-curation batch: the lexical-model curation stages —
  * a seed-set vote classifier (the fastText-style quality-classifier
  * bootstrap, here in its exactly-replayable integer form) and
  * corpus-frequency boilerplate purging (the RefinedWeb/Dolma pass that
  * removes spans appearing across many documents — nav bars, cookie
  * banners, templated footers).
  *
  * Both operators share the pipeline's canonical scale asymmetry: the
  * CORPUS is only ever scanned (once per stage, map-only except one
  * per-doc aggregate), while every learned artifact — seed token
  * statistics, the vote table, the boilerplate gram set — is
  * VOCABULARY-sized and broadcast. Nothing corpus-sized is cached,
  * collected, or shuffled by token.
  */
object Curation6 {

  private def q(name: String, oracle: String)(f: (SparkSession, String) => DataFrame) =
    GraftQuery(name, f, Some(oracle))

  // -- q131: seed-set token-vote quality classifier ---------------------
  // The quality-classifier bootstrap used by GPT-3/LLaMA-style curation
  // (Brown et al. 2020 §A; fastText linear classifiers): learn a
  // lexical scorer from a trusted positive seed vs a negative sample,
  // then score the whole corpus. The trained artifact here is a VOTE
  // table — per token, compare its document-frequency RATE in the two
  // seeds by integer cross-multiplication (pdf·Nneg vs ndf·Npos: the
  // sign of the naive-Bayes log-odds without the transcendental), so
  // training, scoring, and the DuckDB oracle are bit-identical integer
  // computations (the q118 rational-idf trick applied to NB).
  //
  // Plan shape: two seed scans feed token-level DF aggregates (each
  // vocab-sized after map-side combine), full-outer-merged into the
  // vote table, which is BROADCAST against one corpus scan; per-doc
  // distinct tokens come from an in-row array_distinct (no (doc,token)
  // dedup shuffle). At 100 TB the seeds are small by construction
  // (curated positives + a sampled negative slice), so training cost is
  // independent of corpus size; scoring is one scan + a doc-count
  // aggregate. Score = Σ votes over the doc's distinct tokens;
  // pos/neg/margin are exact integers.
  /** q131's trained artifact as a standalone relation: per token, the
    * sign of the NB log-odds between the two seed slices (+1 / −1 / 0
    * by integer cross-multiplication). Vocabulary-sized; broadcast in
    * the batch query, collected-and-frozen by the streaming twin
    * ([[graft.streaming.StreamingVoteClassifier]]). */
  private[graft] def voteTable(docs: DataFrame,
      posSources: Seq[String], negSources: Seq[String]): DataFrame = {
    val posSeed = docs.where(col("source").isin(posSources: _*))
    val negSeed = docs.where(col("source").isin(negSources: _*))
    def seedDf(seed: DataFrame, dfCol: String): DataFrame =
      seed.select(col("doc_id"),
          explode(array_distinct(split(col("text"), " "))).as("word"))
        .groupBy("word").agg(count(lit(1)).as(dfCol))
    val nPos = posSeed.agg(count(lit(1)).as("n_pos"))
    val nNeg = negSeed.agg(count(lit(1)).as("n_neg"))
    seedDf(posSeed, "pdf")
      .join(seedDf(negSeed, "ndf"), Seq("word"), "full_outer")
      .crossJoin(broadcast(nPos)).crossJoin(broadcast(nNeg))
      .select(col("word"),
        (coalesce(col("pdf"), lit(0L)) * col("n_neg"))
          .minus(coalesce(col("ndf"), lit(0L)) * col("n_pos")).as("d"))
      .select(col("word"),
        when(col("d") > 0, 1).when(col("d") < 0, -1).otherwise(0)
          .cast(LongType).as("vote"))
  }

  val q131 = q("q131_seed_vote_classifier",
    """WITH pos AS (SELECT doc_id, text FROM documents WHERE source IN ('src0','src1','src2')),
      |neg AS (SELECT doc_id, text FROM documents WHERE source IN ('src17','src18','src19')),
      |np AS (SELECT COUNT(*) AS n FROM pos), nn AS (SELECT COUNT(*) AS n FROM neg),
      |pdf AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS df
      |        FROM (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS word FROM pos)
      |        GROUP BY word),
      |ndf AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS df
      |        FROM (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS word FROM neg)
      |        GROUP BY word),
      |votes AS (SELECT COALESCE(pdf.word, ndf.word) AS word,
      |    CASE WHEN COALESCE(pdf.df, 0) * (SELECT n FROM nn)
      |              > COALESCE(ndf.df, 0) * (SELECT n FROM np) THEN 1
      |         WHEN COALESCE(pdf.df, 0) * (SELECT n FROM nn)
      |              < COALESCE(ndf.df, 0) * (SELECT n FROM np) THEN -1
      |         ELSE 0 END AS vote
      |  FROM pdf FULL OUTER JOIN ndf ON pdf.word = ndf.word),
      |docw AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS word FROM documents)
      |SELECT doc_id,
      |  CAST(SUM(CASE WHEN vote = 1 THEN 1 ELSE 0 END) AS BIGINT) AS pos_votes,
      |  CAST(SUM(CASE WHEN vote = -1 THEN 1 ELSE 0 END) AS BIGINT) AS neg_votes,
      |  CAST(SUM(vote) AS BIGINT) AS margin,
      |  CASE WHEN SUM(vote) > 0 THEN 'keep' ELSE 'drop' END AS label
      |FROM docw JOIN votes USING (word)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables(s, dir).documents
    val votes = voteTable(docs, Seq("src0", "src1", "src2"), Seq("src17", "src18", "src19"))
    docs.select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("word"))
      .join(broadcast(votes), Seq("word"))
      .groupBy("doc_id")
      .agg(sum(when(col("vote") === 1, 1L).otherwise(0L)).as("pos_votes"),
        sum(when(col("vote") === -1, 1L).otherwise(0L)).as("neg_votes"),
        sum(col("vote")).as("margin"))
      .withColumn("label", when(col("margin") > 0, "keep").otherwise("drop"))
      .orderBy("doc_id")
  }

  // -- q132: corpus-frequency boilerplate purge -------------------------
  // The boilerplate pass of RefinedWeb/Dolma-style cleaning: a word
  // 3-gram that appears in at least max(5, 1% of docs) DISTINCT
  // documents is template text (nav/footer/banner), and every
  // occurrence is flagged for removal — unlike span dedup (q78), which
  // keeps the FIRST occurrence, boilerplate is purged everywhere.
  // Output = the per-doc purge report (gram occurrences, flagged
  // occurrences, flagged ratio) that downstream token budgeting needs.
  //
  // Plan shape (r17 restructure — the whole query runs at DISTINCT-TEXT
  // grain): the Dedup.distinctTextToks collapse tokenizes once per
  // distinct text (its exchange doubles as the CSE barrier — the old
  // doc-grain form inlined split() into the gram lambda and re-ran it
  // per element access), grams build in-row once per distinct text and
  // the relation persists eagerly (3 references). Pass 1 builds the
  // gram document-frequency table — per-TEXT distinct grams via in-row
  // array_distinct, weighted by the copy count (df counts DOCS, and
  // every copy of a text contains the same grams), one gram-keyed
  // aggregate. The threshold join uses an integer cross-multiply
  // (df·100 ≥ n_docs) against a 1-row broadcast count, and the
  // surviving BOILERPLATE set is small by construction — it is the
  // ≥ max(5, 1%·n)-df HEAD of a Zipfian df distribution, so
  // |boiler| ≤ Σdf / (n/100) ≤ 100 · avg distinct grams per doc —
  // CORPUS-SIZE-INDEPENDENT. Pass 2 left-joins it BROADCAST over the
  // distinct-text gram occurrences (duplication-invariant work) and
  // aggregates per text; copies get their rows by exploding the member
  // list. If an adversarial corpus made the head large, the same plan
  // degrades gracefully to a shuffle equi-join on the gram key (AQE
  // decides via size stats). Ratio = one IEEE division of exact
  // integers, identical for every copy of a text.
  val q132 = q("q132_boilerplate_purge",
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |g AS (SELECT doc_id, unnest(list_transform(range(1, len(w) - 1),
      |        i -> array_to_string(w[i:i+2], ' '))) AS gram FROM d),
      |gd AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(w) - 1),
      |        i -> array_to_string(w[i:i+2], ' ')))) AS gram FROM d),
      |df AS (SELECT gram, CAST(COUNT(*) AS BIGINT) AS df FROM gd GROUP BY gram),
      |n AS (SELECT COUNT(*) AS n_docs FROM documents),
      |boiler AS (SELECT gram FROM df WHERE df * 100 >= (SELECT n_docs FROM n) AND df >= 5)
      |SELECT doc_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_grams,
      |  CAST(SUM(CASE WHEN boiler.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
      |  CAST(SUM(CASE WHEN boiler.gram IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS boiler_ratio
      |FROM g LEFT JOIN boiler USING (gram)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val toks = col("toks")
    // codegen-native sliding 3-token grams (see TextKernels.spanJoin):
    // exact twin of the when(size >= 3, transform(...)).otherwise([])
    // HOF — the kernel returns an empty array below size 3 itself
    val grams = graft.functions.expr.TextExpressions.spanJoin(toks, 3)
    val g = Dedup.eager(Dedup.distinctTextToks(Tables(s, dir).documents)
      .select(col("rep_id"), col("n_members"), col("member_ids"), grams.as("grams")))
    val nDocs = Tables(s, dir).documents.agg(count(lit(1)).as("n_docs"))
    val boiler = g
      .select(explode(array_distinct(col("grams"))).as("gram"), col("n_members"))
      .groupBy("gram").agg(sum(col("n_members")).as("df"))
      .crossJoin(broadcast(nDocs))
      .where(col("df") * 100 >= col("n_docs") && col("df") >= 5)
      .select(col("gram"), lit(1).as("is_boiler"))
    g.select(col("rep_id"), explode(col("grams")).as("gram"))
      .join(broadcast(boiler), Seq("gram"), "left")
      .groupBy("rep_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("is_boiler"), lit(0))).cast(LongType).as("n_boiler"))
      .join(g.select(col("rep_id"), col("member_ids")), Seq("rep_id"))
      .select(explode(col("member_ids")).as("doc_id"), col("n_grams"), col("n_boiler"))
      .withColumn("boiler_ratio",
        col("n_boiler").cast(DoubleType) / col("n_grams"))
      .orderBy("doc_id")
  }

  // -- q136: canonical-document selection per duplicate cluster ---------
  // The step AFTER q84 closes the near-dup graph: each duplicate
  // cluster keeps one canonical representative, and real pipelines keep
  // the LONGEST member (most content survives), not the smallest id —
  // ties break to the smaller doc_id. Emits the cluster roll-up the
  // keep/drop stage consumes: size, canonical member, and how many
  // chars the cluster holds in total (what dedup is about to delete).
  //
  // Plan shape: q84's prefix-filtered pair join + connected components
  // feed a doc-keyed equi-join against the (doc_id, n_chars) metadata
  // projection, then ONE cluster-keyed aggregate; the argmax is a
  // struct-max (n_chars, -doc_id) — the q123 vote-argmax pattern — so
  // no per-cluster window/sort exists anywhere. All outputs are exact
  // integers; the oracle replays the clustering with q84's recursive
  // CTE and the argmax with a window over the brute-force pair set.
  val q136 = GraftQuery("q136_canonical_docs", (s, dir) => {
    val edges = Dedup.allPairsJaccard(s, dir, 0.5).select(col("a_id"), col("b_id"))
    val clusters = graft.operators.ConnectedComponents.minLabelPropagation(edges)
      .select(col("node").as("doc_id"), col("comp").as("cluster_id"))
    val meta = Tables(s, dir).documents.select(col("doc_id"), col("n_chars"))
    clusters.join(meta, Seq("doc_id"))
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("n_members"),
        max(struct(col("n_chars"), (-col("doc_id")).as("neg_id"))).as("best"),
        sum(col("n_chars")).as("total_chars"))
      .select(col("cluster_id"), col("n_members"),
        (-col("best.neg_id")).cast(LongType).as("canonical_id"),
        col("best.n_chars").as("canonical_chars"),
        col("total_chars"))
      .orderBy("cluster_id")
  }, Some(
    """WITH RECURSIVE d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
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
      |b AS (SELECT cluster_id, doc_id, n_chars,
      |        row_number() OVER (PARTITION BY cluster_id
      |          ORDER BY n_chars DESC, doc_id) AS rk FROM m),
      |g AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_members,
      |        CAST(SUM(n_chars) AS BIGINT) AS total_chars FROM m GROUP BY 1)
      |SELECT g.cluster_id, g.n_members, b.doc_id AS canonical_id,
      |  b.n_chars AS canonical_chars, g.total_chars
      |FROM g JOIN b ON g.cluster_id = b.cluster_id AND b.rk = 1
      |ORDER BY g.cluster_id""".stripMargin))

  val all: Seq[GraftQuery] = Seq(q131, q132, q136)
}
