package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 10× scale stress harness: replicates the sf0.1 tables (key-shifted,
  * embeddings perturbed deterministically) into a multi-file layout and
  * runs the heavy operators against it. Purpose: observe — before the
  * cluster does — whether any operator's pair space, shuffle volume, or
  * skew behavior degrades super-linearly between sf0.1 and 10×.
  *
  * `sbt "runMain graft.StressMain [gen|run|all]"` — writes to /tmp.
  */
object StressMain {
  val StressDir = "/tmp/graft_stress10"
  val Copies = 10
  val KeyStride = 10000000L

  def gen(spark: SparkSession, src: String, dir: String = StressDir,
      copies: Int = Copies): Unit = {
    val t = Tables(spark, src)
    def replicate(df: DataFrame, keyCols: Seq[String]): DataFrame =
      (0 until copies).map { k =>
        keyCols.foldLeft(df)((d, c) => d.withColumn(c, col(c) + lit(k * KeyStride)))
      }.reduce(_ unionByName _)

    // multi-file layout (the realistic shape at scale — also what makes
    // scans parallelizable, unlike the single-row-group test files)
    replicate(t.lineitem, Seq("l_orderkey")).repartition(32)
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    replicate(t.orders, Seq("o_orderkey", "o_custkey")).repartition(16)
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    replicate(t.customer, Seq("c_custkey")).repartition(8)
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    replicate(t.events.withColumn("event_id", col("event_id")), Seq("event_id", "user_id"))
      .repartition(16).write.mode("overwrite").parquet(s"$dir/events.parquet")
    replicate(t.documents, Seq("doc_id")).repartition(16)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // embeddings: shift ids and perturb values deterministically so the
    // copies are near-dups (exercising the dedup thresholds), not exact
    val emb = (0 until copies).map { k =>
      t.embeddings
        .withColumn("vec_id", col("vec_id") + lit(k * KeyStride))
        .withColumn("embedding",
          transform(col("embedding"),
            (x, i) => x + (pmod(xxhash64(col("vec_id"), i, lit(k)), lit(100)) - lit(50))
              .cast("float") / lit(5000.0f)))
    }.reduce(_ unionByName _)
    emb.repartition(8).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    // small dims copied as-is
    t.nation.write.mode("overwrite").parquet(s"$dir/nation.parquet")
    t.region.write.mode("overwrite").parquet(s"$dir/region.parquet")
    t.supplier.write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    t.part.write.mode("overwrite").parquet(s"$dir/part.parquet")
  }

  val HeavyQueries = Seq(
    "q01_pricing_summary", "q03_top_revenue", "q08_running_sum",
    "q18_sessionize", "q20_wordcount",
    "q27_dedup_exact", "q28_dedup_ngram", "q29_dedup_minhash",
    "q30_dedup_simhash", "q31_ann_brute", "q32_ann_lsh", "q37_ann_ivf",
    "q33_dedup_embed",
    // curation suite: span index, per-row signal pass, vocab window,
    // pair clustering, fuzzy linkage, bigram LM
    "q72_repetition", "q78_span_dedup", "q79_ttr", "q80_zipf",
    "q84_dup_clusters", "q85_fuzzy_linkage", "q88_bigram_lm",
    // round 3: exact prefix-filtered all-pairs, decontamination (span
    // broadcast), fluency join, shard manifest
    "q100_allpairs_jaccard", "q101_bigram_fluency", "q103_decontamination",
    "q104_shard_pack",
    // round 4: cell-bounded semantic dedup, source provenance,
    // two-level prefix-sum token mixing
    "q107_semdedup", "q108_source_dup_matrix", "q109_token_budget_mix",
    // round 6: trained ANN indexes (k-means IVF, PQ codegen kernels) and
    // the tokenizer-adjacent batch (two-level prefix-sum packing, DSIR,
    // vocab/OOV, CDC chunking)
    "q37b_ann_ivf_kmeans", "q102_ann_pq", "q110_sequence_pack",
    "q111_dsir_weights", "q112_vocab_oov", "q113_cdc_chunks",
    // round 6: bloom-prefiltered incremental ingest, bipartite decontam,
    // corpus clustering, BPE merge stats
    "q114_bloom_increment", "q115_neardup_decontam", "q116_embed_clusters",
    "q117_bpe_merges",
    // round 6: retrieval scoring, embedding compression, PII scrub
    "q118_bm25_topk", "q119_embed_int8", "q120_pii_scrub", "q121_ann_sq8",
    "q122_ann_ivf_sq8", "q123_knn_label", "q124_ivf_ingest",
    // round 8: runtime-relation BM25, BPE training loop + tokenizer
    // application, IVF retrain-and-swap, hybrid RRF fusion
    "q125_bm25_queries", "q126_bpe_merge_loop", "q127_ivf_retrain_swap",
    "q128_bpe_tokenize", "q129_hybrid_rrf",
    // round 8: lexical-model curation (fertility, vote classifier,
    // boilerplate purge, keywords), prototype mining, hard negatives,
    // canonical-doc selection
    "q130_bpe_fertility", "q131_seed_vote_classifier", "q132_boilerplate_purge",
    "q133_tfidf_keywords", "q134_cell_exemplars", "q135_hard_negatives",
    "q136_canonical_docs",
    // round 8: corpus governance — session KPI rollup, cluster-atomic
    // split, dup-graph triangle census, SQ8 cell outliers, attrition
    // funnel, PMI collocations
    "q137_sessionize", "q138_cluster_split", "q139_dup_graph_triangles",
    "q140_cell_outliers", "q141_attrition_funnel", "q142_pmi_collocations",
    // round 8: maintenance + statistics/evaluation — incremental MV
    // refresh, SCD2 history, Misra–Gries frequent bigrams, dup-graph
    // PageRank, kNN-classifier evaluation
    "q143_incremental_mv", "q144_scd2_history", "q145_heavy_hitters",
    "q146_pagerank", "q147_knn_eval",
    // round 8: QA + exact statistics — inspection sample, label-noise
    // audit, histogram quantiles, OLS trend
    "q149_inspection_sample", "q150_label_noise", "q151_exact_quantiles",
    "q152_value_trend", "q153_index_recall_sweep", "q154_burst_detection",
    "q155_event_transitions", "q156_erasure_audit", "q157_table_profile",
    "q158_incremental_cc", "q159_threshold_sweep", "q160_attribution",
    "q161_conversion_latency", "q162_multitouch_attribution",
    // round 10: source-cap curation (bounded-heap heads), embedding
    // outlier audit (cell-keyed integer cross-multiply)
    "q163_source_cap", "q164_embedding_outliers",
    "q165_normalized_dedup", "q166_snapshot_diff", "q167_span_purge",
    // round 12 continuation: window-sharing domain cap, derived-cluster
    // fingerprint audit, LSH calibration (q29's machinery + census),
    // four-branch single-scan chi-square, vocab-grain novelty join
    "q171_domain_cap", "q174_split_leakage", "q177_minhash_calibration",
    "q178_domain_shift", "q179_source_novelty",
    // round 13: exact-substring dedup (token-grain gram census + window
    // merge — the heaviest per-token explode in the registry)
    "q183_exact_substring",
    // round 14: line-grain census bill + applied purge (line explode,
    // vocabulary census, reassembly aggregate), the dup-n-gram
    // coverage fractions (fused map-only kernel since r16), fluency
    // bucketing (q101's LM relation + tercile window), and the
    // token-budget sampler (running-sum window at corpus doc grain)
    "q187_line_dedup", "q188_gopher_dup_ngrams", "q189_line_purge_apply",
    "q191_fluency_buckets", "q192_token_budget_sample",
    // round 15: media near-dup (50k real PNG encode+decode+pool in the
    // scan stage — the heaviest per-row UDF work in the registry) and
    // the doc-grain purge emission (pair space + CC + two doc-keyed
    // joins at corpus grain)
    "q194_media_dedup_groups", "q196_neardup_purge_apply",
    // round 15b: the media<->embedding join over real pixel decode and
    // 50k real WAV per-sample decodes in the scan stage
    "q201_crossmodal_align", "q203_audio_quality_gate")

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("all")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // ObjectHashAggregate's LEGACY fallback threshold is 128 distinct
      // keys per task, after which every collect_list/typed-imperative
      // aggregate dumps to an external sorter and SORT-aggregates by
      // the (often string) group key — profiled as the dominant frame
      // in the dedup family's text-keyed collapses. 256k entries keeps
      // the hash path for realistic per-task key counts. NOTE the
      // threshold bounds ENTRY COUNT, not bytes: for text-keyed maps
      // (distinctTextToks) each entry holds the full group-key text, so
      // worst-case task memory is 256k x max text length -- ~100 MB at
      // this corpus's ~400 B texts but multi-GB for multi-KB documents.
      // r19: the targetTaskBytes / maxKeyBytes arithmetic is now the
      // configuration surface itself — see SessionTuning (env-overridable
      // byte budget; default derives the same 262144).
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        graft.SessionTuning.objectHashFallbackEntries.toString)
      // Force the SORT shuffle writer (r18, measured): with R = cpus
      // reduce partitions the bypass-merge writer creates M x R temp
      // files per shuffle and NIO-merges them -- profiled as the
      // dominant frames (copyFileStreamNIO / DiskBlockObjectWriter)
      // of every shuffle-heavy query on this host (q28 steady state
      // halved, 3.1 -> 1.6 s). Production clusters run R >> 200 where
      // bypass never engages, so the sort writer is also the at-scale
      // code path; this makes the local bench exercise it.
      .config("spark.shuffle.sort.bypassMergeThreshold", "1")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (mode == "gen" || mode == "all") {
      val t0 = System.nanoTime()
      gen(spark, "/root/testdata/sf0.1")
      println(f"[stress] generated 10x data in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    if (mode == "ccmem") {
      // Measure the driver union-find fallback footprint at a chosen
      // edge count (default: the 1M directed-edge cutover; 4M measured
      // ~1.4 GB whole-JVM peak, which is what sized the default DOWN
      // from 4M). Node ids spread over ~2x the edge count — the
      // array-width worst case. Peak heap is read from the JVM memory
      // pools (reset before the run). NOTE: local mode shares one JVM,
      // so the peak includes executor-side persists, an upper bound on
      // the driver-only footprint.
      import java.lang.management.ManagementFactory
      import scala.jdk.CollectionConverters._
      val undirectedEdges = args.lift(1).map(_.toLong).getOrElse(500000L)
      val edges = spark.range(0L, undirectedEdges)
        .select(col("id").as("src"),
          pmod(col("id") * lit(2654435761L), lit(undirectedEdges * 2 + 37)).as("dst"))
        .where(col("src") =!= col("dst"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      edges.count() // materialize so generation cost doesn't pollute the peak
      val pools = ManagementFactory.getMemoryPoolMXBeans.asScala
        .filter(_.getType == java.lang.management.MemoryType.HEAP)
      System.gc()
      pools.foreach(_.resetPeakUsage())
      val base = pools.map(_.getPeakUsage.getUsed).sum / 1048576
      val t0 = System.nanoTime()
      val n = graft.operators.ConnectedComponents
        .minLabelPropagation(edges, driverFallbackEdges = Long.MaxValue).count()
      val sec = (System.nanoTime() - t0) / 1e9
      val peak = pools.map(_.getPeakUsage.getUsed).sum / 1048576
      println(f"[stress] cc driver fallback at ${undirectedEdges * 2} directed edges: labeled=$n in ${sec}%.1f s, heap base $base MB -> peak $peak MB (delta ${peak - base} MB)")
      edges.unpersist()
    }
    // untimed sweep between timed queries (Bench's isolation layers):
    // the heavy list persists several 10x shingled corpora — left to
    // accumulate, later queries pay eviction churn and GC debt for
    // earlier ones' blocks, and per-operator numbers stop being
    // per-operator.
    def sweep(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
    }

    if (mode == "curve") {
      // Scaling-curve mode: run one representative operator per family
      // at 1x (sf0.1 as generated), 3x, and 10x, and report the growth
      // exponent alpha where t ~ N^alpha between successive scales
      // (alpha = log(t_b/t_a) / log(b/a); 1.0 = linear, 2.0 =
      // quadratic). Best-of-2 per point — this VM has 10-20x noise
      // windows, one sample proves nothing. At these absolute times
      // (0.3-4 s) the fixed per-job scheduling floor deflates alpha
      // below its asymptote at the small end, so the 3x->10x leg is the
      // informative one; a pair-space operator whose pruning failed
      // would still stick out immediately (alpha -> 2).
      // optional extra scale point (e.g. `curve 30`): deeper points
      // sharpen the exponent (less overhead-dominated) and push the dup
      // graph past the 1M-directed-edge cutover, so the DISTRIBUTED
      // connected-components loop gets a curve point too. An optional
      // third arg filters the operator list by qNN prefix or full name
      // (`curve 30 q194,q202,q203`) so a deep point doesn't force the
      // heavy pair-space operators through 30x data generation runs.
      // `curve q194` (filter without an explicit extra scale) must
      // filter, not crash with NumberFormatException (ADVICE r16): a
      // non-numeric second arg IS the filter.
      val extra = args.lift(1).flatMap(a => scala.util.Try(a.toInt).toOption)
      val curveFilter = (if (extra.isDefined) args.lift(2) else args.lift(1))
        .map(_.split(',').map(_.trim).toSet)
      extra.filter(_ <= 10).foreach(s =>
        println(s"[stress] extra scale $s ignored (must exceed the built-in 10x point)"))
      val scales = Seq(1, 3, 10) ++ extra.filter(_ > 10)
      val dirs = scales.map {
        case 1  => 1 -> "/root/testdata/sf0.1"
        case 10 => 10 -> StressDir
        case c  => c -> s"/tmp/graft_stress$c"
      }.toMap
      // sentinel = the LAST table gen() writes, so an interrupted
      // generation is re-run rather than silently skipped half-complete
      for (c <- scales.filter(_ > 1); d = dirs(c))
        if (!new java.io.File(s"$d/part.parquet").exists()) {
          val t0 = System.nanoTime()
          gen(spark, dirs(1), d, c)
          println(f"[stress] generated ${c}x data in ${(System.nanoTime() - t0) / 1e9}%.1f s")
        }
      val curveQueries = Seq(
        "q01_pricing_summary",   // scan + hash agg
        "q27_dedup_exact",       // single hash-shuffle groupBy
        "q29_dedup_minhash",     // LSH banding over distinct signatures (r17 collapse)
        "q30_dedup_simhash",     // simhash banding over distinct fingerprints
        "q80_zipf",              // token explode + vocab agg + top-k
        "q100_allpairs_jaccard", // prefix-filtered exact pair space
        "q132_boilerplate_purge", // distinct-text-grain df table + broadcast purge (r17)
        "q84_dup_clusters",      // pairs + connected components
        "q37_ann_ivf",           // kernel-assigned index search
        "q119_embed_int8",       // map-only train+encode
        "q110_sequence_pack",    // two-level prefix sum
        "q158_incremental_cc",   // delta-contracted clustering (vs q84's full)
        "q146_pagerank",         // fixed-point power iteration on the dup graph
        "q167_span_purge",       // span agg + equi-join + doc reassembly
        "q183_exact_substring",  // token-grain gram census + window merge
        "q188_gopher_dup_ngrams", // fused map-only dup-n-gram kernel (r16)
        "q194_media_dedup_groups", // media axis: real PNG encode+decode+pool in the scan
        "q202_image_phash_neardup", // dHash + Hamming-band join over real decode
        "q203_audio_quality_gate")  // per-sample real PCM decode in the scan
      val curveSelected = curveQueries.filter(q =>
        curveFilter.forall(f => f.contains(q) || f.contains(q.takeWhile(_ != '_'))))
      SparkEntry.queries("q27_dedup_exact")(spark, dirs(1)).count(); sweep()
      def timeBestOf2(q: String, dir: String): Double =
        (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          SparkEntry.queries(q)(spark, dir).count()
          val sec = (System.nanoTime() - t0) / 1e9
          sweep(); sec
        }.min
      val legs = scales.zip(scales.tail)
      println(f"[stress] ${"operator"}%-24s " +
        scales.map(s => f"${s"${s}x"}%7s").mkString(" ") + "   " +
        legs.map { case (a, b) => f"${s"a($a->$b)"}%8s" }.mkString(" "))
      curveSelected.foreach { q =>
        val t = scales.map(s => s -> timeBestOf2(q, dirs(s))).toMap
        val as = legs.map { case (a, b) =>
          math.log(t(b) / t(a)) / math.log(b.toDouble / a) }
        println(f"[stress] $q%-24s " +
          scales.map(s => f"${t(s)}%6.2fs").mkString(" ") + "   " +
          as.map(a => f"$a%8.2f").mkString(" "))
      }
      // cap gauges across ALL curve points (accumulated window; the
      // deep scales are exactly where a bounded drop would first show —
      // the r16 VERDICT #6 done-criterion is zero dropped groups at 30×)
      graft.metrics.CapObservatory.fence(spark)
      println(s"[stress] caps ${graft.metrics.CapObservatory.snapshotJson()}")
    }

    if (mode == "bloomshard" || mode == "all") {
      // Sharded-bloom path (q114's >10^9-span scale plumbing): build S
      // hash-partitioned sketches with per-shard timings, probe with
      // per-span shard routing, and check the confirmed output is
      // IDENTICAL to the single-sketch path — the property that makes
      // shard count a pure memory knob. Peak sketch memory per
      // task/driver is one shard, so S scales the span capacity
      // linearly at constant per-JVM footprint.
      val S = 4
      val dir = StressDir
      if (!new java.io.File(s"$dir/part.parquet").exists()) gen(spark, "/root/testdata/sf0.1")
      val single = graft.queries.Curation4.bloomIncrement(spark, dir, shards = 1)
        .collect().toSeq
      sweep()
      val (docs, baseDocs) = graft.queries.Curation4.bloomSpanDocs(spark, dir)
      val baseSpans = docs.where(col("_slice") =!= 0)
        .select(explode(col("_sp")).as("span"))
      val perShard = math.max(baseDocs * 256L / S, 1000L)
      (0 until S).foreach { sh =>
        val t0 = System.nanoTime()
        val bf = graft.queries.Curation4.buildShardBloom(baseSpans, S, sh, perShard)
        println(f"[stress] bloomshard build $sh/$S ${(System.nanoTime() - t0) / 1e9}%6.2f s  " +
          f"(${bf.bitSize() / 8 / 1024} KiB sketch)")
      }
      sweep()
      val t0 = System.nanoTime()
      val sharded = graft.queries.Curation4.bloomIncrement(spark, dir, shards = S)
        .collect().toSeq
      println(f"[stress] bloomshard probe+confirm S=$S ${(System.nanoTime() - t0) / 1e9}%6.2f s  " +
        f"rows=${sharded.size}")
      require(sharded == single,
        s"sharded output diverged: ${sharded.size} rows vs ${single.size}")
      println(s"[stress] bloomshard S=$S output == S=1 output (${single.size} rows)")
      sweep()
    }

    if (mode == "substrgate" || mode == "all") {
      // Live exact-substring gate at 10x sf0.1 (the r13 SCALE ask):
      // docs/s through hits(L=50) and resident keyed-state rows, S=1
      // vs S=4 gram-hash shards. Each shard consumes the FULL stream
      // (production shape: S parallel queries over the same source,
      // each filtering to its hash range), so per-shard wall time is
      // what a parallel deployment's rate is set by, and per-shard
      // state is what maxGrams actually bounds. Shards run
      // sequentially here to keep the box uncontended; ShardedGateSpec
      // owns the S-invariance (outputs re-checked cheaply anyway).
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import graft.streaming.StreamingSubstringGate
      import graft.streaming.StreamingSubstringGate.DocArrival
      import spark.implicits._
      val dir = StressDir
      if (!new java.io.File(s"$dir/documents.parquet").exists())
        gen(spark, "/root/testdata/sf0.1")
      val arrivals = spark.read.parquet(s"$dir/documents.parquet")
        .select("doc_id", "source", "text").collect()
        .map(r => DocArrival(r.getLong(0), r.getString(1), r.getString(2), r.getLong(0)))
        .sortBy(_.seq)
      val L = graft.queries.Curation15.MinDupTokens
      def runGate(shard: Int, shards: Int): (Double, Long, Long) = {
        // Independent sequential queries in ONE JVM: clear the
        // JVM-static resident-gram gauge so run N's leftover count
        // doesn't spuriously trip maxGrams on run N+1 (ADVICE r14).
        StreamingSubstringGate.resetResidentGrams()
        val name = s"substr_tp_${shards}_$shard"
        val input = MemoryStream[DocArrival](spark, 8)
        val q = StreamingSubstringGate.hits(input.toDS(), L, shard = shard, shards = shards)
          .writeStream.format("memory").queryName(name)
          .outputMode("append").start()
        val t0 = System.nanoTime()
        arrivals.grouped(5000).foreach(c => input.addData(c.toSeq))
        q.processAllAvailable()
        val sec = (System.nanoTime() - t0) / 1e9
        val stateRows = Option(q.lastProgress).toSeq
          .flatMap(_.stateOperators.toSeq).map(_.numRowsTotal).sum
        val hits = spark.table(name).count()
        q.stop()
        spark.sql(s"DROP TABLE IF EXISTS $name")
        sweep()
        (sec, stateRows, hits)
      }
      val (s1Sec, s1State, s1Hits) = runGate(0, 1)
      println(f"[stress] substrgate S=1    ${s1Sec}%6.2f s  " +
        f"${arrivals.length / s1Sec}%8.0f docs/s  state=$s1State%d grams  hits=$s1Hits%d")
      val S = 4
      val per = (0 until S).map(sh => sh -> runGate(sh, S))
      per.foreach { case (sh, (sec, st, h)) =>
        println(f"[stress] substrgate S=$S sh$sh ${sec}%6.2f s  " +
          f"${arrivals.length / sec}%8.0f docs/s  state=$st%d grams  hits=$h%d")
      }
      val worst = per.map(_._2._1).max
      println(f"[stress] substrgate S=$S parallel-deployment rate " +
        f"${arrivals.length / worst}%.0f docs/s (slowest shard); " +
        f"state split ${per.map(_._2._2).mkString("/")} of $s1State")
      require(per.map(_._2._3).sum == s1Hits,
        s"sharded hit total ${per.map(_._2._3).sum} != S=1 $s1Hits")
      require(per.map(_._2._2).sum == s1State,
        s"sharded state total ${per.map(_._2._2).sum} != S=1 $s1State")
    }

    if (mode == "run" || mode == "all") {
      // untimed warmup (session/codegen init otherwise lands on query 1)
      SparkEntry.queries("q27_dedup_exact")(spark, StressDir).count()
      val results = HeavyQueries.map { name =>
        val t0 = System.nanoTime()
        val n = try SparkEntry.queries(name)(spark, StressDir).count()
                catch { case e: Throwable => println(s"[stress] $name FAILED: ${e.getMessage}"); -1L }
        val sec = (System.nanoTime() - t0) / 1e9
        sweep()
        println(f"[stress] $name%-22s ${sec}%8.2f s  rows=$n")
        name -> sec
      }
      println(f"[stress] TOTAL ${results.map(_._2).sum}%.1f s over ${results.size} heavy queries at 10x sf0.1")
      // bounded-drop observability (r15 VERDICT #2): at 10x the LSH
      // bucket / block caps are the first place recall loss would show
      // (fence = async listener-bus drain, so the last query's metrics
      // are guaranteed in before the read)
      graft.metrics.CapObservatory.fence(spark)
      println(s"[stress] caps ${graft.metrics.CapObservatory.snapshotJson()}")

      // Forced-distributed connected components: the size-adaptive
      // driver fallback absorbs every test corpus (the 10x dup graph is
      // ~hundreds of k directed edges, well under the 4M cutover), so
      // the iterative join loop — the code that must carry a 100 TB dup
      // graph — would otherwise never see a timed, growing workload.
      // Time both paths on the SAME materialized edge list and report
      // the ratio; a regression in the distributed loop shows up here
      // before it shows up on a cluster.
      val ccEdges = graft.queries.Dedup.allPairsJaccard(spark, StressDir, 0.5)
        .select("a_id", "b_id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nPairs = ccEdges.count()
      def timeCC(label: String): Double = {
        val t0 = System.nanoTime()
        val rows = graft.operators.ConnectedComponents.minLabelPropagation(ccEdges).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[stress] cc_$label%-25s ${sec}%8.2f s  rows=$rows (pairs=$nPairs)")
        sec
      }
      val ccAdaptive = timeCC("adaptive")
      sys.props("graft.cc.driverFallbackEdges") = "0"
      val ccForced =
        try timeCC("forced_distributed")
        finally sys.props.remove("graft.cc.driverFallbackEdges")
      println(f"[stress] cc forced/adaptive ratio ${ccForced / ccAdaptive}%.2fx")
      ccEdges.unpersist()
    }
    spark.stop()
  }
}
