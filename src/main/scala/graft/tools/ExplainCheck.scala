package graft.tools
import org.apache.spark.sql.SparkSession
/** Plan-quality audit: assert pushdown/pruning/broadcast shapes on the
  * representative queries (the 100 TB plan-shape contract). */
object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.01"
    def plan(name: String, df: org.apache.spark.sql.DataFrame, checks: (String, String => Boolean)*): Unit = {
      val p = df.queryExecution.executedPlan.toString
      checks.foreach { case (what, ok) =>
        println(f"$name%-22s $what%-38s ${if (ok(p)) "OK" else "MISSING"}")
        if (!ok(p)) println(p.linesIterator.take(30).mkString("\n"))
      }
    }
    plan("q1_pricing_summary", graft.queries.Queries.q1PricingSummary(spark, dir),
      ("partial agg (map-side combine)", _.contains("partial_")),
      ("column-pruned scan (4 cols)", p => p.contains("ReadSchema: struct<l_quantity") || p.contains("l_returnflag")))
    plan("q3_region_customers", graft.queries.Queries.q3RegionCustomers(spark, dir),
      ("broadcast hash join", _.contains("BroadcastHashJoin")))
    plan("q4_part_semijoin", graft.queries.Queries.q4PartSemijoin(spark, dir),
      ("semi join", _.contains("LeftSemi")),
      ("filter pushed to scan", _.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThanOrEqual(l_quantity,48")))
    plan("q8_orders_anti", graft.queries.Queries.q8OrdersAnti(spark, dir),
      ("anti join", _.contains("LeftAnti")))
    plan("q10_dedup_exact", graft.queries.Queries.q10DedupExact(spark, dir),
      ("partial agg before shuffle", _.contains("partial_")))
    plan("q16_ann_cosine", graft.queries.Queries.q16AnnCosine(spark, dir),
      ("broadcast query side", _.contains("Broadcast")))
    plan("q21_transcripts", graft.queries.Queries.q21TranscriptExtract(spark, dir),
      // object operators can't be codegen'd; the contract is a FUSED object
      // chain (flatMap+map, one deserialize, one serialize) and column
      // pruning through the typed map (big string cols never serialize)
      ("fused object chain (single serialize)", p => "SerializeFromObject".r.findAllIn(p).length == 1),
      ("pruned serialize (no main_text col)", p => !p.contains("main_text")))
    plan("q13_quality_signals", graft.queries.Queries.q13QualitySignals(spark, dir),
      // the round-2 fix: one split() via a single aggregate() fold
      ("single split in plan", p => "split\\(".r.findAllIn(p).length <= 1))
    // q25's final frame is a driver-ranked LocalTableScan (20 rows); the
    // scale-relevant plan is its distributed stage, exposed as q25TopPairs
    plan("q25_top_pairs", graft.queries.Queries.q25TopPairs(spark, dir),
      // top-20 via TakeOrdered, not a partition-less window over all pairs
      ("TakeOrdered for top-k", _.contains("TakeOrdered")),
      ("no window over full pair set", p => !p.contains("WindowExec")))
    plan("q29_event_windows", graft.queries.Queries.q29EventWindows(spark, dir),
      ("partial agg (map-side combine)", _.contains("partial_")))
    plan("q30_ann_ivf", graft.queries.Queries.q30AnnIvf(spark, dir),
      ("broadcast query side", _.contains("Broadcast")))
    plan("q15_simhash", graft.queries.Queries.q15Simhash(spark, dir),
      // native Catalyst expression: no UDF eval boundary in the plan
      ("no ScalaUDF boundary", p => !p.contains("ScalaUDF")),
      ("expression inside codegen stage", _.contains("graft_simhash64")))
    plan("q20_bpe_tokens", graft.queries.Queries.q20BpeTokens(spark, dir),
      ("no ScalaUDF boundary", p => !p.contains("ScalaUDF")))
    plan("q14_minhash_lsh", graft.queries.Queries.q14MinhashLsh(spark, dir),
      // round-4: band keys + jaccard verification are native expressions
      ("no ScalaUDF anywhere", p => !p.contains("ScalaUDF")),
      ("native band-key expression", _.contains("graft_lsh_band_keys")),
      // shuffle band self-join (identical children -> AQE reuses one
      // exchange at execution, so signatures compute ONCE; the pre-execution
      // plan can only show the join shape that enables it)
      ("shuffle band self-join (reusable exchange)", _.contains("ShuffledHashJoin")))
    plan("q37_training_mix", graft.queries.Queries.q37TrainingMix(spark, dir),
      // composed curation pipeline: all gates row-local, exactly one
      // shuffle (the dedup groupBy), text never crosses the exchange
      // (min_by keeps only the 3 projected cols), gates run pre-exchange
      ("single shuffle (dedup groupBy only)",
        p => "Exchange hashpartitioning".r.findAllIn(p).length == 1),
      ("partial agg before shuffle", _.contains("partial_")),
      ("no ScalaUDF anywhere", p => !p.contains("ScalaUDF")))
    plan("q38_stratified_sample", graft.queries.Queries.q38StratifiedSample(spark, dir),
      // row-local hash-threshold sample: the only exchange is the final
      // presentation orderBy's range partitioning — no hash shuffle, no
      // UDF; the decision runs inside the scan's codegen stage
      ("no hash shuffle (row-local sample)",
        p => !p.contains("Exchange hashpartitioning")),
      ("no ScalaUDF anywhere", p => !p.contains("ScalaUDF")))
    plan("q39_pack_sequences", graft.queries.Queries.q39PackSequences(spark, dir),
      // sharded packing: exactly one hash exchange — the (lang, shard)
      // window partitioning — and a running-frame window, never a
      // whole-partition materialization
      ("single shuffle (window partitioning)",
        p => "Exchange hashpartitioning".r.findAllIn(p).length == 1),
      ("running-sum window present", _.contains("Window")))
    plan("q40_decontaminate", graft.queries.Queries.q40Decontaminate(spark, dir),
      // eval-set grams broadcast against the streaming corpus-gram fanout;
      // the per-doc count is a partial-agg groupBy
      ("broadcast eval-gram join", _.contains("BroadcastHashJoin")),
      ("partial agg before shuffle", _.contains("partial_")))
    plan("q41_pii_scrub", graft.queries.Queries.q41PiiScrub(spark, dir),
      // row-local regex scrub: the only hash exchange permitted is the
      // conditional input spread on doc_id (fires here because the audit
      // file is one tiny split); the scrub itself stays row-local
      ("only the input-spread exchange (scrub row-local)",
        p => "Exchange hashpartitioning".r.findAllIn(p).length ==
          "Exchange hashpartitioning\\(doc_id".r.findAllIn(p).length),
      ("no ScalaUDF anywhere", p => !p.contains("ScalaUDF")))
    plan("q43_bloom_decontaminate",
      graft.queries.Queries.q43BloomDecontaminate(spark, dir),
      // the big-eval-set shape: bloom bits probe row-locally in codegen
      // BEFORE any join; the exact confirm join shuffles survivors rather
      // than broadcasting eval gram strings
      ("bloom probes inside codegen filter", _.contains("xxhash64")),
      ("exact confirm is a shuffle join, not broadcast",
        p => p.contains("ShuffledHashJoin") && !p.contains("BroadcastHashJoin")),
      ("no ScalaUDF anywhere", p => !p.contains("ScalaUDF")))
    plan("q44_paragraph_dedup", graft.queries.Queries.q44ParagraphDedup(spark, dir),
      // keep-first as an argmin AGG (partial min map-side), not a window:
      // the first-occurrence shuffle carries (hash, doc_id, chunk_idx)
      // only — chunk text crosses one exchange, in the confirm join
      ("partial argmin before shuffle", _.contains("partial_min")),
      ("no window operator", p => !p.contains("Window")),
      ("no ScalaUDF anywhere", p => !p.contains("ScalaUDF")))
    plan("q45_mixture_reweight", graft.queries.Queries.q45MixtureReweight(spark, dir),
      // data-derived rates: tiny count agg (partial map-side), rate table
      // broadcast to the corpus scan, accept predicate row-local
      ("partial count agg before shuffle", _.contains("partial_count")),
      ("rate table broadcast to the corpus", _.contains("BroadcastHashJoin")),
      ("no ScalaUDF anywhere", p => !p.contains("ScalaUDF")))
    plan("q46_epoch_shuffle", graft.queries.Queries.q46EpochShuffle(spark, dir),
      // one hash exchange on shard feeding the per-shard order window
      ("window partitioned by shard (not partition-less)",
        p => p.contains("hashpartitioning(shard")),
      ("no ScalaUDF anywhere", p => !p.contains("ScalaUDF")))
    plan("q47_vocab_induction", graft.queries.Queries.q47VocabInduction(spark, dir),
      // corpus-sized work is the word-count agg only (map-side partial);
      // top-k is TakeOrdered, never a global sort; the cumulative window
      // runs on the k-row bounded result
      ("partial count agg before shuffle", _.contains("partial_count")),
      ("top-k is TakeOrdered, not a global sort", _.contains("TakeOrderedAndProject")),
      ("no ScalaUDF anywhere", p => !p.contains("ScalaUDF")))
    plan("q48_df_boilerplate", graft.queries.Queries.q48DfBoilerplate(spark, dir),
      // DF agg shuffles (hash, doc_id) only, map-side partial; the hot-set
      // removal is an anti-join, not a window
      ("partial agg before shuffle", _.contains("partial_")),
      ("hot-set removal is an anti-join", p => p.contains("LeftAnti")),
      ("no ScalaUDF anywhere", p => !p.contains("ScalaUDF")))
    plan("q49_window_dup", graft.queries.Queries.q49WindowDup(spark, dir),
      // single-pass shape: window text is hashed in the exploding
      // projection — only (doc_id, h) reaches any exchange; ONE h-exchange
      // carries the stream (per-(h,doc) counts + the corpus-total window
      // ride it), and one counts-only doc_id exchange makes the report.
      // No second explode of the corpus, no semi join, no text shuffle.
      ("single h-exchange for the window stream",
        p => "Exchange hashpartitioning\\(h#".r.findAllIn(p).length == 1),
      ("corpus-total is a hash-partitioned window (h)",
        p => "Window.*partition.*h#".r.findFirstIn(p).isDefined ||
          p.contains("windowspecdefinition(h#")),
      ("window text never shuffles",
        p => !"Exchange[^\\n]*win".r.findFirstIn(p).isDefined),
      ("no ScalaUDF anywhere", p => !p.contains("ScalaUDF")))
    plan("q50_length_percentiles", graft.queries.Queries.q50LengthPercentiles(spark, dir),
      // two-pass histogram: the only corpus-sized shuffle is the
      // (lang, n_tokens) count agg (map-side partial); the cumulative
      // window runs over the value-domain-bounded histogram — there is
      // NO corpus-sized rank window (no row_number over the corpus)
      ("corpus shuffle is the (lang, n_tokens) histogram agg",
        p => "hashpartitioning\\(lang#\\d+, n_tokens#".r.findFirstIn(p).isDefined),
      ("partial count agg before shuffle", _.contains("partial_count")),
      ("no corpus-sized rank window", p => !p.contains("row_number")),
      ("no ScalaUDF anywhere", p => !p.contains("ScalaUDF")))
    plan("q51_asof_join", graft.queries.Queries.q51AsofJoin(spark, dir),
      // as-of via tagged union + ONE per-user window: a single hash
      // exchange, no range/nested-loop join anywhere
      ("single hash exchange (per-user window)",
        p => "Exchange hashpartitioning".r.findAllIn(p).length == 1),
      ("running-last window present", _.contains("Window")),
      ("no nested-loop/cartesian join",
        p => !p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct")),
      ("no ScalaUDF anywhere", p => !p.contains("ScalaUDF")))
    plan("q52_range_join", graft.queries.Queries.q52RangeJoin(spark, dir),
      // banding rewrite: the range predicate is a residual FILTER on an
      // equi-join, never a nested-loop/cartesian range join
      ("band probes exploded (Generate)", _.contains("Generate explode")),
      ("no nested-loop/cartesian join",
        p => !p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct")),
      ("partial count agg before shuffle", _.contains("partial_count")),
      ("no ScalaUDF anywhere", p => !p.contains("ScalaUDF")))
    plan("q53_sessionize", graft.queries.Queries.q53Sessionize(spark, dir),
      // lag + running sum share one per-user exchange and sort
      ("single hash exchange (per-user windows)",
        p => "Exchange hashpartitioning".r.findAllIn(p).length == 1),
      ("windows share one sort",
        p => "Sort \\[user_id".r.findAllIn(p).length <= 1),
      ("no ScalaUDF anywhere", p => !p.contains("ScalaUDF")))
    plan("q54_bigram_lm", graft.queries.Queries.q54BigramLm(spark, dir),
      // corpus shuffle is the bigram count agg (map-side partial);
      // top-k is TakeOrdered; the k-row top set broadcasts into the
      // continuation-count join
      ("partial count agg before shuffle", _.contains("partial_count")),
      ("top-k is TakeOrdered, not a global sort", _.contains("TakeOrderedAndProject")),
      ("k-row top set broadcasts", _.contains("BroadcastHashJoin")),
      ("no ScalaUDF anywhere", p => !p.contains("ScalaUDF")))
    plan("q55_quality_score", graft.queries.Queries.q55QualityScore(spark, dir),
      // scoring is row-local: no exchange anywhere except the output sort
      ("no hash exchange (row-local scoring)",
        p => !p.contains("Exchange hashpartitioning")),
      ("no ScalaUDF anywhere", p => !p.contains("ScalaUDF")))
    plan("q56_source_stats", graft.queries.Queries.q56SourceStats(spark, dir),
      // text dies in the scan projection (md5 + token count); dup
      // membership is a semi join; aggs are map-side partial
      ("partial agg before shuffle", _.contains("partial_")),
      ("dup membership is a semi join", _.contains("LeftSemi")),
      ("text never shuffles",
        p => !"Exchange[^\\n]*text#".r.findFirstIn(p).isDefined),
      ("no ScalaUDF anywhere", p => !p.contains("ScalaUDF")))
    plan("q57_train_split", graft.queries.Queries.q57TrainSplit(spark, dir),
      // split assignment is row-local; the only shuffle is the final
      // counts-only agg
      ("partial agg before shuffle", _.contains("partial_")),
      ("single hash exchange (final agg only)",
        p => "Exchange hashpartitioning".r.findAllIn(p).length == 1),
      ("no ScalaUDF anywhere", p => !p.contains("ScalaUDF")))
    plan("q58_top_docs", graft.queries.Queries.q58TopDocs(spark, dir),
      // per-group top-k via the bounded-heap TypedImperativeAggregate:
      // ObjectHashAggregate with a map-side partial, NO rank window and
      // NO sort of corpus rows before the k-bounded exchange
      ("bounded-heap agg runs in ObjectHashAggregate", _.contains("ObjectHashAggregate")),
      ("map-side partial before the exchange", _.contains("partial_graft_top_k")),
      ("no rank window anywhere", p => !p.contains("row_number") && !p.contains("Window")),
      ("no ScalaUDF anywhere", p => !p.contains("ScalaUDF")))
    plan("q59_semdedup", graft.queries.Queries.q59SemDedup(spark, dir),
      // SemDeDup: centroid side broadcast, argmax as a map-side-partial
      // max-of-struct agg (never a corpus window), pair search confined
      // to the within-cluster self-join
      ("centroids broadcast", _.contains("BroadcastExchange")),
      ("argmax is a partial agg, not a window", p =>
        p.contains("partial_max") && !p.contains("row_number")),
      ("no ScalaUDF anywhere", p => !p.contains("ScalaUDF")))
    plan("q42_repetition", graft.queries.Queries.q42RepetitionSignals(spark, dir),
      // shuffles carry (doc_id, gram, cnt) counts, never text
      ("partial agg before shuffle", _.contains("partial_")),
      ("no ScalaUDF anywhere", p => !p.contains("ScalaUDF")))
    plan("q26_simhash_pairs", graft.queries.Queries.q26SimhashPairs(spark, dir),
      // fully-builtin pipeline: simhash + band math + bit_count(xor)
      ("no ScalaUDF anywhere", p => !p.contains("ScalaUDF")),
      ("builtin hamming (bit_count)", _.contains("bit_count")))
    // scan pruning check: a 2-col projection must not read all lineitem cols
    val pruned = spark.read.parquet(s"$dir/lineitem.parquet").select("l_orderkey", "l_quantity")
    val rs = pruned.queryExecution.executedPlan.toString
    println("pruning ReadSchema: " + rs.linesIterator.find(_.contains("ReadSchema")).getOrElse("?").trim.take(120))
    // MOR delete-read plan: the aggregated equality-delete set must be
    // BROADCAST (pinned with a size guard in readAt) — relying on AQE alone
    // can silently degrade to sort-merge once delete debt accumulates
    locally {
      import spark.implicits._
      val out = java.nio.file.Files.createTempDirectory("explain-mor").toString
      val turns = graft.spark.Transcripts.generate(spark, 12)
      val cfg = graft.spark.ExtractionJob.Config(out, buckets = 2, waves = 1, convGrained = true)
      graft.spark.ExtractionJob.run(spark, turns, cfg)
      val victim = turns.select("conv_id").as[String].head()
      val changed = turns.map(t => if (t.conv_id == victim) t.copy(text = t.text + "\nfix") else t)
      graft.spark.ExtractionJob.run(spark, changed, cfg) // writes an equality delete
      plan("mor_delete_read", graft.spark.ExtractionJob.readCommitted(spark, out),
        ("broadcast delete anti-filter join", _.contains("BroadcastHashJoin")))
    }
    spark.stop()
  }
}
