package graft

import org.apache.spark.sql.functions._
import graft.sources.EventSource

/** Driver-contract guardrails: the queries/oracle registries are what
  * the Verify/Bench harness consumes — key collisions across modules
  * would silently DROP an operator from the graded inventory. */
class RegistrySpec extends SparkSpec {

  test("no duplicate query keys across operator modules") {
    val perModule = SparkEntry.modules.map(_._1.keySet)
    val total = perModule.map(_.size).sum
    assert(total === SparkEntry.queries.size,
      s"module key sets overlap: ${perModule.flatten.groupBy(identity).collect { case (k, v) if v.size > 1 => k }}")
  }

  test("every oracle key has a queries entry") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle-only keys: $orphans")
  }

  test("every no-oracle key is an explicit, spec-covered exemption") {
    // the correctness gate only checks keys with an oracle twin — a
    // new key silently missing its oracle would otherwise degrade to
    // the weaker rows-only check without anyone deciding that. Every
    // exemption here is deliberate (approximate sketch/LSH families
    // whose output is seed-dependent, and streaming sinks/state whose
    // contract is stream-vs-batch equivalence) and each is asserted
    // by a named sbt test (AggregatesSpec sketch bounds, DedupSpec /
    // SimilaritySpec recall bounds, TextSpec bloom superset,
    // StreamingSpec / KafkaBindingSpec lifecycle + equivalence).
    val allowed = Set(
      "q_agg_approx_distinct", "q_agg_approx_percentile",
      "q_agg_countmin", "q_agg_sketch_partial", "q_agg_theta_intersect",
      "q_dedup_minhash", "q_dedup_simhash", "q_sim_lsh_bucketed",
      "q_text_decontaminate_bloom",
      "s_compact_files", "s_decode_avro", "s_decode_stream",
      "s_dedup_stream", "s_dedup_stream_near", "s_foreachbatch_upsert",
      "s_ingest_availablenow", "s_ingest_kafka", "s_join_stream",
      "s_late_data", "s_sink_avro", "s_sink_partitioned",
      "s_sink_seqfile", "s_sink_text", "s_stateful_session",
      "s_stateful_session_tws", "s_stateful_zscore", "s_stream_cdc",
      "s_stream_outer_join", "s_stream_session_window",
      "s_stream_sliding", "s_stream_topk", "s_stream_tumbling")
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle === allowed,
      s"unexpected no-oracle keys: ${noOracle -- allowed}; " +
        s"stale exemptions: ${allowed -- noOracle}")
  }

  test("inventory covers all SURVEY §2 declared keys") {
    val declared = Seq(
      // B1
      "q_scan_project", "q_scan_filter_pushdown", "q_scan_union_files",
      "q_scan_schema_evolution", "q_scan_binaryfile", "q_join_dpp",
      "s_sink_partitioned", "s_ingest_availablenow", "s_ingest_kafka",
      "s_sink_text", "q_decode_registry", "q_decode_avro", "q_scan_json", "q_scan_csv",
      "s_sink_seqfile",
      "q_agg_pivot", "q_split_train_eval", "q_sample_stratified",
      "q_agg_approx_percentile", "s_join_stream",
      // B2
      "q_project_expr", "q_filter_compound", "q_filter_null",
      // B3
      "q_join_inner", "q_join_broadcast", "q_join_left", "q_join_right",
      "q_join_full", "q_join_semi", "q_join_anti", "q_join_cross",
      "q_join_theta_range", "q_join_asof", "q_join_multiway",
      "q_join_bucketed", "q_join_skew_salted",
      // B4
      "q_agg_global", "q_agg_group_pricing", "q_agg_distinct",
      "q_agg_approx_distinct", "q_agg_having", "q_agg_rollup", "q_agg_cube",
      "q_agg_grouping_sets", "q_agg_stats", "q_agg_percentile",
      "q_agg_collect", "q_agg_minmax_by", "q_agg_histogram",
      // B5
      "q_win_rank", "q_win_topk_group", "q_win_running", "q_win_sliding",
      "q_win_range_frame", "q_win_lead_lag", "q_win_ntile", "q_win_first_last",
      "q_win_session_window", "q_embed_rproj", "q_time_interp",
      "q_win_dist",
      // B6 / B7
      "q_sort_multi", "q_limit_topk",
      "q_union_all", "q_union_distinct", "q_intersect", "q_except",
      // B8
      "q_str_basic", "q_str_regex", "q_str_split_explode", "q_str_distance",
      "q_date_funcs", "q_math_funcs", "q_cond_funcs", "q_cast_types",
      "q_array_funcs", "q_map_funcs", "q_json_funcs",
      // B9
      "q_time_tumbling", "q_time_sliding", "q_sessionize",
      "s_stream_tumbling", "s_late_data", "s_dedup_stream",
      "s_stateful_session", "s_stream_session_window", "s_foreachbatch_upsert",
      // B10
      "q_dedup_exact", "q_dedup_near_jaccard", "q_dedup_minhash",
      "q_dedup_cluster", "q_embed_centroid", "q_embed_quantize",
      "s_decode_stream",
      "q_sim_cosine_topk", "q_sim_knn_query", "q_sim_knn_batch",
      "q_sim_lsh_bucketed",
      "q_text_tokens_tf", "q_text_tfidf", "q_text_lang_stats",
      "q_text_ngrams", "q_text_redact", "q_multimodal_join",
      // r6
      "q_decode_avro", "q_text_decontaminate_bloom", "q_dedup_incremental",
      "s_decode_avro", "s_sink_avro", "q_scan_avro", "q_text_chunk",
      "q_sample_reservoir", "q_scan_text",
      // r7
      "q_dedup_substring", "q_text_bpe", "q_embed_pq",
      "q_multimodal_image_meta", "s_stateful_session_tws",
      "q_graph_pagerank", "q_graph_triangles", "q_merge_scd2",
      "q_sample_weighted", "q_scan_xml", "q_sim_pq_adc",
      // r8
      "q_text_ngram_lm", "q_text_entropy", "q_sample_temperature",
      "q_quality_classifier", "q_dedup_url", "q_merge_cdc",
      "q_graph_bfs", "q_time_autocorr",
      "q_text_bpe_apply", "q_multimodal_audio_meta", "s_stream_cdc",
      "q_layout_hilbert", "q_join_asof_tolerance", "q_text_langid_rank",
      "q_embed_pca", "q_win_streak", "q_time_seasonal",
      "q_scan_parquet_bloom", "q_time_cusum",
      "q_sql_tpch_q1", "q_sql_tpch_q10", "q_time_trend",
      "q_event_attribution", "q_scan_csv_malformed",
      // r9
      "s_sim_index_build", "q_sim_ivf_probe",
      "s_table_commit", "q_table_time_travel",
      "q_sql_tpch_q21", "q_sql_tpch_q16", "q_sql_tpch_q2",
      "q_table_changes", "s_table_vacuum",
      "q_table_optimize", "s_table_commit_retry",
      "q_quality_perplexity_bucket", "q_sim_ivfpq", "q_pipeline_curation",
      "q_table_add_column", "q_text_unigram_segment", "q_table_merge",
      "q_dedup_span_strip", "q_dedup_survivors", "s_table_stream_read",
      "q_table_restore",
      // r10
      "q_table_partition_prune", "q_table_stats_prune_ts",
      "q_table_optimize_zorder", "q_table_cdf",
      "q_sql_table_time_travel", "q_sql_table_insert",
      "q_sql_table_restore", "q_sql_table_maintenance",
      "q_sql_table_dml", "s_table_stream_sql", "q_sql_table_cdf",
      "q_sql_table_evolve", "q_sql_table_history", "s_table_stream_cdf",
      "q_sql_table_constraints", "q_sql_table_ctas", "q_sql_table_clone",
      "q_sql_table_optimize_where", "q_sql_table_vacuum_hours",
      "q_table_update", "q_sql_table_update",
      "q_table_column_mapping", "q_sql_table_rename_drop",
      "q_table_delete_dv", "q_sql_table_delete_dv",
      "q_table_update_dv", "q_sql_table_reorg",
      "q_table_incr_view", "s_table_view_stream", "q_sql_table_incr_view",
      "q_table_incr_view_minmax", "s_sim_index_refresh",
      "q_table_history_checkpoint", "q_table_merge_evolve",
      "q_table_view_chain", "q_table_incr_view_multikey",
      "q_sql_table_incr_view_multi", "s_sim_index_delete",
      "q_table_incr_view_join", "q_sql_table_incr_view_join",
      "q_sql_table_detail",
      // r12: dim-advance propagation, continuous multi/join view
      // maintenance, depth-3 chains, AVG statement surface
      "q_table_incr_view_join_dimupd", "s_table_view_stream_multi",
      "q_table_view_chain3", "q_sql_table_incr_view_avg",
      "q_table_auto_compact", "q_table_generated_cols",
      "q_sql_table_merge_delete", "q_table_type_widening",
      // r13: continuous dim-advance, STDDEV/VAR statement surface,
      // partition spec evolution, DEFAULT + IDENTITY columns
      "s_table_view_stream_dimupd", "q_sql_table_incr_view_stddev",
      "q_table_partition_evolve", "q_table_default_cols",
      "q_table_identity_cols",
      // r14: sample-variance statement surface, identity × retry-path
      // streaming ingest, multi-column partition specs
      "q_sql_table_incr_view_stddev_samp", "s_table_stream_identity",
      "q_table_partition_evolve_multi", "s_table_view_chain_stream",
      // r15
      "q_sql_table_pruned_scan", "q_sql_table_pruned_scan_multi",
      "q_table_prune_combined", "s_table_dv_rebase",
      "q_sql_table_merge_evolve", "q_sql_table_prune_estimate",
      "q_sql_table_agg_pushdown", "q_sql_table_show_partitions",
      "q_sql_table_join_spj", "q_sql_table_limit_pushdown",
      "s_table_stream_pruned", "q_sql_table_topn_pushdown",
      "q_sql_table_agg_pushdown_grouped", "q_sql_table_join_spj_bucket",
      // r16: OR-disjunction file pruning, timestamp partition probes,
      // filtered metadata aggregates via exact filter consumption
      "q_sql_table_prune_or", "q_sql_table_prune_ts",
      "q_sql_table_agg_pushdown_filtered", "q_sql_table_topn_multi",
      "q_sql_table_seg_scan",
      // r17: segmented metadata answers (per-segment row/byte totals →
      // COUNT(*) + stats-column MIN/MAX + the segment-first LIMIT
      // prefix), prefix probes by layout-value enumeration
      "q_sql_table_seg_agg", "q_sql_table_prune_prefix",
      // r18: segmentation composed with partition layouts (two-level
      // layout pruning), segmented streaming, generalized enumeration
      // probes (range/suffix/substring) with consumption, segmented
      // TopN + COUNT(col)
      "q_sql_table_seg_prune_part", "s_table_stream_segmented",
      "q_sql_table_prune_range", "q_sql_table_seg_topn",
      "q_sql_table_seg_agg_part", "q_sql_table_seg_peek")
    val missing = declared.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"SURVEY §2 keys not implemented: $missing")
  }

  test("flagship entry returns rows on sf0.001 (driver smoke gate)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("schema registry decodes a second payload shape (documents)") {
    import spark.implicits._
    import graft.sources.SchemaRegistry
    val raw = Seq(
      """{"doc_id": 10, "lang": "en", "text": "the quick value", "n_chars": 15}""",
      """{"doc_id": 11, "lang": "de", "text": "order group", "n_chars": 11}""")
      .toDF("value")
    val d = SchemaRegistry.decode(raw, "documents").orderBy("doc_id").collect()
    assert(d.length === 2)
    assert(d(0).getAs[Long]("doc_id") === 10L)
    assert(d(0).getAs[String]("lang") === "en")
    assert(d(1).getAs[Int]("n_chars") === 11)
    assert(d.forall(_.getAs[String](SchemaRegistry.corruptCol) == null))
  }

  test("malformed payloads quarantine into _corrupt_record, never kill the decode") {
    import spark.implicits._
    import graft.sources.SchemaRegistry
    val raw = Seq(
      """{"event_id": 1, "ts": "2024-01-01T10:00:00.000Z", "user_id": 7, "event_type": "click", "value": 1.5, "props": "{}"}""",
      """{"event_id": oops not json""",
      """[1, 2, 3]""")
      .toDF("value")
    val d = SchemaRegistry.decode(raw, "events").collect()
    assert(d.length === 3)
    val (good, bad) = d.partition(_.getAs[String](SchemaRegistry.corruptCol) == null)
    assert(good.length === 1 && good(0).getAs[Long]("event_id") === 1L)
    assert(bad.length === 2, s"expected 2 quarantined rows, got ${bad.length}")
    assert(bad.forall(r => r.isNullAt(r.fieldIndex("event_id"))))
    assert(bad.exists(_.getAs[String](SchemaRegistry.corruptCol).contains("oops")))
  }

  test("registry encode->decode round-trips microsecond timestamps losslessly") {
    import graft.sources.SchemaRegistry
    val e = graft.sources.Tables(spark, sf, "events")
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    val back = SchemaRegistry.decode(SchemaRegistry.encode(e, cols), "events")
      .select(cols.map(col): _*)
    assert(back.exceptAll(e.select(cols.map(col): _*)).count() === 0)
    assert(e.select(cols.map(col): _*).exceptAll(back).count() === 0)
  }

  test("avro encode->decode round-trips the events table losslessly") {
    import graft.sources.SchemaRegistry
    val e = graft.sources.Tables(spark, sf, "events")
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    val back = SchemaRegistry.decodeAvro(
        SchemaRegistry.encodeAvro(e, "events", cols), "events")
      .select(cols.map(col): _*)
    assert(back.exceptAll(e.select(cols.map(col): _*)).count() === 0)
    assert(e.select(cols.map(col): _*).exceptAll(back).count() === 0)
  }

  test("undecodable avro payloads quarantine as base64, never kill the decode") {
    import spark.implicits._
    import graft.sources.SchemaRegistry
    val e = graft.sources.Tables(spark, sf, "events").limit(2)
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    val good = SchemaRegistry.encodeAvro(e, "events", cols)
    // a truncated frame and outright garbage — both must quarantine
    val corrupt = Seq(Array[Byte](1), Array[Byte](-1, -1, -1, -1, -1, -1))
      .toDF("value")
    val mixed = good.union(corrupt)
    val d = SchemaRegistry.decodeAvro(mixed, "events").collect()
    assert(d.length === 4)
    val (ok, bad) = d.partition(_.getAs[String](SchemaRegistry.corruptCol) == null)
    assert(ok.length === 2 && bad.length === 2, s"partition was ${ok.length}/${bad.length}")
    assert(bad.forall(r => r.isNullAt(r.fieldIndex("event_id"))))
    // the quarantined payload is recoverable (base64 of the raw bytes)
    assert(java.util.Base64.getDecoder.decode(
      bad.map(_.getAs[String](SchemaRegistry.corruptCol)).head).nonEmpty)
  }

  test("unregistered payload type fails fast with the known-type list") {
    import spark.implicits._
    import graft.sources.SchemaRegistry
    val raw = Seq("""{}""").toDF("value")
    val ex = intercept[IllegalArgumentException] {
      SchemaRegistry.decode(raw, "nope")
    }
    assert(ex.getMessage.contains("unregistered") && ex.getMessage.contains("events"))
  }

  test("kafka source options carry offset-reset, loss tolerance, and fetch caps (A1/A3/A9)") {
    val opts = EventSource.Kafka.sourceOptions("b1:9092,b2:9092", "events",
      startingOffsets = EventSource.Kafka.offsetsJson("events",
        Map(1 -> -2L, 0 -> 23L, 2 -> -1L)),
      failOnDataLoss = false, maxOffsetsPerTrigger = 5000L)
    assert(opts("kafka.bootstrap.servers") === "b1:9092,b2:9092")
    assert(opts("subscribe") === "events")
    // partitions in numeric order, sentinel offsets preserved
    assert(opts("startingOffsets") === """{"events":{"0":23,"1":-2,"2":-1}}""")
    assert(opts("failOnDataLoss") === "false")
    assert(opts("maxOffsetsPerTrigger") === "5000")
    // defaults: earliest reset (the reference's re-consumable log [R])
    assert(EventSource.Kafka.sourceOptions("b", "t")("startingOffsets") === "earliest")
  }

  test("kafka binding status reports both branches (connector present / absent)") {
    // the status must agree with whatever the classpath actually has:
    // absent offline (this container) => file-stream twin fallback;
    // bound where the connector jar IS installed — don't hard-fail the
    // suite on the environment the options surface was built for
    val (_, realAvail, realStatus) = EventSource.Kafka.bindingStatus()
    if (realAvail) assert(realStatus === "bound")
    else assert(realStatus.startsWith("connector-absent"),
      s"expected absent connector offline, got $realStatus")
    // a resolvable stand-in class flips the same code path to "bound"
    val (_, fakeAvail, fakeStatus) =
      EventSource.Kafka.bindingStatus(classOf[FakeKafkaProvider].getName)
    assert(fakeAvail && fakeStatus === "bound")
  }

  test("kafka payload decode (A6): raw binary JSON -> canonical typed schema") {
    import spark.implicits._
    val raw = Seq(
      """{"event_id": 1, "ts": "2024-01-01T10:00:00.000Z", "user_id": 7, "event_type": "click", "value": 1.5, "props": "{\"k\": 3}"}""",
      """{"event_id": 2, "ts": "2024-01-01T11:30:00.000Z", "user_id": 8, "event_type": "view", "value": 2.0, "props": "{\"k\": 4}"}""")
      .toDF("json")
      .select(col("json").cast("binary").as("value")) // kafka frame shape
    val decoded = EventSource.Kafka.decodeJson(spark, raw)
    assert(decoded.columns.toSeq ===
      Seq("event_id", "ts", "user_id", "event_type", "value", "props"))
    val rows = decoded.orderBy("event_id").collect()
    assert(rows.length === 2)
    assert(rows(0).getAs[Long]("event_id") === 1L)
    assert(rows(0).getAs[String]("event_type") === "click")
    assert(rows(1).getAs[java.sql.Timestamp]("ts").getTime ===
      java.sql.Timestamp.valueOf("2024-01-01 11:30:00").getTime)
  }

  test("xml scan contract: ignoreSurroundingSpaces=false preserves padded element text") {
    // q_scan_xml's md5 round-trip is a fidelity contract; the source's
    // DEFAULT ignoreSurroundingSpaces=true would silently trim a text
    // value with leading/trailing whitespace (the fixtures happen to be
    // trim-safe — this pins the option so the contract never depends on
    // fixture luck)
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_xml_ws").toString
    Seq("<docs><doc><id>1</id><text>  padded value  </text></doc></docs>")
      .toDF("value").coalesce(1).write.mode("overwrite").text(dir)
    def readWith(ignore: String) = spark.read.format("xml")
      .option("rowTag", "doc").option("ignoreSurroundingSpaces", ignore)
      .schema("id LONG, text STRING").load(dir)
      .collect().head.getAs[String]("text")
    assert(readWith("false") === "  padded value  ")
    assert(readWith("true") === "padded value", "default trims — q_scan_xml must not use it")
  }

  test("md5-threshold sampling is subset-monotone across rates") {
    // the property that makes deterministic sampling composable: the
    // kept set of a lower threshold nests inside a higher one's, so a
    // 10% sample drawn later agrees with the 25% sample drawn earlier
    import org.apache.spark.sql.functions._
    val d = graft.sources.Tables(spark, sf, "documents")
      .select(col("doc_id"), md5(col("doc_id").cast("string")).as("h"))
    def kept(thr: String): Set[Long] =
      d.filter(col("h") < lit(thr)).select("doc_id")
        .collect().map(_.getLong(0)).toSet
    val (lo, mid, hi) = (kept("1a"), kept("40"), kept("c0"))
    assert(lo.nonEmpty && lo.size < mid.size && mid.size < hi.size)
    assert(lo.subsetOf(mid) && mid.subsetOf(hi))
  }
}

/** Stand-in DataSource provider class for the binding-status test: its
  * presence on the test classpath exercises the "bound" branch of the
  * Kafka availability check without the real connector jar. */
class FakeKafkaProvider
