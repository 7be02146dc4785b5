"""Replicates the driver's correctness gate locally at sf0.001: run each
``__ray_entry__.queries()`` entry and its DuckDB oracle SQL side-by-side,
compare row count, column names, and order-insensitive values."""

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"


def _to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(obj, ray.data.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


@pytest.fixture(scope="module")
def entrymod():
    import __ray_entry__

    return __ray_entry__


@pytest.fixture(scope="module")
def duck():
    import os

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _oracle_sql_for(entrymod, name: str) -> str:
    """Rebuild the oracle SQL against the sf0.001 transcripts (the shipped
    oracle_sql() hardcodes the driver's sf0.01 path)."""
    from asterixdb_analytics_ray import sql_oracle as so
    from asterixdb_analytics_ray.sources.transcripts import ensure_transcripts

    p = ensure_transcripts(SF_DIR)
    builders = {
        "transcript_roundtrip": so.transcript_roundtrip_sql,
        "nodes": so.nodes_sql,
        "edge_counts": so.edge_counts_sql,
        "out_degrees": so.out_degrees_sql,
        "top_degree": so.top_degree_sql,
        "pagerank": so.pagerank_sql,
        "spectral_scores": so.spectral_scores_sql,
        "spectral_cut": so.spectral_cut_sql,
        "graph_coloring": so.coloring_sql,
        "conv_turn_latency": so.turn_latency_sql,
        "tool_pair_weights": so.tool_pair_weights_sql,
        "pagerank_top_nodes": so.pagerank_top_nodes_sql,
        "connected_components": so.connected_components_sql,
        "modularity": so.modularity_sql,
        "label_propagation": so.label_propagation_sql,
        "triangle_count": so.triangles_sql,
        "triangle_total": so.triangle_total_sql,
        "sssp": so.sssp_sql,
        "bfs_multi_source": so.bfs_multi_sql,
        "harmonic_centrality": so.bfs_harmonic_sql,
        "closeness_centrality": so.bfs_closeness_sql,
        "rich_club": so.rich_club_sql,
        "graph_eccentricity": so.bfs_eccentricity_sql,
        "sssp_weighted": so.sssp_weighted_sql,
        "reachability": so.reachability_sql,
        "graph_sample": so.graph_sample_sql,
        "max_clique": so.max_clique_sql,
        "hits": so.hits_sql,
        "pagerank_personalized": lambda p: so.ppr_sql(p, source=0),
        "kcore": lambda p: so.kcore_sql(p, k=3),
        "clustering_coefficient": so.clustering_coefficient_sql,
        "link_prediction": so.adamic_adar_sql,
        "degree_histogram": so.degree_histogram_sql,
        "random_walks": so.random_walks_sql,
        "pagerank_weighted": so.pagerank_weighted_sql,
        "mis": so.mis_sql,
        "ktruss": lambda p: so.ktruss_sql(p, k=4),
        "degree_assortativity": so.assortativity_sql,
        "link_prediction_jaccard": so.jaccard_linkpred_sql,
        "link_prediction_ra": so.resource_allocation_sql,
        "betweenness": so.betweenness_sql,
        "transitivity": so.transitivity_sql,
        "katz": so.katz_sql,
        "avg_neighbor_degree": so.avg_neighbor_degree_sql,
        "dag_levels": so.dag_levels_sql,
        "conv_tool_paths": so.tool_paths_sql,
        "tool_scc": so.tool_scc_sql,
        "conv_stats": so.conv_stats_sql,
        "role_stats": so.role_stats_sql,
    }
    view_based = {
        "events_bipartite_degree": so.events_bipartite_degree_sql,
        "events_windowed_counts": so.windowed_counts_sql,
        "events_asof_click": so.asof_last_event_sql,
        "events_range_join": so.range_join_counts_sql,
        "doc_ngram_jaccard": lambda: so.ngram_jaccard_sql(0.4),
        "doc_minhash_dups": lambda: so.minhash_lsh_sql(0.4),
        "doc_dup_clusters": lambda: so.dup_clusters_sql(0.4),
        "doc_language_id": so.language_id_sql,
        "doc_simhash": so.simhash_sql,
        "doc_hll_registers": so.hll_registers_sql,
        "events_sessionize": so.sessionize_sql,
        "events_session_ids": so.session_ids_sql,
        "events_funnel": so.funnel_stages_sql,
        "events_retention": so.retention_counts_sql,
        "events_top_per_user": lambda: so.top_events_per_user_sql(3),
        "events_value_quantiles": so.event_value_quantiles_sql,
        "events_sliding_counts": so.sliding_counts_sql,
        "events_anomalies": so.window_anomalies_sql,
        "events_gap_stats": so.gap_stats_sql,
        "doc_vocab_stats": so.vocab_stats_sql,
        "doc_quality_by_lang": so.quality_by_lang_sql,
        "events_transitions": so.transition_counts_sql,
        "events_session_pairs": so.session_type_pairs_sql,
        "events_props_rollup": so.props_rollup_sql,
        "tpch_pricing_summary": so.pricing_summary_sql,
        "tpch_nation_revenue": so.nation_revenue_sql,
        "tpch_inactive_customers": so.inactive_customers_sql,
        "tpch_priority_returns": so.priority_return_counts_sql,
        "tpch_shipping_priority": so.shipping_priority_sql,
        "tpch_brand_volume": so.brand_volume_sql,
        "tpch_region_revenue": so.region_revenue_sql,
        "tpch_forecast_revenue": so.forecast_revenue_sql,
        "tpch_promo_share": so.promo_revenue_share_sql,
        "tpch_top_customers": so.top_return_customers_sql,
        "tpch_order_counts": so.order_count_distribution_sql,
        "tpch_large_orders": so.large_orders_sql,
        "tpch_discounted_revenue": so.discounted_revenue_sql,
        "tpch_local_supplier_revenue": so.local_supplier_revenue_sql,
        "tpch_volume_shipping": so.volume_shipping_sql,
        "tpch_top_supplier": so.top_supplier_sql,
        "tpch_small_qty_revenue": so.small_quantity_revenue_sql,
        "tpch_supplier_part_counts": so.supplier_part_counts_sql,
        "tpch_sales_opportunity": so.sales_opportunity_sql,
        "tpch_maintained_summary": so.maintained_pricing_summary_sql,
        "doc_segment_dedup": so.segment_dedup_sql,
        "doc_source_overlap": so.source_overlap_sql,
        "events_heavy_hitters": so.heavy_hitters_sql,
        "doc_oov_rate": so.oov_rate_sql,
        "doc_chunks": lambda: so.chunk_documents_sql(16, 4),
        "tpch_best_supplier": so.min_cost_supplier_sql,
        "tpch_product_profit": so.product_type_profit_sql,
        "tpch_important_parts": so.important_parts_sql,
        "tpch_late_shipments": so.late_shipment_counts_sql,
        "tpch_part_promotion": so.part_promotion_suppliers_sql,
        "tpch_waiting_suppliers": so.waiting_suppliers_sql,
        "events_rolling_wau": lambda: so.rolling_active_users_sql(7),
        "events_user_profiles": so.user_profiles_sql,
        "doc_source_stats": so.source_stats_sql,
        "doc_decontaminate": lambda: so.decontaminate_sql(5),
        "doc_best_per_source": so.best_per_source_sql,
        "doc_cms_registers": so.cms_registers_sql,
        "doc_top_tokens": lambda: so.top_tokens_sql(20),
        "doc_zipf_slope": lambda: so.zipf_slope_sql(200),
        "doc_containment_dups": lambda: so.containment_sql(0.8),
        "doc_dup_shingles": so.dup_shingle_stats_sql,
        "tpch_market_share": so.market_share_sql,
        "corpus_split_leakage": lambda: so.split_leakage_sql(0.4, 0.2),
        "doc_tfidf_terms": lambda: so.tfidf_top_terms_sql(3),
        "doc_hash_sample": lambda: so.hash_sample_sql(
            0.2, __import__("__ray_entry__")._SAMPLE_RATES
        ),
        "doc_length_quantiles": so.length_quantiles_sql,
        "doc_simhash_dups": lambda: so.simhash_pairs_sql(3),
        "doc_token_counts": so.token_counts_sql,
        "doc_token_entropy": so.token_entropy_sql,
        "doc_fingerprints": so.fingerprints_sql,
        "doc_exact_dedup": so.exact_dedup_sql,
        "doc_quality": so.quality_scores_sql,
        "doc_repetition": so.repetition_scores_sql,
        "doc_lm_score": so.lm_score_sql,
        "corpus_pipeline": so.corpus_pipeline_sql,
        "emb_label_centroids": so.label_centroids_sql,
        "emb_knn": lambda: so.knn_sql((0, 1, 2), 10),
        "emb_cosine_dups": lambda: so.cosine_dup_pairs_sql(0.4),
        "emb_lsh_dups": lambda: so.lsh_dup_pairs_sql(0.4, 8, 4),
        "emb_centroid_exemplars": lambda: so.nearest_to_centroids_sql(5),
        "emb_centroid_separation": so.centroid_separation_sql,
        "emb_cluster_cohesion": so.cluster_cohesion_sql,
        "emb_outliers": so.centroid_outliers_sql,
        "emb_random_projection": lambda: so.random_projection_sql(8, 64),
        "media_features": lambda: so.media_features_sql(
            __import__("__ray_entry__")._media_path(SF_DIR)
        ),
        "emb_kmeans_cells": lambda: so.kmeans_cells_sql(
            os.path.join(SF_DIR, "embeddings.parquet")
        ),
        "emb_stratified_sample": lambda: so.stratified_sample_sql(
            os.path.join(SF_DIR, "embeddings.parquet")
        ),
        "emb_silhouette": so.silhouette_sql,
        "doc_source_dup_rates": so.source_dup_rates_sql,
        "emb_ivf_recall": lambda: so.ivf_recall_sql(
            os.path.join(SF_DIR, "embeddings.parquet"),
            query_ids=__import__("__ray_entry__")._KNN_QUERY_IDS,
        ),
        "emb_ivf_knn": lambda: so.ivf_knn_sql(
            os.path.join(SF_DIR, "embeddings.parquet"),
            query_ids=__import__("__ray_entry__")._KNN_QUERY_IDS,
        ),
        "emb_pq_codes": lambda: so.pq_codes_sql(
            os.path.join(SF_DIR, "embeddings.parquet"), m=2, n_clusters=8
        ),
        "doc_bigram_pmi": lambda: so.bigram_pmi_sql(k=50, min_count=5),
        "emb_quantize": so.quantize_int8_sql,
        "doc_scrub_terms": so.scrub_terms_sql,
        "emb_covariance": so.covariance_sql,
        "emb_top_direction": so.top_direction_sql,
    }
    if name in view_based:
        return view_based[name]()
    return builders[name](p)


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind in "iu":
            df[c] = df[c].astype(np.int64)
        elif df[c].dtype.kind == "f":
            df[c] = df[c].astype(np.float64).round(9)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


QUERY_NAMES = [
    "transcript_roundtrip",
    "nodes",
    "edge_counts",
    "out_degrees",
    "top_degree",
    "pagerank",
    "connected_components",
    "modularity",
    "label_propagation",
    "triangle_count",
    "triangle_total",
    "sssp",
    "sssp_weighted",
    "reachability",
    "events_bipartite_degree",
    "events_windowed_counts",
    "events_asof_click",
    "events_range_join",
    "doc_ngram_jaccard",
    "doc_minhash_dups",
    "doc_language_id",
    "doc_simhash",
    "doc_simhash_dups",
    "doc_hll_registers",
    "doc_token_counts",
    "doc_fingerprints",
    "doc_exact_dedup",
    "doc_quality",
    "doc_repetition",
    "events_sessionize",
    "events_session_ids",
    "doc_decontaminate",
    "doc_best_per_source",
    "doc_cms_registers",
    "doc_top_tokens",
    "doc_zipf_slope",
    "doc_containment_dups",
    "doc_dup_shingles",
    "corpus_split_leakage",
    "doc_tfidf_terms",
    "doc_hash_sample",
    "doc_length_quantiles",
    "doc_lm_score",
    "corpus_pipeline",
    "emb_label_centroids",
    "emb_knn",
    "emb_cosine_dups",
    "emb_lsh_dups",
    "max_clique",
    "graph_sample",
    "media_features",
    "emb_kmeans_cells",
    "emb_ivf_knn",
    "emb_pq_codes",
    "hits",
    "pagerank_personalized",
    "kcore",
    "clustering_coefficient",
    "link_prediction",
    "degree_histogram",
    "doc_bigram_pmi",
    "emb_quantize",
    "random_walks",
    "pagerank_weighted",
    "mis",
    "ktruss",
    "degree_assortativity",
    "link_prediction_jaccard",
    "transitivity",
    "doc_token_entropy",
    "katz",
    "avg_neighbor_degree",
    "events_funnel",
    "events_retention",
    "events_top_per_user",
    "link_prediction_ra",
    "doc_dup_clusters",
    "emb_centroid_exemplars",
    "bfs_multi_source",
    "events_value_quantiles",
    "emb_centroid_separation",
    "events_sliding_counts",
    "events_user_profiles",
    "doc_source_stats",
    "betweenness",
    "harmonic_centrality",
    "closeness_centrality",
    "rich_club",
    "emb_random_projection",
    "events_anomalies",
    "events_gap_stats",
    "doc_vocab_stats",
    "events_transitions",
    "events_rolling_wau",
    "emb_cluster_cohesion",
    "events_session_pairs",
    "tpch_pricing_summary",
    "tpch_nation_revenue",
    "tpch_shipping_priority",
    "tpch_brand_volume",
    "tpch_region_revenue",
    "doc_quality_by_lang",
    "emb_outliers",
    "pagerank_top_nodes",
    "events_props_rollup",
    "doc_scrub_terms",
    "dag_levels",
    "emb_covariance",
    "conv_tool_paths",
    "emb_top_direction",
    "tool_scc",
    "conv_stats",
    "graph_eccentricity",
    "role_stats",
    "tpch_inactive_customers",
    "tpch_priority_returns",
    "doc_segment_dedup",
    "emb_stratified_sample",
    "doc_source_overlap",
    "events_heavy_hitters",
    "doc_oov_rate",
    "spectral_scores",
    "emb_ivf_recall",
    "graph_coloring",
    "conv_turn_latency",
    "doc_chunks",
    "tool_pair_weights",
    "tpch_maintained_summary",
    "emb_silhouette",
    "doc_source_dup_rates",
    "spectral_cut",
    "tpch_best_supplier",
    "tpch_product_profit",
    "tpch_important_parts",
    "tpch_late_shipments",
    "tpch_part_promotion",
    "tpch_waiting_suppliers",
    "tpch_forecast_revenue",
    "tpch_promo_share",
    "tpch_top_customers",
    "tpch_order_counts",
    "tpch_large_orders",
    "tpch_discounted_revenue",
    "tpch_local_supplier_revenue",
    "tpch_volume_shipping",
    "tpch_top_supplier",
    "tpch_small_qty_revenue",
    "tpch_supplier_part_counts",
    "tpch_sales_opportunity",
    "tpch_market_share",
]


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(entrymod, duck, name):
    got = _normalize(_to_pandas(entrymod.queries()[name](SF_DIR)))
    want = _normalize(duck.execute(_oracle_sql_for(entrymod, name)).df())
    assert list(got.columns) == list(want.columns), (got.columns, want.columns)
    assert len(got) == len(want), (len(got), len(want))
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=0, rtol=0)


def test_entry_smoke(entrymod):
    out = entrymod.entry()
    assert len(out) > 0
    assert list(out.columns) == ["v", "kind", "key", "rank"]
    assert out["rank"].sum() > 0
