"""Driver contract for the hydra_ray engine (Ray Data target).

``entry()`` runs the flagship streaming replication pipeline on a small
synthetic clip stream (BASELINE.json input_hint shape); ``queries()``
exposes one named pipeline per operator family from SURVEY.md §2 (plus
the training-data operator set); ``oracle_sql()`` gives the DuckDB
equivalent for every SQL-expressible query, with identical column names
and matching rounding.

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init`` / ``ray.shutdown``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship: streaming replication (decode → windows/join state actors
    → exactly-once sink) on synthetic clips; returns the replicated rows."""
    from hydra_ray.pipelines import batch_queries as q

    return q.q_replicate_stream("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from hydra_ray.pipelines import batch_queries as q

    return {
        # DRIVER WINDOW (first 50 entries are oracle-checked by the
        # driver).  Round-5 rotation (VERDICT r4 #3): freshness is the
        # criterion now that every oracle has >=1 driver row — slots
        # 1-35 are the 35 oracles whose latest driver row is r1/r2,
        # slots 36-50 the alphabetically-first r3-verified fill (new
        # r5 oracles displace from the END of the fill block).
        # -- slots 1-35: stalest (last driver row r1/r2) --
        "anti_join": q.q_anti_join,
        "asof_join": q.q_asof_join,
        "bloom_semi_join": q.q_bloom_semi_join,
        "broadcast_enrich": q.q_broadcast_enrich,
        "consumer_lag": q.q_consumer_lag,
        "events_per_day": q.q_events_per_day,
        "exact_dedup": q.q_exact_dedup,
        "funnel": q.q_funnel,
        "global_rank": q.q_global_rank,
        "interval_join": q.q_interval_join,
        "json_key_extract": q.q_json_key_extract,
        "lag_delta": q.q_lag_delta,
        "latest_by_key": q.q_latest_by_key,
        "mode_user": q.q_mode_user,
        "pivot_events": q.q_pivot_events,
        "pricing_summary": q.q_pricing_summary,
        "replication_diff": q.q_replication_diff,
        "running_total": q.q_running_total,
        "salted_agg": q.q_salted_agg,
        "session_window": q.q_session_window,
        "sliding_window": q.q_sliding_window,
        "source_cap": q.q_source_cap,
        "stratified_sample": q.q_stratified_sample,
        "token_budget": q.q_token_budget,
        "topic_tail": q.q_topic_tail,
        "train_split": q.q_train_split,
        "tumbling_window": q.q_tumbling_window,
        "value_corr": q.q_value_corr,
        "value_cume": q.q_value_cume,
        "value_dispersion": q.q_value_dispersion,
        "value_histogram": q.q_value_histogram,
        "value_outliers": q.q_value_outliers,
        "value_quantiles": q.q_value_quantiles,
        "value_quantiles_cont": q.q_value_quantiles_cont,
        "value_ranks": q.q_value_ranks,
        # -- slots 36-50: r3-verified fill; new r5 oracles displace
        # from the END of this block --
        "ann_topk": q.q_ann_topk,
        "avro_evolution": q.q_avro_evolution,
        "avro_roundtrip": q.q_avro_roundtrip,
        "bag_except": q.q_bag_except,
        "bag_intersect": q.q_bag_intersect,
        "bm25_search": q.q_bm25_search,
        "chunk_docs": q.q_chunk_docs,
        "components": q.q_components,
        # -- NEW r5 oracles (displace the end of the fill block) --
        "date_shift": q.q_date_shift,
        "string_pack": q.q_string_pack,
        "regex_extract": q.q_regex_extract,
        "audio_fbank": q.q_audio_fbank,
        "audio_mfcc": q.q_audio_mfcc,
        "pareto_parts": q.q_pareto_parts,
        "above_avg_items": q.q_above_avg_items,
        # -- oracled, past the 50-slot window (driver-verified in a
        # recent round; rotate forward in later rounds) --
        "csv_roundtrip": q.q_csv_roundtrip,
        "decontaminate": q.q_decontaminate,
        "dedup_cut": q.q_dedup_cut,
        "degree_stats": q.q_degree_stats,
        "dup_spans": q.q_dup_spans,
        "embedding_neardup": q.q_embedding_neardup,
        "event_paths": q.q_event_paths,
        "nation_trade": q.q_nation_trade,
        "product_revenue": q.q_product_revenue,
        "top_supplier": q.q_top_supplier,
        "small_qty_revenue": q.q_small_qty_revenue,
        "disjunctive_revenue": q.q_disjunctive_revenue,
        "waiting_suppliers": q.q_waiting_suppliers,
        "discounted_revenue": q.q_discounted_revenue,
        "market_share": q.q_market_share,
        "important_parts": q.q_important_parts,
        "ship_priority": q.q_ship_priority,
        "promo_suppliers": q.q_promo_suppliers,
        "promo_share": q.q_promo_share,
        "priority_count": q.q_priority_count,
        "returned_revenue": q.q_returned_revenue,
        "large_orders": q.q_large_orders,
        "cheapest_supplier": q.q_cheapest_supplier,
        "supplier_count": q.q_supplier_count,
        "customer_distribution": q.q_customer_distribution,
        "idle_balances": q.q_idle_balances,
        "shipping_priority": q.q_shipping_priority,
        "local_volume": q.q_local_volume,
        "best_order": q.q_best_order,
        "date_parts": q.q_date_parts,
        "string_funcs": q.q_string_funcs,
        "unpivot_events": q.q_unpivot_events,
        "orc_roundtrip": q.q_orc_roundtrip,
        "ipc_roundtrip": q.q_ipc_roundtrip,
        "winsorize": q.q_winsorize,
        "normalize_text": q.q_normalize_text,
        "token_entropy": q.q_token_entropy,
        "table_profile": q.q_table_profile,
        "match_funnel": q.q_match_funnel,
        "ann_range": q.q_ann_range,
        "vector_norms": q.q_vector_norms,
        "distinct_users": q.q_distinct_users,
        "upsert_compaction": q.q_upsert_compaction,
        "rollup_sales": q.q_rollup_sales,
        "cube_sales": q.q_cube_sales,
        "rolling_range": q.q_rolling_range,
        "rolling_value": q.q_rolling_value,
        "value_bounds": q.q_value_bounds,
        "quantile_sketch": q.q_quantile_sketch,
        "hash_join": q.q_hash_join,
        "left_join": q.q_left_join,
        "sentence_stats": q.q_sentence_stats,
        "pagerank_ranks": q.q_pagerank_ranks,
        "export_shards": q.q_export_shards,
        "value_matrix": q.q_value_matrix,
        "benford_digits": q.q_benford_digits,
        "hour_heatmap": q.q_hour_heatmap,
        "jaccard_search": q.q_jaccard_search,
        "similarity_join": q.q_similarity_join,
        "token_stats": q.q_token_stats,
        "token_explode": q.q_token_explode,
        "repetition_stats": q.q_repetition_stats,
        "tfidf_terms": q.q_tfidf_terms,
        "redact_text": q.q_redact_text,
        "top_bigrams": q.q_top_bigrams,
        "window_distinct": q.q_window_distinct,
        "set_except": q.q_set_except,
        "set_intersect": q.q_set_intersect,
        "set_union": q.q_set_union,
        "quality_scores": q.q_quality_scores,
        "langid": q.q_langid,
        "fingerprint": q.q_fingerprint,
        "zorder_scan": q.q_zorder_scan,
        "heavy_hitters": q.q_heavy_hitters,
        "value_moments": q.q_value_moments,
        "value_regression": q.q_value_regression,
        "flag_aggregates": q.q_flag_aggregates,
        "first_last_event": q.q_first_last_event,
        "type_entropy": q.q_type_entropy,
        "value_mad": q.q_value_mad,
        "fuzzy_match": q.q_fuzzy_match,
        "order_revenue": q.q_order_revenue,
        "window_quantiles": q.q_window_quantiles,
        "weighted_sample": q.q_weighted_sample,
        "triangle_count": q.q_triangle_count,
        "pair_support": q.q_pair_support,
        "k_hop": q.q_k_hop,
        "full_outer": q.q_full_outer,
        "transition_counts": q.q_transition_counts,
        "time_resample": q.q_time_resample,
        "interval_overlap": q.q_interval_overlap,
        "sessionize": q.q_sessionize,
        # -- rows-only (no SQL oracle; covered by dedicated pytest
        # oracles) -- keep LAST so they never displace an oracled query
        # from the driver window.
        "ewma_value": q.q_ewma_value,
        "pack_sequences": q.q_pack_sequences,
        "replicate_stream": q.q_replicate_stream,
        "pagerank": q.q_pagerank,
        "pagerank_sharded": q.q_pagerank_sharded,
        "hits_scores": q.q_hits_scores,
        "early_windows": q.q_early_windows,
        "communities": q.q_communities,
        "random_walks": q.q_random_walks,
        "kcore_parts": q.q_kcore_parts,
        "minhash_neardup": q.q_minhash_neardup,
        "neardup_clusters": q.q_neardup_clusters,
        "neardup_cc": q.q_neardup_cc,
        "simhash_neardup": q.q_simhash_neardup,
        "lm_quality": q.q_lm_quality,
        "bpe_tokens": q.q_bpe_tokens,
        "curation_e2e": q.q_curation_e2e,
        "compression_ratio": q.q_compression_ratio,
        "kmeans_embed": q.q_kmeans_embed,
        "text_cluster": q.q_text_cluster,
        "semantic_dedup": q.q_semantic_dedup,
        "ann_ivf": q.q_ann_ivf,
        "ann_pq": q.q_ann_pq,
        "ann_ivfpq": q.q_ann_ivfpq,
        "embed_pca": q.q_embed_pca,
        "approx_distinct": q.q_approx_distinct,
        "audio_features": q.q_audio_features,
        "audio_search": q.q_audio_search,
        "pitch_track": q.q_pitch_track,
        "audio_curation": q.q_audio_curation,
        "vad_segments": q.q_vad_segments,
        "trim_audio": q.q_trim_audio,
        "loudness_normalize": q.q_loudness_normalize,
        "transcode_flac": q.q_transcode_flac,
        "audio_neardup": q.q_audio_neardup,
        "flac_roundtrip": q.q_flac_roundtrip,
        "adpcm_roundtrip": q.q_adpcm_roundtrip,
        "image_features": q.q_image_features,
        "image_resize": q.q_image_resize,
        "image_neardup": q.q_image_neardup,
        "video_frames": q.q_video_frames,
        "video_neardup": q.q_video_neardup,
    }


def _pagerank_sql(iters: int = 8, d: float = 0.85) -> str:
    """DuckDB PageRank oracle: recursive CTEs cannot aggregate in the
    recursive term, so the fixed iteration count is UNROLLED as chained
    CTEs.  Graph = Brand#1 co-purchase, support >= 2, both directions
    (same base as the components oracle) — no dangling nodes, so the
    kernel's dangling-mass term is identically zero."""
    base = """
        WITH pp AS (
            SELECT DISTINCT l.l_orderkey AS o, l.l_partkey AS p
            FROM lineitem l JOIN part pt ON pt.p_partkey = l.l_partkey
            WHERE pt.p_brand = 'Brand#1'
        ), e0 AS (
            SELECT a.p AS u, b.p AS v
            FROM pp a JOIN pp b ON a.o = b.o AND a.p < b.p
            GROUP BY 1, 2
            HAVING count(*) >= 2
        ), e AS (
            SELECT u, v FROM e0 UNION SELECT v AS u, u AS v FROM e0
        ), nodes AS (
            SELECT DISTINCT u AS node FROM e
        ), nn AS (
            SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes
        ), od AS (
            SELECT u AS node, CAST(count(*) AS DOUBLE) AS deg
            FROM e GROUP BY u
        ), r0 AS (
            SELECT node, 1.0 / nn.n AS rank FROM nodes CROSS JOIN nn
        )"""
    its = []
    prev = "r0"
    for k in range(1, iters + 1):
        its.append(f""", r{k} AS (
            SELECT nd.node,
                   (1.0 - {d}) / nn.n + {d} * coalesce(s.acc, 0) AS rank
            FROM nodes nd CROSS JOIN nn
            LEFT JOIN (
                SELECT e.v AS node, sum({prev}.rank / od.deg) AS acc
                FROM e
                JOIN {prev} ON {prev}.node = e.u
                JOIN od ON od.node = e.u
                GROUP BY e.v
            ) s ON s.node = nd.node
        )""")
        prev = f"r{k}"
    return (base + "".join(its)
            + f" SELECT node, round(rank, 6) AS rank FROM {prev}")


def oracle_sql() -> dict[str, str]:
    HOUR = 3_600_000
    DAY = 86_400_000
    import os as _os

    _GOLDEN = _os.path.join(
        _os.path.dirname(_os.path.abspath(__file__)), "hydra_ray", "golden")
    return {
        # stored-reference identity oracles (VERDICT r4 #7): the audio
        # feature kernels are bitwise deterministic and sf-independent,
        # so the committed golden tables pin every coefficient
        # (regenerate via tools/make_audio_golden.py after intentional
        # kernel changes).
        "audio_fbank": f"""
            SELECT * FROM read_parquet('{_GOLDEN}/audio_fbank.parquet')
        """,
        "audio_mfcc": f"""
            SELECT * FROM read_parquet('{_GOLDEN}/audio_mfcc.parquet')
        """,
        "date_shift": """
            SELECT o_orderkey,
                   epoch_ms(o_orderdate + INTERVAL 30 DAY) AS due_ms,
                   CAST(date_diff('day', DATE '2024-01-01', o_orderdate)
                        AS BIGINT) AS age_days
            FROM orders
        """,
        "string_pack": """
            SELECT c_custkey, reverse(c_name) AS rname,
                   left(c_name, 6) AS l6,
                   lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS pad,
                   replace(c_mktsegment, 'U', '_') AS seg
            FROM customer
        """,
        "regex_extract": """
            SELECT doc_id,
                   coalesce(regexp_extract(text, '([a-z]{8,})', 1), '')
                       AS first_long
            FROM documents
        """,
        "pareto_parts": """
            SELECT a.p_partkey, CAST(a.p_size AS BIGINT) AS p_size,
                   round(a.p_retailprice, 2) AS price
            FROM part a
            WHERE NOT EXISTS (
                SELECT 1 FROM part b
                WHERE b.p_retailprice <= a.p_retailprice
                  AND b.p_size <= a.p_size
                  AND (b.p_retailprice < a.p_retailprice
                       OR b.p_size < a.p_size))
        """,
        "above_avg_items": """
            WITH w AS (
                SELECT l_orderkey, l_linenumber, l_quantity,
                       avg(l_quantity) OVER (PARTITION BY l_orderkey)
                           AS order_avg
                FROM lineitem)
            SELECT l_orderkey, l_linenumber, l_quantity,
                   round(order_avg, 6) AS order_avg_qty
            FROM w WHERE l_quantity > order_avg
        """,
        "csv_roundtrip": """
            SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
            FROM customer
        """,
        "sessionize": f"""
            WITH s AS (
                SELECT user_id, event_id, epoch_ms(ts) AS ms,
                       CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
                              OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w
                                 > {30 * 60_000}
                            THEN 1 ELSE 0 END AS is_start
                FROM events
                WINDOW w AS (PARTITION BY user_id
                             ORDER BY epoch_ms(ts), event_id)
            )
            SELECT user_id, event_id, ms,
                   CAST(sum(is_start) OVER (
                       PARTITION BY user_id ORDER BY ms, event_id
                       ROWS UNBOUNDED PRECEDING
                   ) AS BIGINT) AS session_id
            FROM s
        """,
        "interval_overlap": f"""
            WITH b AS (
                SELECT user_id, event_id, epoch_ms(ts) AS s,
                       epoch_ms(ts) + (event_id % 7 + 1) * {HOUR} AS e
                FROM events
            )
            SELECT a.user_id, a.event_id AS event_a, c.event_id AS event_b,
                   least(a.e, c.e) - greatest(a.s, c.s) AS overlap_ms
            FROM b a JOIN b c
              ON a.user_id = c.user_id AND a.event_id < c.event_id
                 AND a.s < c.e AND c.s < a.e
        """,
        "time_resample": f"""
            WITH b AS (
                SELECT user_id, epoch_ms(ts) AS ms, value, event_id
                FROM events
            ), b2 AS (
                SELECT user_id, ms, arg_max(value, event_id) AS v
                FROM b GROUP BY user_id, ms
            ), r AS (
                SELECT user_id,
                       ((min(ms) + {HOUR - 1}) // {HOUR}) * {HOUR} AS lo,
                       (max(ms) // {HOUR}) * {HOUR} AS hi
                FROM b GROUP BY user_id
            ), g AS (
                SELECT user_id, unnest(range(lo, hi + 1, {HOUR})) AS grid_ms
                FROM r WHERE lo <= hi
            )
            SELECT g.user_id, g.grid_ms, round(b2.v, 2) AS value
            FROM g ASOF JOIN b2
              ON g.user_id = b2.user_id AND g.grid_ms >= b2.ms
        """,
        "transition_counts": """
            WITH s AS (
                SELECT user_id,
                       lag(event_type) OVER (
                           PARTITION BY user_id
                           ORDER BY epoch_ms(ts), event_id
                       ) AS prev_type,
                       event_type AS next_type
                FROM events
            )
            SELECT prev_type, next_type, count(*) AS cnt
            FROM s
            WHERE prev_type IS NOT NULL
            GROUP BY prev_type, next_type
        """,
        "tumbling_window": f"""
            SELECT user_id,
                   (epoch_ms(ts) // {HOUR}) * {HOUR} AS window_start,
                   count(*) AS n_events,
                   round(sum(value), 2) AS sum_value,
                   round(max(value), 2) AS max_value
            FROM events GROUP BY 1, 2
        """,
        "sliding_window": f"""
            SELECT user_id,
                   ((epoch_ms(ts) // {HOUR}) - j.j) * {HOUR} AS window_start,
                   count(*) AS n_events,
                   round(sum(value), 2) AS sum_value
            FROM events CROSS JOIN (SELECT unnest([0, 1]) AS j) j
            GROUP BY 1, 2
        """,
        "session_window": """
            WITH d AS (
                SELECT user_id, event_id, epoch_ms(ts) AS ms, value FROM events
            ), l AS (
                SELECT *, lag(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS prev
                FROM d
            ), s AS (
                SELECT *, sum(CASE WHEN prev IS NULL OR ms - prev > 1800000 THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id ORDER BY ms, event_id
                             ROWS UNBOUNDED PRECEDING) AS sid
                FROM l
            )
            SELECT user_id,
                   min(ms) AS session_start,
                   max(ms) AS session_end,
                   count(*) AS n_events,
                   round(sum(value), 2) AS sum_value
            FROM s GROUP BY user_id, sid
        """,
        "interval_join": """
            SELECT a.user_id,
                   a.event_id AS click_id,
                   b.event_id AS purchase_id,
                   epoch_ms(b.ts) - epoch_ms(a.ts) AS dt_ms
            FROM events a JOIN events b
              ON a.user_id = b.user_id
             AND epoch_ms(b.ts) >= epoch_ms(a.ts)
             AND epoch_ms(b.ts) < epoch_ms(a.ts) + 600000
            WHERE a.event_type = 'click' AND b.event_type = 'purchase'
        """,
        "asof_join": """
            WITH l AS (
                SELECT event_id, user_id, ts, value
                FROM events WHERE event_type = 'purchase'
            ), r AS (
                SELECT event_id, user_id, ts
                FROM events WHERE event_type = 'click'
            ), m AS (
                SELECT l.user_id,
                       l.event_id AS purchase_id,
                       epoch_ms(l.ts) AS purchase_ts_ms,
                       l.value AS value,
                       r.event_id AS click_id,
                       epoch_ms(r.ts) AS click_ts_ms,
                       row_number() OVER (
                           PARTITION BY l.event_id
                           ORDER BY epoch_ms(r.ts) DESC, r.event_id DESC) AS rn
                FROM l JOIN r
                  ON l.user_id = r.user_id
                 AND epoch_ms(r.ts) <= epoch_ms(l.ts)
            )
            SELECT user_id, purchase_id, purchase_ts_ms, value,
                   click_id, click_ts_ms
            FROM m WHERE rn = 1
        """,
        "value_quantiles": """
            SELECT event_type,
                   quantile_disc(value, 0.25) AS q25,
                   quantile_disc(value, 0.5) AS median,
                   quantile_disc(value, 0.9) AS q90
            FROM events GROUP BY 1
        """,
        "lag_delta": """
            SELECT user_id, event_id, epoch_ms(ts) AS ms,
                   round(value, 2) AS value,
                   round(lag(value, 1) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id), 2)
                       AS prev_value
            FROM events
        """,
        "running_total": """
            SELECT user_id, event_id, epoch_ms(ts) AS ms,
                   round(value, 2) AS value,
                   round(sum(value) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING), 4) AS running_sum
            FROM events
        """,
        "funnel": f"""
            WITH s1 AS (
                SELECT user_id, min(epoch_ms(ts)) AS t1_ms
                FROM events WHERE event_type = 'view' GROUP BY user_id
            ), s2 AS (
                SELECT e.user_id, min(epoch_ms(e.ts)) AS t2_ms
                FROM events e JOIN s1 ON e.user_id = s1.user_id
                WHERE e.event_type = 'click' AND epoch_ms(e.ts) > s1.t1_ms
                GROUP BY e.user_id
            ), s3 AS (
                SELECT e.user_id, min(epoch_ms(e.ts)) AS t3_ms
                FROM events e JOIN s2 ON e.user_id = s2.user_id
                WHERE e.event_type = 'purchase' AND epoch_ms(e.ts) > s2.t2_ms
                GROUP BY e.user_id
            )
            SELECT s1.user_id, s1.t1_ms, s2.t2_ms, s3.t3_ms
            FROM s1 JOIN s2 USING (user_id) JOIN s3 USING (user_id)
            WHERE s3.t3_ms - s1.t1_ms <= {2 * DAY}
        """,
        "value_histogram": """
            SELECT event_type,
                   CAST(LEAST(GREATEST(FLOOR(value / 20.0), 0), 9) AS BIGINT)
                       AS bin,
                   count(*) AS n
            FROM events GROUP BY 1, 2
        """,
        "mode_user": """
            SELECT event_type, user_id AS mode_user FROM (
                SELECT event_type, user_id,
                       row_number() OVER (
                           PARTITION BY event_type
                           ORDER BY count(*) DESC, user_id ASC) AS rn
                FROM events GROUP BY event_type, user_id
            ) WHERE rn = 1
        """,
        "value_corr": """
            SELECT l_returnflag,
                   round(corr(l_quantity, l_extendedprice), 4)
                       AS corr_qty_price
            FROM lineitem GROUP BY 1
        """,
        "value_outliers": """
            SELECT event_id, event_type, round(value, 2) AS value FROM (
                SELECT event_id, event_type, value,
                       avg(value) OVER (PARTITION BY event_type) AS m,
                       stddev_samp(value) OVER (PARTITION BY event_type) AS s
                FROM events
            ) WHERE abs(value - m) > 3 * s
        """,
        "value_moments": """
            SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                   round(skewness(value), 4) AS skew_value,
                   round(kurtosis(value), 4) AS kurt_value
            FROM events GROUP BY event_type
        """,
        "value_regression": """
            WITH d AS (
                SELECT event_type, value,
                       CAST((epoch_ms(ts) // 3600000) % 24 AS DOUBLE) AS hod
                FROM events
            )
            SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                   round(regr_slope(value, hod), 4) AS slope,
                   round(regr_intercept(value, hod), 4) AS intercept,
                   round(corr(value, hod), 4) AS corr_hod,
                   round(covar_samp(value, hod), 4) AS covar_hod
            FROM d GROUP BY event_type
        """,
        "flag_aggregates": """
            SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                   bool_and(value > 10.0) AS all_over_floor,
                   bool_or(value > 900.0) AS any_over_cap
            FROM events GROUP BY event_type
        """,
        "best_order": """
            WITH m AS (
                SELECT o_custkey, CAST(count(*) AS BIGINT) AS n,
                       max(o_totalprice) AS mx, min(o_totalprice) AS mn
                FROM orders GROUP BY o_custkey
            )
            SELECT m.o_custkey, m.n, round(m.mx, 2) AS max_price,
                   min(CASE WHEN o.o_totalprice = m.mx
                            THEN o.o_orderkey END) AS best_order,
                   min(CASE WHEN o.o_totalprice = m.mn
                            THEN o.o_orderpriority END) AS cheap_priority
            FROM orders o JOIN m USING (o_custkey)
            GROUP BY m.o_custkey, m.n, m.mx
        """,
        "first_last_event": """
            WITH o AS (
                SELECT user_id, event_type, epoch_ms(ts) AS ms,
                       row_number() OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                       ) rn_a,
                       row_number() OVER (
                           PARTITION BY user_id
                           ORDER BY ts DESC, event_id DESC
                       ) rn_d
                FROM events
            )
            SELECT f.user_id, f.event_type AS first_type,
                   f.ms AS first_ts,
                   l.event_type AS last_type, l.ms AS last_ts
            FROM o f JOIN o l USING (user_id)
            WHERE f.rn_a = 1 AND l.rn_d = 1
        """,
        "type_entropy": """
            SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                   round(entropy(user_id), 4) AS entropy
            FROM events GROUP BY event_type
        """,
        "value_mad": """
            SELECT event_type, round(mad(value), 4) AS mad
            FROM events GROUP BY event_type
        """,
        "date_parts": """
            SELECT year(o_orderdate) AS y,
                   quarter(o_orderdate) AS q,
                   month(o_orderdate) AS m,
                   dayofweek(o_orderdate) AS dow,
                   CAST(count(*) AS BIGINT) AS n,
                   round(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                         / 100.0, 2) AS sum_price
            FROM orders GROUP BY 1, 2, 3, 4
        """,
        "string_funcs": """
            SELECT c_custkey,
                   upper(c_name) AS name_upper,
                   substr(c_name, 1, 8) AS name_prefix,
                   CAST(length(c_name) AS BIGINT) AS name_len,
                   CAST(strpos(c_name, '0') AS BIGINT) AS pos_zero,
                   reverse(c_name) AS name_rev,
                   lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_pad,
                   concat(c_mktsegment, ':', c_name) AS tagged
            FROM customer
        """,
        "unpivot_events": """
            SELECT l_orderkey, l_linenumber,
                   'l_quantity' AS measure, round(l_quantity, 2) AS value
            FROM lineitem
            UNION ALL
            SELECT l_orderkey, l_linenumber,
                   'l_discount', round(l_discount, 2)
            FROM lineitem
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'l_tax', round(l_tax, 2)
            FROM lineitem
        """,
        "local_volume": """
            SELECT n_name,
                   round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                             * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                         / 10000.0, 2) AS revenue
            FROM customer, orders, lineitem, supplier, nation, region
            WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
              AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
              AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
              AND r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1997-01-01'
              AND o_orderdate < TIMESTAMP '1999-01-01'
            GROUP BY n_name
        """,
        "promo_share": """
            SELECT
                round(sum(CASE WHEN p_type = 'PROMO'
                          THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                               * (100 - CAST(round(l_discount * 100) AS BIGINT))
                          ELSE 0 END) / 10000.0, 2) AS promo_revenue,
                round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                          * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                      / 10000.0, 2) AS total_revenue,
                round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                          THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                               * (100 - CAST(round(l_discount * 100) AS BIGINT))
                          ELSE 0 END)
                      / sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                            * (100 - CAST(round(l_discount * 100) AS BIGINT))),
                      4) AS promo_share
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= TIMESTAMP '1997-09-01'
              AND l_shipdate < TIMESTAMP '1997-12-01'
        """,
        "table_profile": """
            SELECT 'event_id' AS col, CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(count(event_id) AS BIGINT) AS n_nonnull,
                   CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct,
                   round(CAST(min(event_id) AS DOUBLE), 4) AS min_v,
                   round(CAST(max(event_id) AS DOUBLE), 4) AS max_v
            FROM events
            UNION ALL
            SELECT 'ts', count(*), count(ts), count(DISTINCT ts),
                   CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) FROM events
            UNION ALL
            SELECT 'user_id', count(*), count(user_id),
                   count(DISTINCT user_id),
                   round(CAST(min(user_id) AS DOUBLE), 4),
                   round(CAST(max(user_id) AS DOUBLE), 4) FROM events
            UNION ALL
            SELECT 'event_type', count(*), count(event_type),
                   count(DISTINCT event_type),
                   CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) FROM events
            UNION ALL
            SELECT 'value', count(*), count(value), count(DISTINCT value),
                   round(min(value), 4), round(max(value), 4) FROM events
            UNION ALL
            SELECT 'props', count(*), count(props), count(DISTINCT props),
                   CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) FROM events
        """,
        "match_funnel": """
            SELECT user_id,
                   CAST(len(regexp_extract_all(seq, 'vc*p')) AS BIGINT)
                       AS n_matches
            FROM (SELECT user_id,
                         string_agg(substr(event_type, 1, 1), ''
                                    ORDER BY epoch_ms(ts), event_id) AS seq
                  FROM events GROUP BY user_id)
        """,
        "priority_count": """
            SELECT o_orderpriority,
                   CAST(count(*) AS BIGINT) AS order_count
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1997-01-01'
              AND o_orderdate < TIMESTAMP '1997-07-01'
              AND EXISTS (SELECT 1 FROM lineitem
                          WHERE l_orderkey = o_orderkey
                            AND l_returnflag = 'R')
            GROUP BY o_orderpriority
        """,
        "returned_revenue": """
            SELECT c_custkey, c_name,
                   round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                             * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                         / 10000.0, 2) AS revenue,
                   round(c_acctbal, 2) AS acctbal, n_name
            FROM customer, orders, lineitem, nation
            WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
              AND o_orderdate >= TIMESTAMP '1997-07-01'
              AND o_orderdate < TIMESTAMP '1997-10-01'
              AND l_returnflag = 'R' AND c_nationkey = n_nationkey
            GROUP BY c_custkey, c_name, c_acctbal, n_name
            ORDER BY sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                         * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                     DESC, c_custkey
            LIMIT 20
        """,
        "large_orders": """
            SELECT c_custkey, c_name, o_orderkey,
                   epoch_ms(o_orderdate) AS o_orderdate_ms,
                   round(o_totalprice, 2) AS total_price,
                   CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
                       AS sum_qty
            FROM customer, orders, lineitem
            WHERE o_orderkey = l_orderkey AND c_custkey = o_custkey
            GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
            HAVING sum(CAST(round(l_quantity) AS BIGINT)) > 200
        """,
        "fuzzy_match": """
            -- char-based substr == the kernel's prefix on ASCII fixtures
            SELECT doc_id,
                   CAST(levenshtein(
                       substr(coalesce(text, ''), 1, 40),
                       'the data pipeline processes streaming'
                   ) AS BIGINT) AS dist
            FROM documents
        """,
        "avro_roundtrip": """
            -- identity: the Ray side round-trips through Avro OCF bytes
            SELECT event_id, user_id, value, epoch_ms(ts) AS ts_ms
            FROM events
        """,
        "window_quantiles": f"""
            SELECT event_type,
                   (epoch_ms(ts) // {DAY}) * {DAY} AS window_start,
                   round(quantile_cont(value, 0.5), 4) AS median,
                   round(quantile_cont(value, 0.9), 4) AS p90
            FROM events GROUP BY 1, 2
        """,
        "order_revenue": """
            SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_items,
                   round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                             * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                         / 10000.0, 2) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment
        """,
        "value_dispersion": """
            SELECT event_type,
                   count(*) AS n,
                   round(avg(value), 4) AS mean_value,
                   round(var_samp(value), 4) AS var_value,
                   round(stddev_samp(value), 4) AS std_value
            FROM events GROUP BY 1
        """,
        "value_quantiles_cont": """
            SELECT event_type,
                   round(quantile_cont(value, 0.25), 4) AS q25,
                   round(quantile_cont(value, 0.5), 4) AS median,
                   round(quantile_cont(value, 0.9), 4) AS q90
            FROM events GROUP BY 1
        """,
        "pivot_events": """
            SELECT user_id,
                   round(sum(CASE WHEN event_type = 'click'
                                  THEN value ELSE 0 END), 2) AS sum_click,
                   round(sum(CASE WHEN event_type = 'purchase'
                                  THEN value ELSE 0 END), 2) AS sum_purchase,
                   round(sum(CASE WHEN event_type = 'view'
                                  THEN value ELSE 0 END), 2) AS sum_view
            FROM events GROUP BY 1
        """,
        "rolling_value": """
            SELECT user_id, event_id, epoch_ms(ts) AS ms,
                   round(value, 2) AS value,
                   round(avg(value) OVER (
                       PARTITION BY user_id
                       ORDER BY ts, event_id
                       ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4)
                       AS rolling_mean
            FROM events
        """,
        "value_cume": """
            SELECT user_id, event_id, round(value, 2) AS value,
                   cume_dist() OVER (
                       PARTITION BY user_id ORDER BY value) AS cume
            FROM events
        """,
        "value_bounds": """
            SELECT user_id, event_id, epoch_ms(ts) AS ms,
                   round(value, 2) AS value,
                   round(first_value(value) OVER w, 2) AS first_value,
                   round(last_value(value) OVER w, 2) AS last_value,
                   CAST(ntile(4) OVER w AS BIGINT) AS tile
            FROM events
            WINDOW w AS (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        """,
        "rolling_range": """
            SELECT user_id, event_id, epoch_ms(ts) AS ms,
                   CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) OVER w
                        AS BIGINT) AS range_cents,
                   CAST(count(*) OVER w AS BIGINT) AS range_cnt
            FROM events
            WINDOW w AS (
                PARTITION BY user_id ORDER BY ts
                RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        """,
        "quantile_sketch": """
            WITH rnk AS (
                SELECT event_type, value,
                       row_number() OVER (
                           PARTITION BY event_type
                           ORDER BY (event_id * 2654435761) % 4294967296,
                                    event_id) AS r
                FROM events)
            SELECT event_type,
                   quantile_disc(value, 0.5) AS p50,
                   quantile_disc(value, 0.9) AS p90
            FROM rnk WHERE r <= 64 GROUP BY 1
        """,
        "bloom_semi_join": """
            SELECT l_orderkey, l_partkey, l_quantity
            FROM lineitem
            WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size = 1)
        """,
        "anti_join": """
            SELECT user_id, count(*) AS n_clicks
            FROM events
            WHERE event_type = 'click'
              AND user_id NOT IN (
                  SELECT user_id FROM events
                  WHERE event_type = 'purchase' AND value > 150)
            GROUP BY 1
        """,
        "tfidf_terms": r"""
            WITH tok AS (
                SELECT doc_id, u.t AS term
                FROM documents,
                     unnest(string_split_regex(lower(coalesce(text, '')),
                                               '[^a-z]+')) AS u(t)
                WHERE u.t <> ''
            ), tf AS (
                SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2
            ), df AS (
                SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1
            ), n AS (SELECT count(*) AS n FROM documents)
            SELECT tf.doc_id, tf.term,
                   round(tf.tf * ln(CAST(n.n AS DOUBLE) / df.df), 6) AS score
            FROM tf JOIN df USING (term) CROSS JOIN n
            QUALIFY row_number() OVER (
                PARTITION BY tf.doc_id
                ORDER BY tf.tf * ln(CAST(n.n AS DOUBLE) / df.df) DESC,
                         tf.term) <= 3
        """,
        "weighted_sample": """
            SELECT doc_id, length(text) AS n_chars
            FROM documents
            WHERE ((doc_id * 2654435761) % 4294967296) < length(text) * 4194304
        """,
        "full_outer": """
            WITH l AS (
                SELECT o_custkey AS custkey, count(*) AS n_big
                FROM orders WHERE o_totalprice > 250000 GROUP BY 1
            ), r AS (
                SELECT o_custkey AS custkey, count(*) AS n_pending
                FROM orders WHERE o_orderstatus = 'P' GROUP BY 1
            )
            SELECT coalesce(l.custkey, r.custkey) AS custkey,
                   l.n_big, r.n_pending
            FROM l FULL OUTER JOIN r ON l.custkey = r.custkey
        """,
        "degree_stats": """
            WITH pp AS (
                SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
            ), e AS (
                SELECT DISTINCT least(a.p, b.p) AS u, greatest(a.p, b.p) AS v
                FROM pp a JOIN pp b ON a.o = b.o AND a.p < b.p
            ), deg AS (
                SELECT node, count(*) AS degree
                FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
                GROUP BY node
            )
            SELECT degree, count(*) AS n_nodes FROM deg GROUP BY degree
        """,
        # BM25 bit-exactness: the expression tree below is mirrored
        # op-for-op by stages/text.py bm25_score — composite constants
        # stay unfolded ((1.2 + 1.0), (1.0 - 0.75)) and the per-term
        # contributions are added left-to-right in query order.
        "bm25_search": """
            WITH tok AS (
                SELECT doc_id, t AS term
                FROM documents,
                     unnest(string_split_regex(lower(text), '[^a-z]+')) AS u(t)
                WHERE t <> ''
            ), dl AS (
                SELECT doc_id, count(*) AS len FROM tok GROUP BY doc_id
            ), stats AS (
                SELECT (SELECT count(*) FROM documents) AS n,
                       (SELECT CAST(sum(len) AS DOUBLE) FROM dl)
                       / (SELECT count(*) FROM documents) AS avgdl
            ), tf AS (
                SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
                FROM tok
                WHERE term IN ('hash', 'join', 'stream', 'vector')
                GROUP BY doc_id, term
            ), df AS (
                SELECT term, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
                FROM tok
                WHERE term IN ('hash', 'join', 'stream', 'vector')
                GROUP BY term
            ), c AS (
                SELECT tf.doc_id, tf.term,
                       ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
                       * tf.tf * (1.2 + 1.0)
                       / (tf.tf + 1.2 * ((1.0 - 0.75)
                                         + 0.75 * dl.len / stats.avgdl)) AS w
                FROM tf
                JOIN df USING (term)
                JOIN dl USING (doc_id)
                CROSS JOIN stats
            ), p AS (
                SELECT doc_id,
                       max(CASE WHEN term = 'hash' THEN w END) AS w1,
                       max(CASE WHEN term = 'join' THEN w END) AS w2,
                       max(CASE WHEN term = 'stream' THEN w END) AS w3,
                       max(CASE WHEN term = 'vector' THEN w END) AS w4
                FROM c GROUP BY doc_id
            )
            SELECT doc_id,
                   round(coalesce(w1, 0) + coalesce(w2, 0)
                         + coalesce(w3, 0) + coalesce(w4, 0), 4) AS score
            FROM p
        """,
        "k_hop": """
            WITH RECURSIVE pp AS (
                SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
            ), e AS (
                SELECT DISTINCT least(a.p, b.p) AS u, greatest(a.p, b.p) AS v
                FROM pp a JOIN pp b ON a.o = b.o AND a.p < b.p
            ), adj AS (
                SELECT u AS node, v AS nbr FROM e
                UNION ALL
                SELECT v AS node, u AS nbr FROM e
            ), bfs AS (
                SELECT CAST(s.node AS BIGINT) AS node, CAST(0 AS BIGINT) AS d
                FROM (VALUES (1), (2), (3)) AS s(node)
                UNION
                SELECT adj.nbr AS node, bfs.d + 1 AS d
                FROM bfs JOIN adj ON adj.node = bfs.node
                WHERE bfs.d < 3
            )
            SELECT node, min(d) AS dist FROM bfs GROUP BY node
        """,
        "pair_support": """
            WITH pp AS (
                SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
            )
            SELECT a.p AS u, b.p AS v, count(*) AS pair_count
            FROM pp a JOIN pp b ON a.o = b.o AND a.p < b.p
            GROUP BY u, v
            HAVING count(*) >= 2
        """,
        "triangle_count": """
            WITH pp AS (
                SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
            ), e AS (
                SELECT DISTINCT least(a.p, b.p) AS u, greatest(a.p, b.p) AS v
                FROM pp a JOIN pp b ON a.o = b.o AND a.p < b.p
            )
            SELECT count(*) AS triangles
            FROM e e1
            JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
            JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v
        """,
        "train_split": """
            SELECT doc_id,
                   CASE WHEN (doc_id * 2654435761) % 4294967296 < 3435973836
                        THEN 'train' ELSE 'val' END AS split
            FROM documents
        """,
        "stratified_sample": """
            SELECT doc_id, lang FROM documents
            WHERE (doc_id * 2654435761) % 4294967296 <
                  CASE lang WHEN 'en' THEN 2147483648
                            WHEN 'de' THEN 1073741824
                            ELSE 429496729 END
        """,
        "token_budget": """
            SELECT doc_id, lang, n_chars,
                   CAST(running_chars AS BIGINT) AS running_chars
            FROM (
                SELECT doc_id, lang, n_chars,
                       sum(n_chars) OVER (
                           PARTITION BY lang
                           ORDER BY n_chars DESC, doc_id
                           ROWS UNBOUNDED PRECEDING) AS running_chars
                FROM documents)
            WHERE running_chars <= 10000
        """,
        "redact_text": r"""
            SELECT doc_id,
                   regexp_replace(
                       regexp_replace(text, '\bcustomer\b', '[REDACTED]', 'g'),
                       '\b(user|order)\b', '[ENTITY]', 'g') AS text,
                   CAST(len(regexp_extract_all(text, '\bcustomer\b'))
                        + len(regexp_extract_all(
                              regexp_replace(text, '\bcustomer\b',
                                             '[REDACTED]', 'g'),
                              '\b(user|order)\b')) AS BIGINT) AS n_redacted
            FROM documents
        """,
        "window_distinct": f"""
            SELECT event_type,
                   (epoch_ms(ts) // {DAY}) * {DAY} AS day_ms,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
            FROM events
            GROUP BY 1, 2
        """,
        "set_except": f"""
            SELECT user_id, (epoch_ms(ts) // {DAY}) * {DAY} AS day_ms
            FROM events WHERE event_type = 'click'
            EXCEPT
            SELECT user_id, (epoch_ms(ts) // {DAY}) * {DAY}
            FROM events WHERE event_type = 'purchase'
        """,
        "set_intersect": f"""
            SELECT user_id, (epoch_ms(ts) // {DAY}) * {DAY} AS day_ms
            FROM events WHERE event_type = 'click'
            INTERSECT
            SELECT user_id, (epoch_ms(ts) // {DAY}) * {DAY}
            FROM events WHERE event_type = 'purchase'
        """,
        "set_union": f"""
            SELECT user_id, (epoch_ms(ts) // {DAY}) * {DAY} AS day_ms
            FROM events WHERE event_type = 'click'
            UNION
            SELECT user_id, (epoch_ms(ts) // {DAY}) * {DAY}
            FROM events WHERE event_type = 'purchase'
        """,
        "bag_except": f"""
            SELECT user_id, (epoch_ms(ts) // {DAY}) * {DAY} AS day_ms
            FROM events WHERE event_type = 'click'
            EXCEPT ALL
            SELECT user_id, (epoch_ms(ts) // {DAY}) * {DAY}
            FROM events WHERE event_type = 'purchase'
        """,
        "bag_intersect": f"""
            SELECT user_id, (epoch_ms(ts) // {DAY}) * {DAY} AS day_ms
            FROM events WHERE event_type = 'click'
            INTERSECT ALL
            SELECT user_id, (epoch_ms(ts) // {DAY}) * {DAY}
            FROM events WHERE event_type = 'purchase'
        """,
        "dedup_cut": """
            -- NOTE: substr/len here are CHARACTER-based while the kernel
            -- counts BYTES; they agree because the documents fixture is
            -- ASCII.  A non-ASCII corpus needs octet_length arithmetic.
            WITH wins AS (
                SELECT doc_id, CAST(i AS BIGINT) - 1 AS pos,
                       substr(text, CAST(i AS BIGINT), 30) AS w
                FROM documents,
                     unnest(generate_series(1, len(text) - 30 + 1, 1)) AS g(i)
                WHERE len(text) >= 30
            ),
            marked AS (
                SELECT doc_id, pos FROM (
                    SELECT doc_id, pos,
                           count(*) OVER (PARTITION BY w) AS cnt,
                           row_number() OVER (
                               PARTITION BY w ORDER BY doc_id, pos) AS rn
                    FROM wins)
                WHERE cnt >= 2 AND rn > 1
            ),
            isl AS (
                SELECT doc_id, pos,
                       CASE WHEN pos - lag(pos) OVER (
                                PARTITION BY doc_id ORDER BY pos) <= 30
                            THEN 0 ELSE 1 END AS brk
                FROM marked
            ),
            grp AS (
                SELECT doc_id, pos,
                       sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                                      ROWS UNBOUNDED PRECEDING) AS gid
                FROM isl
            ),
            spans AS (
                SELECT doc_id, max(pos) + 30 - min(pos) AS ln
                FROM grp GROUP BY doc_id, gid
            )
            SELECT doc_id, CAST(sum(ln) AS BIGINT) AS n_cut_bytes
            FROM spans GROUP BY doc_id
        """,
        "dup_spans": """
            -- NOTE: character-based substr vs the kernel's byte windows —
            -- equal only on the ASCII fixture corpus (see dedup_cut note).
            WITH wins AS (
                SELECT doc_id, substr(text, CAST(i AS BIGINT), 30) AS w
                FROM documents,
                     unnest(generate_series(1, len(text) - 30 + 1, 1)) AS g(i)
                WHERE len(text) >= 30
            ),
            dup AS (SELECT w FROM wins GROUP BY w HAVING count(*) >= 2)
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_windows
            FROM wins JOIN dup USING (w)
            GROUP BY doc_id
        """,
        "top_bigrams": """
            WITH toks AS (
                SELECT string_split(coalesce(text, ''), ' ') AS ws
                FROM documents
            ),
            pairs AS (
                SELECT ws[CAST(i AS BIGINT)] || ' ' ||
                       ws[CAST(i AS BIGINT) + 1] AS ngram
                FROM toks, unnest(generate_series(1, len(ws) - 1)) AS g(i)
            )
            SELECT ngram, CAST(count(*) AS BIGINT) AS n
            FROM pairs GROUP BY 1
            ORDER BY n DESC, ngram
            LIMIT 20
        """,
        "source_cap": """
            SELECT doc_id, source, len(coalesce(text, '')) AS n_chars
            FROM documents
            QUALIFY row_number() OVER (
                PARTITION BY source
                ORDER BY len(coalesce(text, '')) DESC, doc_id) <= 10
        """,
        "latest_by_key": """
            SELECT user_id,
                   event_id AS last_event_id,
                   event_type AS last_type,
                   round(value, 2) AS last_value,
                   epoch_ms(ts) AS last_ms
            FROM events
            QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
        """,
        "consumer_lag": """
            SELECT user_id,
                   count(*) AS n_events,
                   max(epoch_ms(ts)) AS user_max_ms,
                   (SELECT max(epoch_ms(ts)) FROM events) - max(epoch_ms(ts)) AS lag_ms
            FROM events GROUP BY 1
        """,
        "topic_tail": """
            SELECT event_id, user_id, event_type,
                   epoch_ms(ts) AS ms, round(value, 2) AS value
            FROM events ORDER BY ts DESC, event_id DESC LIMIT 10
        """,
        "json_key_extract": """
            SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS k, count(*) AS n
            FROM events GROUP BY 1
        """,
        "events_per_day": f"""
            SELECT (epoch_ms(ts) // {DAY}) * {DAY} AS day_ms,
                   count(*) AS n_events,
                   round(sum(value), 2) AS sum_value
            FROM events GROUP BY 1
        """,
        "salted_agg": """
            SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value
            FROM events GROUP BY 1
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   count(*) AS n_rows,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                         / 100.0, 2) AS sum_base_price,
                   round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                             * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                         / 10000.0, 2) AS sum_revenue
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY 1, 2
        """,
        "rollup_sales": """
            SELECT l_returnflag, l_linestatus,
                   CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT)
                       AS grouping_id,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   sum(l_quantity) AS sum_qty,
                   round(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                         / 100.0, 2) AS sum_base_price
            FROM lineitem
            GROUP BY ROLLUP(l_returnflag, l_linestatus)
        """,
        "cube_sales": """
            SELECT l_returnflag, l_linestatus,
                   CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT)
                       AS grouping_id,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   sum(l_quantity) AS sum_qty
            FROM lineitem
            GROUP BY CUBE(l_returnflag, l_linestatus)
        """,
        "broadcast_enrich": """
            SELECT c.c_nationkey AS c_nationkey,
                   count(*) AS n_orders,
                   round(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
                         / 100.0, 2) AS sum_price
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY 1
        """,
        "hash_join": """
            SELECT c.c_nationkey AS c_nationkey,
                   count(*) AS n_orders,
                   round(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
                         / 100.0, 2) AS sum_price
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY 1
        """,
        "left_join": """
            SELECT c.c_custkey AS o_custkey, c.c_nationkey AS c_nationkey,
                   o.n_orders AS n_orders
            FROM customer c
            LEFT JOIN (SELECT o_custkey,
                              CAST(count(*) AS BIGINT) AS n_orders
                       FROM orders WHERE o_totalprice > 150000
                       GROUP BY 1) o
              ON c.c_custkey = o.o_custkey
        """,
        "value_ranks": """
            SELECT event_id, user_id, value,
                   CAST(dense_rank() OVER w AS BIGINT) AS dr,
                   CAST(rank() OVER w AS BIGINT) AS rk,
                   percent_rank() OVER w AS pr
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY value)
        """,
        "global_rank": """
            SELECT event_id, value,
                   CAST(row_number() OVER (ORDER BY value, event_id)
                        AS BIGINT) AS rnk
            FROM events
        """,
        "replication_diff": """
            WITH l AS (
                SELECT o_orderkey, o_totalprice, o_orderstatus
                FROM orders WHERE o_orderkey % 97 <> 0
            ), r AS (
                SELECT o_orderkey,
                       CASE WHEN o_orderkey % 50 = 0
                            THEN o_totalprice + 1.0
                            ELSE o_totalprice END AS o_totalprice,
                       o_orderstatus
                FROM orders WHERE o_orderkey % 89 <> 0
            )
            SELECT COALESCE(l.o_orderkey, r.o_orderkey) AS o_orderkey,
                   CASE WHEN l.o_orderkey IS NULL THEN 'added'
                        WHEN r.o_orderkey IS NULL THEN 'removed'
                        ELSE 'changed' END AS status
            FROM l FULL JOIN r ON l.o_orderkey = r.o_orderkey
            WHERE l.o_orderkey IS NULL OR r.o_orderkey IS NULL
               OR l.o_totalprice IS DISTINCT FROM r.o_totalprice
               OR l.o_orderstatus IS DISTINCT FROM r.o_orderstatus
        """,
        "distinct_users": """
            SELECT event_type, count(DISTINCT user_id) AS n_distinct_users
            FROM events GROUP BY 1
        """,
        "heavy_hitters": """
            SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
            FROM events GROUP BY 1 HAVING count(*) >= 80
        """,
        "exact_dedup": """
            SELECT min(doc_id) AS doc_id, count(*) AS n_copies
            FROM documents GROUP BY text
        """,
        "cheapest_supplier": """
            WITH r AS (
                SELECT l_partkey,
                       CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
                       l_suppkey
                FROM lineitem
            ), w AS (
                SELECT l_partkey, cents, l_suppkey,
                       row_number() OVER (
                           PARTITION BY l_partkey
                           ORDER BY cents, l_suppkey) AS rn
                FROM r
            )
            SELECT w.l_partkey, round(w.cents / 100.0, 2) AS min_price,
                   w.l_suppkey AS supp_key, s.s_name AS supp_name,
                   round(s.s_acctbal, 2) AS supp_acctbal
            FROM w JOIN supplier s ON s.s_suppkey = w.l_suppkey
            WHERE w.rn = 1
        """,
        "supplier_count": """
            SELECT p_brand, p_type, p_size,
                   CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
            FROM lineitem JOIN part ON p_partkey = l_partkey
            GROUP BY 1, 2, 3
        """,
        "avro_evolution": """
            SELECT c_custkey, c_name, 'std' AS tier FROM customer
        """,
        "nation_trade": """
            SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
                   CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
                   round(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                             * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
                         / 10000.0, 2) AS revenue
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation sn ON s.s_nationkey = sn.n_nationkey
            JOIN nation cn ON c.c_nationkey = cn.n_nationkey
            WHERE ((sn.n_name = 'NATION_13' AND cn.n_name = 'NATION_19')
                OR (sn.n_name = 'NATION_19' AND cn.n_name = 'NATION_13'))
              AND l.l_shipdate >= DATE '1996-01-01'
              AND l.l_shipdate < DATE '1999-01-01'
            GROUP BY 1, 2, 3
        """,
        "product_revenue": """
            SELECT n.n_name, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
                   round(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                             * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
                         / 10000.0, 2) AS revenue
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN part p ON l.l_partkey = p.p_partkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            WHERE p.p_type = 'ECONOMY'
            GROUP BY 1, 2
        """,
        "top_supplier": """
            WITH rev AS (
                SELECT l_suppkey AS s_suppkey,
                       sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                           * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS r
                FROM lineitem
                WHERE l_shipdate >= DATE '1997-01-01'
                  AND l_shipdate < DATE '1997-04-01'
                GROUP BY 1
            )
            SELECT s.s_suppkey, s.s_name,
                   round(r / 10000.0, 2) AS total_revenue
            FROM rev JOIN supplier s USING (s_suppkey)
            WHERE r = (SELECT max(r) FROM rev)
        """,
        "small_qty_revenue": """
            WITH pq AS (
                SELECT l_partkey, CAST(count(*) AS BIGINT) AS n,
                       sum(CAST(round(l_quantity) AS BIGINT)) AS s
                FROM lineitem JOIN part
                  ON p_partkey = l_partkey AND p_brand = 'Brand#3'
                GROUP BY 1
            )
            SELECT round(coalesce(
                       sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)),
                       0) / 700.0, 2) AS avg_yearly
            FROM lineitem l JOIN pq ON l.l_partkey = pq.l_partkey
            WHERE CAST(round(l.l_quantity) AS BIGINT) * 5 * pq.n < pq.s
        """,
        "disjunctive_revenue": """
            SELECT round(coalesce(
                       sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                           * (100 - CAST(round(l.l_discount * 100) AS BIGINT))),
                       0) / 10000.0, 2) AS revenue
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 5
                   AND l.l_quantity BETWEEN 1 AND 11)
               OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10
                   AND l.l_quantity BETWEEN 10 AND 20)
               OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
                   AND l.l_quantity BETWEEN 20 AND 30)
        """,
        "waiting_suppliers": """
            WITH f AS (
                SELECT l.l_orderkey AS okey, l.l_suppkey AS supp,
                       max(CASE WHEN l.l_shipdate >
                                     o.o_orderdate + INTERVAL 60 DAY
                                THEN 1 ELSE 0 END) AS late
                FROM lineitem l JOIN orders o
                  ON l.l_orderkey = o.o_orderkey
                WHERE o.o_orderstatus = 'F'
                GROUP BY 1, 2
            ), g AS (
                SELECT okey, count(*) AS n_supp, sum(late) AS n_late
                FROM f GROUP BY 1
            )
            SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
            FROM f JOIN g USING (okey)
            JOIN supplier s ON f.supp = s.s_suppkey
            WHERE f.late = 1 AND g.n_supp > 1 AND g.n_late = 1
            GROUP BY 1
        """,
        "discounted_revenue": """
            SELECT round(coalesce(
                       sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                           * CAST(round(l_discount * 100) AS BIGINT)),
                       0) / 10000.0, 2) AS revenue
            FROM lineitem
            WHERE l_shipdate >= DATE '1997-01-01'
              AND l_shipdate < DATE '1998-01-01'
              AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
              AND l_quantity < 24
        """,
        "market_share": """
            WITH v AS (
                SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
                       CAST(round(l.l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
                           AS rev_e4,
                       CASE WHEN sn.n_name = 'NATION_7' THEN 1 ELSE 0 END
                           AS is_target
                FROM lineitem l
                JOIN orders o ON l.l_orderkey = o.o_orderkey
                JOIN customer c ON o.o_custkey = c.c_custkey
                JOIN nation cn ON c.c_nationkey = cn.n_nationkey
                JOIN region r ON cn.n_regionkey = r.r_regionkey
                JOIN part p ON l.l_partkey = p.p_partkey
                JOIN supplier s ON l.l_suppkey = s.s_suppkey
                JOIN nation sn ON s.s_nationkey = sn.n_nationkey
                WHERE r.r_name = 'ASIA' AND p.p_type = 'STANDARD'
                  AND o.o_orderdate >= DATE '1996-01-01'
                  AND o.o_orderdate < DATE '1998-01-01'
            )
            SELECT o_year,
                   round(CAST(sum(rev_e4 * is_target) AS DOUBLE)
                         / CAST(sum(rev_e4) AS DOUBLE), 4) AS mkt_share
            FROM v GROUP BY 1
        """,
        "important_parts": """
            WITH v AS (
                SELECT l_partkey AS p_partkey,
                       sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                           * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                           AS rev_e4
                FROM lineitem GROUP BY 1
            )
            SELECT p_partkey, round(rev_e4 / 10000.0, 2) AS value
            FROM v
            WHERE rev_e4 * (SELECT count(*) FROM v) * 2
                  > 3 * (SELECT sum(rev_e4) FROM v)
        """,
        "ship_priority": """
            SELECT CASE WHEN l.l_shipdate > o.o_orderdate
                             + INTERVAL 30 DAY
                        THEN 'SLOW' ELSE 'FAST' END AS ship_bucket,
                   CAST(sum(CASE WHEN o.o_orderpriority IN
                                      ('1-URGENT', '2-HIGH')
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS high_line_count,
                   CAST(sum(CASE WHEN o.o_orderpriority NOT IN
                                      ('1-URGENT', '2-HIGH')
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS low_line_count
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE l.l_shipdate >= DATE '1997-01-01'
              AND l.l_shipdate < DATE '1998-01-01'
            GROUP BY 1
        """,
        "promo_suppliers": """
            WITH v AS (
                SELECT l.l_suppkey AS s_suppkey,
                       CAST(sum(CAST(round(l.l_quantity) AS BIGINT))
                            AS BIGINT) AS total_qty
                FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
                WHERE p.p_name LIKE 'cold%'
                  AND l.l_shipdate >= DATE '1997-01-01'
                  AND l.l_shipdate < DATE '1998-01-01'
                GROUP BY 1
            )
            SELECT s.s_name, round(s.s_acctbal, 2) AS s_acctbal,
                   v.total_qty
            FROM v JOIN supplier s USING (s_suppkey)
            WHERE v.total_qty > 50
        """,
        "components": """
            WITH RECURSIVE pp AS (
                SELECT DISTINCT l.l_orderkey AS o, l.l_partkey AS p
                FROM lineitem l JOIN part pt ON pt.p_partkey = l.l_partkey
                WHERE pt.p_brand = 'Brand#1'
            ), e0 AS (
                SELECT a.p AS u, b.p AS v
                FROM pp a JOIN pp b ON a.o = b.o AND a.p < b.p
                GROUP BY 1, 2
                HAVING count(*) >= 2
            ), e AS (
                SELECT u, v FROM e0 UNION SELECT v AS u, u AS v FROM e0
            ), nodes AS (
                SELECT DISTINCT u AS node FROM e
            ), walk(node, lbl) AS (
                SELECT node, node FROM nodes
                UNION
                SELECT e.v, walk.lbl FROM walk JOIN e ON e.u = walk.node
            )
            SELECT node AS p_partkey, CAST(min(lbl) AS BIGINT) AS component
            FROM walk GROUP BY 1
        """,
        "pagerank_ranks": _pagerank_sql(),
        "sentence_stats": r"""
            WITH s AS (
                SELECT doc_id,
                       list_filter(
                           list_transform(
                               string_split_regex(coalesce(text, ''),
                                                  '[.!?]+'),
                               x -> trim(x)),
                           x -> x <> '') AS sents
                FROM documents
            )
            SELECT doc_id,
                   CAST(len(sents) AS BIGINT) AS n_sentences,
                   round(list_aggregate(
                       list_transform(sents, x -> len(x)), 'avg'), 4)
                       AS avg_chars,
                   CAST(list_aggregate(
                       list_transform(sents, x -> len(x)), 'max')
                       AS BIGINT) AS max_chars
            FROM s
        """,
        "value_matrix": """
            SELECT l_returnflag,
                   round(corr(l_quantity, l_extendedprice), 4)
                       AS corr_qty_price,
                   round(corr(l_quantity, l_discount), 4) AS corr_qty_disc,
                   round(corr(l_extendedprice, l_discount), 4)
                       AS corr_price_disc
            FROM lineitem GROUP BY l_returnflag
        """,
        "benford_digits": """
            WITH d AS (
                SELECT substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                                   AS VARCHAR), 1, 1) AS digit
                FROM orders
            ), tot AS (SELECT CAST(count(*) AS DOUBLE) AS t FROM orders)
            SELECT digit, CAST(count(*) AS BIGINT) AS n,
                   round(count(*) * 100.0 / tot.t, 4) AS share_pct
            FROM d CROSS JOIN tot
            GROUP BY digit, tot.t
        """,
        "hour_heatmap": """
            SELECT dayofweek(ts) AS dow,
                   CAST((epoch_ms(ts) // 3600000) % 24 AS BIGINT) AS hour,
                   CAST(count(*) AS BIGINT) AS n,
                   round(sum(value), 2) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "export_shards": """
            WITH s AS (
                SELECT doc_id,
                       (doc_id * 2654435761) % 4294967296 AS h,
                       CAST((doc_id * 2654435761) % 4294967296 % 8
                            AS BIGINT) AS shard
                FROM documents
            )
            SELECT doc_id, shard,
                   CAST(row_number() OVER (
                       PARTITION BY shard ORDER BY h, doc_id
                   ) AS BIGINT) AS pos
            FROM s
        """,
        "idle_balances": """
            WITH g AS (
                SELECT sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS s,
                       CAST(count(*) AS BIGINT) AS n
                FROM customer WHERE round(c_acctbal * 100) > 0
            )
            SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_cust,
                   round(sum(CAST(round(c_acctbal * 100) AS BIGINT))
                         / 100.0, 2) AS total_bal
            FROM customer, g
            WHERE CAST(round(c_acctbal * 100) AS BIGINT) * g.n > g.s
              AND NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey
                                AND o_orderpriority = '1-URGENT')
            GROUP BY 1
        """,
        "customer_distribution": """
            SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
            FROM (
                SELECT c.c_custkey,
                       CAST(count(o.o_custkey) AS BIGINT) AS c_count
                FROM customer c LEFT JOIN orders o
                  ON c.c_custkey = o.o_custkey
                GROUP BY 1
            ) GROUP BY 1
        """,
        "upsert_compaction": """
            SELECT user_id,
                   event_type AS last_type,
                   epoch_ms(ts) AS last_ms
            FROM events
            QUALIFY row_number() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
        """,
        "token_stats": r"""
            SELECT lang,
                   count(*) AS n_docs,
                   CAST(sum(CASE WHEN trim(text) = '' THEN 0
                            ELSE len(string_split_regex(trim(text), '\s+'))
                            END) AS BIGINT) AS n_tokens,
                   CAST(sum(len(text)) AS BIGINT) AS n_chars_text
            FROM documents GROUP BY 1
        """,
        "token_explode": r"""
            SELECT doc_id,
                   unnest(string_split_regex(trim(text), '\s+')) AS token
            FROM documents
        """,
        "chunk_docs": r"""
            WITH toks AS (
                SELECT doc_id,
                       string_split_regex(trim(text), '\s+') AS t
                FROM documents
            ), c AS (
                SELECT doc_id, t,
                       greatest(1, CAST(ceil((len(t) - 24)::DOUBLE / 16)
                                        AS BIGINT) + 1) AS nc
                FROM toks
            ), g AS (
                SELECT doc_id, t,
                       unnest(generate_series(1, nc)) AS i
                FROM c
            )
            SELECT doc_id,
                   i - 1 AS chunk_idx,
                   array_to_string(t[(i - 1) * 16 + 1 : (i - 1) * 16 + 24], ' ')
                       AS chunk
            FROM g
        """,
        "ipc_roundtrip": """
            -- identity + norm: the Ray side round-trips the nested
            -- list<float> column through Arrow IPC files first
            SELECT vec_id, label,
                   round(sqrt(list_sum(list_transform(embedding,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4)
                       AS l2
            FROM embeddings
        """,
        "orc_roundtrip": """
            -- identity: the Ray side round-trips through ORC files
            SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                   epoch_ms(o_orderdate) AS odate_ms
            FROM orders
        """,
        "zorder_scan": """
            -- the Ray side answers this through a z-order clustered
            -- layout with footer-stats file pruning
            SELECT event_id, user_id, round(value, 4) AS value
            FROM events
            WHERE user_id BETWEEN 2 AND 8
              AND value BETWEEN 10.0 AND 60.0
        """,
        "shipping_priority": """
            SELECT l_orderkey,
                   round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                             * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                         / 10000.0, 2) AS revenue,
                   epoch_ms(o_orderdate) AS o_orderdate_ms,
                   o_orderpriority
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1998-06-01'
              AND l_shipdate > TIMESTAMP '1998-06-01'
            GROUP BY l_orderkey, o_orderdate, o_orderpriority
            ORDER BY sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                         * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                         DESC,
                     o_orderdate, l_orderkey
            LIMIT 10
        """,
        "winsorize": """
            WITH t AS (
                SELECT event_type,
                       quantile_disc(value, 0.05) AS lo,
                       quantile_disc(value, 0.95) AS hi
                FROM events GROUP BY 1
            )
            SELECT e.event_id, e.event_type,
                   round(least(greatest(e.value, t.lo), t.hi), 2)
                       AS winsorized
            FROM events e JOIN t ON e.event_type = t.event_type
        """,
        "normalize_text": r"""
            SELECT doc_id,
                   trim(regexp_replace(
                       lower(strip_accents(nfc_normalize(coalesce(text, '')))),
                       '\s+', ' ', 'g')) AS text,
                   CAST(len(trim(regexp_replace(
                       lower(strip_accents(nfc_normalize(coalesce(text, '')))),
                       '\s+', ' ', 'g'))) AS BIGINT) AS n_chars
            FROM documents
        """,
        "token_entropy": r"""
            WITH toks AS (
                SELECT doc_id,
                       unnest(string_split_regex(trim(text), '\s+')) AS tok
                FROM documents
            ), c AS (
                SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS cnt
                FROM toks GROUP BY 1, 2
            )
            SELECT doc_id,
                   CAST(sum(cnt) AS BIGINT) AS n_tokens,
                   round(log2(sum(cnt)) - sum(cnt * log2(cnt)) / sum(cnt), 4)
                       AS token_entropy
            FROM c GROUP BY doc_id
        """,
        "repetition_stats": r"""
            WITH toks AS (
                SELECT doc_id,
                       unnest(string_split_regex(trim(text), '\s+')) AS tok
                FROM documents
            ), c AS (
                SELECT doc_id, tok, count(*) AS cnt FROM toks GROUP BY 1, 2
            )
            SELECT doc_id,
                   CAST(sum(cnt) AS BIGINT) AS n_tokens,
                   CAST(count(*) AS BIGINT) AS n_distinct,
                   round(1 - count(*)::DOUBLE / sum(cnt), 4) AS dup_token_frac,
                   round(max(cnt)::DOUBLE / sum(cnt), 4) AS top_token_frac
            FROM c GROUP BY doc_id
        """,
        "event_paths": """
            SELECT user_id,
                   string_agg(event_type, ',' ORDER BY ts, event_id) AS path,
                   CAST(count(*) AS BIGINT) AS n_items
            FROM events GROUP BY user_id
        """,
        "ann_range": """
            SELECT q.vec_id AS query_id,
                   e.vec_id AS vec_id,
                   round(list_cosine_similarity(
                       q.embedding::DOUBLE[], e.embedding::DOUBLE[]), 2) AS cosine
            FROM embeddings q, embeddings e
            WHERE q.vec_id < 8
              AND list_cosine_similarity(
                      q.embedding::DOUBLE[], e.embedding::DOUBLE[]) >= 0.2
        """,
        "vector_norms": """
            SELECT label,
                   count(*) AS n,
                   round(sum(sqrt(list_sum(list_transform(embedding,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4) AS sum_l2
            FROM embeddings GROUP BY 1
        """,
        "embedding_neardup": """
            SELECT a.vec_id AS id_a,
                   b.vec_id AS id_b,
                   round(list_cosine_similarity(
                       a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 2) AS cosine
            FROM embeddings a, embeddings b
            WHERE a.vec_id < b.vec_id
              AND list_cosine_similarity(
                      a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.42
        """,
        "decontaminate": r"""
            WITH d AS (
                SELECT doc_id,
                       string_split(trim(regexp_replace(lower(text),
                                                        '\s+', ' ', 'g')),
                                    ' ') AS ws
                FROM documents),
            g AS (SELECT DISTINCT doc_id,
                         array_to_string(
                             ws[CAST(i AS BIGINT):CAST(i AS BIGINT) + 7],
                             ' ') AS gram
                  FROM d, unnest(generate_series(1, len(ws) - 7)) AS u(i)),
            probe AS (SELECT doc_id AS probe_id, gram FROM g WHERE doc_id < 4),
            hits AS (SELECT p.probe_id, g.doc_id, count(*) AS n_overlap
                     FROM probe p JOIN g ON p.gram = g.gram GROUP BY 1, 2)
            SELECT probe_id, doc_id, CAST(n_overlap AS BIGINT) AS n_overlap
            FROM hits WHERE n_overlap >= 3
        """,
        "similarity_join": r"""
            WITH sub AS (
                SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0
            ), corpus AS (
                SELECT doc_id, text FROM sub
                UNION ALL
                SELECT doc_id + 1000000, text FROM sub
                WHERE doc_id % 7 = 0
            ), d AS (
                SELECT doc_id,
                       trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
                FROM corpus
            ), sh AS (
                SELECT DISTINCT doc_id, substr(t, CAST(u.i AS INT), 5) AS s
                FROM d, unnest(generate_series(1, length(t) - 4)) AS u(i)
            ), cnt AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY 1
            ), inter AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS m
                FROM sh a JOIN sh b
                  ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            )
            SELECT id_a, id_b,
                   round(m * 1.0 / (ca.c + cb.c - m), 6) AS jaccard
            FROM inter
            JOIN cnt ca ON id_a = ca.doc_id
            JOIN cnt cb ON id_b = cb.doc_id
            WHERE round(m * 1.0 / (ca.c + cb.c - m), 6) >= 0.8
        """,
        "jaccard_search": r"""
            WITH d AS (SELECT doc_id,
                              trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
                       FROM documents),
            sh AS (SELECT DISTINCT doc_id, substr(t, CAST(u.i AS INT), 5) AS s
                   FROM d, unnest(generate_series(1, length(t) - 4)) AS u(i)),
            cnt AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY 1),
            probe AS (SELECT * FROM sh WHERE doc_id < 4),
            inter AS (SELECT p.doc_id AS probe_id, s.doc_id AS doc_id,
                             count(*) AS m
                      FROM probe p JOIN sh s ON p.s = s.s GROUP BY 1, 2)
            SELECT inter.probe_id, inter.doc_id,
                   round(m * 1.0 / (cp.c + cd.c - m), 6) AS jaccard
            FROM inter
            JOIN cnt cp ON inter.probe_id = cp.doc_id
            JOIN cnt cd ON inter.doc_id = cd.doc_id
            WHERE m * 1.0 / (cp.c + cd.c - m) >= 0.22
        """,
        "ann_topk": """
            WITH s AS (
                SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
                       list_cosine_similarity(
                           q.embedding::DOUBLE[], e.embedding::DOUBLE[]) AS cos
                FROM embeddings q, embeddings e
                WHERE q.vec_id < 8
            ), r AS (
                SELECT query_id, vec_id, cos,
                       row_number() OVER (
                           PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rnk
                FROM s
            )
            SELECT query_id, vec_id, round(cos, 2) AS cosine, rnk AS "rank"
            FROM r WHERE rnk <= 5
        """,
        "fingerprint": r"""
            SELECT source,
                   count(DISTINCT regexp_replace(lower(text), '\s+', ' ', 'g'))
                       AS n_distinct
            FROM documents GROUP BY 1
        """,
        "langid": r"""
            WITH m AS (
                SELECT lang,
                       lower(coalesce(text, '')) AS t
                FROM documents
            ), h AS (
                SELECT lang,
                       len(regexp_extract_all(t, '\b(?:a|and|for|in|is|it|of|that|the|to)\b')) AS h_en,
                       len(regexp_extract_all(t, '\b(?:das|den|der|die|ein|ist|mit|und|von|zu)\b')) AS h_de,
                       len(regexp_extract_all(t, '\b(?:de|el|en|es|la|no|que|se|un|y)\b')) AS h_es,
                       len(regexp_extract_all(t, '\b(?:de|du|en|est|et|la|le|que|un|une)\b')) AS h_fr
                FROM m
            ), p AS (
                SELECT lang,
                       CASE
                           WHEN h_en = 0 AND h_de = 0 AND h_es = 0 AND h_fr = 0 THEN 'und'
                           WHEN h_en >= h_de AND h_en >= h_es AND h_en >= h_fr THEN 'en'
                           WHEN h_de >= h_es AND h_de >= h_fr THEN 'de'
                           WHEN h_es >= h_fr THEN 'es'
                           ELSE 'fr'
                       END AS lang_pred
                FROM h
            )
            SELECT lang, lang_pred, count(*) AS n FROM p GROUP BY 1, 2
        """,
        "quality_scores": r"""
            WITH m AS (
                SELECT lang, coalesce(text, '') AS t FROM documents
            ), f AS (
                SELECT lang,
                       greatest(length(t), 1) AS n_chars,
                       len(regexp_extract_all(t, '[^\w\s]')) AS n_punct,
                       greatest(len(regexp_extract_all(t, '[a-zA-Z'']+')), 1) AS n_words,
                       len(list_distinct(regexp_extract_all(t, '[a-zA-Z'']+'))) AS n_uniq,
                       len(regexp_extract_all(lower(t), CASE lang
                           WHEN 'de' THEN '\b(?:das|den|der|die|ein|ist|mit|und|von|zu)\b'
                           WHEN 'es' THEN '\b(?:de|el|en|es|la|no|que|se|un|y)\b'
                           WHEN 'fr' THEN '\b(?:de|du|en|est|et|la|le|que|un|une)\b'
                           ELSE '\b(?:a|and|for|in|is|it|of|that|the|to)\b'
                       END)) AS n_stop
                FROM m
            ), r AS (
                SELECT lang,
                       CAST(n_stop AS DOUBLE) / n_words AS stopword_ratio,
                       1.0 - CAST(n_uniq AS DOUBLE) / n_words AS rep,
                       CAST(n_punct AS DOUBLE) / n_chars AS punct
                FROM f
            )
            SELECT lang,
                   count(*) AS n_docs,
                   round(avg(0.4 * (1.0 - rep)
                         + 0.3 * (1.0 - least(greatest(punct, 0.0), 1.0))
                         + 0.3 * least(greatest(stopword_ratio, 0.0), 0.6) / 0.6), 4)
                       AS avg_quality,
                   round(avg(stopword_ratio), 4) AS avg_stopword_ratio
            FROM r GROUP BY 1
        """,
        # no oracle (not SQL-expressible): replicate_stream, minhash_neardup,
        # simhash_neardup, ann_ivf (approximate), approx_distinct (sketch),
        # audio/image/video feature extraction
    }
