"""Benchmark the engine's headline queries at one scale factor.

Driver contract: run every headline query at ``$SPARK_GRAFT_SF_DIR``
(default /root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and print
ONE JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized with the noop sink (``df.write.format("noop")``)
so timing includes full execution on every partition but no driver-side
collect. One warm-up query amortizes JVM/codegen startup so per-query
numbers reflect steady-state throughput, which is what matters for the
100 TB posture.

Output is two-tier (round 8): stdout carries one COMPACT JSON line sized
to the driver's ~2000-char tail-capture window (total, driver-registered
query timings, extras aggregated), while the COMPLETE record — all
queries, ``store_build_sec``, per-phase ``phase_sec`` breakdowns,
errors — is written to ``BENCH_DETAIL.json`` at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from aws_payment_data_lake_spark import queries as registry  # noqa: E402
from aws_payment_data_lake_spark.session import get_spark  # noqa: E402

DEFAULT_SF_DIR = "/root/testdata/sf0.1"

# Headline set: one per operator family (scan/agg, join, window, set-op,
# subquery, medallion ETL, streaming-window, dedup, similarity, text,
# multimodal). Keep stable across rounds so BENCH_r{N}.json is comparable.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "join_left_outer_order_lines",
    "join_outer_recon",
    "join_semi_anti_customers",      # round 2: semi + anti merged
    "topk_orders_per_customer",
    "window_event_analytics",        # round 2: running-value + event gaps
    "rollup_orders_year_status",
    "set_ops_buyers",                # round 2: union + intersect + except
    "subquery_gallery",              # round 2: scalar + correlated
    "asof_join_purchase_view",
    "range_join_price_bands",
    "scalar_function_gallery",       # round 2: string/math + datetime
    "medallion_dedup_latest",
    "medallion_validate_filter",
    "tumbling_window_events",        # unregistered batch twin (EXTRA_FNS)
    "session_window_events",         # unregistered batch twin (EXTRA_FNS)
    "retention_cohorts",
    "event_funnel_conversion",
    "trade_flows_by_nation_year",
    "returned_revenue_by_customer",
    "brand_market_share",
    "order_count_histogram",         # unregistered Q13 shape (EXTRA_FNS)
    "slow_supplier_blame",           # unregistered Q21 shape (EXTRA_FNS)
    "fuzzy_name_join",               # unregistered similarity join (EXTRA_FNS)
    "dedup_exact_groups",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_shingle_jaccard",         # unregistered baseline (EXTRA_FNS)
    "dedup_span_removal",            # unregistered ExactSubstr removal (EXTRA_FNS)
    "dedup_span_incremental",        # unregistered delta-vs-index probe (EXTRA_FNS)
    "dedup_connected_components",
    "corpus_leakfree_split",         # r12: cluster-aware no-leak split (EXTRA_FNS)
    "text_profile",                  # round 2: lang-id + quality + tokens
    "text_repetition_profile",       # Gopher gates (registered since r5)
    "text_vocab_topk",
    "vocab_heavy_hitters",           # unregistered MG sketch twin (EXTRA_FNS)
    "text_train_test_split",
    "text_fingerprint",
    "text_pii_scrub",                # unregistered PII redaction (EXTRA_FNS)
    "text_decontamination",          # unregistered 8-gram gate (EXTRA_FNS)
    "text_decontamination_scrub",    # unregistered 8-13-gram span scrub (EXTRA_FNS)
    "lm_perplexity_quality",         # unregistered CCNet-style LM gate (EXTRA_FNS)
    "quality_model_filter",          # unregistered learned MLlib gate (EXTRA_FNS)
    "corpus_mixture_resample",       # unregistered epoch mixing (EXTRA_FNS)
    "knn_brute_force",
    "knn_ivf_probe",                 # unregistered approx path (EXTRA_FNS)
    "knn_rp_lsh",                    # unregistered sign-LSH ANN (EXTRA_FNS)
    "knn_pq",                        # unregistered PQ+rerank ANN (EXTRA_FNS)
    "knn_ivfpq",                     # unregistered IVF-PQ composition (EXTRA_FNS)
    "ann_index_ingest",              # frozen-artifact index roll (EXTRA_FNS)
    "ann_recall_report",             # r13: recall@10 per approx tier vs exact (EXTRA_FNS)
    "semantic_dedup_embeddings",     # unregistered SemDeDup (EXTRA_FNS)
    "cluster_balance_sample",        # unregistered cluster-cap stage (EXTRA_FNS)
    "rag_chunk_retrieval",           # unregistered chunk->embed->IVF (EXTRA_FNS)
    "embedding_neardup_pairs",
    "multimodal_decode_stub",
    "multimodal_frame_sample",
    "json_props_extract",
    "percentile_lineitem_price",
    "approx_distinct_quantiles",     # unregistered sketch path (EXTRA_FNS)
    "sql_daily_totals",
    "sql_status_funnel",             # unregistered SQL twin (EXTRA_FNS)
    "streaming_windows_live",        # round 2: all 3 live streams merged
    "jsonl_events_roundtrip",        # r7: + ORC + Python DataSource variants
    "pysource_payments",             # unregistered sf-scaled source (EXTRA_FNS)
    "pysource_stream_resume",        # checkpointed two-leg resume (EXTRA_FNS)
    "txn_table_lifecycle",           # r7: ACID format create/append/merge/compact (EXTRA_FNS)
    "txn_admin_surface",             # r10: clone/copy/properties/defaults/dry-run (EXTRA_FNS)
    "txn_catalog_surface",           # r11: persistent catalog/CTAS/replace/deep-clone/CDF/batch-source (EXTRA_FNS)
    "catalog_namespace_surface",     # r12: databases/views/crawl+convert/writer-partitionBy/rowgroup-prune (EXTRA_FNS)
    "txlog_sink_ingest",             # r10: native writeStream txlog sink (EXTRA_FNS)
    "queue_source_ingest",           # r7: Kafka-semantics queue consume path (EXTRA_FNS)
    "udtf_order_quarters",
    "corpus_curation_decisions",
    "corpus_source_report",          # unregistered per-source dashboard (EXTRA_FNS)
    "dq_check_payments",             # r13: declarative DQ rules + history + anomaly (EXTRA_FNS)
]


def _extra_fns():
    """Headline operators that deliberately sit OUTSIDE the <=50-query
    driver registry (pytest-verified instead) but keep a bench record."""
    from aws_payment_data_lake_spark.queries.decontam import (
        text_decontamination,
        text_decontamination_scrub,
    )
    from aws_payment_data_lake_spark.queries.dedup import (
        corpus_leakfree_split,
        dedup_shingle_jaccard,
        dedup_span_incremental,
        dedup_span_removal,
    )
    from aws_payment_data_lake_spark.queries.lm import lm_perplexity_quality
    from aws_payment_data_lake_spark.queries.rag import rag_chunk_retrieval
    from aws_payment_data_lake_spark.queries.report import corpus_source_report
    from aws_payment_data_lake_spark.queries.mixture import (
        corpus_mixture_resample,
    )
    from aws_payment_data_lake_spark.queries.similarity import (
        ann_index_ingest,
        ann_recall_report,
        cluster_balance_sample,
        knn_ivf_probe,
        knn_ivfpq,
        knn_pq,
        knn_rp_lsh,
        semantic_dedup_embeddings,
    )
    from aws_payment_data_lake_spark.queries.sql_surface import sql_status_funnel
    from aws_payment_data_lake_spark.queries.stats import (
        approx_distinct_quantiles,
    )
    from aws_payment_data_lake_spark.queries.text import (
        text_pii_scrub,
        vocab_heavy_hitters,
    )
    from aws_payment_data_lake_spark.queries.streaming_batch import (
        session_window_events,
        tumbling_window_events,
    )
    from aws_payment_data_lake_spark.queries.jsonl_source import (
        pysource_payments,
        pysource_stream_resume,
    )
    from aws_payment_data_lake_spark.queries.acid import (
        txlog_sink_ingest,
        txn_admin_surface,
        catalog_namespace_surface,
        txn_catalog_surface,
        txn_table_lifecycle,
    )
    from aws_payment_data_lake_spark.queries.queue import (
        queue_source_ingest,
    )
    from aws_payment_data_lake_spark.queries.dq import dq_check_payments
    from aws_payment_data_lake_spark.queries.quality import (
        quality_model_filter,
    )
    from aws_payment_data_lake_spark.queries.relational2 import (
        fuzzy_name_join,
        order_count_histogram,
        slow_supplier_blame,
    )
    return {
        "cluster_balance_sample": cluster_balance_sample,
        "fuzzy_name_join": fuzzy_name_join,
        "order_count_histogram": order_count_histogram,
        "slow_supplier_blame": slow_supplier_blame,
        "pysource_payments": pysource_payments,
        "pysource_stream_resume": pysource_stream_resume,
        "txn_admin_surface": txn_admin_surface,
        "txn_catalog_surface": txn_catalog_surface,
        "catalog_namespace_surface": catalog_namespace_surface,
        "txn_table_lifecycle": txn_table_lifecycle,
        "txlog_sink_ingest": txlog_sink_ingest,
        "queue_source_ingest": queue_source_ingest,
        "quality_model_filter": quality_model_filter,
        "dq_check_payments": dq_check_payments,
        "dedup_shingle_jaccard": dedup_shingle_jaccard,
        "corpus_leakfree_split": corpus_leakfree_split,
        "dedup_span_incremental": dedup_span_incremental,
        "dedup_span_removal": dedup_span_removal,
        "ann_index_ingest": ann_index_ingest,
        "ann_recall_report": ann_recall_report,
        "knn_ivf_probe": knn_ivf_probe,
        "knn_ivfpq": knn_ivfpq,
        "knn_pq": knn_pq,
        "knn_rp_lsh": knn_rp_lsh,
        "semantic_dedup_embeddings": semantic_dedup_embeddings,
        "rag_chunk_retrieval": rag_chunk_retrieval,
        "corpus_source_report": corpus_source_report,
        "text_decontamination": text_decontamination,
        "text_decontamination_scrub": text_decontamination_scrub,
        "lm_perplexity_quality": lm_perplexity_quality,
        "corpus_mixture_resample": corpus_mixture_resample,
        "sql_status_funnel": sql_status_funnel,
        "approx_distinct_quantiles": approx_distinct_quantiles,
        "session_window_events": session_window_events,
        "text_pii_scrub": text_pii_scrub,
        "vocab_heavy_hitters": vocab_heavy_hitters,
        "tumbling_window_events": tumbling_window_events,
    }


def sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def materialize(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    only = sys.argv[1].split(",") if len(sys.argv) > 1 else None
    spark = get_spark(app_name="bench")
    specs = registry.all_queries()
    fns = {n: s.fn for n, s in specs.items()} | _extra_fns()
    names = [n for n in (only or HEADLINE) if n in fns]

    # Warm up JVM, parquet footer cache, codegen — and the Python worker
    # pool (the first pandas-UDF/Arrow exchange otherwise bills several
    # seconds of interpreter spin-up to whichever query runs it first).
    for warm in ("q1_pricing_summary", "multimodal_frame_sample"):
        try:
            materialize(fns[warm](spark, sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"  warmup {warm}: ERR {type(e).__name__}: {e}",
                  file=sys.stderr)

    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    phases: dict[str, dict[str, float]] = {}
    stats: dict[str, dict[str, float]] = {}
    from aws_payment_data_lake_spark.telemetry import (
        drain_phases,
        drain_stats,
        drain_store_builds,
        load_stamp,
    )

    # Self-carried load evidence (VERDICT r11): loadavg at both ends
    # plus a same-code CANARY timed before and after the suite — a
    # canary delta >> 1x on identical code and data reads "box was
    # loaded", so the artifact explains its own noise.
    def canary() -> float:
        t0 = time.perf_counter()
        materialize(fns["q1_pricing_summary"](spark, sf_dir))
        return round(time.perf_counter() - t0, 3)

    load_start = load_stamp()
    canary_start = canary()
    # In-run drift series (VERDICT r13 #3): two endpoint canaries cannot
    # explain a mid-suite host-capacity swing (r12/r13 cross-round
    # comparisons were both confounded by one). Interleave the same q1
    # canary every ~10 slots and emit the series in BENCH_DETAIL's env
    # block so a reader can deseasonalize per-slot numbers. Additions
    # only: no pre-existing entry's timing, ordering or materialization
    # changes (the canary runs BETWEEN slots, after the previous slot's
    # clearCache).
    canary_series: list[dict] = []
    for slot_i, name in enumerate(names):
        if slot_i and slot_i % 10 == 0:
            canary_series.append(
                {"before_slot": name, "sec": canary()})
        # Per-query fault isolation: one throwing query must cost one row,
        # not the whole artifact (BENCH_r02 was nulled by a single
        # streaming AnalysisException reaching the top level).
        best = float("inf")
        try:
            for _ in range(runs):
                t0 = time.perf_counter()
                materialize(fns[name](spark, sf_dir))
                best = min(best, time.perf_counter() - t0)
                # Per-phase sub-timings (timed_phase): keep the drain
                # from this entry's fastest run so phase_sec sums track
                # the best-of-N per-query number, not N runs' worth.
                for fam, ph in drain_phases().items():
                    if (fam not in phases
                            or sum(ph.values()) < sum(
                                phases[fam].values())):
                        phases[fam] = ph
                # Quality numbers (ANN recall@k): deterministic per
                # run — latest wins.
                for fam, st in drain_stats().items():
                    stats.setdefault(fam, {}).update(st)
                # Operators may persist() intermediates; drop them so no
                # query's timing pays for (or benefits from) cached state.
                spark.catalog.clearCache()
        except Exception as e:  # noqa: BLE001
            errors[name] = f"{type(e).__name__}: {str(e)[:200]}"
            spark.catalog.clearCache()
            drain_phases()
            drain_stats()
            print(f"  {name}: ERR {errors[name]}", file=sys.stderr)
            continue
        timings[name] = round(best, 3)
        print(f"  {name}: {timings[name]:.2f}s", file=sys.stderr)

    canary_end = canary()
    load_end = load_stamp()
    env = {
        "load_start": load_start, "load_end": load_end,
        "canary_sec_start": canary_start,
        "canary_sec_end": canary_end,
    }
    # The series goes to BENCH_DETAIL only: the compact stdout line must
    # stay inside the driver's ~2000-char tail window.
    env_detail = dict(env)
    env_detail["canary_series"] = canary_series
    total = round(sum(timings.values()), 3)
    full = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_from_dir(sf_dir),
        "env": env_detail,
    }
    # Shared-store build costs land on whichever consumer ran FIRST
    # (BASELINE.md); emit them separately so per-query numbers stay
    # comparable across rounds regardless of suite ordering. Eager
    # seconds only — see aws_payment_data_lake_spark/telemetry.py.
    builds = drain_store_builds()
    if builds:
        full["store_build_sec"] = builds
    if phases:
        full["phase_sec"] = phases
    if stats:
        full["stats"] = stats
    if errors:
        full["errors"] = errors

    # The driver records only the last ~2000 chars of output, and the
    # full 70-entry record outgrew that window in round 7 (the artifact
    # came back tail-truncated with parsed=null). Two-tier emission:
    # the COMPLETE record goes to BENCH_DETAIL.json next to this script
    # (committed with the repo), and stdout gets ONE compact line that
    # always fits the window — suite total, the driver-registered
    # queries' timings, and an aggregate for the bench-only extras.
    detail_path = os.path.join(REPO, "BENCH_DETAIL.json")
    with open(detail_path, "w") as fh:
        json.dump(full, fh, indent=1)
    registered = set(specs)
    line = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": {n: t for n, t in timings.items() if n in registered},
        "extra_queries_total_sec": round(
            sum(t for n, t in timings.items() if n not in registered), 3),
        "n_queries": len(timings),
        "detail": "BENCH_DETAIL.json",
        "sf": full["sf"],
        "env": env,
    }
    if errors:
        line["n_errors"] = len(errors)
    print(json.dumps(line, separators=(",", ":")))
    return 0


if __name__ == "__main__":
    sys.exit(main())
