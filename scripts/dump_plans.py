"""Regenerate PLANS.md: formatted physical plans for the headline queries.

The point of the artifact: scale behavior is a property of the PLAN, not
of small-data timings — broadcast choices, exchange counts, pushed
filters, and codegen spans are all visible here exactly as they would be
on a 1000-executor cluster (modulo AQE runtime re-planning, which only
tightens these plans).

Run: python scripts/dump_plans.py  (rewrites /root/repo/PLANS.md)
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

# one representative per plan family
SHOWCASE = (
    ("q_window_join", "the flagship: two windowed aggregates full-outer joined"),
    ("q_scan_filter_pushdown", "predicate pushdown to the parquet scan"),
    ("q_join_broadcast", "broadcast hash join of a small dimension"),
    ("q_star_join", "fact + three broadcast dims, single scan"),
    ("q_avg_grouped", "partial (map-side) aggregation around one exchange"),
    ("q_topk_per_group", "ranking window + filter"),
    ("q_fingerprint_winnow", "window + aggregate sharing one exchange"),
    ("q_ohlc_bars", "two sort orders + aggregate on one exchange"),
    ("q_dedup_minhash_lsh", "LSH banding: aggregate signatures, grouped pairs"),
    ("q_cosine_topk", "broadcast query side, codegen'd vector fold"),
    ("q_resample_interpolate", "generated spine, checkpointed agg, 2 windows"),
    ("q_anomaly_zscore", "stats broadcast back onto the fact scan"),
    ("q_fuzzy_match", "blocked entity resolution: equi-join, no cartesian"),
    ("q_histogram_equiheight_approx", "sketch boundaries broadcast, map-only bucketing"),
    ("q_surrogate_key_dist", "contiguous ids without a global window"),
    ("q_decontaminate", "one shingle pass, hashed-key overlap join"),
    ("q_doc_pack", "distributed prefix sum: sketch buckets + broadcast offsets"),
    ("q_join_bloom", "runtime bloom filter: might_contain before the fact shuffle"),
    ("q_tpch_local_supplier_volume", "6-table snowflake: 4 broadcast dims, one fact shuffle"),
    ("q_tpch_large_orders", "HAVING aggregate collapses the fact before any join"),
    ("q_ri_orphans", "five broadcast anti joins, zero fact-sized shuffles"),
    ("q_mix_sample", "per-source window prefix-sum: parallelism = sources"),
    (
        "q_dedup_ngram_pruned",
        "dedup family reads the ONE persisted pair-overlap relation "
        "(InMemoryTableScan — pair generation not recomputed per query)",
    ),
    (
        "q_bigram_logprob",
        "head-salted LM-scoring join: hot transitions marked by broadcast, "
        "salted shuffle, marginals via window over the cached model",
    ),
    (
        "q_bm25_rank",
        "map-side tf, 1-row stats broadcast, TakeOrdered top-k — corpus "
        "never shuffles",
    ),
    (
        "q_tpch_volume_shipping",
        "TPC-H Q7: 2-row nation prune broadcast onto supplier+customer; "
        "one fact shuffle",
    ),
    (
        "q_exists_subquery",
        "correlated EXISTS decorrelated to LEFT SEMI, uncorrelated "
        "predicates pushed to the probe scan",
    ),
    (
        "q_knn_join_lsh",
        "blocked k-NN join: pandas-UDF matmul buckets, narrow id-only "
        "candidate join, vectors re-attached for exact re-rank",
    ),
    (
        "q_dup_span_stats",
        "in-scan gram Generate, multi-doc-gram aggregate, skew-aware "
        "flag join, per-doc rollup",
    ),
    (
        "q_pmi_collocations",
        "min-count prune before marginal joins; 1-row totals broadcast; "
        "TakeOrdered",
    ),
    (
        "q_curation_funnel",
        "composed curation pipeline in ONE fused plan: stage flags are "
        "columns, only the two windows + shingle semi-join shuffle",
    ),
    (
        "q_compaction_plan",
        "binaryFile listing inventory (content column pruned, size "
        "filter pushed) left-joined with the _metadata row aggregate; "
        "per-partition-dir cumulative window",
    ),
    (
        "q_dedup_representatives",
        "CC labels from the persisted pair relation + doc_id equi-join "
        "+ per-cluster rank — the decision relation stays |clustered "
        "docs|, never corpus-sized",
    ),
    (
        "q_cluster_keywords_ivf",
        "deterministic-quantizer cluster keywords: 16-row centroid "
        "broadcast, one corpus argmax pass (codegen'd dot folds), "
        "vocab-cardinality lift joins, bounded rank window",
    ),
    (
        "q_tpch_waiting_suppliers",
        "adapted Q21: EXISTS -> LEFT SEMI, NOT EXISTS -> LEFT ANTI, all "
        "keyed on l_orderkey (one exchange partitioning end-to-end); "
        "supplier x nation broadcast; TakeOrdered top-20",
    ),
    (
        "q_tpch_min_cost_supplier",
        "adapted Q2 (r10, completes all 22 TPC-H shapes): the correlated "
        "per-part MIN decorrelates onto the once-aggregated supply "
        "catalog; region suppliers broadcast; part attach broadcast; "
        "top-100 TakeOrdered",
    ),
)


def main() -> None:
    from bitcoinminingetl_spark.registry import load_all
    from bitcoinminingetl_spark.session import get_spark

    spark = get_spark(app_name="dump-plans", cpus=4, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()

    out = [
        "# PLANS — physical plans of the headline queries",
        "",
        f"Generated by `scripts/dump_plans.py` at sf_dir=`{SF_DIR}` "
        "(plans are scale-invariant; AQE may further tighten them at runtime).",
        "",
    ]
    for name, why in SHOWCASE:
        df = reg[name].fn(spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        out += [f"## {name}", "", f"*{why}*", "", "```", buf.getvalue().rstrip(), "```", ""]
    (REPO / "PLANS.md").write_text("\n".join(out))
    print(f"wrote {REPO / 'PLANS.md'} ({len(SHOWCASE)} plans)")
    spark.stop()


if __name__ == "__main__":
    main()
