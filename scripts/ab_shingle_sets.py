"""Interleaved same-session A/B for the r13 shared shingle_sets relation.

OLD = each _verify_candidates call aggregates the shingle index into
per-doc sets inline, and the plan references that aggregate twice (one
per pair side) — 2 aggregate subtrees per query, 10 across the family.
NEW = the five batch consumers read the persist-once shingle_sets build
(current tree; corpus variants semi-filter it by the exact-stage
survivors).

Protocol: one warm session (shingle_index/strings + shingle_sets
prebuilt), row-set equality proof per consumer first, then alternating
OLD/NEW timing reps (host noise is ±45% across minutes), min over reps.

Usage: python scripts/ab_shingle_sets.py [--reps 4] [--sf-dir .../sf0.1]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from bitcoinminingetl_spark.catalog import table  # noqa: E402
from bitcoinminingetl_spark.operators import dedup  # noqa: E402
from bitcoinminingetl_spark.operators import mllib_ops  # noqa: E402
from bitcoinminingetl_spark.registry import load_all  # noqa: E402
from bitcoinminingetl_spark.session import get_spark  # noqa: E402


def _old_minhash_lsh(spark, sf_dir):
    sh = dedup.shingle_index(spark, sf_dir)
    return dedup._verify_candidates(
        sh, dedup._candidate_pairs(dedup.minhash_bands(sh))
    )


def _old_minhash_md5(spark, sf_dir):
    cand = dedup._candidate_pairs(
        dedup.minhash_bands_md5(dedup.shingle_strings(spark, sf_dir))
    )
    return dedup._verify_candidates(dedup.shingle_index(spark, sf_dir), cand)


def _old_mllib(spark, sf_dir):
    from pyspark.ml.feature import HashingTF, MinHashLSH
    from pyspark.ml.functions import vector_to_array

    docs = table(spark, sf_dir, "documents")
    feat = HashingTF(
        inputCol="shingles",
        outputCol="features",
        numFeatures=mllib_ops._TF_FEATURES,
        binary=True,
    ).transform(mllib_ops._shingle_array(docs))
    model = MinHashLSH(
        inputCol="features",
        outputCol="hashes",
        numHashTables=mllib_ops._MLLIB_MINHASH_K,
        seed=mllib_ops._MLLIB_SEED,
    ).fit(feat)
    hv = [
        vector_to_array(F.element_at("hashes", i + 1))[0]
        for i in range(mllib_ops._MLLIB_MINHASH_K)
    ]
    bands_arr = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    *hv[b * mllib_ops._MLLIB_ROWS : (b + 1) * mllib_ops._MLLIB_ROWS]
                ).alias("sig"),
            )
            for b in range(mllib_ops._MLLIB_BANDS)
        ]
    )
    bands = (
        model.transform(feat)
        .select("doc_id", F.explode(bands_arr).alias("bs"))
        .select("doc_id", "bs.band", "bs.sig")
    )
    return dedup._verify_candidates(
        dedup.shingle_index(spark, sf_dir), dedup._candidate_pairs(bands)
    )


def _old_corpus(spark, sf_dir, md5: bool):
    docs = table(spark, sf_dir, "documents")
    exact_survivors = (
        docs.groupBy(F.md5("text").alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    sh = dedup.shingle_index(spark, sf_dir).join(
        exact_survivors.select("doc_id"), "doc_id", "semi"
    )
    if md5:
        shs = dedup.shingle_strings(spark, sf_dir).join(
            exact_survivors.select("doc_id"), "doc_id", "semi"
        )
        bands = dedup.minhash_bands_md5(shs)
    else:
        bands = dedup.minhash_bands(sh)
    near_pairs = dedup._verify_candidates(sh, dedup._candidate_pairs(bands))
    near_dups = near_pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    return exact_survivors.select("doc_id").join(
        near_dups, on="doc_id", how="left_anti"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    reg = load_all()
    spark = get_spark(app_name="ab-shingle-sets")
    spark.sparkContext.setLogLevel("ERROR")
    sf = args.sf_dir

    for build in (
        lambda: dedup.shingle_index(spark, sf),
        lambda: dedup.shingle_strings(spark, sf),
        lambda: dedup.shingle_sets(spark, sf),
    ):
        build().write.format("noop").mode("overwrite").save()

    arms = {
        "q_dedup_minhash_lsh": (
            lambda: _old_minhash_lsh(spark, sf),
            lambda: reg["q_dedup_minhash_lsh"].fn(spark, sf),
        ),
        "q_dedup_minhash_md5": (
            lambda: _old_minhash_md5(spark, sf),
            lambda: reg["q_dedup_minhash_md5"].fn(spark, sf),
        ),
        "q_dedup_minhash_mllib": (
            lambda: _old_mllib(spark, sf),
            lambda: reg["q_dedup_minhash_mllib"].fn(spark, sf),
        ),
        "q_corpus_dedup_lsh": (
            lambda: _old_corpus(spark, sf, md5=False),
            lambda: reg["q_corpus_dedup_lsh"].fn(spark, sf),
        ),
        "q_corpus_dedup_lsh_md5": (
            lambda: _old_corpus(spark, sf, md5=True),
            lambda: reg["q_corpus_dedup_lsh_md5"].fn(spark, sf),
        ),
    }

    for name, (old_fn, new_fn) in arms.items():
        old_rows = sorted(tuple(r) for r in old_fn().collect())
        new_rows = sorted(tuple(r) for r in new_fn().collect())
        assert old_rows == new_rows, (
            f"{name}: old {len(old_rows)} != new {len(new_rows)}"
        )
        print(f"equality {name}: {len(old_rows)} rows identical", flush=True)

    for old_fn, new_fn in arms.values():  # warmup
        for fn in (old_fn, new_fn):
            df = fn()
            if df is not None:
                df.write.format("noop").mode("overwrite").save()

    times: dict[str, list[float]] = {}
    for _ in range(args.reps):
        for name, (old_fn, new_fn) in arms.items():
            for suffix, fn in (("old", old_fn), ("new", new_fn)):
                df = fn()
                if df is None:
                    continue
                key = f"{name}:{suffix}"
                spark.sparkContext.setJobDescription(f"ab_sets:{key}")
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                times.setdefault(key, []).append(
                    round(time.perf_counter() - t0, 3)
                )
                spark.sparkContext.setJobDescription(None)
    out = {
        "min": {k: min(v) for k, v in times.items()},
        "per_rep": times,
        "reps": args.reps,
        "sf_dir": sf,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
