"""Interleaved same-session A/B for the r13 _simhash_pairs rewrite.

OLD = vote-CASE aggregate + chunk equi-self-join (duplicated aggregate
subtree, plans/r13/q_dedup_simhash_before.txt) + final distinct.
NEW = 2*ones>=n votes, one bucket groupBy + double-Generate pair
generation, first-matching-chunk dedup filter (current tree).

Protocol: one warm session, shared infra prebuilt, alternating
OLD/NEW reps (host noise here is ±45% across minutes, so paired
alternation is the only trustworthy comparison), min over reps.
Also proves row-set equality OLD==NEW for both variants at the
measured SF before timing.

Usage: python scripts/ab_simhash.py [--reps 4] [--sf-dir .../sf0.1]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from bitcoinminingetl_spark.operators import dedup  # noqa: E402
from bitcoinminingetl_spark.session import get_spark  # noqa: E402

_BITS = dedup._SIMHASH_BITS
_CHUNKS = dedup._SIMHASH_CHUNKS
_CBITS = dedup._CHUNK_BITS
_HMAX = dedup._HAMMING_MAX


def _old_simhash_pairs(tok: DataFrame) -> DataFrame:
    votes = tok.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(
                    F.shiftright("th", bit).bitwiseAND(F.lit(1)) == 1, 1
                ).otherwise(-1)
            ).alias(f"v{bit}")
            for bit in range(_BITS)
        ]
    )
    simhash = None
    for bit in range(_BITS):
        term = F.when(
            F.col(f"v{bit}") >= 0, F.lit(2**bit).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        simhash = term if simhash is None else simhash + term
    sigs = votes.select("doc_id", simhash.alias("simhash"))
    chunks = sigs.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk_id"),
                        F.shiftright("simhash", c * _CBITS)
                        .bitwiseAND(F.lit(2**_CBITS - 1))
                        .alias("chunk"),
                    )
                    for c in range(_CHUNKS)
                ]
            )
        ).alias("cs"),
    ).select("doc_id", "simhash", "cs.chunk_id", "cs.chunk")
    a = chunks.alias("a")
    b = chunks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk_id") == F.col("b.chunk_id"))
            & (F.col("a.chunk") == F.col("b.chunk")),
        )
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= _HMAX)
        .distinct()
    )


def _tok(spark, sf_dir, variant):
    t = dedup.simhash_tokens(spark, sf_dir)
    if variant == "xxhash64":
        return t.withColumn("th", F.xxhash64("token"))
    return t.withColumn(
        "th", F.conv(F.substring(F.md5("token"), 1, 8), 16, 10).cast("long")
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    spark = get_spark(app_name="ab-simhash")
    spark.sparkContext.setLogLevel("ERROR")

    # prebuild the shared token relation (both arms read it warm)
    dedup.simhash_tokens(spark, args.sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    # equality proof first: OLD and NEW emit the identical row set
    for variant in ("xxhash64", "md5"):
        tok = _tok(spark, args.sf_dir, variant)
        old_rows = sorted(
            (r.doc_a, r.doc_b, r.hamming)
            for r in _old_simhash_pairs(tok).collect()
        )
        new_rows = sorted(
            (r.doc_a, r.doc_b, r.hamming)
            for r in dedup._simhash_pairs(tok).collect()
        )
        assert old_rows == new_rows, (
            f"{variant}: old {len(old_rows)} rows != new {len(new_rows)}"
        )
        print(f"equality {variant}: {len(old_rows)} rows identical", flush=True)

    arms = {
        "old_xx": lambda: _old_simhash_pairs(_tok(spark, args.sf_dir, "xxhash64")),
        "new_xx": lambda: dedup._simhash_pairs(_tok(spark, args.sf_dir, "xxhash64")),
        "old_md5": lambda: _old_simhash_pairs(_tok(spark, args.sf_dir, "md5")),
        "new_md5": lambda: dedup._simhash_pairs(_tok(spark, args.sf_dir, "md5")),
    }
    # warmup (codegen/JIT)
    for fn in arms.values():
        fn().write.format("noop").mode("overwrite").save()

    times: dict[str, list[float]] = {k: [] for k in arms}
    for _ in range(args.reps):
        for name, fn in arms.items():  # alternate within each rep
            spark.sparkContext.setJobDescription(f"ab_simhash:{name}")
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            times[name].append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
    out = {
        "min": {k: min(v) for k, v in times.items()},
        "per_rep": times,
        "reps": args.reps,
        "sf_dir": args.sf_dir,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
