"""Per-query A/B measurement + plan capture for optimization rounds.

Times a named subset of registry queries in ONE warm session (same
methodology as bench.py: noop sink, page-cache warmup, shared-infra
prebuild so family members measure warm plan cost) and optionally dumps
each query's .explain("formatted") to plans/<tag>/<query>_<suffix>.txt.

Usage:
  python scripts/opt_measure.py --queries q_a,q_b --reps 3 \
      [--plans-dir plans/r13 --suffix before] [--sf-dir /root/testdata/sf0.1]

Prints one JSON line: {"queries": {name: min_sec}, "reps": N, "sf_dir": ...}
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from bitcoinminingetl_spark.catalog import table  # noqa: E402
from bitcoinminingetl_spark.registry import load_all  # noqa: E402
from bitcoinminingetl_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", required=True)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument(
        "--skip-infra",
        action="store_true",
        help="skip the shared-infra prebuild (for queries outside the families)",
    )
    args = ap.parse_args()
    names = [n for n in args.queries.split(",") if n]

    registry = load_all()
    unknown = [n for n in names if n not in registry]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    spark = get_spark(app_name="opt-measure")
    spark.sparkContext.setLogLevel("ERROR")

    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        try:
            table(spark, args.sf_dir, t).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:  # noqa: BLE001
            pass

    if not args.skip_infra:
        from bitcoinminingetl_spark.operators import corpus_ops as _corpus
        from bitcoinminingetl_spark.operators import dedup as _dedup
        from bitcoinminingetl_spark.operators import text as _text

        for build in (
            lambda: _dedup.shingle_index(spark, args.sf_dir),
            lambda: _dedup.normed_embeddings(spark, args.sf_dir),
            lambda: _dedup.shingle_index(spark, args.sf_dir, n=_corpus._DECON_N),
            lambda: _dedup.pair_overlaps(spark, args.sf_dir),
            lambda: _dedup.simhash_tokens(spark, args.sf_dir),
            lambda: _dedup.pair_overlaps(spark, args.sf_dir, df_cap=_dedup._DF_CAP),
            lambda: _text.ccnet_scored(spark, args.sf_dir),
        ):
            try:
                build().write.format("noop").mode("overwrite").save()
            except Exception:  # noqa: BLE001
                pass
        from bitcoinminingetl_spark.operators import (
            reference_pipeline as _refpipe,
        )

        # optional shared relations added during r13 live behind getattr so
        # this script also runs on the pre-optimization tree
        for extra in (
            "span_grams",
            "span_dup_grams",
            "shingle_strings",
            "shingle_sets",
            "surrogate_buckets",
            "bm25_tf",
        ):
            fn = (
                getattr(_dedup, extra, None)
                or getattr(_corpus, extra, None)
                or getattr(_refpipe, extra, None)
                or getattr(_text, extra, None)
            )
            if fn is not None:
                try:
                    fn(spark, args.sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                except Exception:  # noqa: BLE001
                    pass

    # one untimed warmup pass of the targets themselves (JIT/codegen)
    for n in names:
        try:
            registry[n].fn(spark, args.sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as exc:  # noqa: BLE001
            print(f"warmup {n} failed: {exc}", file=sys.stderr)

    if args.plans_dir:
        plans_dir = REPO / args.plans_dir
        plans_dir.mkdir(parents=True, exist_ok=True)
        for n in names:
            df = registry[n].fn(spark, args.sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            (plans_dir / f"{n}_{args.suffix}.txt").write_text(buf.getvalue())

    reps: list[dict[str, float]] = []
    for _ in range(args.reps):
        t_rep: dict[str, float] = {}
        for n in names:
            spark.sparkContext.setJobDescription(f"opt_measure:{n}")
            t0 = time.perf_counter()
            registry[n].fn(spark, args.sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            t_rep[n] = round(time.perf_counter() - t0, 3)
            spark.sparkContext.setJobDescription(None)
        reps.append(t_rep)

    out = {
        "queries": {n: min(r[n] for r in reps) for n in names},
        "per_rep": reps,
        "reps": args.reps,
        "sf_dir": args.sf_dir,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
