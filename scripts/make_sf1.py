"""Deterministic sf1-equivalent corpus for the upper-decade scaling
audit (r9 VERDICT item 2).

The fitted exponents for the noisy-alpha families (q_zorder_layout,
q_bitext_mine, q_dup_span_stats, q_dedup_span_removal) come from
0.8-3.5 s timings at sf0.01->sf0.1 where fixed per-query overhead
pollutes the fit. This script buys a real extra decade: a 10x replica
of `/root/testdata/sf0.1` (read-only driver data — so the copy lives
under the repo's gitignored scratch dir), seeded and fully
deterministic, for exactly the three tables the decade-audited queries
read (lineitem, documents, embeddings).

Replication model — "10 fresh shards from the same distribution", NOT
10 verbatim copies. Verbatim copies would change the WORKLOAD SHAPE,
not just its size: every document would gain 9 exact twins (near-dup
pair counts x100, shingle document frequencies x10 -> every shingle
past df_cap), every embedding 9 cosine-1.0 clones. Instead each
replica preserves the sf0.1 corpus's internal structure exactly and is
decorrelated from the others:

- lineitem: values verbatim, l_orderkey offset by replica so the
  z-order tie-break key stays unique. (q_zorder_layout sorts on
  (day, quantity) morton codes — replication leaves that distribution
  untouched, which is the point: 10x rows through the same ntile.)
- documents: doc_id offset; every whitespace token suffixed `_r{k}`
  for replica k>0. Within a replica, n-gram/span/jaccard structure is
  byte-for-byte isomorphic to sf0.1; across replicas vocabularies are
  disjoint, so gram tables grow linearly and document-frequency
  distributions are preserved per shard (what a real 10x corpus does —
  new data brings new vocabulary mass, not 10 copies of one day's).
- embeddings: vec_id offset by a multiple of 50 (preserving the
  `vec_id % 50` query-sample structure the knn/bitext twins use);
  each replica's vectors multiplied by a seeded per-replica +-1 sign
  vector — an ORTHOGONAL transform, so all within-replica norms,
  cosines and neighbor ranks are exactly preserved while cross-replica
  cosines decorrelate (no artificial cosine-1.0 clone pairs). `label`
  is offset per replica: the coarse-clusterer stand-in keeps its block
  SIZE and grows its block COUNT with the data, which is the 100 TB
  operating assumption the label-block guard is designed for (block
  count scales, per-block pair work stays bounded).

Usage: python scripts/make_sf1.py   (idempotent; ~30 s; writes
scratch_sf1eq/{lineitem,documents,embeddings}.parquet + a manifest
recording the generator version so a stale corpus is rebuilt).
"""

from __future__ import annotations

import json
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
SRC = Path("/root/testdata/sf0.1")
OUT = REPO / "scratch_sf1eq"
REPLICAS = 10
# bump when the replication model changes: scaling_check compares this
# against the manifest and rebuilds a stale corpus
VERSION = 1

DOC_STRIDE = 1_000_000
ORDER_STRIDE = 1_000_000
VEC_STRIDE = 100_000  # multiple of 50: preserves the %50 sample pattern
LABEL_STRIDE = 1_000


def _manifest_path() -> Path:
    return OUT / "MANIFEST.json"


def is_current() -> bool:
    try:
        m = json.loads(_manifest_path().read_text())
    except (OSError, ValueError):
        return False
    return m.get("version") == VERSION and all(
        (OUT / f"{t}.parquet").exists()
        for t in ("lineitem", "documents", "embeddings")
    )


def build() -> Path:
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    OUT.mkdir(exist_ok=True)
    con = duckdb.connect()

    # --- lineitem: verbatim values, orderkey offset per replica -------
    con.execute(
        f"""
        COPY (
            SELECT l_orderkey + r.rep * {ORDER_STRIDE} AS l_orderkey,
                   l_partkey, l_suppkey, l_linenumber, l_quantity,
                   l_extendedprice, l_discount, l_tax, l_returnflag,
                   l_linestatus, l_shipdate
            FROM '{SRC}/lineitem.parquet'
            CROSS JOIN (SELECT unnest(range({REPLICAS})) AS rep) r
            ORDER BY rep, l_orderkey, l_linenumber
        ) TO '{OUT}/lineitem.parquet' (FORMAT PARQUET)
        """
    )

    # --- documents: replica-disjoint vocabulary ----------------------
    # token || '_r{k}' preserves whitespace structure, token counts and
    # every within-replica gram relation; n_chars recomputed to stay
    # consistent with the rewritten text
    # the token rewrite is written ONCE and n_chars derives from the
    # rewritten column in an outer query — a hand-synced second copy of
    # the expression was the r10 code-review fork-on-edit hazard
    con.execute(
        f"""
        COPY (
            SELECT doc_id, text, lang, source,
                   CAST(length(text) AS BIGINT) AS n_chars
            FROM (
                SELECT doc_id + r.rep * {DOC_STRIDE} AS doc_id,
                       CASE WHEN r.rep = 0 THEN text
                            ELSE array_to_string(
                                list_transform(
                                    string_split(text, ' '),
                                    t -> CASE WHEN t = '' THEN t
                                              ELSE t || '_r' || r.rep END
                                ), ' ')
                       END AS text,
                       lang, source
                FROM '{SRC}/documents.parquet'
                CROSS JOIN (SELECT unnest(range({REPLICAS})) AS rep) r
            )
            ORDER BY doc_id
        ) TO '{OUT}/documents.parquet' (FORMAT PARQUET)
        """
    )

    # --- embeddings: seeded orthogonal sign flip per replica ---------
    base = pq.read_table(f"{SRC}/embeddings.parquet")
    vec_ids = base.column("vec_id").to_numpy()
    labels = base.column("label").to_numpy()
    emb = np.asarray(
        base.column("embedding").to_pylist(), dtype=np.float32
    )
    dim = emb.shape[1]
    out_ids, out_labels, out_emb = [], [], []
    for rep in range(REPLICAS):
        signs = (
            np.ones(dim, dtype=np.float32)
            if rep == 0
            else np.random.RandomState(1_000 + rep)
            .choice(np.asarray([-1.0, 1.0], dtype=np.float32), size=dim)
        )
        out_ids.append(vec_ids + rep * VEC_STRIDE)
        out_labels.append(labels + rep * LABEL_STRIDE)
        out_emb.append(emb * signs)
    tbl = pa.table(
        {
            "vec_id": pa.array(
                np.concatenate(out_ids), type=pa.int64()
            ),
            "embedding": pa.array(
                [row for block in out_emb for row in block.tolist()],
                type=pa.list_(pa.float32()),
            ),
            "label": pa.array(
                np.concatenate(out_labels).astype("int32"),
                type=pa.int32(),
            ),
        }
    )
    pq.write_table(tbl, f"{OUT}/embeddings.parquet")

    _manifest_path().write_text(
        json.dumps(
            {
                "version": VERSION,
                "replicas": REPLICAS,
                "source": str(SRC),
                "tables": ["lineitem", "documents", "embeddings"],
                "model": "10 decorrelated shards: offset keys, "
                "replica-disjoint vocab, orthogonal sign-flipped "
                "embeddings, replica-local labels",
            },
            indent=1,
        )
    )
    return OUT


def ensure() -> Path:
    """Build the corpus if absent or stale; return its path."""
    if not is_current():
        print(f"building sf1-equivalent corpus under {OUT} ...")
        build()
    return OUT


if __name__ == "__main__":
    ensure()
    print(f"sf1eq corpus ready at {OUT}")
