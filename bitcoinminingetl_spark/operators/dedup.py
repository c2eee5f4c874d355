"""Near-duplicate detection for LLM training corpora (BASELINE.json north
star): exact n-gram Jaccard, MinHash+LSH, SimHash, and embedding-cosine
near-dup — each a pure-DataFrame plan (no MLlib vectors, no Python UDFs),
so Catalyst owns the join strategies end to end.

Scale architecture (the 100 TB story):
- exact pairwise Jaccard joins on shingle equality — correct but its
  shuffle grows with shingle frequency; it is the small-scale oracle.
- MinHash+LSH is the scale path: per-doc signatures (one groupBy), banded
  bucket keys, candidate generation by equi-join on (band, bucket) —
  shuffle volume ~ O(docs × bands), independent of pairwise count — then
  exact verification only on candidates.
- SimHash: 32-bit signatures, chunk-blocked candidate join, popcount
  Hamming verify.
- embedding near-dup blocks on the label column (any coarse clusterer at
  scale) so the quadratic term is per-block, not global.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from bitcoinminingetl_spark.catalog import table
from bitcoinminingetl_spark.functions.cache import lru_persisted
from bitcoinminingetl_spark.functions.numeric import roundn, roundn_sql
from bitcoinminingetl_spark.registry import query

_NGRAM = 3
_JACCARD_THRESHOLD = 0.3

# The DuckDB-side twin of _shingled (kept adjacent so they evolve together).
# The oracle keeps shingles as strings; Spark hashes them to int64 — all
# downstream quantities are set cardinalities, which agree as long as
# xxhash64 is collision-free on the corpus (see _shingled docstring).
_SHINGLE_SQL = """
    SELECT doc_id, unnest(list_distinct(
        list_transform(
            generate_series(1, greatest(len(string_split(text, ' ')) - 2, 1)),
            i -> array_to_string(string_split(text, ' ')[i:i+2], ' ')
        ))) AS shingle
    FROM documents
"""


def ngram_array(toks: Column, n: int) -> Column:
    """array<string> of all n-word grams of a token array (positional,
    NOT deduplicated), built as a FOLD OF zip_with OVER n SHIFTED SLICES
    — not transform(sequence) + per-position slice/concat: the
    positional-index form evaluates an interpreted slice per element and
    benched 2.5x slower for the full shingle pass at sf0.1 (same finding
    as q_bigram_logprob's pair construction; output verified identical
    row-for-row). Inputs shorter than n yield one gram: the full text
    (the whole dedup family's short-doc convention)."""
    size = F.size(toks)
    width = size - (n - 1)
    sh = F.slice(toks, 1, width)
    for k in range(2, n + 1):
        sh = F.zip_with(
            sh,
            F.slice(toks, k, width),
            lambda acc, t: F.concat(acc, F.lit(" "), t),
        )
    return F.when(size >= n, sh).otherwise(F.array(F.concat_ws(" ", toks)))


def _shingled(docs: DataFrame, n: int = _NGRAM) -> DataFrame:
    """(doc_id, shingle: bigint) with distinct n-word shingles per document
    (default 3), xxhash64-hashed. Docs shorter than the shingle width
    contribute their full text.

    Built on ngram_array (the codegen'd zip_with fold). The hash happens
    AFTER the explode, as a scalar projection inside whole-stage codegen
    (hashing inside the lambda benches ~40% slower — interpreted per
    element). Everything downstream shuffles/joins 8-byte keys instead
    of ~25-byte shingle strings; at corpus scale that's the dominant
    shuffle-volume term. Collision odds ~n_shingles²/2⁶⁴ — immaterial
    below ~10⁹ distinct shingles, and a collision only inflates one
    intersection count."""
    return _shingle_strings(docs, n).select(
        "doc_id", F.xxhash64("s").alias("shingle")
    )


def _shingle_strings(docs: DataFrame, n: int = _NGRAM) -> DataFrame:
    """(doc_id, s: string) with distinct n-word shingles per document,
    UNHASHED — the engine-portable relation the md5 MinHash twin
    (q_dedup_minhash_md5) draws its min-hashes from; _shingled is this
    plus the xxhash64 projection every production-path consumer joins
    on."""
    shingles = F.array_distinct(ngram_array(F.split("text", " "), n))
    return (
        # NULL text contributes NO shingles (the doc has no content to
        # match on) — matching the oracle, where the NULL gram vanishes
        # under list_distinct. Without the filter, split(NULL) flows to
        # ngram_array's short-doc branch as concat_ws('')='', silently
        # aliasing NULL-text docs with empty-text docs in every
        # shingle-joining query. Empty text ('') keeps its one ''
        # shingle on BOTH sides.
        docs.filter(F.col("text").isNotNull())
        .select("doc_id", F.explode(shingles).alias("s"))
    )


_SHINGLE_INDEX_CACHE: dict[str, DataFrame] = {}
_SHINGLE_STRINGS_CACHE: dict[str, DataFrame] = {}
_SHINGLE_SETS_CACHE: dict[str, DataFrame] = {}


def _doc_shingle_sets(sh: DataFrame) -> DataFrame:
    """(doc_id, shingles: array, n_shingles) — the per-doc shingle-set
    relation _verify_candidates joins to both pair sides. Group-then-
    filter == filter-then-group for any doc_id-level predicate, so
    consumers that restrict the corpus (q_corpus_dedup_lsh*'s exact-
    stage survivors) may semi-join the SHARED aggregate instead of
    re-aggregating a filtered index."""
    return sh.groupBy("doc_id").agg(
        F.collect_set("shingle").alias("shingles"),
        F.count(F.lit(1)).alias("n_shingles"),
    )


def shingle_sets(spark: SparkSession, sf_dir: str, n: int = _NGRAM) -> DataFrame:
    """The per-doc shingle-SET relation persisted once per (session,
    corpus, n) — level three of the dedup-family artifact stack
    (shingle_index -> pair_overlaps / shingle_sets). r13 optimization
    (guide §2.4): _verify_candidates references its per-doc set
    aggregate TWICE (doc_a side + doc_b side) and Spark recomputes the
    whole groupBy+collect_set subtree per side — and FIVE registry
    queries run that verify stage (q_dedup_minhash_lsh, q_dedup_
    minhash_md5, q_dedup_minhash_mllib, q_corpus_dedup_lsh,
    q_corpus_dedup_lsh_md5), so one bench pass aggregated the shingle
    index into sets TEN times. One persist-once build (timed in
    bench.py's shared-infra phase, honestly dropped between reps)
    serves all ten references."""
    key = f"{spark.sparkContext.applicationId}:{sf_dir}:{n}:sets"
    return lru_persisted(
        _SHINGLE_SETS_CACHE,
        key,
        lambda: _doc_shingle_sets(shingle_index(spark, sf_dir, n)),
    )


def shingle_strings(
    spark: SparkSession, sf_dir: str, n: int = _NGRAM
) -> DataFrame:
    """The UNHASHED (doc_id, s) shingle relation persisted once per
    (session, corpus, n) — the engine-portable sibling of shingle_index
    that the md5 MinHash twins draw their lane min-hashes from
    (min-of-md5 must be taken over the same strings DuckDB sees, never
    over xxhash64 keys). r13 optimization: q_dedup_minhash_md5 and
    q_corpus_dedup_lsh_md5 each re-ran the scan + tokenize + shingle
    explode inline; one shared build saves a full corpus explode per
    consumer (the r12 simhash_tokens doctrine — the twins' 16-min
    aggregates stay deliberately separate so each keeps mirroring the
    production plan past the shared scan). Kept independent of
    shingle_index (not derived from it, not feeding it) so the
    production index never pays the wider string persist when no md5
    twin runs."""
    key = f"{spark.sparkContext.applicationId}:{sf_dir}:{n}:strings"
    return lru_persisted(
        _SHINGLE_STRINGS_CACHE,
        key,
        lambda: _shingle_strings(table(spark, sf_dir, "documents"), n),
    )


def shingle_index(spark: SparkSession, sf_dir: str, n: int = _NGRAM) -> DataFrame:
    """The materialized SHINGLE INDEX for a corpus: the (doc_id, shingle)
    relation persisted once per (session, corpus, n) and shared by every
    dedup-family query — the engine-side analogue of the bucketed
    corpus shingle table a production pipeline maintains (see
    q_dedup_incremental's docstring). Without it, each of the ~8
    dedup/decontamination queries re-runs the scan + tokenize + shingle
    explode (~the single most repeated subplan in the engine); with it,
    the first query materializes ~n_docs x shingles_per_doc rows of
    (long, long) and the rest reuse them. MEMORY_AND_DISK persist: at
    100 TB this is the index you'd write to a bucketed table instead;
    the 8-byte hashed keys make it compact either way. The cache is
    bounded LRU (functions/cache.py) so test fixtures don't accumulate
    executor storage."""
    key = f"{spark.sparkContext.applicationId}:{sf_dir}:{n}"
    return lru_persisted(
        _SHINGLE_INDEX_CACHE,
        key,
        lambda: _shingled(table(spark, sf_dir, "documents"), n=n),
    )


def _jaccard_pairs(shingled: DataFrame, df_cap: int | None = None) -> DataFrame:
    """All doc pairs sharing >=1 shingle, with exact Jaccard similarity.
    |A∪B| = |A|+|B|-|A∩B|.

    Intersection counts come from ONE groupBy(shingle) + in-group pair
    generation, not a self-join: the self-join shuffles the shingle
    relation twice (both sides hash-partition on the key), the groupBy
    shuffles it once and emits the same pairs from the grouped doc list —
    benched 24% faster at sf0.1 with identical output. Pair fan-out per
    shingle is g(g-1)/2 either way and lands on the task owning that
    shingle key either way, so the skew story is unchanged.

    ``df_cap`` is the stop-shingle guard, the piece that makes the exact
    variant survive skew at corpus scale: a shingle appearing in g docs
    fans out g(g-1)/2 pairs, so one boilerplate shingle shared by 10^6
    docs emits 5*10^11 pairs from a single task. With a cap, shingles
    with document frequency > df_cap are dropped BEFORE pair generation —
    a free filter on the already-grouped relation (no extra shuffle) that
    bounds per-shingle fan-out at df_cap(df_cap-1)/2. Jaccard is then
    computed over the pruned shingle universe (per-doc sizes recounted
    from the kept shingles), keeping the metric internally consistent —
    mirrored exactly by the DuckDB oracle's HAVING count(*) <= cap.
    df_cap=None keeps unpruned semantics (the oracle ground truth)."""
    return _jaccard_from_overlaps(_pair_overlaps(shingled, df_cap))


def _jaccard_from_overlaps(overlaps: DataFrame) -> DataFrame:
    """Jaccard = |A∩B| / (|A|+|B|-|A∩B|) as a projection of the shared
    pair-overlap relation — no shuffle of its own."""
    return overlaps.select(
        "doc_a",
        "doc_b",
        roundn(
            F.col("n_inter")
            * 1.0
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
            6,
        ).alias("jaccard"),
    )


def near_dup_pairs(overlaps: DataFrame) -> DataFrame:
    """Thresholded near-dup pairs (doc_a, doc_b, jaccard) from an
    overlap relation. The selection predicate runs on the RAW
    intersection ratio — matching every oracle's WHERE on the unrounded
    expression — and only the REPORTED metric is rounded to 6 dp.
    Filtering on the rounded column (the pre-r6 form) admitted pairs in
    [threshold - 5e-7, threshold) that the oracles exclude; one such
    phantom edge perturbs degree-sensitive consumers (PageRank degrees,
    CC components) far beyond its own row."""
    raw = (
        F.col("n_inter")
        * 1.0
        / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    )
    return _jaccard_from_overlaps(
        overlaps.filter(raw >= _JACCARD_THRESHOLD)
    )


def _pair_overlaps(shingled: DataFrame, df_cap: int | None = None) -> DataFrame:
    """The shared pair-overlap skeleton: (doc_a, doc_b, n_inter, n_a,
    n_b) for all doc pairs sharing >=1 (kept) shingle — the relation
    every set-similarity metric (Jaccard, containment, overlap
    coefficient) is a one-line projection of. See _jaccard_pairs for the
    one-groupBy design and the df_cap stop-shingle guard."""
    # r13 (guide §4.1 — prefer codegen over interpreted HOFs): in-group
    # pair generation is two codegen'd Generate (explode) passes + an
    # a<b filter, replacing the flatten/transform/slice HOF explosion
    # (interpreted per element) — A/B at sf0.1, interleaved min-of-4:
    # uncapped 2.24 -> 1.43 s, df_cap 2.31 -> 1.54 s, 1,130,536-row
    # output proven identical per mode. The explode emits g² rows per
    # group pre-filter vs the HOF's g(g-1)/2 structs, but each row is
    # two longs and never materializes the nested struct array; fan-out
    # stays bounded by the same df_cap stop-shingle guard. collect_list
    # no longer needs sort_array: a doc appears at most once per shingle,
    # so the a<b filter alone emits each pair exactly once.
    grouped = shingled.groupBy("shingle").agg(
        F.collect_list("doc_id").alias("ds")
    )
    if df_cap is not None:
        grouped = grouped.filter(F.size("ds") <= df_cap)
        # per-doc sizes over the PRUNED universe, recovered from the
        # grouped relation itself (no second scan of the shingle table)
        sizes = (
            grouped.select(F.explode("ds").alias("doc_id"))
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_shingles"))
        )
    else:
        sizes = shingled.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("n_shingles")
        )
    inter = (
        grouped.select(F.explode("ds").alias("doc_a"), "ds")
        .select("doc_a", F.explode("ds").alias("doc_b"))
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a"), on="doc_a")
        .withColumnRenamed("n_shingles", "n_a")
        .join(
            sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed(
                "n_shingles", "n_b"
            ),
            on="doc_b",
        )
    )


_PAIR_OVERLAPS_CACHE: dict[str, DataFrame] = {}


def pair_overlaps(
    spark: SparkSession,
    sf_dir: str,
    df_cap: int | None = None,
    n: int = _NGRAM,
) -> DataFrame:
    """The materialized PAIR-OVERLAP relation for a corpus: (doc_a,
    doc_b, n_inter, n_a, n_b) persisted once per (session, corpus, n,
    df_cap) and shared by every exact set-similarity consumer —
    q_dedup_ngram_jaccard/_pruned/_containment, q_dedup_clusters{,_minlabel},
    q_corpus_dedup, q_source_overlap_matrix. It is the second level of
    the dedup-family artifact stack: shingle_index materializes the
    (doc_id, shingle) relation; this materializes the guarded pair
    generation on top of it, which was previously recomputed per query
    (the single most expensive repeated subplan in the engine — the
    groupBy(shingle) + in-group pair explosion + two size joins).

    At 100 TB this is the "candidate/overlap table" a production dedup
    pipeline writes once per corpus snapshot and serves to every metric,
    clustering, and governance pass; here it is a MEMORY_AND_DISK
    persist with the same bounded-eviction policy as shingle_index.
    Every similarity metric (Jaccard, containment, overlap coefficient)
    is a map-only projection of this relation."""
    key = f"{spark.sparkContext.applicationId}:{sf_dir}:{n}:{df_cap}"
    return lru_persisted(
        _PAIR_OVERLAPS_CACHE,
        key,
        lambda: _pair_overlaps(shingle_index(spark, sf_dir, n), df_cap),
    )


# DuckDB-side exact near-dup pairs — the oracle for q_dedup_ngram_jaccard
# and the edge set for q_dedup_clusters' oracle (corpus_ops.py).
NGRAM_PAIRS_ORACLE = f"""
    WITH sh AS ({_SHINGLE_SQL}),
    sizes AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY doc_id
    ),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           {roundn_sql('n_inter * 1.0 / (sa.n + sb.n - n_inter)', 6)} AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE n_inter * 1.0 / (sa.n + sb.n - n_inter) >= {_JACCARD_THRESHOLD}
    """


@query("q_dedup_ngram_jaccard", oracle=NGRAM_PAIRS_ORACLE)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs above 0.3 — the ground truth
    the probabilistic variants (MinHash, SimHash) approximate. Correct at
    any scale but the shingle-equality join is the quadratic risk; use
    q_dedup_minhash_lsh beyond ~10^7 docs. Reads the shared persisted
    pair-overlap relation (pair_overlaps); the Jaccard metric is a
    map-only projection of it."""
    return near_dup_pairs(pair_overlaps(spark, sf_dir))


_DF_CAP = 50

NGRAM_PRUNED_ORACLE = f"""
    WITH sh0 AS ({_SHINGLE_SQL}),
    kept AS (
        SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) <= {_DF_CAP}
    ),
    sh AS (SELECT sh0.doc_id, sh0.shingle FROM sh0 JOIN kept USING (shingle)),
    sizes AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY doc_id
    ),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           {roundn_sql('n_inter * 1.0 / (sa.n + sb.n - n_inter)', 6)} AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE n_inter * 1.0 / (sa.n + sb.n - n_inter) >= {_JACCARD_THRESHOLD}
    """


@query("q_dedup_ngram_pruned", oracle=NGRAM_PRUNED_ORACLE)
def q_dedup_ngram_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard with stop-shingle document-frequency pruning
    (df_cap=50) — the skew guard the unpruned variant lacks: boilerplate
    shingles shared by more than df_cap documents are dropped before pair
    generation, bounding any single task's pair fan-out. This is the
    variant to run at corpus scale when exact (non-LSH) pairs are needed;
    q_dedup_ngram_jaccard remains the unpruned ground truth. Projects
    the shared persisted guarded pair-overlap relation."""
    return near_dup_pairs(pair_overlaps(spark, sf_dir, df_cap=_DF_CAP))


_CONTAINMENT_THRESHOLD = 0.8


@query(
    "q_dedup_containment",
    oracle=f"""
    WITH sh0 AS ({_SHINGLE_SQL}),
    kept AS (
        SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) <= {_DF_CAP}
    ),
    sh AS (SELECT sh0.doc_id, sh0.shingle FROM sh0 JOIN kept USING (shingle)),
    sizes AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY doc_id
    ),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           {roundn_sql('n_inter * 1.0 / least(sa.n, sb.n)', 6)} AS containment
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE n_inter * 1.0 / least(sa.n, sb.n) >= {_CONTAINMENT_THRESHOLD}
    """,
)
def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment near-dup pairs: C = |A∩B| / min(|A|,|B|) ≥ 0.8 — the
    partial-duplication detector Jaccard structurally misses. A short
    document quoted whole inside a long one scores C = 1.0 but Jaccard ≈
    |A|/|B| → 0 as the wrapper grows, so boilerplate-wrapped copies and
    quote-inclusion dups survive a Jaccard-only pass; every serious
    corpus dedup runs both metrics over the same pair relation. Shares
    the persisted pair_overlaps relation (one groupBy, df_cap
    stop-shingle guard) with the Jaccard family — the metric is a
    projection, not a new shuffle, and the pair generation is not even
    recomputed."""
    return (
        pair_overlaps(spark, sf_dir, df_cap=_DF_CAP)
        .select(
            "doc_a",
            "doc_b",
            roundn(
                F.col("n_inter") * 1.0 / F.least(F.col("n_a"), F.col("n_b")), 6
            ).alias("containment"),
        )
        .filter(F.col("containment") >= _CONTAINMENT_THRESHOLD)
    )


_MINHASH_K = 16
_BANDS = 4
_ROWS_PER_BAND = _MINHASH_K // _BANDS


_LSH_BUCKET_CAP = 5_000


def _candidate_pairs(
    bands: DataFrame, bucket_cap: int | None = _LSH_BUCKET_CAP
) -> DataFrame:
    """Distinct (doc_a < doc_b) candidate pairs from a (doc_id, band, sig)
    relation via ONE groupBy(band, sig) + in-group pair generation — the
    same rewrite as _jaccard_pairs: the equi-self-join computes and
    shuffles the band relation twice (and for the MLlib variant "compute"
    means the whole HashingTF + model-hash pipeline), the groupBy does it
    once and emits identical pairs from the grouped doc list. Bucket
    fan-out is g(g-1)/2 either way; a doc appears at most once per
    (band, sig) so no self-pairs arise.

    ``bucket_cap`` is the LSH twin of _jaccard_pairs' stop-shingle
    df_cap: a band signature shared by g documents fans out g(g-1)/2
    candidate pairs from one task, and a degenerate signature (e.g.
    boilerplate-dominated min-hashes) shared by 10^6 docs would emit
    5*10^11 pairs. Buckets above the cap are dropped EXPLICITLY — an
    intentional recall trade on pathological buckets, not a silent
    truncation: any pair lost here shares a dominant boilerplate
    signature and is the exact-verify stage's job to reject anyway. At
    the default 5000 the cap never fires on healthy data (expected
    bucket size is a handful of near-dups); it exists to bound the
    worst case."""
    # r13 (guide §4.1, the _pair_overlaps rewrite): two codegen'd
    # explodes + an a<b filter replace the interpreted flatten/
    # transform/slice HOF pair explosion (and the per-group sort_array,
    # unnecessary once pairs come from filtering — a doc appears at
    # most once per (band, sig), so a<b emits each pair exactly once
    # per bucket). Interleaved A/B at sf0.1 over the minhash bands:
    # min 1.43 -> 0.96 s (the band aggregate dominates this stage, so
    # the delta is smaller than _pair_overlaps' −36%); 256-row output
    # proven identical.
    grouped = (
        bands.groupBy("band", "sig")
        .agg(F.collect_list("doc_id").alias("ds"))
        .filter(F.size("ds") > 1)
    )
    if bucket_cap is not None:
        grouped = grouped.filter(F.size("ds") <= bucket_cap)
    return (
        grouped.select(F.explode("ds").alias("doc_a"), "ds")
        .select("doc_a", F.explode("ds").alias("doc_b"))
        .filter(F.col("doc_a") < F.col("doc_b"))
        .distinct()
    )


def minhash_bands(sh: DataFrame) -> DataFrame:
    """(doc_id, band, sig) banded MinHash signatures from a (doc_id,
    shingle) relation: 16 min-hashes per doc (ONE hash aggregate;
    xxhash64 with 16 salts) -> 4 bands of 4 rows, band signature =
    xxhash64 of its rows. Shared by the batch LSH queries and the
    streaming incremental-dedup index."""
    sig = sh.groupBy("doc_id").agg(
        *[
            F.min(F.xxhash64(F.col("shingle"), F.lit(k))).alias(f"mh{k}")
            for k in range(_MINHASH_K)
        ]
    )
    return sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[
                                F.col(f"mh{b * _ROWS_PER_BAND + r}")
                                for r in range(_ROWS_PER_BAND)
                            ]
                        ).alias("sig"),
                    )
                    for b in range(_BANDS)
                ]
            )
        ).alias("bs"),
    ).select("doc_id", "bs.band", "bs.sig")


@query("q_dedup_minhash_lsh")  # rows-only: xxhash64 signatures are Spark-specific
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + banded LSH near-dup detection, the 100 TB dedup path:

    shingle -> banded signatures (minhash_bands) -> candidate pairs =
    equi-join on (band, signature) -> exact Jaccard verification on
    candidates only.

    Probability a pair with Jaccard j becomes a candidate: 1-(1-j^4)^4
    (~0.97 at j=0.8). Checked rows-only (signatures are engine-specific);
    the unit test asserts candidates ⊆ exact pairs at threshold after
    verification."""
    sh = shingle_index(spark, sf_dir)
    return _verify_candidates(
        sh,
        _candidate_pairs(minhash_bands(sh)),
        sets=shingle_sets(spark, sf_dir),
    )


def minhash_bands_md5(shs: DataFrame) -> DataFrame:
    """(doc_id, band, sig) banded MinHash signatures over ENGINE-PORTABLE
    hashes — the md5 twin of minhash_bands: each of 4 salted md5s yields
    4 independent 8-hex-char lanes, so mh[k] = min over shingles of
    substr(md5(shingle || '|' || k//4), 1 + 8*(k%4), 8), KEPT AS THE HEX
    STRING — fixed-width lowercase hex compares lexicographically ==
    numerically and identically in Spark's UTF8_BINARY and DuckDB's
    binary VARCHAR order, so the min needs no conv/cast at all. Band
    signature = md5 of the comma-joined lane strings. A/B at sf0.1
    (shared shingle index warm, 3 reps): 16-md5 + conv 4.2 s, 4-md5
    lanes + conv 3.4 s, 4-md5 lanes + string-min 2.8 s — the adopted
    form. `shs` is the UNHASHED (doc_id, s) string-shingle relation —
    min-of-md5 must be taken over the same strings DuckDB sees, not
    over xxhash64 keys. Same plan shape as the production path: ONE
    16-min aggregate, one 4-way band explode."""
    sig = shs.groupBy("doc_id").agg(
        *[
            F.min(
                F.substring(
                    F.md5(F.concat_ws("|", "s", F.lit(str(k // 4)))),
                    1 + 8 * (k % 4),
                    8,
                )
            ).alias(f"mh{k}")
            for k in range(_MINHASH_K)
        ]
    )
    return sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col(f"mh{b * _ROWS_PER_BAND + r}")
                                    for r in range(_ROWS_PER_BAND)
                                ],
                            )
                        ).alias("sig"),
                    )
                    for b in range(_BANDS)
                ]
            )
        ).alias("bs"),
    ).select("doc_id", "bs.band", "bs.sig")


def _minhash_md5_salt_sql(k: int) -> str:
    """DuckDB twin of one md5 min-hash lane column (see
    minhash_bands_md5: 4 salted md5s × 4 hex lanes, string min)."""
    return (
        f"min(substr(md5(concat(shingle, '|{k // 4}')),"
        f" {1 + 8 * (k % 4)}, 8)) AS mh{k}"
    )


# DuckDB twin of q_dedup_minhash_md5: same 16 md5-lane min-hashes, same
# md5-of-comma-joined-lanes band signatures, same bucket-cap'd candidate
# generation, same exact-Jaccard verify — over the string shingles both
# engines derive identically (_SHINGLE_SQL ↔ _shingle_strings).
_MINHASH_MD5_ORACLE = f"""
WITH sh AS ({_SHINGLE_SQL}),
mh AS (
    SELECT doc_id,
           {', '.join(_minhash_md5_salt_sql(k) for k in range(_MINHASH_K))}
    FROM sh GROUP BY doc_id
),
bands AS (
    {' UNION ALL '.join(
        "SELECT doc_id, " + str(b) + " AS band, md5(concat_ws(',', "
        + ', '.join(
            f"mh{b * _ROWS_PER_BAND + r}" for r in range(_ROWS_PER_BAND)
        )
        + ")) AS sig FROM mh"
        for b in range(_BANDS)
    )}
),
bsz AS (SELECT band, sig, count(*) AS g FROM bands GROUP BY 1, 2),
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a
    JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
    JOIN bsz z ON z.band = a.band AND z.sig = a.sig
    WHERE z.g <= {_LSH_BUCKET_CAP}
),
sizes AS (
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY doc_id
),
inter AS (
    SELECT c.doc_a, c.doc_b, count(*) AS n_inter
    FROM cand c
    JOIN sh a ON a.doc_id = c.doc_a
    JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
    GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       {roundn_sql('n_inter * 1.0 / (sa.n + sb.n - n_inter)', 6)} AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE n_inter * 1.0 / (sa.n + sb.n - n_inter) >= {_JACCARD_THRESHOLD}
"""


@query("q_dedup_minhash_md5", oracle=_MINHASH_MD5_ORACLE)
def q_dedup_minhash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-hashed MinHash+LSH twin (r12 VERDICT item 1): the exact
    band/candidate/verify machinery of q_dedup_minhash_lsh — same
    _candidate_pairs skeleton (one groupBy(band, sig) + in-group pair
    generation, bucket cap), same _verify_candidates exact-Jaccard
    stage — with min-hashes and band signatures drawn from md5 instead
    of xxhash64. md5 bits are engine-portable (the r12 SimHash
    conversion pattern, q_dedup_simhash_md5), so the ENTIRE verified
    pair set value-hashes against a DuckDB oracle, putting the banding
    machinery that q_dedup_minhash_lsh / q_corpus_dedup_lsh /
    q_dedup_pagerank_lsh all share under a full value hash. xxhash64
    stays the production path (fastest JVM-side hash; no string
    round-trip through hex/conv). The unhashed shingle relation comes
    from the shared persist-once build (shingle_strings) — r13: the
    inline rebuild re-ran the corpus scan + tokenize + shingle explode
    that q_corpus_dedup_lsh_md5 also pays."""
    cand = _candidate_pairs(minhash_bands_md5(shingle_strings(spark, sf_dir)))
    return _verify_candidates(
        shingle_index(spark, sf_dir), cand, sets=shingle_sets(spark, sf_dir)
    )


def _verify_candidates(
    sh: DataFrame, candidates: DataFrame, sets: DataFrame | None = None
) -> DataFrame:
    """Exact-Jaccard verification on CANDIDATES ONLY — the whole point of
    LSH: the per-doc shingle sets join to the (small) candidate list,
    never to each other, so verification is O(candidates), not O(pairs).
    Shared by the hand-rolled and MLlib-signature LSH variants.

    ``sets`` (r13, guide §2.4): the per-doc set relation is referenced
    once per pair side, and Spark recomputes the aggregate subtree for
    each reference — batch callers pass the persist-once shingle_sets
    build (optionally doc-filtered) so the aggregate runs zero times
    per query; the streaming path keeps the inline build (its shingle
    relation is per-batch, not a corpus artifact)."""
    if sets is None:
        sets = _doc_shingle_sets(sh)
    sa = sets.select(
        F.col("doc_id").alias("doc_a"),
        F.col("shingles").alias("sh_a"),
        F.col("n_shingles").alias("n_a"),
    )
    sb = sets.select(
        F.col("doc_id").alias("doc_b"),
        F.col("shingles").alias("sh_b"),
        F.col("n_shingles").alias("n_b"),
    )
    n_inter = F.size(F.array_intersect("sh_a", "sh_b"))
    return (
        candidates.join(sa, on="doc_a")
        .join(sb, on="doc_b")
        # raw-ratio predicate, rounded report (see near_dup_pairs) —
        # also keeps the LSH edge set a strict subset of the exact one
        # at the threshold boundary
        .filter(
            n_inter * 1.0 / (F.col("n_a") + F.col("n_b") - n_inter)
            >= _JACCARD_THRESHOLD
        )
        .select(
            "doc_a",
            "doc_b",
            roundn(
                n_inter * 1.0 / (F.col("n_a") + F.col("n_b") - n_inter), 6
            ).alias("jaccard"),
        )
    )


_SIMHASH_BITS = 32
_SIMHASH_CHUNKS = 4
_CHUNK_BITS = _SIMHASH_BITS // _SIMHASH_CHUNKS
_HAMMING_MAX = 3


@query("q_dedup_simhash")  # rows-only: xxhash64 bit patterns are Spark-specific
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup: 32-bit signature per doc (sign of per-bit vote
    sums over token hashes), candidate pairs via chunk blocking (two docs
    within Hamming distance d < chunks must share >=1 of the 4 8-bit
    chunks), popcount-XOR Hamming verify <= 3. All bit arithmetic is
    JVM-side (shiftright/bit_count); one aggregate + one bounded join.
    Production path hashes tokens with xxhash64 (fastest JVM-side hash);
    its full value-hash correctness receipt is the md5-bit twin below
    (q_dedup_simhash_md5), which runs the SAME vote/chunk/Hamming
    machinery over engine-portable bits."""
    tok = simhash_tokens(spark, sf_dir).withColumn(
        "th", F.xxhash64("token")
    )
    return _simhash_pairs(tok)


_SIMHASH_TOKENS_CACHE: dict[str, DataFrame] = {}


def simhash_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, token) with per-doc distinct tokens — the shared input
    of both SimHash variants, persisted once per (session, corpus)
    through the functions/cache.py stack (r12 VERDICT item 6: the two
    twins each recomputed the scan + tokenize + distinct explode —
    ~one corpus scan saved across the pair; the 32-vote aggregates
    stay deliberately separate so the twin keeps mirroring the
    production plan past the shared scan)."""
    key = f"{spark.sparkContext.applicationId}:{sf_dir}:simhash_tokens"
    return lru_persisted(
        _SIMHASH_TOKENS_CACHE,
        key,
        lambda: table(spark, sf_dir, "documents").select(
            "doc_id",
            F.explode(F.array_distinct(F.split("text", " "))).alias(
                "token"
            ),
        ),
    )


# DuckDB twin of the md5-bit SimHash below: same 32 vote sums, same
# signature fold, same chunk blocking and popcount-XOR verify — over
# bits both engines derive identically (first 8 hex chars of md5(token)
# as a 32-bit int; DuckDB casts '0x…' strings, Spark uses conv(…,16,10),
# verified equal). The vote/signature stages are unrolled per bit, the
# same oracle style as q_bpe_train's unrolled CTE.
_SIMHASH_MD5_ORACLE = f"""
WITH tok AS (
    SELECT DISTINCT doc_id, token FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents
    )
), th AS (
    SELECT doc_id,
           CAST(concat('0x', substr(md5(token), 1, 8)) AS BIGINT) AS th
    FROM tok
), votes AS (
    SELECT doc_id,
           {', '.join(
               f"sum(CASE WHEN (th >> {b}) & 1 = 1 THEN 1 ELSE -1 END)"
               f" AS v{b}"
               for b in range(_SIMHASH_BITS)
           )}
    FROM th GROUP BY doc_id
), sig AS (
    SELECT doc_id,
           CAST({' + '.join(
               f"(CASE WHEN v{b} >= 0 THEN {2**b} ELSE 0 END)"
               for b in range(_SIMHASH_BITS)
           )} AS BIGINT) AS simhash
    FROM votes
), chunks AS (
    SELECT doc_id, simhash, c.chunk_id,
           (simhash >> (c.chunk_id * {_CHUNK_BITS}))
               & {2**_CHUNK_BITS - 1} AS chunk
    FROM sig, (SELECT unnest(range({_SIMHASH_CHUNKS})) AS chunk_id) c
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM chunks a JOIN chunks b
  ON a.chunk_id = b.chunk_id AND a.chunk = b.chunk AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {_HAMMING_MAX}
"""


@query("q_dedup_simhash_md5", oracle=_SIMHASH_MD5_ORACLE)
def q_dedup_simhash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-hashed SimHash twin (r11 VERDICT item 3): the exact
    vote/chunk/Hamming machinery of q_dedup_simhash, with token bits
    drawn from md5 instead of xxhash64 — md5 is engine-portable
    (q_eval_split / q_fingerprint_winnow doctrine), so the ENTIRE pair
    set value-hashes against a DuckDB oracle, closing the one near-dup
    family that had neither a full-value oracle nor an exact
    oracle-hashed twin. Same plan shape as the production path: one
    32-vote aggregate, chunk-blocked candidate equi-join, popcount
    verify — the md5+conv token hash is the only extra scan-side cost,
    so the twin also certifies the machinery's plan, not just its
    values (same pattern as q_ann_ivf's deterministic-quantizer
    conversion in r10)."""
    tok = simhash_tokens(spark, sf_dir).withColumn(
        "th",
        F.conv(F.substring(F.md5("token"), 1, 8), 16, 10).cast("long"),
    )
    return _simhash_pairs(tok)


def _simhash_pairs(tok: DataFrame) -> DataFrame:
    """Shared SimHash machinery: per-bit vote sums -> sign-fold into a
    32-bit signature -> chunk blocking -> Hamming verify. `tok` is a
    (doc_id, token, th) relation; both variants differ only in how
    `th` is derived.

    r13 optimization (guide §2.4 — remove shuffles/duplicated subtrees;
    measured A/B in OPTIMIZATION_r13.md):

    1. VOTES: sum of ±1 per bit is 2·ones_b − n, so the aggregate sums
       the raw bit (no per-row CASE per bit — 32 branches dropped from
       the hot aggregate input) plus ONE count, and the sign condition
       becomes 2·ones_b >= n at the per-doc projection (5k rows, not
       500k). Exact integer equivalence: v_b = ones_b − (n − ones_b).
    2. CANDIDATES: the previous equi-SELF-JOIN on (chunk_id, chunk)
       referenced `chunks` twice, and Spark recomputed the ENTIRE
       32-vote aggregate + chunk explode once per side (two Exchanges
       over the token relation — see plans/r13/q_dedup_simhash_before
       .txt operators 8-10 vs 17-19). Now buckets group ONCE by
       (chunk_id, chunk) — a |chunks|-row shuffle, 4 rows/doc — and
       pairs come from two codegen'd Generate (posexplode) passes over
       the bucket's doc list, NOT the interpreted slice/transform HOF
       that lost the old A/B (self-join 2.4 s vs HOF-groupBy 4.9 s):
       per-bucket fan-out is |b|² either way, but the vote aggregate
       runs exactly once. At 100 TB the old shape was TWO corpus-wide
       aggregates + a corpus-sized broadcast/SMJ; this is one aggregate
       + one 4-rows/doc shuffle.
    3. DEDUP: pairs sharing several chunks were deduped by a final
       .distinct() — one more Exchange. Both signatures ride the row,
       so "this is the FIRST matching chunk" is a bit test (every
       earlier xor byte nonzero) and the distinct disappears; each
       qualifying pair survives exactly once, at its minimum matching
       chunk_id. Result set identical (oracle re-proven at sf0.01 +
       sf0.1, ORACLE_LOCAL/ORACLE_SF01).

    r14 (VERDICT item 4 / ADVICE medium — guide §2.5 skew + §5 memory):
    the r13 candidate stage grouped by (chunk_id, chunk) and
    collect_list'd every bucket member into ONE array. With 8-bit
    chunks that key space is at most 4×256 = 1024 groups, so each
    bucket row materializes O(corpus/256) structs in a single
    aggregation buffer — a per-task OOM (and 2 GB array-limit) hazard
    at 100 TB that the old self-join, quadratic but streamed and
    spillable, never had. Candidates now come from an equi-SELF-JOIN
    on (chunk_id, chunk) over the CHECKPOINTED per-doc signature
    relation: the vote aggregate still runs exactly once (ckpt
    truncates lineage, so both join sides read the materialized 1-row/
    doc relation instead of recomputing the aggregate — the defect the
    r13 rewrite fixed stays fixed), the shuffle is still 4 rows/doc
    per side, and the join is streamed/spillable with AQE skew
    handling instead of one unbounded in-memory array per bucket. The
    checkpoint is per-invocation (recomputed every run — nothing is
    memoized across queries or reps); NULL-th rows are filtered
    structurally (ADVICE low: the pre-r13 ±1 vote convention counted a
    NULL th as all-zero bits via CASE…otherwise(-1), the raw-bit sum
    silently drops them — no current producer emits NULL th, and the
    explicit filter makes the equivalence structural rather than
    incidental)."""
    tok = tok.filter(F.col("th").isNotNull())
    votes = tok.groupBy("doc_id").agg(
        F.count("th").alias("nt"),
        *[
            F.sum(F.shiftright("th", bit).bitwiseAND(F.lit(1))).alias(f"o{bit}")
            for bit in range(_SIMHASH_BITS)
        ],
    )
    simhash = None
    for bit in range(_SIMHASH_BITS):
        term = F.when(
            F.col(f"o{bit}") * 2 >= F.col("nt"), F.lit(2**bit).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        simhash = term if simhash is None else simhash + term
    from bitcoinminingetl_spark.functions.state import ckpt

    sigs = ckpt(votes.select("doc_id", simhash.alias("simhash")))
    chunks = sigs.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk_id"),
                        F.shiftright("simhash", c * _CHUNK_BITS)
                        .bitwiseAND(F.lit(2**_CHUNK_BITS - 1))
                        .alias("chunk"),
                    )
                    for c in range(_SIMHASH_CHUNKS)
                ]
            )
        ).alias("cs"),
    ).select("doc_id", "simhash", "cs.chunk_id", "cs.chunk")
    pairs = (
        chunks.select(
            "chunk_id", "chunk", F.struct("doc_id", "simhash").alias("a")
        )
        .join(
            chunks.select(
                "chunk_id", "chunk", F.struct("doc_id", "simhash").alias("b")
            ),
            ["chunk_id", "chunk"],
        )
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
    )
    xor = F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    # first-matching-chunk test: for every chunk c' < this bucket's
    # chunk_id, the signatures must DIFFER in chunk c' (xor byte c'
    # nonzero) — otherwise the pair already surfaced in bucket c'.
    first_match = F.lit(True)
    for c in range(_SIMHASH_CHUNKS - 1):
        first_match = first_match & (
            (F.col("chunk_id") <= c)
            | (F.shiftright(xor, c * _CHUNK_BITS).bitwiseAND(
                F.lit(2**_CHUNK_BITS - 1)
            ) != 0)
        )
    return (
        pairs.select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(xor).alias("hamming"),
            first_match.alias("fm"),
        )
        .filter((F.col("hamming") <= _HAMMING_MAX) & F.col("fm"))
        .select("doc_a", "doc_b", "hamming")
    )


# Exact-variant threshold, set so the driver's sf0.01 fixture yields a
# non-empty, hashable pair set (the synthetic embeddings top out at
# cosine ~0.51 — a production-style 0.9 threshold matches zero pairs and
# makes the correctness row vacuous; measured: 26 pairs at sf0.01, 391
# at sf0.1 for 0.35).
_COSINE_THRESHOLD = 0.35
# LSH-variant threshold: the production near-dup setting the sign-bit
# amplification is tuned for (recall math in q_dedup_embed_cosine_lsh).
_COSINE_LSH_THRESHOLD = 0.9

# Left-fold dot product, identical evaluation order to Spark's
# zip_with + aggregate, so the doubles match bit-for-bit pre-rounding.
_DOT_SQL = (
    "list_reduce(list_transform(generate_series(1, len(a.embedding)), "
    "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)), "
    "(x, y) -> x + y)"
)


def _norm_sql(side: str) -> str:
    return (
        f"sqrt(list_reduce(list_transform(CAST({side}.embedding AS DOUBLE[]), "
        "v -> v * v), (x, y) -> x + y))"
    )


def _usable_norm_sql(side: str) -> str:
    """Oracle-side mirror of normed_embeddings' corrupt-vector
    exclusion: finite positive norm. Without it a NaN-component vector
    sails through the oracle's cosine filter — DuckDB (like Spark)
    compares NaN GREATER than any threshold — and every oracle pair set
    grows phantom corrupt pairs the Spark side excludes by doctrine
    (r8 adversarial sweep)."""
    return f"(isfinite({_norm_sql(side)}) AND {_norm_sql(side)} > 0)"


def _dot(x: Column, y: Column) -> Column:
    return F.aggregate(
        F.zip_with(x, y, lambda p, q: p.cast("double") * q.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(x: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(x, lambda v: v.cast("double") * v.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


_NORMED_EMB_CACHE: dict[str, DataFrame] = {}


def normed_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The embeddings table with its L2 norm attached, EXCLUDING
    zero-norm vectors — the shared load path of the cosine family
    (dedup / ANN / kNN / semantic decontamination / hybrid retrieval).

    Doctrine: a zero vector has no direction, so cosine against it is
    undefined — and under ANSI mode (Spark 4 default) the norm_a*norm_b
    division doesn't return NULL, it KILLS THE JOB. Real corpora contain
    zero embeddings (failed encoder calls, padded rows), so every
    cosine-dividing operator loads through this filter. The same goes
    for NON-FINITE vectors (a NaN or overflowing component — failed
    encoder output): their norm is NaN/Inf, and because Spark orders NaN
    GREATER than every value, `norm > 0` alone would wave them through
    into NaN cosines and ANSI-fatal decimal casts — hence the explicit
    finiteness bound. The test fixtures contain no corrupt vectors, so
    oracle rows are unchanged; the adversarial-corpus sweep
    (tests/test_adversarial.py) plants zero, NaN and 1e200-component
    vectors and asserts the family excludes them and survives.

    Persisted once per (session, corpus) and shared by all ~14 consumer
    sites (functions/cache.py) — the normalize-once snapshot a production
    pipeline materializes next to the raw embeddings at 100 TB. Without
    it every cosine-family query re-paid the scan + 64-dim norm fold."""
    key = f"{spark.sparkContext.applicationId}:{sf_dir}:normed_emb"
    return lru_persisted(
        _NORMED_EMB_CACHE,
        key,
        lambda: (
            table(spark, sf_dir, "embeddings")
            .withColumn("norm", _norm(F.col("embedding")))
            .filter(
                (F.col("norm") > 0) & (F.col("norm") < F.lit(float("inf")))
            )
        ),
    )


_EMB_LSH_TABLES = 6
_EMB_LSH_BITS = 4
_EMB_LSH_SEED = 11


def _emb_planes(dims: int = 64):
    """Deterministic hyperplanes for the near-dup sub-buckets: TABLES
    independent tables of BITS sign planes each (seeded numpy), embedded
    as plan literals so they broadcast by construction."""
    import numpy as np

    rng = np.random.default_rng(_EMB_LSH_SEED)
    return rng.standard_normal((_EMB_LSH_TABLES, _EMB_LSH_BITS, dims)).tolist()


@query(
    "q_dedup_embed_cosine",
    oracle=f"""
    WITH pairs AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label,
               {roundn_sql(f'{_DOT_SQL} / ({_norm_sql("a")} * {_norm_sql("b")})', 6)}
                   AS cosine
        FROM embeddings a JOIN embeddings b
          ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE {_usable_norm_sql("a")} AND {_usable_norm_sql("b")}
    )
    SELECT * FROM pairs WHERE cosine >= {_COSINE_THRESHOLD}
    """,
)
def q_dedup_embed_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs >= 0.35, EXACT within label
    blocks — the DuckDB-checkable ground truth of the embedding dedup
    family (generalizes reference row identity, data_model.py:32-33, to
    semantic identity).

    Blocking on `label` (the stand-in for any coarse clusterer at scale)
    makes within-block pairs O(n²/‖labels‖): the join is equi on label,
    so Catalyst plans a hash join and the quadratic term is per-block.
    This exact variant is the oracle twin — correct at any scale but
    block-quadratic; q_dedup_embed_cosine_lsh is the 100 TB path
    (sign-bit sub-buckets bound block size by bucket granularity).
    The threshold is 0.35 rather than a production-style 0.9 because the
    synthetic corpus tops out at cosine ~0.51 — at 0.9 the correctness
    row would be vacuously green on an empty set (round-3 VERDICT
    finding); at 0.35 the driver hashes a real pair set (26 pairs at
    sf0.01)."""
    emb = normed_embeddings(spark, sf_dir)
    a = emb.select(
        F.col("vec_id").alias("vec_a"),
        "label",
        F.col("embedding").alias("emb_a"),
        F.col("norm").alias("norm_a"),
    )
    b = emb.select(
        F.col("vec_id").alias("vec_b"),
        "label",
        F.col("embedding").alias("emb_b"),
        F.col("norm").alias("norm_b"),
    )
    cos = _dot(F.col("emb_a"), F.col("emb_b")) / (F.col("norm_a") * F.col("norm_b"))
    return (
        a.join(b, on="label")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            "label",
            # guard=False: zero norms filtered upstream so cosine is a
            # finite [-1,1] — keeps the HOF dot product single-eval
            roundn(cos, 6, guard=False).alias("cosine"),
        )
        .filter(F.col("cosine") >= _COSINE_THRESHOLD)
    )


def dedup_embed_cosine_lsh(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = _COSINE_LSH_THRESHOLD,
    bucket_udf=None,
    require_label: bool = False,
) -> DataFrame:
    """The 100 TB embedding near-dup path: label blocks sub-bucketed by
    multi-table sign-bit LSH, then EXACT cosine verification on
    candidates only. `threshold` defaults to the production near-dup
    setting 0.9 the amplification is tuned for (recall math below); the
    REGISTERED query passes the exact twin's demo threshold instead —
    see q_dedup_embed_cosine_lsh.

    Blocking on `label` alone leaves within-block pairs O(n²/‖labels‖) —
    quadratic at corpus scale when label cardinality is small. Here each
    vector gets TABLES=6 independent 4-bit sign buckets; a pair is a
    candidate iff it shares (label, bucket) in ANY table (OR-amplified
    LSH). Per-table bucketing caps block size at ~n/(‖labels‖·2^bits),
    so the pairwise term is bounded by bucket granularity, and bits/
    tables are the scale knobs. Candidates come from ONE groupBy per
    table (the _candidate_pairs rewrite — no self-join), then exact
    cosine re-scores candidates, so every emitted pair is exact.

    Recall: a true pair at cosine 0.9 (θ≈25.8°) agrees on one sign plane
    with p = 1-θ/180 ≈ 0.857, so it collides in one 4-bit table with
    p⁴ ≈ 0.54 and the 6-table OR misses it with (1-0.54)⁶ ≈ 1e-2 —
    one-sided error (candidates are a subset of the label-block pairs,
    every candidate exactly verified). Checked rows-only by design: the
    recall contract is probabilistic, so oracle-hash agreement against
    the exact pair set is not guaranteed; the planted-fixture test
    (test_embed_cosine_lsh_finds_planted_near_dups) pins recall on
    deterministic seeded planes, and a subset-of-exact test pins the
    one-sided error direction.

    ``bucket_udf`` swaps the sign-plane assignment (default: the seeded
    float planes below) so the md5-quantized oracle twin
    (q_dedup_embed_cosine_lsh_md5) runs the IDENTICAL plan — the same
    parametrization _knn_lsh_pairs uses. ``require_label`` drops
    NULL-label vectors up front: struct-grouping puts NULL labels in
    ONE sub-bucketed block (production behavior — unlabeled vectors
    still dedup against each other), but the oracle-hashed twins join
    blocks with SQL equality where NULL ≠ NULL, so the twin excludes
    them to keep both engines on the exact twin's equality semantics."""
    from pyspark.sql.functions import pandas_udf

    emb = normed_embeddings(spark, sf_dir)
    if require_label:
        emb = emb.filter(F.col("label").isNotNull())

    if bucket_udf is None:

        @pandas_udf("array<long>")
        def lsh_buckets(embedding: pd.Series) -> pd.Series:
            # All TABLES×BITS plane projections in ONE numpy matmul per
            # Arrow batch — the HOF-per-plane form evaluates 24
            # interpreted array aggregates per row and benches ~5×
            # slower at sf0.1.
            import numpy as np

            planes = np.asarray(_emb_planes())  # (T, B, D)
            t, b, d = planes.shape
            x = np.vstack(embedding.to_numpy())  # (n, D)
            bits = (x @ planes.reshape(t * b, d).T) >= 0  # (n, T*B)
            buckets = bits.reshape(len(x), t, b) @ (1 << np.arange(b))
            return pd.Series(list(buckets.astype("int64")))

        bucket_udf = lsh_buckets

    bands = (
        emb.select(
            F.col("vec_id").alias("doc_id"),
            "label",
            F.posexplode(bucket_udf(F.col("embedding"))).alias("band", "bucket"),
        )
        .select(
            "doc_id",
            "band",
            F.struct("label", "bucket").alias("sig"),
        )
    )
    cand = _candidate_pairs(bands).select(
        F.col("doc_a").alias("vec_a"), F.col("doc_b").alias("vec_b")
    )
    a = emb.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("emb_a"),
        F.col("norm").alias("norm_a"),
        F.col("label"),
    )
    b = emb.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("emb_b"),
        F.col("norm").alias("norm_b"),
    )
    cos = _dot(F.col("emb_a"), F.col("emb_b")) / (F.col("norm_a") * F.col("norm_b"))
    return (
        cand.join(a, on="vec_a")
        .join(b, on="vec_b")
        .select(
            "vec_a",
            "vec_b",
            "label",
            # guard=False: zero norms filtered upstream so cosine is a
            # finite [-1,1] — keeps the HOF dot product single-eval
            roundn(cos, 6, guard=False).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


@query("q_dedup_embed_cosine_lsh")  # rows-only: recall-bounded approximate plan
def q_dedup_embed_cosine_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup_embed_cosine_lsh REGISTERED at the exact twin's demo
    threshold (0.35, _COSINE_THRESHOLD) instead of the production 0.9
    (r7 VERDICT item 1): the synthetic corpus tops out at cosine ~0.51,
    so at 0.9 the driver's rows-only gate saw 0 rows and proved
    nothing. At the demo threshold the registered query emits a real
    pair set at sf0.01 AND becomes directly subset-comparable to
    q_dedup_embed_cosine on the driver fixtures (one-sided error: LSH
    can only miss, never invent — pinned by
    test_embed_cosine_lsh_subset_on_sf_fixture). The production-
    threshold behavior stays pinned by the planted-fixture recall test
    calling dedup_embed_cosine_lsh at its 0.9 default. Still rows-only
    by design: recall at the demo threshold (cos 0.35 -> per-plane
    agreement p=0.61, per-table p^4=0.14, 6-table OR ~0.60) is
    probabilistic, so oracle-hash agreement with the exact pair set is
    not guaranteed."""
    return dedup_embed_cosine_lsh(spark, sf_dir, threshold=_COSINE_THRESHOLD)


# --- md5-quantized twin of the sub-bucket machinery ----------------------

# Quantization scale for the md5-plane twin (the q_knn_join_lsh_md5
# doctrine, similarity.py): one double multiply + floor per element —
# IEEE-identical in numpy and DuckDB — then every bucket dot is exact
# int64 (max |dot| ~ 64 dims * 1e6 * 128 ≈ 8.2e9, far under the edge).
_EMB_Q_SCALE = 1_000_000.0
_EMB_FLOOR_SAFE = float(2**63)


def _emb_plane_ints() -> list[list[int]]:
    """(tables*bits) integer hyperplanes from md5 bytes (first byte of
    md5('embplane|t|b|d') - 128 ∈ [-128, 127]) — engine-portable by
    CONSTRUCTION: Python-computed constants embedded as literals in
    both the UDF closure and the DuckDB oracle text."""
    import hashlib

    return [
        [
            hashlib.md5(f"embplane|{t}|{b}|{d}".encode()).digest()[0] - 128
            for d in range(64)
        ]
        for t in range(_EMB_LSH_TABLES)
        for b in range(_EMB_LSH_BITS)
    ]


def _emb_bucket_udf_md5():
    """md5-plane twin of the default sign-bucket UDF — SAME Arrow-batched
    numpy matmul plan over exact int64 arithmetic: embeddings quantize
    to floor(v·1e6) int64 under the floor_long guard (overflow/NaN/Inf
    components contribute 0, identically in both engines), planes are
    small ints, so bucket assignment cannot disagree with the oracle's
    per-element list_reduce fold."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    planes = np.array(_emb_plane_ints(), dtype=np.int64)  # (T*B, 64)
    weights = (2 ** np.arange(_EMB_LSH_BITS)).astype(np.int64)

    @pandas_udf("array<long>")
    def buckets(embedding: pd.Series) -> pd.Series:
        import numpy as np

        V = np.vstack(embedding.to_numpy()).astype(np.float64)  # (n, D)
        X = V * _EMB_Q_SCALE
        ok = np.abs(X) < _EMB_FLOOR_SAFE  # False for NaN/Inf/overflow
        Q = np.floor(np.where(ok, X, 0.0)).astype(np.int64)
        bits = (Q @ planes.T >= 0).astype(np.int64)  # exact int64 dots
        per_table = bits.reshape(len(V), _EMB_LSH_TABLES, _EMB_LSH_BITS)
        return pd.Series(list(per_table @ weights))

    return buckets


def _emb_md5_bucket_sql(t: int) -> str:
    """DuckDB bucket expression for sub-bucket table `t` over the
    quantized vector column `q`: sum of 2^b sign bits of exact int64
    plane dots (mirrors _knn_md5_bucket_sql)."""
    planes = _emb_plane_ints()
    terms = []
    for b in range(_EMB_LSH_BITS):
        w = planes[t * _EMB_LSH_BITS + b]
        lit = "[" + ", ".join(str(x) for x in w) + "]"
        dot = (
            "list_reduce(list_transform(generate_series(1, len(q)), "
            f"i -> q[i] * ({lit})[i]), (x, y) -> x + y)"
        )
        terms.append(f"(CASE WHEN {dot} >= 0 THEN {2 ** b} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


# DuckDB twin of q_dedup_embed_cosine_lsh_md5: quantize -> per-table
# sign buckets -> candidates sharing (table, label, bucket) under the
# bucket cap -> exact decimal-rounded cosine verify at the demo
# threshold. Label blocks join with SQL equality (NULL labels excluded
# on both sides — see dedup_embed_cosine_lsh's require_label note).
_EMB_LSH_MD5_ORACLE = f"""
WITH base AS (
    SELECT e.vec_id, e.label, e.embedding FROM embeddings e
    WHERE {_usable_norm_sql('e')} AND e.label IS NOT NULL
),
qv AS (
    -- floor_long doctrine: scaled components at/past 2^63 (incl.
    -- NaN/Inf, which compare not-less-than the bound) quantize to 0 —
    -- matching the UDF's mask exactly; an unguarded CAST raises here
    SELECT vec_id, label,
           list_transform(CAST(embedding AS DOUBLE[]),
                          v -> CASE WHEN abs(v * {_EMB_Q_SCALE!r})
                                        < 9223372036854775808.0
                                    THEN CAST(floor(v * {_EMB_Q_SCALE!r})
                                              AS BIGINT)
                                    ELSE 0 END) AS q
    FROM base
),
bk AS (
    {' UNION ALL '.join(
        f"SELECT vec_id, label, {t} AS tbl, {{BKT{t}}} AS bkt FROM qv"
        for t in range(_EMB_LSH_TABLES)
    )}
),
bsz AS (
    SELECT tbl, label, bkt, count(*) AS g FROM bk GROUP BY 1, 2, 3
),
cand AS (
    SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
    FROM bk a
    JOIN bk b ON a.tbl = b.tbl AND a.label = b.label AND a.bkt = b.bkt
             AND a.vec_id < b.vec_id
    JOIN bsz z ON z.tbl = a.tbl AND z.label = a.label AND z.bkt = a.bkt
    WHERE z.g <= {_LSH_BUCKET_CAP}
),
scored AS (
    SELECT c.vec_a, c.vec_b, a.label,
           {roundn_sql(f'{_DOT_SQL} / ({_norm_sql("a")} * {_norm_sql("b")})', 6)}
               AS cosine
    FROM cand c
    JOIN embeddings a ON a.vec_id = c.vec_a
    JOIN embeddings b ON b.vec_id = c.vec_b
)
SELECT vec_a, vec_b, label, cosine FROM scored
WHERE cosine >= {_COSINE_THRESHOLD}
""".format(**{
    f"BKT{t}": _emb_md5_bucket_sql(t) for t in range(_EMB_LSH_TABLES)
})


@query("q_dedup_embed_cosine_lsh_md5", oracle=_EMB_LSH_MD5_ORACLE)
def q_dedup_embed_cosine_lsh_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-hashed twin of the embedding near-dup sub-bucket machinery:
    the EXACT label-block × multi-table sign-bucket × exact-verify
    composition of q_dedup_embed_cosine_lsh (same dedup_embed_cosine_lsh
    body, same _candidate_pairs groupBy skeleton, same bucket cap, same
    decimal-rounded cosine verify), with the float-order verdict
    eliminated the q_knn_join_lsh_md5 way: md5-derived integer planes ×
    floor(v·1e6)-quantized int64 embeddings make every bucket dot exact
    integer arithmetic, bit-identical to the DuckDB oracle's list_reduce
    fold. q_knn_join_lsh_md5 value-hashes the family's plane-bucket +
    re-rank skeleton; this twin value-hashes the machinery UNIQUE to the
    dedup member — the (label, bucket) struct sub-blocking and the
    candidate-pair verify against the label-quadratic exact twin's
    semantics. The seeded float planes stay the production path (no
    quantization pass on the hot scan); NULL-label vectors are excluded
    here to match the exact twin's SQL-equality block semantics (the
    production path keeps them in one block — require_label note)."""
    return dedup_embed_cosine_lsh(
        spark,
        sf_dir,
        threshold=_COSINE_THRESHOLD,
        bucket_udf=_emb_bucket_udf_md5(),
        require_label=True,
    )




@query(
    "q_corpus_dedup",
    oracle=f"""
    WITH canon AS (
        SELECT doc_id, md5(text) AS h,
               row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id)
                   AS rn
        FROM documents
    ),
    exact_survivors AS (SELECT doc_id FROM canon WHERE rn = 1),
    sh0 AS ({_SHINGLE_SQL}),
    kept AS (
        SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) <= {_DF_CAP}
    ),
    sh AS (SELECT sh0.doc_id, sh0.shingle FROM sh0 JOIN kept USING (shingle)),
    sizes AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY doc_id
    ),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    near_dups AS (
        SELECT DISTINCT doc_b AS doc_id
        FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE n_inter * 1.0 / (sa.n + sb.n - n_inter) >= {_JACCARD_THRESHOLD}
    )
    SELECT doc_id FROM exact_survivors
    WHERE doc_id NOT IN (SELECT doc_id FROM near_dups)
    """,
)
def q_corpus_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end corpus dedup pass a training-data pipeline actually
    materializes — composition of the stages the other q_dedup_* queries
    expose individually:

    1. exact stage: keep the lowest doc_id per content hash (md5) —
       one hash aggregate, removes byte-identical copies.
    2. near-dup stage: drop every survivor that is the HIGHER doc_id of
       a 3-gram Jaccard pair ≥ 0.3 in the SHARED guarded pair relation
       (pair_overlaps: stop-shingle df_cap=50 over the raw corpus, one
       persisted computation reused by the whole dedup family).

    The near-dup stage reads the full-corpus pair relation rather than
    re-deriving pairs over the survivor subset; this is sound because
    exact duplicates have identical shingle sets — if survivor S is a
    near-dup of dropped doc D, then S is an equal-Jaccard near-dup of
    D's surviving twin (the min doc_id of D's hash class, which is
    < D), so the same survivor is dropped either way, and pairs whose
    higher id is a non-survivor are no-ops under the anti-join. DF
    pruning over the raw corpus is also the better stop-shingle
    estimator: boilerplate frequency should not depend on the dedup
    stage. The DuckDB oracle applies the identical semantics (full-
    corpus cap + pair set, anti-joined onto the survivors).

    Output: the surviving doc_ids (the corpus you'd train on). At scale
    stage 2 swaps in the MinHash+LSH candidate generator
    (q_dedup_minhash_lsh) with identical keep-policy plumbing; the exact
    variant here is the DuckDB-checkable ground truth."""
    docs = table(spark, sf_dir, "documents")
    # keep-lowest per content hash as a MIN aggregate, not a row_number
    # window: the aggregate partial-combines map-side and never sorts,
    # where the window sorts every hash partition (same survivor set —
    # min doc_id ≡ rn=1 under ORDER BY doc_id)
    exact_survivors = (
        docs.groupBy(F.md5("text").alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    pairs = near_dup_pairs(pair_overlaps(spark, sf_dir, df_cap=_DF_CAP))
    near_dups = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    return exact_survivors.join(near_dups, on="doc_id", how="left_anti")


@query("q_corpus_dedup_lsh")  # rows-only: LSH signatures are engine-specific
def q_corpus_dedup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_corpus_dedup with its near-dup stage swapped for the 100 TB
    candidate generator — the composition a training-data pipeline
    actually ships:

    1. exact stage: keep the lowest doc_id per md5(content) hash.
    2. MinHash signatures -> banded LSH buckets -> candidate pairs
       (shuffle ~ O(docs x bands), never O(pairs)) -> exact-Jaccard
       verification on candidates only -> drop the higher doc_id of
       every verified pair >= 0.3.

    Rows-only check (signatures are engine-specific); the unit test
    asserts the planted byte-dup and near-dup are dropped and that the
    survivor set CONTAINS q_corpus_dedup's (LSH candidates are a subset
    of the exact pair set, so LSH can only drop fewer docs — the recall
    trade is one-sided and auditable)."""
    docs = table(spark, sf_dir, "documents")
    # min-aggregate keep-lowest (see q_corpus_dedup): no per-hash sort
    exact_survivors = (
        docs.groupBy(F.md5("text").alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    # NO broadcast hint: exact_survivors is corpus-cardinality (one row
    # per distinct text) — forcing it to every executor OOMs at the
    # 100 TB design point this operator exists for. AQE picks the build
    # side; at fixture scale it still broadcasts on its own.
    sh = shingle_index(spark, sf_dir).join(
        exact_survivors.select("doc_id"), "doc_id", "semi"
    )
    # UNFILTERED persist-once set relation: _verify_candidates INNER-
    # joins sets to the candidate list, and candidates only ever name
    # exact-stage survivors (bands come from the filtered index), while
    # a surviving doc's own shingle set / count is unchanged by the
    # doc-level filter — so pre-filtering sets is a semantic no-op that
    # would just re-run the exact_survivors aggregate twice more
    near_pairs = _verify_candidates(
        sh,
        _candidate_pairs(minhash_bands(sh)),
        sets=shingle_sets(spark, sf_dir),
    )
    near_dups = near_pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    return exact_survivors.select("doc_id").join(
        near_dups, on="doc_id", how="left_anti"
    )


# DuckDB twin of q_corpus_dedup_lsh_md5: the WHOLE shipped composition —
# md5(text) exact stage, md5-lane banded MinHash over the survivor
# shingles, bucket-cap'd candidates, exact-Jaccard verify, higher-id
# drop — in one value-hashed query (same band CTEs as
# _MINHASH_MD5_ORACLE, restricted to the exact-stage survivors).
_CORPUS_DEDUP_LSH_MD5_ORACLE = f"""
WITH canon AS (
    SELECT md5(text) AS h, min(doc_id) AS doc_id FROM documents GROUP BY 1
),
survivors AS (SELECT doc_id FROM canon),
sh0 AS ({_SHINGLE_SQL}),
sh AS (SELECT sh0.doc_id, sh0.shingle FROM sh0 JOIN survivors USING (doc_id)),
mh AS (
    SELECT doc_id,
           {', '.join(_minhash_md5_salt_sql(k) for k in range(_MINHASH_K))}
    FROM sh GROUP BY doc_id
),
bands AS (
    {' UNION ALL '.join(
        "SELECT doc_id, " + str(b) + " AS band, md5(concat_ws(',', "
        + ', '.join(
            f"mh{b * _ROWS_PER_BAND + r}" for r in range(_ROWS_PER_BAND)
        )
        + ")) AS sig FROM mh"
        for b in range(_BANDS)
    )}
),
bsz AS (SELECT band, sig, count(*) AS g FROM bands GROUP BY 1, 2),
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a
    JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
    JOIN bsz z ON z.band = a.band AND z.sig = a.sig
    WHERE z.g <= {_LSH_BUCKET_CAP}
),
sizes AS (
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY doc_id
),
inter AS (
    SELECT c.doc_a, c.doc_b, count(*) AS n_inter
    FROM cand c
    JOIN sh a ON a.doc_id = c.doc_a
    JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
    GROUP BY 1, 2
),
near_dups AS (
    SELECT DISTINCT doc_b AS doc_id
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE n_inter * 1.0 / (sa.n + sb.n - n_inter) >= {_JACCARD_THRESHOLD}
)
SELECT doc_id FROM survivors
WHERE doc_id NOT IN (SELECT doc_id FROM near_dups)
"""


@query("q_corpus_dedup_lsh_md5", oracle=_CORPUS_DEDUP_LSH_MD5_ORACLE)
def q_corpus_dedup_lsh_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-hashed twin of the SHIPPED composition (q_corpus_dedup_lsh):
    exact stage -> banded MinHash LSH candidates -> exact-Jaccard verify
    -> higher-id drop, end to end under one full value hash.

    q_dedup_minhash_md5 value-hashes the band/candidate/verify machinery
    in isolation; this twin value-hashes the COMPOSITION those stages
    ship inside — the survivor semi-join feeding the signature aggregate,
    the keep-policy anti-join consuming the verified pairs — so a wiring
    bug between stages (e.g. banding the pre-dedup corpus, or anti-
    joining on the wrong pair side) is caught by the oracle, not only by
    the planted-composition test. Same plan as the production path
    (q_corpus_dedup_lsh): min-aggregate exact stage, ONE groupBy band
    aggregate over the survivor shingles, _candidate_pairs'
    groupBy(band, sig) pair generation with the bucket cap,
    _verify_candidates on the hashed shingle index. md5-lane min-hashes
    (minhash_bands_md5) replace xxhash64 solely for engine portability;
    xxhash64 stays the production signature."""
    docs = table(spark, sf_dir, "documents")
    # min-aggregate keep-lowest (see q_corpus_dedup): no per-hash sort
    exact_survivors = (
        docs.groupBy(F.md5("text").alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    # bands draw from the UNHASHED survivor shingles (md5 lanes must see
    # the same strings DuckDB does); verification joins the shared
    # xxhash64 shingle index — set cardinalities agree (see _SHINGLE_SQL).
    # Both relations are the persist-once builds (r13: the string
    # shingles were an inline rebuild per twin).
    shs = shingle_strings(spark, sf_dir).join(
        exact_survivors.select("doc_id"), "doc_id", "semi"
    )
    sh = shingle_index(spark, sf_dir).join(
        exact_survivors.select("doc_id"), "doc_id", "semi"
    )
    # UNFILTERED persist-once set relation (see q_corpus_dedup_lsh:
    # the candidate inner join already restricts to survivors, and
    # per-doc sets/counts are invariant to the doc-level filter)
    near_pairs = _verify_candidates(
        sh,
        _candidate_pairs(minhash_bands_md5(shs)),
        sets=shingle_sets(spark, sf_dir),
    )
    near_dups = near_pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    return exact_survivors.select("doc_id").join(
        near_dups, on="doc_id", how="left_anti"
    )


_INCR_SPLIT_FRAC = 0.8  # stand-in: first 80% of doc_ids are "the corpus"

INCR_DEDUP_ORACLE = f"""
    WITH split AS (
        SELECT CAST(floor(max(doc_id) * {_INCR_SPLIT_FRAC}) AS BIGINT) AS cut
        FROM documents
    ),
    sh AS ({_SHINGLE_SQL}),
    sizes AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY doc_id
    ),
    inter AS (
        SELECT n.doc_id AS new_doc, c.doc_id AS corpus_doc, count(*) AS n_inter
        FROM sh n JOIN sh c ON n.shingle = c.shingle, split
        WHERE n.doc_id > split.cut AND c.doc_id <= split.cut
        GROUP BY 1, 2
    )
    SELECT new_doc, corpus_doc,
           {roundn_sql('n_inter * 1.0 / (sn.n + sc.n - n_inter)', 6)} AS jaccard
    FROM inter
    JOIN sizes sn ON sn.doc_id = new_doc
    JOIN sizes sc ON sc.doc_id = corpus_doc
    WHERE n_inter * 1.0 / (sn.n + sc.n - n_inter) >= {_JACCARD_THRESHOLD}
    """


@query("q_dedup_incremental", oracle=INCR_DEDUP_ORACLE)
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL dedup — the production shape: a batch of NEW documents
    (stand-in: the top 20% of doc_ids) checked against the EXISTING
    corpus index, never against itself. This is what a daily ingest
    actually runs; the full-corpus q_dedup_* passes are the bootstrap.

    The asymmetry is the scale win: the corpus side's shingle index is
    precomputed once and reused across batches (here both sides derive
    from one shingled relation — at 100 TB the corpus shingles live as a
    bucketed table keyed by shingle, so each increment joins without
    re-shuffling history). Join fan-out is |new shingles| x
    per-shingle corpus frequency, bounded by the same stop-shingle
    df_cap guard as the batch path when needed. Output: (new_doc,
    corpus_doc, jaccard) pairs >= 0.3 — the docs an ingest gate would
    reject or route to review."""
    docs = table(spark, sf_dir, "documents")
    cut = docs.agg(
        F.floor(F.max("doc_id") * _INCR_SPLIT_FRAC).cast("long").alias("cut")
    )
    sh = shingle_index(spark, sf_dir).join(F.broadcast(cut))
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    new_sh = sh.filter(F.col("doc_id") > F.col("cut")).select(
        F.col("doc_id").alias("new_doc"), "shingle"
    )
    corpus_sh = sh.filter(F.col("doc_id") <= F.col("cut")).select(
        F.col("doc_id").alias("corpus_doc"), "shingle"
    )
    inter = (
        new_sh.join(corpus_sh, "shingle")
        .groupBy("new_doc", "corpus_doc")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.join(
            sizes.select(F.col("doc_id").alias("new_doc"), F.col("n_sh").alias("n_n")),
            "new_doc",
        )
        .join(
            sizes.select(
                F.col("doc_id").alias("corpus_doc"), F.col("n_sh").alias("n_c")
            ),
            "corpus_doc",
        )
        # raw-ratio predicate, rounded report — see near_dup_pairs
        .filter(
            F.col("n_inter") * 1.0
            / (F.col("n_n") + F.col("n_c") - F.col("n_inter"))
            >= _JACCARD_THRESHOLD
        )
        .select(
            "new_doc",
            "corpus_doc",
            roundn(
                F.col("n_inter") * 1.0 / (F.col("n_n") + F.col("n_c") - F.col("n_inter")),
                6,
            ).alias("jaccard"),
        )
    )


@query(
    "q_source_overlap_matrix",
    oracle=f"""
    WITH sh0 AS ({_SHINGLE_SQL}),
    kept AS (
        SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) <= {_DF_CAP}
    ),
    sh AS (SELECT sh0.doc_id, sh0.shingle FROM sh0 JOIN kept USING (shingle)),
    sizes AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY doc_id
    ),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT doc_a, doc_b
        FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE n_inter * 1.0 / (sa.n + sb.n - n_inter) >= {_JACCARD_THRESHOLD}
    )
    SELECT least(da.source, db.source) AS source_lo,
           greatest(da.source, db.source) AS source_hi,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM pairs
    JOIN documents da ON da.doc_id = doc_a
    JOIN documents db ON db.doc_id = doc_b
    GROUP BY source_lo, source_hi
    """,
)
def q_source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix — the corpus-governance question
    ("how much does source A duplicate source B?") asked before choosing
    mix weights: near-dup pairs (the df_cap-guarded exact Jaccard pass)
    rolled up by unordered source pair. A heavy diagonal means
    within-source redundancy (dedup there first); heavy off-diagonal
    cells mean two feeds crawl the same content and one should be
    down-weighted or decontaminated against the other.

    Plan: everything heavy is the shared persisted pair relation
    (pair_overlaps), already guarded and computed once per corpus. The
    source lookups join the pair relation (orders of magnitude smaller
    than the corpus) against the (doc_id, source) projection — the pair
    side is the SMALL/build side, so no hint is given: AQE broadcasts
    the pair side when it fits and falls back to a shuffled hash join
    keyed on doc_id otherwise. (A broadcast hint on the docs projection
    — corpus cardinality — would OOM at 100 TB.) The rollup aggregates
    |sources|² rows at most."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "source")
    pairs = near_dup_pairs(pair_overlaps(spark, sf_dir, df_cap=_DF_CAP))
    sa = docs.select(
        F.col("doc_id").alias("doc_a"), F.col("source").alias("src_a")
    )
    sb = docs.select(
        F.col("doc_id").alias("doc_b"), F.col("source").alias("src_b")
    )
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .groupBy(
            F.least("src_a", "src_b").alias("source_lo"),
            F.greatest("src_a", "src_b").alias("source_hi"),
        )
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
