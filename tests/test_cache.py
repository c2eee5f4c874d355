"""Unit tests for functions/cache.py — the shared LRU persist-once policy
behind the corpus-artifact stack (shingle index, pair overlaps, normed
embeddings, bigram model, resample aggregate). The operator-level behavior
is covered by those families' own suites; this pins the cache mechanics
every family now inherits: build-once, hit-reuse, LRU (not clear-all)
eviction, and unpersist-on-evict."""

from __future__ import annotations

from bitcoinminingetl_spark.functions.cache import lru_persisted


def _is_persisted(df) -> bool:
    lvl = df.storageLevel
    return lvl.useMemory or lvl.useDisk


def test_build_once_and_hit_reuse(spark):
    cache: dict = {}
    builds = []

    def build(tag):
        def _b():
            builds.append(tag)
            return spark.range(5).toDF(tag)

        return _b

    a1 = lru_persisted(cache, "a", build("a"))
    a2 = lru_persisted(cache, "a", build("a"))
    assert a1 is a2, "hit must return the SAME persisted relation"
    assert builds == ["a"], "builder runs once per key"
    assert _is_persisted(a1)
    a1.unpersist()


def test_lru_evicts_oldest_not_most_recent(spark):
    cache: dict = {}
    # distinct row counts per key: Spark's cache manager matches by
    # CANONICALIZED plan (alias names normalized away), so range(3)
    # relations named differently would share ONE cache entry and
    # persisting a later key would resurrect an evicted one
    sizes = {"a": 1, "b": 2, "c": 3}

    def mk(key):
        return lru_persisted(
            cache, key, lambda: spark.range(sizes[key]).toDF(key), cap=2
        )

    a, b = mk("a"), mk("b")
    mk("a")  # refresh a's LRU position: b is now oldest
    c = mk("c")  # cap hit -> evicts b, NOT a (the clear-all bug this replaces)
    assert set(cache) == {"a", "c"}
    assert _is_persisted(a), "most-recently-used entry must survive eviction"
    assert not _is_persisted(b), "evicted entry must be unpersisted"
    for df in (a, c):
        df.unpersist()


def test_distinct_keys_distinct_relations(spark):
    cache: dict = {}
    a = lru_persisted(cache, "k1", lambda: spark.range(1).toDF("x"))
    b = lru_persisted(cache, "k2", lambda: spark.range(2).toDF("x"))
    assert a is not b
    assert a.count() == 1 and b.count() == 2
    for df in (a, b):
        df.unpersist()
