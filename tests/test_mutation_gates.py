"""Mutation checks on the planted-test gates (r7 VERDICT stretch 7).

The driver hash-checks only an alphabetical window of queries; outside
it, correctness rests on planted/property tests. A planted test only
protects anything if it actually goes RED when the operator under it
breaks — a gate that stays green under a broken threshold is worse than
no gate (it certifies nothing while looking like coverage). Each check
here applies a deliberate, realistic regression (flip a threshold the
query reads at call time), asserts the named planted test FAILS, then
restores the constant and asserts the test passes again — mutation
testing the gates themselves, run on every pytest rather than as a
one-off.

Mechanics: the query functions read their module-level thresholds at
CALL time (plan construction), so monkeypatching the module global and
re-invoking the registered query is exactly the regression a bad edit
would produce. Only the Spark side is mutated — the DuckDB oracle
strings were baked at import — which is fine: every gate mutated here
is a planted/property test that never consults the oracle.
"""

from __future__ import annotations

import pytest

import bitcoinminingetl_spark.operators.dedup as dedup_mod
import bitcoinminingetl_spark.operators.text as text_mod

# underscore aliases so pytest does not re-collect the imported planted
# tests as members of THIS module (they already run in test_llm_ops)
from tests.test_llm_ops import (
    test_embed_cosine_lsh_subset_on_sf_fixture as _gate_embed_lsh_subset,
)
from tests.test_llm_ops import (
    test_k_anonymity_planted as _gate_k_anonymity,
)
from tests.test_llm_ops import (
    test_minhash_candidates_subset_of_exact as _gate_minhash_subset,
)


def _mutated(module, name, value):
    """Context manager: set module.name = value, restore on exit."""
    import contextlib

    @contextlib.contextmanager
    def cm():
        orig = getattr(module, name)
        setattr(module, name, value)
        try:
            yield
        finally:
            setattr(module, name, orig)

    return cm()


def test_k_anonymity_gate_goes_red_on_threshold_flip(spark, tmp_path):
    """Flip _K_ANON to 1: with the strict < comparison nothing can
    violate, so the planted release's 2 violating classes read 0 and
    the gate must fail. Restored, it must pass."""
    red = tmp_path / "red"
    red.mkdir()
    with _mutated(text_mod, "_K_ANON", 1):
        with pytest.raises(AssertionError):
            _gate_k_anonymity(spark, red)
    green = tmp_path / "green"
    green.mkdir()
    _gate_k_anonymity(spark, green)


def test_embed_lsh_gate_goes_red_on_threshold_flip(spark, sf_dir):
    """Raise the registered demo threshold past the corpus ceiling
    (~0.51): the registered LSH query goes back to the 0-row vacuity
    r7 VERDICT item 1 flagged, and the non-vacuity gate must fail."""
    with _mutated(dedup_mod, "_COSINE_THRESHOLD", 0.99):
        with pytest.raises(AssertionError):
            _gate_embed_lsh_subset(spark, sf_dir)
    _gate_embed_lsh_subset(spark, sf_dir)


def test_minhash_gate_goes_red_on_threshold_flip(spark, sf_dir):
    """Push the Jaccard verification threshold above 1.0: even the
    planted byte-identical duplicates (jaccard exactly 1.0) fail
    verification, the LSH pair set empties, and the planted-dup gate
    must fail."""
    with _mutated(dedup_mod, "_JACCARD_THRESHOLD", 1.01):
        with pytest.raises(AssertionError):
            _gate_minhash_subset(spark, sf_dir)
    _gate_minhash_subset(spark, sf_dir)
