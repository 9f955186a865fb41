"""tools/oracle_sweep.py compare_fast canonicalisation rules (round-11
advice: int64 above 2^53 must canonicalise EXACTLY, not through float64,
or two distinct hash values could false-PASS the sf1 sweep)."""

from __future__ import annotations

import importlib.util
import os

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def sweep():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "oracle_sweep", os.path.join(repo, "tools", "oracle_sweep.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_large_int64_mismatch_is_caught(sweep):
    """The exact advice scenario: two int64 hashes differing only below
    float64 precision (2^53 + 1 vs 2^53 + 2) must NOT compare equal."""
    a = pd.DataFrame({"h": pd.array([2**53 + 1], dtype="int64")})
    b = pd.DataFrame({"h": pd.array([2**53 + 2], dtype="int64")})
    assert sweep.compare_fast(a, b, "q")  # non-empty problems
    assert not sweep.compare_fast(a, a.copy(), "q")


def test_int_vs_equal_double_still_matches(sweep):
    """Driver parity: _normalise's tuple equality treats int 5 == float
    5.0 as equal (a BIGINT sum vs a DOUBLE sum), so representable ints
    keep the float render."""
    a = pd.DataFrame({"v": pd.array([5, -3, 0], dtype="int64")})
    b = pd.DataFrame({"v": [5.0, -3.0, -0.0]})  # -0.0 folds to 0.0
    assert not sweep.compare_fast(a, b, "q")


def test_object_ints_and_decimals(sweep):
    """DuckDB HUGEINT/DECIMAL arrive as object columns: huge python ints
    render exactly; integral Decimals match their int/float twins;
    fractional Decimals follow the round-9 float rule."""
    import decimal

    a = pd.DataFrame({"v": pd.Series([2**64 + 1, 7, None], dtype="object")})
    b = pd.DataFrame({"v": pd.Series([2**64 + 1, 7, None], dtype="object")})
    assert not sweep.compare_fast(a, b, "q")
    c = pd.DataFrame({"v": pd.Series([2**64 + 2, 7, None], dtype="object")})
    assert sweep.compare_fast(a, c, "q")
    d = pd.DataFrame(
        {"v": pd.Series([decimal.Decimal("5.00"), decimal.Decimal("2.5")], dtype="object")}
    )
    e = pd.DataFrame({"v": [5.0, 2.5]})
    assert not sweep.compare_fast(d, e, "q")


def test_float_rule_unchanged(sweep):
    """Genuine floats still round to 9dp with the -0.0 fold and the NULL
    sentinel."""
    a = pd.DataFrame({"v": [1.0000000001, -0.0, float("nan")]})
    b = pd.DataFrame({"v": [1.0000000001, 0.0, None]})
    assert not sweep.compare_fast(a, b, "q")
    c = pd.DataFrame({"v": [1.001, 0.0, None]})
    assert sweep.compare_fast(a, c, "q")


def test_certified_jaccard_recipes_stay_bounded():
    """Round-12 re-base pin: the certified q_dedup_ngram, q_dedup_cluster
    and q_curation_pipeline bodies must block the exact-Jaccard self-join
    on lang + blk (doc_id%50) — lang-only blocking is quadratic by
    construction one decade up (sf1: the en block alone is ~212M pairs),
    and certified recipes are what users copy.  Checks both the Spark
    bodies (AST: every ngram_jaccard_pairs call in those functions passes
    ['lang', 'blk']) and the oracle twins (SQL: the pair join carries the
    a.blk = b.blk conjunct)."""
    import ast
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "queries_catalog.py")) as f:
        tree = ast.parse(f.read())
    targets = {"q_dedup_ngram", "q_dedup_cluster", "q_curation_pipeline"}
    seen = set()
    for node in ast.walk(tree):
        if not (isinstance(node, ast.FunctionDef) and node.name in targets):
            continue
        for c in ast.walk(node):
            if (
                isinstance(c, ast.Call)
                and isinstance(c.func, ast.Name)
                and c.func.id == "ngram_jaccard_pairs"
            ):
                seen.add(node.name)
                blocks = next(
                    (a for a in c.args if isinstance(a, ast.List)), None
                )
                assert blocks is not None, f"{node.name}: block_cols not a literal list"
                names = [getattr(e, "value", None) for e in blocks.elts]
                assert names == ["lang", "blk"], (
                    f"{node.name}: certified recipe blocks on {names}, not the "
                    "bounded ['lang', 'blk'] key (round-12 re-base)"
                )
    assert seen == targets

    import sys

    sys.path.insert(0, repo)
    import queries_catalog as qc

    for name in ("q_dedup_ngram", "q_dedup_cluster", "q_curation_pipeline"):
        sql = qc.ORACLE_SQL[name]
        assert "a.blk = b.blk" in sql, f"{name}: oracle twin lost the blk conjunct"
        assert "doc_id % 50" in sql, f"{name}: oracle twin lost the doc_id%50 key"


def test_nullable_int64_with_pd_na(sweep):
    """Round-12 advice: a pandas nullable Int64 column carrying pd.NA must
    flow to the <NULL> sentinel (na_action='ignore'), not TypeError inside
    canon_int's float(i)."""
    a = pd.DataFrame({"v": pd.array([5, None, 2**53 + 1], dtype="Int64")})
    b = pd.DataFrame({"v": pd.array([5, None, 2**53 + 1], dtype="Int64")})
    assert not sweep.compare_fast(a, b, "q")
    c = pd.DataFrame({"v": pd.array([5, None, 2**53 + 2], dtype="Int64")})
    assert sweep.compare_fast(a, c, "q")
    # NULL on one side only is a mismatch, not a crash
    d = pd.DataFrame({"v": pd.array([5, 6, 2**53 + 1], dtype="Int64")})
    assert sweep.compare_fast(a, d, "q")


def test_float_render_is_python_float_repr(sweep):
    """Round-12 advice: the float branch must render via repr(float(x)),
    not repr(np.float64(x)) — under numpy >= 2 the latter is
    'np.float64(5.0)' and would spuriously mismatch the int branch's
    Python-float render.  Assert the render strings directly so the pin
    holds regardless of the numpy version installed."""
    import numpy as np

    ints = sweep._canon_col(pd.Series([5, -3], dtype="int64"))
    floats = sweep._canon_col(pd.Series(np.array([5.0, -3.0], dtype="float64")))
    assert list(ints) == list(floats) == ["5.0", "-3.0"]
