"""Hypothesis fuzz parity: `_algo.fit_variable` vs the reference, cell-for-cell.

The golden tests (test_fit_parity.py) cover hand-built fixtures; this fuzzes
the whole parameter x data space — distinct-value counts from degenerate to
wide, NaN fractions, flat and steep target gradients, both monotonic
directions, thresholds from permissive to aggressive — and demands exact
agreement (1e-9 relative) with the reference on every draw, including quirks
Q1-Q12.  Pure pandas on both sides (no Spark session), so hundreds of cases
run in seconds; tests/test_fit_parity.py proves the Spark path feeds
`fit_variable` the same summaries.
"""

from __future__ import annotations

import warnings

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from woe_monotonic_binning_spark._algo import FitParams, fit_variable

from tests._reference import load_reference
from tests.test_fit_parity import assert_bins_equal
from tests.test_properties import summary_of

ref = load_reference()
pytestmark = pytest.mark.skipif(ref is None, reason="reference library not available")


@st.composite
def binning_case(draw):
    n = draw(st.integers(min_value=40, max_value=1500))
    k = draw(st.integers(min_value=1, max_value=40))
    seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
    nan_frac = draw(st.sampled_from([0.0, 0.0, 0.05, 0.15]))
    steep = draw(st.sampled_from([0.0, 0.1, 0.35, -0.25]))
    base = draw(st.floats(min_value=0.05, max_value=0.6))
    n_threshold = draw(st.sampled_from([1, 5, 25, 100]))
    p_threshold = draw(st.sampled_from([0.05, 0.1, 0.35]))
    n_occurences = draw(st.sampled_from([1, 1, 2]))
    merge_threshold = draw(st.sampled_from([None, None, 0.15]))

    rng = np.random.default_rng(seed)
    x = rng.integers(0, k, n).astype(float)
    if nan_frac:
        x[rng.random(n) < nan_frac] = np.nan
    p = np.clip(base + steep * (np.nan_to_num(x) - k / 2) / max(k, 1), 0.02, 0.98)
    target = (rng.random(n) < p).astype(int)
    pdf = pd.DataFrame({"x": x, "target": target})
    params = dict(
        n_threshold=n_threshold,
        n_occurences=n_occurences,
        p_threshold=p_threshold,
        merge_threshold=merge_threshold,
    )
    return pdf, params


@settings(max_examples=150, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(binning_case())
def test_fit_variable_matches_reference(case):
    pdf, params = case
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # reference idxmax FutureWarning (Q9)
        expected = ref.woe_binning(
            "target",
            pdf[["x", "target"]],
            params["n_threshold"],
            n_occurences=params["n_occurences"],
            p_threshold=params["p_threshold"],
            merge_threshold=params["merge_threshold"],
        )
    got = fit_variable(
        summary_of(pdf, "x"),
        FitParams(
            n_threshold=params["n_threshold"],
            n_occurences=params["n_occurences"],
            p_threshold=params["p_threshold"],
            merge_threshold=params["merge_threshold"],
        ),
    )
    assert_bins_equal(got, expected, f"fuzz{params}")
