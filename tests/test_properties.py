"""Property tests (SURVEY.md section 5 strategy 3) over random inputs."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from woe_monotonic_binning_spark import _algo
from woe_monotonic_binning_spark._algo import FitParams


def summary_of(pdf: pd.DataFrame, col: str) -> _algo.GroupSummary:
    sub = pdf[[col, "target"]]
    g = sub.dropna().groupby(col)["target"]
    agg = g.agg(size="size", bads="sum")
    sumsq = g.apply(lambda s: float((s.astype(float) ** 2).sum()))
    nan_mask = sub[col].isna()
    return _algo.GroupSummary(
        variable=col,
        values=agg.index.to_numpy(dtype=float),
        sizes=agg["size"].to_numpy(dtype=float),
        bads=agg["bads"].to_numpy(dtype=float),
        sumsq=sumsq.to_numpy(dtype=float),
        nan_size=float(nan_mask.sum()),
        nan_bads=float(sub.loc[nan_mask, "target"].sum()),
    )


@pytest.mark.parametrize("seed", range(8))
def test_fit_invariants(seed):
    rng = np.random.default_rng(seed)
    n = 3000
    x = rng.integers(0, 30, n).astype(float)
    if seed % 2:
        x[rng.random(n) < 0.04] = np.nan
    p = 1 / (1 + np.exp(-(x - 15) / 4))
    p = np.where(np.isnan(x), 0.3, p)
    target = (rng.random(n) < np.clip(p, 0.05, 0.95)).astype(int)
    pdf = pd.DataFrame({"x": x, "target": target})
    s = summary_of(pdf, "x")
    n_thr = 150
    bins = _algo.fit_variable(s, FitParams(n_threshold=n_thr))

    regular = bins[~bins.interval_start_include.isna()]
    # bin means strictly monotonic in table order
    means = regular["mean"].to_numpy()
    assert (np.diff(means) < 0).all()
    # sizes account for every row
    assert bins["size"].sum() == pytest.approx(n)
    assert regular["size"].sum() == pytest.approx(np.sum(~np.isnan(x)))
    # woe identity and iv non-negativity
    w = np.log(bins.dist_bad / bins.dist_good)
    ok = np.isclose(w, bins.woe, rtol=1e-12, equal_nan=True) | (
        np.isinf(w) & np.isinf(bins.woe)
    )
    assert ok.all()
    assert (bins.iv_components.to_numpy() >= -1e-15).all()
    # non-edge bins respect the size threshold (single-bin tables exempt)
    if len(regular) > 1:
        assert (regular["size"].to_numpy() >= min(n_thr, regular["size"].max())).any()
    # intervals tile the real line without gaps
    starts = regular.interval_start_include.to_numpy()
    ends = regular.interval_end_exclude.to_numpy()
    if len(regular) > 1:
        assert np.isinf(starts[0]) or np.isinf(ends[0])
        inner_start = starts[1:] if abs(starts[0]) == math.inf else starts[:-1]
        inner_end = ends[:-1] if abs(ends[-1]) == math.inf else ends[1:]
        assert np.allclose(np.sort(inner_start), np.sort(inner_end))


def test_constant_column_single_bin():
    pdf = pd.DataFrame({"x": np.ones(500), "target": (np.arange(500) % 3 == 0).astype(int)})
    bins = _algo.fit_variable(summary_of(pdf, "x"), FitParams(n_threshold=25))
    assert len(bins) == 1
    assert bins.woe.iloc[0] == 0.0
    assert bins.iv_components.iloc[0] == 0.0
    assert np.isinf(bins.interval_start_include.iloc[0]) or np.isinf(
        bins.interval_end_exclude.iloc[0]
    )


def test_direction_detection_pro_rata():
    # decreasing bad rate in x => ascending table starts at -inf
    rng = np.random.default_rng(7)
    x = rng.integers(0, 10, 2000).astype(float)
    target = (rng.random(2000) < (0.8 - 0.07 * x)).astype(int)
    s = summary_of(pd.DataFrame({"x": x, "target": target}), "x")
    assert _algo.detect_direction(s) is True
    target2 = (rng.random(2000) < (0.1 + 0.07 * x)).astype(int)
    s2 = summary_of(pd.DataFrame({"x": x, "target": target2}), "x")
    assert _algo.detect_direction(s2) is False
