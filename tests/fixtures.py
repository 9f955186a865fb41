"""Deterministic binning fixtures (FIXTURES.md A1), seed=42."""

from __future__ import annotations

import numpy as np
import pandas as pd


def make_binning_input(n: int = 10_000, seed: int = 42) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    x_mono_up = rng.integers(0, 20, size=n).astype(np.float64)
    p_up = 1.0 / (1.0 + np.exp(-(x_mono_up - 10.0) / 3.0))
    # target driven mostly by x_mono_up; bad rate ~0.4 overall
    target = (rng.random(n) < 0.2 + 0.55 * p_up).astype(np.int64)

    x_mono_down = 19.0 - x_mono_up + rng.integers(0, 3, size=n).astype(np.float64)
    x_noise = rng.standard_normal(n)
    x_const = np.ones(n)

    x_with_nan = x_mono_up.copy()
    x_with_nan[rng.random(n) < 0.05] = np.nan

    x_sep = x_mono_up.copy()
    sep_mask = rng.random(n) < 0.08
    x_sep[sep_mask] = -999.0

    x_few = rng.choice([1.0, 2.0, 3.0], size=n, p=[0.5, 0.3, 0.2])

    x_tiny = rng.integers(0, 40, size=n).astype(np.float64)
    # thin out a few values so they fall below n_threshold
    thin = np.isin(x_tiny, [37, 38, 39]) & (rng.random(n) < 0.97)
    x_tiny[thin] = rng.integers(0, 37, size=int(thin.sum())).astype(np.float64)

    return pd.DataFrame(
        {
            "row_id": np.arange(n, dtype=np.int64),
            "target": target,
            "x_mono_up": x_mono_up,
            "x_mono_down": x_mono_down,
            "x_noise": x_noise,
            "x_const": x_const,
            "x_with_nan": x_with_nan,
            "x_sep": x_sep,
            "x_few": x_few,
            "x_tiny_bins": x_tiny,
        }
    )


def reset_store_tables(spark, *tables: str) -> None:
    """DROP IF EXISTS plus remove the table's managed warehouse directory.

    An interrupted previous run (driver window timeout, killed JVM) leaves a
    managed table's LOCATION on disk while a fresh session's catalog has
    never heard of the table — so ``DROP TABLE IF EXISTS`` alone is a no-op
    and the next ``saveAsTable`` fails with LOCATION_ALREADY_EXISTS (the
    round-18 inherited breakage).  Tests that use fixed table names reset
    through this helper instead.
    """
    import shutil
    from pathlib import Path

    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    wh_path = Path(wh.removeprefix("file:"))
    for t in tables:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        loc = wh_path / t.split(".")[-1].lower()
        if loc.exists():
            shutil.rmtree(loc, ignore_errors=True)
