"""MLlib packaging tests: Estimator/Model behavior, persistence, pipelines."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from woe_monotonic_binning_spark import WOEBinner, WOEBinnerModel, apply_bins, fit_bins

FEATURES = ["l_extendedprice", "l_quantity", "l_discount"]


@pytest.fixture(scope="module")
def li(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .withColumn("target", (F.col("l_returnflag") == "R").cast("double"))
        .cache()
    )


@pytest.fixture(scope="module")
def model(li):
    binner = WOEBinner(
        targetCol="target", inputCols=FEATURES, nThreshold=100.0,
        ivThreshold=0.0, keepCols=["l_orderkey"],
    )
    return binner.fit(li)


def test_fit_matches_functional_api(li, model):
    expected = fit_bins(li, "target", FEATURES, n_threshold=100).toPandas()
    got = model.binsTable.toPandas()
    key = ["variable", "interval_start_include"]
    expected = expected.sort_values(key).reset_index(drop=True)
    got = got.sort_values(key).reset_index(drop=True)
    assert list(got.columns) == list(expected.columns)
    assert len(got) == len(expected)
    for c in got.columns:
        if c == "variable":
            assert (got[c] == expected[c]).all()
        else:
            import numpy as np

            a, e = got[c].to_numpy(float), expected[c].to_numpy(float)
            same = (a == e) | (np.isnan(a) & np.isnan(e))
            assert (same | (np.abs(a - e) <= 1e-12)).all(), c


def test_transform_matches_apply_bins(li, model):
    expected = apply_bins(
        li, model.binsTable, iv_threshold=0.0, keep_columns=["l_orderkey"]
    )
    got = model.transform(li)
    assert got.columns == expected.columns
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0


def test_transform_output_columns(li, model):
    cols = model.transform(li).columns
    assert cols[0] == "l_orderkey"
    assert all(c.endswith("_bin") for c in cols[1:])


def test_model_save_load_roundtrip(tmp_path, li, model, spark):
    path = str(tmp_path / "woe_model")
    model.write().overwrite().save(path)
    loaded = WOEBinnerModel.load(path)
    assert loaded.uid == model.uid
    assert loaded.getOrDefault(loaded.ivThreshold) == 0.0
    assert loaded.getOrDefault(loaded.keepCols) == ["l_orderkey"]
    assert (
        loaded.binsTable.orderBy("variable", "interval_start_include").collect()
        == model.binsTable.orderBy("variable", "interval_start_include").collect()
    )
    assert loaded.transform(li).columns == model.transform(li).columns


def test_estimator_save_load_roundtrip(tmp_path):
    binner = WOEBinner(targetCol="t", inputCols=["a", "b"], pThreshold=0.2)
    path = str(tmp_path / "woe_est")
    binner.write().overwrite().save(path)
    loaded = WOEBinner.load(path)
    assert loaded.getTargetCol() == "t"
    assert loaded.getInputCols() == ["a", "b"]
    assert loaded.getOrDefault(loaded.pThreshold) == pytest.approx(0.2)


def test_pipeline_composition(li):
    from pyspark.ml import Pipeline
    from pyspark.ml.feature import VectorAssembler

    binner = WOEBinner(
        targetCol="target", inputCols=FEATURES, nThreshold=100.0,
        ivThreshold=0.0, keepCols=["target"],
    )
    # at sf0.001 only l_extendedprice survives the 2-bin gate
    assembler = VectorAssembler(
        inputCols=["l_extendedprice_bin"], outputCol="features"
    )
    pipe_model = Pipeline(stages=[binner, assembler]).fit(li)
    out = pipe_model.transform(li)
    assert "features" in out.columns
    row = out.select("features").first()
    assert len(row["features"]) == 1


def test_total_iv(model):
    ivs = {r["variable"]: r["iv_total"] for r in model.totalIv().collect()}
    assert set(ivs) == set(FEATURES)
    assert all(v >= 0 or v != v for v in ivs.values())


def test_model_drift_methods_match_functional_api(li, model):
    from woe_monotonic_binning_spark.drift import (
        characteristic_stability,
        psi_report,
        psi_summary,
    )

    recent = li.filter(F.col("l_quantity") > 25)
    via_model = psi_summary(model.psi(li, recent)).toPandas().sort_values("variable")
    direct = (
        psi_summary(psi_report(li, recent, model.binsTable, iv_threshold=0.0))
        .toPandas()
        .sort_values("variable")
    )
    assert list(via_model["variable"]) == list(direct["variable"])
    assert (via_model["psi"].to_numpy() == direct["psi"].to_numpy()).all()
    # identical populations through the model read stable
    self_psi = psi_summary(model.psi(li, li)).toPandas()
    assert (self_psi["status"] == "stable").all()
    cs = model.characteristicStability(li).toPandas()
    want = characteristic_stability(
        li, model.binsTable, "target", iv_threshold=0.0
    ).toPandas()
    key = ["variable", "bin"]
    cs, want = cs.sort_values(key), want.sort_values(key)
    assert (cs["n"].to_numpy() == want["n"].to_numpy()).all()
    fitted = cs[cs["bucket"] == "bin"]
    assert (fitted["woe_actual"] - fitted["woe_fitted"]).abs().max() < 1e-9
