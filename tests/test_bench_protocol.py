"""Bench-host protocol checks (bench.py).

The rep_spread re-run adjudication (BASELINE.md protocol) never fired in
rounds 6-7 because no query left its band; the round-7 verdict (#7) asks
for proof the mechanism still works.  This drives the real bench binary
from a copy directory seeded with a doctored prior artifact, so the flag
-> fresh-process re-run -> "rerun" record path executes end to end.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest


# headline -> the public package functions its body MUST call.  This is
# the anti-drift pin the round-9 verdict asked for: the round-8 bench had
# silently hand-rolled the curation stages (dropping scrub) instead of
# calling curate_corpus, and only that one body was protocol-tested.  If a
# future edit inlines operator logic in ANY headline body, the required
# public call disappears from its AST and this fails.
REQUIRED_PUBLIC_CALLS = {
    "fit_batch": {"fit_bins"},
    "transform": {"apply_bins"},
    "transform_count": {"apply_bins"},
    "dedup_digest": {"exact_dedup_by_digest"},
    "dedup_minhash": {"minhash_dedup_pairs"},
    "sim_search": {"brute_force_topk"},
    "text_stats": {"text_stats"},
    "events_windows": {"tumbling_agg", "session_agg"},
    "dedup_cc": {"minhash_dedup_pairs", "dedup_keep_canonical"},
    "tfidf": {"tfidf_top_terms"},
    "curation": {"curate_corpus"},
    "decontam": {"decontaminate"},
    "pack": {"pack_sequences", "text_stats"},
    "drift": {"psi_report", "psi_summary", "characteristic_stability"},
    "chunking": {"chunk_documents"},
}


def _bench_ast():
    import ast

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "bench.py")) as f:
        return ast.parse(f.read())


def test_every_headline_body_calls_the_public_api():
    """Each timed headline body must resolve through the package's public
    surface: the body's AST (lambda or named run_* function) contains a
    call to every function in REQUIRED_PUBLIC_CALLS[name], and each such
    name is imported from woe_monotonic_binning_spark."""
    import ast

    tree = _bench_ast()

    # name -> FunctionDef for run_* helper resolution
    funcdefs = {n.name: n for n in ast.walk(tree) if isinstance(n, ast.FunctionDef)}
    # local name -> source module for every `from X import y [as z]`
    import_src: dict[str, str] = {}
    for n in ast.walk(tree):
        if isinstance(n, ast.ImportFrom) and n.module:
            for alias in n.names:
                import_src[alias.asname or alias.name] = n.module

    def called_names(node) -> set[str]:
        out = set()
        for c in ast.walk(node):
            if isinstance(c, ast.Call) and isinstance(c.func, ast.Name):
                out.add(c.func.id)
        return out

    # find every timed("name", body) site
    bodies: dict[str, object] = {}
    for n in ast.walk(tree):
        if (
            isinstance(n, ast.Call)
            and isinstance(n.func, ast.Name)
            and n.func.id == "timed"
            and len(n.args) == 2
            and isinstance(n.args[0], ast.Constant)
        ):
            bodies[n.args[0].value] = n.args[1]

    import bench

    assert set(bodies) == set(bench.HEADLINES) == set(REQUIRED_PUBLIC_CALLS)

    for name, body in bodies.items():
        node = body
        if isinstance(node, ast.Name):  # timed("x", run_x)
            assert node.id in funcdefs, f"{name}: helper {node.id} not found"
            node = funcdefs[node.id]
        calls = called_names(node)
        missing = REQUIRED_PUBLIC_CALLS[name] - calls
        assert not missing, (
            f"headline {name!r} no longer calls the public API: missing "
            f"{sorted(missing)} — inlined operator logic drifts from the "
            "certified composition (round-8 curation regression)"
        )
        for fn in REQUIRED_PUBLIC_CALLS[name]:
            src = import_src.get(fn, "")
            assert src.startswith("woe_monotonic_binning_spark"), (
                f"headline {name!r}: {fn} is imported from {src!r}, not the "
                "public package surface"
            )


def test_curation_headline_keeps_the_scrub_stage():
    """The exact round-8 drift: the curation body must pass scrub=True to
    curate_corpus (the hand-rolled copy had silently dropped the scrub
    stage)."""
    import ast

    tree = _bench_ast()
    for n in ast.walk(tree):
        if (
            isinstance(n, ast.Call)
            and isinstance(n.func, ast.Name)
            and n.func.id == "timed"
            and isinstance(n.args[0], ast.Constant)
            and n.args[0].value == "curation"
        ):
            helper = n.args[1]
    body = next(
        f for f in ast.walk(tree)
        if isinstance(f, ast.FunctionDef) and f.name == helper.id
    )
    for c in ast.walk(body):
        if isinstance(c, ast.Call) and isinstance(c.func, ast.Name) and c.func.id == "curate_corpus":
            kw = {k.arg: k.value for k in c.keywords}
            assert "scrub" in kw and getattr(kw["scrub"], "value", None) is True
            return
    raise AssertionError("curation body no longer calls curate_corpus")


@pytest.mark.certification  # slow battery; see pytest.ini (round 18)
def test_bench_rerun_adjudication_fires(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    shutil.copy(os.path.join(repo, "bench.py"), tmp_path / "bench.py")
    # doctored prior at the SAME sf: text_stats pinned absurdly fast, so
    # the current run must exceed the band and trigger the fresh re-run
    (tmp_path / "BENCH_r99.json").write_text(
        json.dumps(
            {
                "queries": {"text_stats": 0.001},
                "rep_spread": {"text_stats": 1.0},
                "sf": 0.001,
            }
        )
    )
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="8",
        SPARK_GRAFT_BENCH_REPS="1",
        # the prior is pinned absurdly fast, so the fresh sample is ALSO
        # out of band and the round-12 settle+retry path runs end to end;
        # zero settle keeps the test from sleeping 60s for real
        SPARK_GRAFT_BENCH_SETTLE="0",
        PYTHONPATH=repo,
    )
    env.pop("SPARK_GRAFT_BENCH_ONLY", None)
    out = subprocess.run(
        [sys.executable, str(tmp_path / "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=1500,
        cwd=str(tmp_path),
    )
    payload = None
    for line in reversed(out.stdout.strip().splitlines()):
        try:
            payload = json.loads(line)
            break
        except json.JSONDecodeError:
            continue
    assert payload is not None, (out.stdout[-2000:], out.stderr[-2000:])
    assert "rerun" in payload, sorted(payload)
    rec = payload["rerun"].get("text_stats")
    assert rec is not None, payload["rerun"]
    assert rec["orig"] > 0 and rec["fresh"] > 0
    # a real measurement can never land back inside the doctored 0.001s
    # band, so the CONCLUSIVE protocol must have retried once and then
    # flagged the query as unresolved (round-11 verdict #1)
    assert rec.get("unresolved") is True, rec
    assert rec.get("fresh_retry", 0) > 0, rec
    # the reported figure is the min over all samples (noise-robust);
    # exact equality, so a regression back to reporting the original
    # timing cannot slip through (round-8 review)
    assert payload["queries"]["text_stats"] == min(
        round(rec["orig"], 3), round(rec["fresh"], 3), round(rec["fresh_retry"], 3)
    )


def test_bench_artifact_unwrap_handles_driver_wrapper(tmp_path):
    """Round-11 review: the driver's BENCH_r{N}.json wraps the bench line
    under 'parsed', so reading it raw exposed no top-level 'queries' and
    the out-of-band fresh-process re-run adjudication silently never
    fired.  _unwrap_artifact must accept both shapes and reject junk.
    The scan runs against a tmp fixture dir, not the repo's live (and
    untracked/mutable) round artifacts (round-11 ADVICE)."""
    import bench

    raw = {"queries": {"a": 1.0}, "rep_spread": {"a": 1.5}, "sf": 0.1}
    assert bench._unwrap_artifact(raw) is raw
    wrapped = {"rc": 0, "tail": "…", "parsed": dict(raw)}
    assert bench._unwrap_artifact(wrapped) == raw
    assert bench._unwrap_artifact({"rc": 0}) is None
    assert bench._unwrap_artifact(None) is None
    # driver-wrapper shape on disk: the highest-numbered artifact wins and
    # unwraps through 'parsed'
    (tmp_path / "BENCH_r03.json").write_text(
        json.dumps({"queries": {"old": 9.0}, "sf": 0.1})
    )
    (tmp_path / "BENCH_r10.json").write_text(json.dumps(wrapped))
    prior = bench._latest_prior_artifact(str(tmp_path))
    assert prior == raw
    # junk latest artifact -> None, never a crash mid-bench
    (tmp_path / "BENCH_r11.json").write_text("{not json")
    assert bench._latest_prior_artifact(str(tmp_path)) is None


def test_adjudicate_settle_and_retry():
    """Unit drive of the round-12 CONCLUSIVE protocol with a fake prior
    and monkeypatched re-timer/sleeper (round-11 verdict #1 test ask)."""
    import bench

    prior = {
        "queries": {"a": 1.0, "b": 1.0, "c": 1.0, "d": 1.0},
        "rep_spread": {"a": 1.0, "b": 1.0, "c": 1.0, "d": 1.0},
        "sf": 0.1,
    }
    # band floor 1.5 -> flagged iff outside [1/1.5, 1.5]
    timings = {"a": 5.0, "b": 5.0, "c": 5.0, "d": 1.2, "e": 7.0}
    fresh_values = {
        "a": [1.1],          # fresh back in band: no retry, no flag
        "b": [4.0, 1.2],     # fresh out, retry in band: recorded, resolved
        "c": [4.0, 3.9],     # fresh out, retry out: unresolved
    }
    slept = []
    calls = {"a": 0, "b": 0, "c": 0}

    def fake_rerun(name, reps):
        vals = fresh_values[name]
        i = calls[name]
        calls[name] += 1
        return vals[i]

    rerun = bench._adjudicate(
        timings, prior, reps=1, rerun_fn=fake_rerun, sleep_fn=slept.append
    )
    # d (in band) and e (absent from prior) were never flagged
    assert set(rerun) == {"a", "b", "c"}
    assert rerun["a"] == {"orig": 5.0, "fresh": 1.1}
    assert rerun["b"] == {"orig": 5.0, "fresh": 4.0, "fresh_retry": 1.2}
    assert rerun["c"] == {
        "orig": 5.0, "fresh": 4.0, "fresh_retry": 3.9, "unresolved": True
    }
    # settle slept exactly once per out-of-band fresh sample (b and c)
    assert len(slept) == 2
    # reported figure is min over all samples
    assert timings == {"a": 1.1, "b": 1.2, "c": 3.9, "d": 1.2, "e": 7.0}


def test_adjudicate_skips_queries_whose_action_revision_changed(monkeypatch):
    """Round 18: a query whose timed ACTION definition changed between
    artifacts (bench.ACTION_REV vs the prior artifact's action_rev) must
    not be band-checked — the prior band measured a different computation
    — while same-revision queries keep the full protocol."""
    import bench

    monkeypatch.setattr(bench, "ACTION_REV", {"a": 2}, raising=True)
    prior = {
        "queries": {"a": 1.0, "b": 1.0},
        "rep_spread": {"a": 1.0, "b": 1.0},
        "sf": 0.1,
        # prior artifact predates the revision (no action_rev field)
    }
    timings = {"a": 5.0, "b": 5.0}

    def fake_rerun(name, reps):
        assert name != "a", "revision-changed query must not be re-run"
        return 1.1

    rerun = bench._adjudicate(
        timings, prior, reps=1, rerun_fn=fake_rerun, sleep_fn=lambda s: None
    )
    assert set(rerun) == {"b"}
    assert timings["a"] == 5.0  # untouched, no fresh samples burned

    # and when the prior artifact records the SAME revision, adjudication
    # applies normally again
    prior2 = dict(prior, action_rev={"a": 2})
    timings2 = {"a": 5.0}
    rerun2 = bench._adjudicate(
        timings2, prior2, reps=1,
        rerun_fn=lambda n, r: 1.1, sleep_fn=lambda s: None,
    )
    assert set(rerun2) == {"a"} and timings2["a"] == 1.1


def test_adjudicate_rerun_failure_is_unresolved_when_flagged():
    """A rerun that cannot produce a number leaves the original un-
    adjudicated (no record) on the first sample, and marks unresolved if
    the RETRY fails after an out-of-band fresh sample."""
    import bench

    prior = {"queries": {"a": 1.0, "b": 1.0}, "rep_spread": {}, "sf": 0.1}
    timings = {"a": 5.0, "b": 5.0}
    seq = {"a": [None], "b": [4.0, None]}
    calls = {"a": 0, "b": 0}

    def fake_rerun(name, reps):
        v = seq[name][calls[name]]
        calls[name] += 1
        return v

    rerun = bench._adjudicate(
        timings, prior, reps=1, rerun_fn=fake_rerun, sleep_fn=lambda s: None
    )
    assert "a" not in rerun  # first sample failed -> nothing to record
    assert rerun["b"] == {"orig": 5.0, "fresh": 4.0, "unresolved": True}
    assert timings == {"a": 5.0, "b": 4.0}
