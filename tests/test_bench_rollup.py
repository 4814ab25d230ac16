"""bench.py surface tests (no Spark): the CSV rollup and the headline-size
contract that round 3 lost its machine-readable record to."""

import csv
import importlib.util
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_rollup_csv_flattens_bench_results(tmp_path):
    """rollup_csv flattens every bench_results/*.json scalar (plus the
    per-stage queries dict as q_* columns) into one CSV — the reference's
    benchmarking/results.py:14-122 CSV analog. Nested lists (param_grid,
    curves) stay in the sidecars; malformed files are skipped, not fatal."""
    bench = _load_bench()
    out = str(tmp_path / "rollup.csv")
    path = bench.rollup_csv(out)
    assert path == out and os.path.exists(out)
    with open(out) as fh:
        rows = list(csv.DictReader(fh))
    src_jsons = [
        f for f in os.listdir(os.path.join(REPO, "bench_results"))
        if f.endswith(".json")
    ]
    parseable = 0
    for f in src_jsons:
        try:
            with open(os.path.join(REPO, "bench_results", f)) as fh:
                if isinstance(json.load(fh), dict):
                    parseable += 1
        except (OSError, json.JSONDecodeError):
            pass
    assert len(rows) == parseable and parseable >= 1
    # per-stage timings flattened; no nested-structure columns leaked
    cols = rows[0].keys()
    assert any(c.startswith("q_") for c in cols)
    assert "param_grid" not in cols and "ivf_recall_curve" not in cols
    # every row's scalar 'value' survives round-trip as a float
    for r in rows:
        if r.get("value"):
            float(r["value"])


def test_headline_stays_tail_capturable():
    """The most recent (by mtime) full-record sidecar must have produced a
    compact headline: rebuild the headline from bench.py's OWN
    HEADLINE_EXTRAS (single source of truth — a hand-copied tuple here
    drifted once already) and assert it fits comfortably inside a
    2000-char tail capture (round 3's inline param_grid blew past it and
    the driver recorded parsed:null)."""
    bench = _load_bench()
    results_dir = os.path.join(REPO, "bench_results")
    fulls = [
        os.path.join(results_dir, f)
        for f in os.listdir(results_dir)
        if f.startswith("bench_full_")
    ]
    if not fulls:
        return  # no sidecar yet on a fresh clone; bench run will create one
    with open(max(fulls, key=os.path.getmtime)) as fh:
        full = json.load(fh)
    out = {
        "metric": full["metric"],
        "value": full["value"],
        "unit": "sec",
        "queries": full["queries"],
        "sf": full["sf"],
        "cpus": full["cpus"],
        **{k: full[k] for k in bench.HEADLINE_EXTRAS if k in full},
        "sidecar": "bench_results/x.json",
        "minhash_ab_ratio": 0.5,
    }
    assert len(json.dumps(out)) < 2000
