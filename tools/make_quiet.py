#!/usr/bin/env python3
"""Regenerate BENCH_QUIET.json from a quiet bench record.

Usage: tools/make_quiet.py [target/bench_full.json] [note]

The anchors MUST come from a QUIET run — refuse otherwise, using the
run's own calibration evidence (the same signals BenchQuiet.adjudicate
reads): host_load_index <= 1.5 and calib.min inside the historical
0.05-0.08 quiet band for this host. Serve budgets follow the committed
rule: max(2x quiet serve_s, 1.0 s) per stored-model family.
"""
import json, sys, datetime

src = sys.argv[1] if len(sys.argv) > 1 else "target/bench_full.json"
note = sys.argv[2] if len(sys.argv) > 2 else ""
d = json.load(open(src))

load = d["host_load_index"]
cmin = d["calib"]["min"]
assert load <= 1.5, f"host_load_index {load} > 1.5: not a quiet run, refuse to anchor"
# The absolute band is a sanity rail, not the quietness evidence (that is
# host_load_index + per-pass stability): the r14 session's box ran the
# SAME probe at 0.082-0.094 while demonstrably quiet (load index ~1.0
# across 60 samples) — the sandbox host is ~1.4x slower per core than the
# r12/13-era state. Widened 0.08 -> 0.10 accordingly; a calib above the
# band still refuses (that IS contention on every host state seen so far).
assert 0.05 <= cmin <= 0.10, f"calib.min {cmin} outside the 0.05-0.10 quiet band, refuse to anchor"
assert not d.get("errors") or d["errors"] == {}, f"run has errors: {d['errors']}"
models = d.get("models") or {}
assert "error" not in models, f"model split failed in the source run: {models}"
assert models and all(isinstance(v, dict) and "serve_s" in v for v in models.values()), \
    f"models section malformed — anchoring would silently disable serve budgets: {models}"

quiet = {
    "anchor": (f"bench runs={d['runs']} at {d['sf']} "
               f"(host_load_index {load}, calib.min {cmin}) "
               + (note or f"regenerated {datetime.date.today().isoformat()}")),
    "calib_min": cmin,
    "sf": d["sf"],
    # disk-probe floor (absent on pre-r13 records): anchors the I/O
    # contention gate that catches what the CPU probe cannot
    **({"calib_io_min": d["calib_io"]["min"]}
       if d.get("calib_io", {}).get("min", 0) > 0 else {}),
    "host_load_index": load,
    "total": d["value"],
    "serve_budget_rule": "max(2x quiet serve_s, 1.0s) per stored-model family",
    "serve_budgets": {k: round(max(2 * v["serve_s"], 1.0), 4)
                      for k, v in d["models"].items() if "serve_s" in v},
    # round-14 verdict #6: same rule shape for the build and append legs
    "build_budgets": {k: round(max(2 * v["build_s"], 1.0), 4)
                      for k, v in d["models"].items() if "build_s" in v},
    "append_budgets": {k: round(max(2 * v["append_s"], 1.0), 4)
                       for k, v in d["models"].items() if "append_s" in v},
    "queries": d["queries"],
}
json.dump(quiet, open("BENCH_QUIET.json", "w"), indent=1, sort_keys=True)
print(f"BENCH_QUIET.json: {len(quiet['queries'])} anchors, "
      f"{len(quiet['serve_budgets'])} budgets, total {d['value']}")
