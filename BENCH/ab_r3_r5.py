"""Paired interleaved A/B: round-3 snapshot (7ebe88d) vs HEAD.

Round 4's bench slowed 1.2-1.75x vs round 3 UNIFORMLY — including keys whose
code did not change — which smells like co-tenant host drift, but the repo's
own BASELINE.md protocol demands an interleaved same-day control before any
cross-round number is attributed to code. This script is that control:

  * `git worktree` the r3 bench commit (7ebe88d, the exact tree that
    produced BENCH_r03.json) into a temp dir;
  * run `python bench.py` with SPARK_GRAFT_BENCH_TRIALS=1 alternately
    (r3, HEAD, r3, HEAD, ...) N times per side, same sf dir, same cpus,
    each invocation a fresh JVM so neither side inherits warm state;
  * report per-key best-of-N for both sides plus the r5/r3 ratio over the
    shared keys, flagging any key whose INTERLEAVED ratio exceeds 1.15 —
    those need a named cause; everything under is within this host's
    same-day noise band.

Pair with a same-day BENCH/cpu_ceiling.py reading (cpu_ceiling_r5.json) so
the day's hardware ceiling is on record next to the comparison.

Usage: python BENCH/ab_r3_r5.py [rounds_per_side] → one JSON line +
writes BENCH/ab_r3_r5.json.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

R3_COMMIT = "7ebe88d"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(cwd: str) -> dict:
    env = dict(os.environ,
               SPARK_GRAFT_BENCH_TRIALS="1",
               SPARK_GRAFT_SF_DIR=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                 "/root/testdata/sf0.1"),
               SPARK_GRAFT_CPUS=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    t0 = time.monotonic()
    p = subprocess.run([sys.executable, "bench.py"], cwd=cwd, env=env,
                       capture_output=True, text=True, timeout=1800)
    wall = time.monotonic() - t0
    if p.returncode != 0:
        raise RuntimeError(f"bench in {cwd} rc={p.returncode}: "
                           f"{p.stderr[-2000:]}")
    line = [ln for ln in p.stdout.splitlines()
            if ln.startswith('{"metric"')][-1]
    out = json.loads(line)
    out["_wall_sec"] = round(wall, 2)
    return out


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    wt = "/tmp/ab_r3_worktree"
    if os.path.exists(wt):
        subprocess.run(["git", "worktree", "remove", "--force", wt],
                       cwd=REPO, capture_output=True)
        shutil.rmtree(wt, ignore_errors=True)
    subprocess.run(["git", "worktree", "add", "--detach", wt, R3_COMMIT],
                   cwd=REPO, check=True, capture_output=True)
    trials: dict[str, list[dict]] = {"r3": [], "r5": []}
    try:
        # strict interleave: r3, r5, r3, r5, ... — any host drift inside
        # the window hits both sides symmetrically
        for i in range(rounds):
            for side, cwd in (("r3", wt), ("r5", REPO)):
                res = run_bench(cwd)
                trials[side].append(res)
                print(f"pass {i + 1} {side}: suite={res['value']}s "
                      f"wall={res['_wall_sec']}s", file=sys.stderr)
    finally:
        subprocess.run(["git", "worktree", "remove", "--force", wt],
                       cwd=REPO, capture_output=True)
        shutil.rmtree(wt, ignore_errors=True)

    def best(side: str) -> dict[str, float]:
        qs = [dict(t["queries"], **{k: v for k, v in t.items()
                                    if isinstance(v, (int, float))})
              for t in trials[side]]
        keys = set.intersection(*(set(q) for q in qs))
        return {k: min(q[k] for q in qs) for k in sorted(keys)}

    b3, b5 = best("r3"), best("r5")
    shared = sorted(set(b3) & set(b5) - {"_wall_sec", "value", "sf",
                                         "trials", "n_docs"})
    ratios = {k: round(b5[k] / b3[k], 3) for k in shared if b3[k] > 0}
    # rates (docs/sec etc.) improve when >1; latencies regress when >1 —
    # flag only latency-like keys (sec/ms) above the 1.15 noise bar
    lat = {k: r for k, r in ratios.items()
           if not k.endswith("per_sec") and not k.endswith("_kept")}
    flagged = {k: r for k, r in lat.items() if r > 1.15}
    out = {
        "r3_commit": R3_COMMIT,
        "rounds_per_side": rounds,
        "interleaved": True,
        "pinned": False,
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        "sf_dir": os.environ.get("SPARK_GRAFT_SF_DIR",
                                 "/root/testdata/sf0.1"),
        "best_r3": {k: round(v, 4) for k, v in b3.items()},
        "best_r5": {k: round(v, 4) for k, v in b5.items()},
        "ratio_r5_over_r3": ratios,
        "flagged_over_1.15": flagged,
        "per_trial_suite_sec": {s: [t["value"] for t in trials[s]]
                                for s in trials},
    }
    path = os.path.join(REPO, "BENCH", "ab_r3_r5.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"metric": "ab_r3_r5",
                      "flagged": flagged,
                      "median_latency_ratio": round(
                          sorted(lat.values())[len(lat) // 2], 3)
                      if lat else None}))


if __name__ == "__main__":
    main()
