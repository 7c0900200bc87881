"""Control experiment: what parallel speedup does this box actually deliver
for CPU-bound work, independent of Spark?

Runs an embarrassingly-parallel regex workload (the same character of work
as tokenization) under plain multiprocessing at 1/2/8/16/32 processes and
reports throughput. This bounds the achievable Spark scaling efficiency on
this host: if raw CPU gives k× from N to 4N processes, no Spark job can
exceed k/4 efficiency between local[N] and local[4N].

Usage: python BENCH/cpu_ceiling.py  → one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time


def burn(n: int) -> int:
    import re
    s = ("the quick brown fox jumps over the lazy dog 12345 " * 400)
    r = re.compile("[A-Za-z0-9]+")
    for _ in range(n):
        r.findall(s)
    return 1


def measure(procs: int, work: int = 1500) -> float:
    with mp.Pool(procs) as p:
        t0 = time.monotonic()
        p.map(burn, [work] * procs)
        dt = time.monotonic() - t0
    return procs * work / dt


def main() -> None:
    out = {}
    for procs in (1, 2, 8, 16, 32):
        best = max(measure(procs) for _ in range(3))
        out[procs] = round(best, 1)
    eff_2_8 = out[8] / (4 * out[2])
    eff_8_32 = out[32] / (4 * out[8])
    print(json.dumps({"throughput_by_procs": out,
                      "hardware_eff_2_to_8": round(eff_2_8, 3),
                      "hardware_eff_8_to_32": round(eff_8_32, 3)}))


if __name__ == "__main__":
    main()
