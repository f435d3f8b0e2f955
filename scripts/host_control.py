"""Pure-CPU busy-loop host control for the scaling-pair methodology.

Runs a fixed amount of arithmetic work split across N and then 4N
worker processes and reports the wall-clock ratio as a hardware
ceiling: on a healthy host (no steal / thermal / co-tenant pressure)
``(t_N / t_4N) / 4`` should be ~1.0.  Run this immediately before each
recorded scaling pair so engine efficiencies can be read against the
host's own same-day limit (see BASELINE.md "Host state").

    python scripts/host_control.py [--low 8] [--high 32] [--work 6.0]

``--work`` is roughly the per-process seconds of work at the high
level (total work = work * high units).
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import time


def _spin(units: int) -> int:
    # deterministic integer arithmetic, no allocation: ~1e7 iters/unit
    acc = 0
    for _ in range(units * 10_000_000):
        acc = (acc * 1103515245 + 12345) & 0x7FFFFFFF
    return acc


def _calibrate() -> float:
    t0 = time.perf_counter()
    _spin(1)
    return time.perf_counter() - t0


def run_level(n_procs: int, total_units: int) -> float:
    per = total_units // n_procs
    rem = total_units - per * n_procs
    args = [per + (1 if i < rem else 0) for i in range(n_procs)]
    t0 = time.perf_counter()
    with mp.Pool(n_procs) as pool:
        pool.map(_spin, args)
    return time.perf_counter() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--work", type=float, default=6.0)
    args = ap.parse_args()
    unit_s = _calibrate()
    total_units = max(args.high, int(args.work * args.high / unit_s))
    t_low = run_level(args.low, total_units)
    t_high = run_level(args.high, total_units)
    ceiling = (t_low / t_high) / (args.high / args.low)
    print(
        json.dumps(
            {
                "metric": "host_busyloop_ceiling",
                "low": args.low,
                "high": args.high,
                "t_low_s": round(t_low, 2),
                "t_high_s": round(t_high, 2),
                "value": round(ceiling, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
