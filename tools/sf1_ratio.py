"""Summarize the sf1 scaling pair (VERDICT r7 #3): per-query
sec@8cores / sec@32cores from two bench.py outputs.

Usage: python tools/sf1_ratio.py BENCH_sf1_c32.json BENCH_sf1_c8.json
(each file = the metric line of a bench.py run, or a file whose last
line is that JSON).
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as fh:
        return json.loads(fh.read().strip().splitlines()[-1])


def main() -> None:
    c32, c8 = load(sys.argv[1]), load(sys.argv[2])
    q32 = {**c32["queries"], **c32.get("extended", {})}
    q8 = {**c8["queries"], **c8.get("extended", {})}
    rows = []
    for name, t32 in q32.items():
        if name in q8 and t32 > 0:
            rows.append((name, t32, q8[name], round(q8[name] / t32, 2)))
    rows.sort(key=lambda r: -r[3])
    print(f"{'query':24s} {'sec@32':>8s} {'sec@8':>8s} {'r=8/32':>7s}")
    for name, t32, t8, r in rows:
        print(f"{name:24s} {t32:8.3f} {t8:8.3f} {r:7.2f}")
    tot32 = c32["value"] + c32.get("extended_total", 0)
    tot8 = c8["value"] + c8.get("extended_total", 0)
    print(f"{'TOTAL (head+ext)':24s} {tot32:8.3f} {tot8:8.3f} {tot8 / tot32:7.2f}")
    print(f"load_1m: c32={c32.get('load_avg_1m')} c8={c8.get('load_avg_1m')}")


if __name__ == "__main__":
    main()
