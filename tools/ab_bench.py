"""Cross-tree A/B query timing — the drift-proof way to compare two
commits on this box.

The round benches (BENCH_r*.json) are best-of-3 minima from single
processes, and SCALING.md's round-6 notes measure why they drift: the
box's effective speed swings ±35% on identical code without showing in
loadavg, and one long JVM session flushes warm codegen between distant
reps. Comparing two TREES therefore needs interleaved samples under the
same ambient state: this tool checks both refs out as git worktrees and
alternates A/B/A/B... single-query runs, each in a FRESH process (its own
JVM: same warmup at sf0.001, one timed run at the target sf), so every
adjacent A/B pair shares the box state and the medians subtract drift.

Usage:
  python tools/ab_bench.py --ref-a HEAD~1 --ref-b HEAD \
      --queries rev_pairs,dedup_simhash [--rounds 5] [--sf-dir .../sf0.1]

Prints one JSON line per query: per-tree sample lists, medians, and the
median ratio B/A.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile

RUNNER = r"""
import json, sys, time
sys.path.insert(0, sys.argv[1])
from hedera_spark.session import get_spark, reset_session_state
from hedera_spark.registry import QUERIES
spark = get_spark("ab-bench")
spark.sparkContext.setLogLevel("ERROR")
name, sf_dir, warmup_dir = sys.argv[2], sys.argv[3], sys.argv[4]
QUERIES[name](spark, warmup_dir).collect()  # JIT warmup
reset_session_state(spark)
t0 = time.perf_counter()
QUERIES[name](spark, sf_dir).collect()
print(json.dumps({"sec": round(time.perf_counter() - t0, 3)}))
"""


def _repo_root() -> str:
    out = subprocess.run(
        ["git", "rev-parse", "--show-toplevel"],
        capture_output=True, text=True, check=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    return out.stdout.strip()


def _worktree(ref: str, base: str) -> str:
    path = os.path.join(base, ref.replace("/", "_"))
    subprocess.run(
        ["git", "worktree", "add", "--detach", path, ref],
        check=True,
        capture_output=True,
        cwd=_repo_root(),
    )
    return path


def _sample(tree: str, name: str, sf_dir: str, warmup_dir: str) -> float:
    out = subprocess.run(
        [sys.executable, "-c", RUNNER, tree, name, sf_dir, warmup_dir],
        capture_output=True,
        text=True,
        check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])["sec"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref-a", required=True)
    ap.add_argument("--ref-b", required=True)
    ap.add_argument("--queries", required=True)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--warmup-sf",
        default=None,
        help="sf dir for the JIT warmup pass (default: the smallest "
        "sf* sibling of --sf-dir, so the tool works on any checkout/box)",
    )
    args = ap.parse_args()

    warmup = args.warmup_sf
    if warmup is None:
        parent = os.path.dirname(os.path.abspath(args.sf_dir.rstrip("/")))
        sibs = sorted(
            (d for d in os.listdir(parent)
             if d.startswith("sf")
             and os.path.isdir(os.path.join(parent, d))),
            key=lambda d: float(d[2:]) if d[2:].replace(".", "").isdigit()
            else float("inf"),
        )
        warmup = os.path.join(parent, sibs[0]) if sibs else args.sf_dir

    with tempfile.TemporaryDirectory(prefix="abbench-") as base:
        tree_a = _worktree(args.ref_a, base)
        tree_b = _worktree(args.ref_b, base)
        try:
            for name in args.queries.split(","):
                sa, sb = [], []
                for _ in range(args.rounds):
                    sa.append(_sample(tree_a, name, args.sf_dir, warmup))
                    sb.append(_sample(tree_b, name, args.sf_dir, warmup))
                ma, mb = statistics.median(sa), statistics.median(sb)
                print(
                    json.dumps(
                        {
                            "query": name,
                            "a": {"ref": args.ref_a, "samples": sa, "median": ma},
                            "b": {"ref": args.ref_b, "samples": sb, "median": mb},
                            "ratio_b_over_a": round(mb / ma, 3) if ma else None,
                        }
                    )
                )
        finally:
            for p in (tree_a, tree_b):
                subprocess.run(
                    ["git", "worktree", "remove", "--force", p],
                    cwd=_repo_root(),
                    capture_output=True,
                )


if __name__ == "__main__":
    main()
