"""Rotate the driver gate's front-50 for the next round.

The gate grades the FIRST 50 entries of ``registry.QUERIES``;
``registry._DEMOTED_STABLE`` holds everything else, and promotion is by
DELETING names from that list (SURVEY §7 item 17 — the list itself is
the schedule). This tool performs one rotation:

1. reads every ``CORRECTNESS_r*.json`` to find entries the driver has
   ever checked,
2. demotes the current front entries that are green in the latest
   round's gate (appending a dated wave comment),
3. promotes the next never-checked entries in _DEMOTED_STABLE order
   until the front holds 50 (or the debt is exhausted),
4. keeps any current-front entry that FAILED its latest check in the
   front (a failure must be fixed and re-graded, never rotated away).

Run: ``python tools/rotate_gate.py [--round N] [--dry-run]``; verify
with ``python tools/driver_sim.py --only $(python - <<'PY' ...)`` or a
full sweep afterwards.
"""

from __future__ import annotations

import argparse
import glob
import json
import re
import sys

sys.path.insert(0, "/root/repo")

REGISTRY = "/root/repo/hedera_spark/registry.py"
FRONT_SIZE = 50


def load_checked() -> tuple[set[str], dict[str, dict]]:
    """(ever-checked names, latest round's per-name record)."""
    files = sorted(glob.glob("/root/repo/CORRECTNESS_r*.json"))
    checked: set[str] = set()
    latest: dict[str, dict] = {}
    for f in files:
        with open(f) as fh:
            data = json.load(fh)
        checked |= set(data)
        latest = data  # files sort by round; last wins
    return checked, latest


def is_green(rec: dict) -> bool:
    """Green = value-hash match. A rows-only `no_oracle` row is NOT green:
    it can never show a hash match, so rotating it away hides the debt —
    hold it in the front until its oracle exists (VERDICT r4 #2)."""
    return rec.get("hash_match") is True


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True, help="round number being prepared")
    ap.add_argument("--dry-run", action="store_true")
    ap.add_argument(
        "--promote",
        action="append",
        default=[],
        help="force-promote an already-checked entry (e.g. one whose oracle "
        "was just added and needs driver re-grading); repeatable",
    )
    args = ap.parse_args()

    from hedera_spark import registry as reg

    order = list(reg.QUERIES)  # gate order: front first, then demoted
    front = [n for n in order if n not in reg._DEMOTED_STABLE]
    checked, latest = load_checked()

    demote = [n for n in front if n in latest and is_green(latest[n])]
    hold = [n for n in front if n not in demote]
    if hold:
        print(f"holding in front (not green in latest gate): {hold}")

    # promotion pool: forced re-grades first, then never-checked entries
    # in _DEMOTED_STABLE order
    forced = [n for n in args.promote if n in reg._DEMOTED_STABLE]
    missing = set(args.promote) - set(forced)
    if missing:
        sys.exit(f"--promote names not in _DEMOTED_STABLE: {sorted(missing)}")
    pool = forced + [
        n for n in reg._DEMOTED_STABLE if n in reg.QUERIES and n not in checked
    ]
    n_promote = FRONT_SIZE - len(hold)
    promote = pool[:n_promote]
    print(f"demoting {len(demote)}, promoting {len(promote)}, "
          f"debt after: {len(pool) - len(promote)}")
    if args.dry_run:
        print("PROMOTE:", promote)
        return

    src = open(REGISTRY).read()
    head, rest = src.split("_DEMOTED_STABLE = [", 1)
    # Split on the closing bracket at column 0 so a comment line that merely
    # ends with "]" can never truncate the block.
    block, tail = rest.split("\n]\n", 1)

    lines = block.split("\n")
    keep_lines = []
    removed = 0
    promote_set = set(promote)
    for ln in lines:
        m = re.match(r'\s+"([a-z0-9_]+)",\s*$', ln)
        if m and m.group(1) in promote_set:
            removed += 1
            continue
        keep_lines.append(ln)
    assert removed == len(promote), (removed, len(promote))

    wave = [f"    # round {args.round} rotation (tools/rotate_gate.py): "
            f"latest-gate-green front demotes,",
            f"    # next {len(promote)} never-checked entries promote "
            f"(SURVEY §7 schedule)"]
    wave += [f'    "{n}",' for n in demote]
    new_block = "\n".join(keep_lines).rstrip("\n") + "\n" + "\n".join(wave)
    new_src = head + "_DEMOTED_STABLE = [" + new_block + "\n]\n" + tail
    tmp = REGISTRY + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(new_src)
    import os

    os.replace(tmp, REGISTRY)
    print("registry rewritten; re-import to validate the 50-entry assert")


if __name__ == "__main__":
    main()
