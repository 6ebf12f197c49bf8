#!/usr/bin/env python
"""Executable bench-record comparability policy (VERDICT r11 task #2).

BASELINE.md's rule — "compare calib first" — as code instead of prose:

    python tools/compare_bench.py OLD.json NEW.json [--ratio 1.5]

1. COMPARABILITY GATE.  Box-speed stamps are compared before any gate
   timing is looked at: the records' ``calib_probe_median_sec`` (r12+)
   or, falling back, the mean of ``cpu_calib_sec`` endpoints (r11).  If
   they differ by more than --calib-tolerance (default 1.3x), the suites
   ran on materially different effective hardware and NO per-gate ratio
   is meaningful: exit 2 with "NOT COMPARABLE".
2. PER-GATE DIFF.  Otherwise print gates whose timing moved more than
   --ratio in either direction, EXCLUDING gates either record lists in
   ``burst_flagged`` (their timings are stall ceilings, not
   measurements) and annotating gates in ``burst_requeued``.

Exit codes: 0 comparable + no regressions, 1 comparable + regressions
listed, 2 not comparable, 3 usage/parse error.
"""

from __future__ import annotations

import argparse
import json
import sys


def _load(path: str) -> dict:
    with open(path) as fh:
        text = fh.read()
    # accept both the full local record and a driver tail file whose last
    # line is the JSON payload
    for candidate in (text, text.strip().splitlines()[-1] if text.strip() else ""):
        try:
            obj = json.loads(candidate)
            if isinstance(obj, dict):
                return obj
        except (json.JSONDecodeError, IndexError):
            continue
    raise ValueError(f"no JSON record found in {path}")


def _calib_stamp(rec: dict) -> float | None:
    """The record's box-speed number, preferring the r12+ per-gate probe
    median (3M-iteration single-shot) over the r11 endpoint stamps
    (10M-iteration best-of-3) — normalized to seconds-per-10M so the two
    generations compare."""
    med = rec.get("calib_probe_median_sec")
    if med:
        work = rec.get("calib_probe_work") or 3_000_000
        return float(med) * (10_000_000 / work)
    stamps = rec.get("cpu_calib_sec")
    if stamps:
        vals = [float(x) for x in stamps if x]
        if vals:
            return sum(vals) / len(vals)
    return None


def compare(old: dict, new: dict, ratio: float, calib_tolerance: float) -> int:
    c_old, c_new = _calib_stamp(old), _calib_stamp(new)
    if c_old and c_new:
        spread = max(c_old, c_new) / min(c_old, c_new)
        print(
            f"calib: old {c_old:.3f}s/10M, new {c_new:.3f}s/10M "
            f"(spread {spread:.2f}x, tolerance {calib_tolerance}x)"
        )
        if spread > calib_tolerance:
            print(
                "NOT COMPARABLE: box-speed stamps differ materially — "
                "per-gate ratios would measure the host, not the code"
            )
            return 2
    else:
        print(
            "# warning: calib stamp missing from "
            + ("both records" if not (c_old or c_new) else "one record")
            + " — comparability not established, ratios are advisory"
        )

    flagged = set(old.get("burst_flagged") or []) | set(new.get("burst_flagged") or [])
    requeued = set(old.get("burst_requeued") or []) | set(
        new.get("burst_requeued") or []
    )
    q_old, q_new = old.get("queries") or {}, new.get("queries") or {}
    moved = []
    for name in sorted(set(q_old) & set(q_new)):
        if name in flagged:
            continue
        a, b = float(q_old[name]), float(q_new[name])
        if a <= 0 or b <= 0:
            continue
        r = b / a
        if r > ratio or r < 1 / ratio:
            moved.append((r, name, a, b))
    regressions = 0
    for r, name, a, b in sorted(moved, reverse=True):
        tag = " [burst-requeued]" if name in requeued else ""
        kind = "REGRESSION" if r > 1 else "improvement"
        if r > 1:
            regressions += 1
        print(f"{kind} {name}: {a:.3f}s -> {b:.3f}s ({r:.2f}x){tag}")
    for name in sorted(flagged & set(q_old) & set(q_new)):
        print(f"# excluded (burst_flagged): {name}")
    if not moved:
        print(f"no gate moved more than {ratio}x")
    return 1 if regressions else 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--ratio", type=float, default=1.5)
    ap.add_argument("--calib-tolerance", type=float, default=1.3)
    args = ap.parse_args(argv)
    try:
        old, new = _load(args.old), _load(args.new)
    except (OSError, ValueError) as exc:
        print(f"error: {exc}", file=sys.stderr)
        return 3
    return compare(old, new, args.ratio, args.calib_tolerance)


if __name__ == "__main__":
    sys.exit(main())
