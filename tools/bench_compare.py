"""Per-query bench comparison against a previous round's envelope.

The round-close methodology (VERDICT r6/r7 precedent): host noise on
this box moves the headline SUM by ±25% while individual medians stay
inside their min/max envelopes, so cross-round regressions are judged
PER QUERY against the reference run's [min, max] — never by raw
headline deltas. This tool encodes that comparison::

    python tools/bench_compare.py BENCH_r07_local.json /tmp/bench_new.out

Exit 1 if any shared query's median lands ABOVE the reference max
(faster-than-envelope is reported but never fails). New/removed
queries are listed for the round notes.
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        return json.loads(f.read().strip().split("\n")[0])


def main() -> None:
    if len(sys.argv) != 3:
        print(__doc__)
        raise SystemExit(2)
    ref, cur = load(sys.argv[1]), load(sys.argv[2])
    ref_q = {**ref["queries"], **ref.get("tail_queries", {})}
    ref_mm = {
        **ref.get("queries_minmax", {}),
        **ref.get("tail_queries_minmax", {}),
    }
    cur_q = {**cur["queries"], **cur.get("tail_queries", {})}

    print(
        f"headline: ref {ref['value']}s -> cur {cur['value']}s | "
        f"tail: ref {ref.get('tail_value')}s -> cur {cur.get('tail_value')}s"
    )
    slow, fast = [], []
    for name, v in sorted(cur_q.items()):
        if name not in ref_mm:
            continue
        lo, hi = ref_mm[name]
        if v > hi:
            slow.append((name, v, lo, hi, ref_q[name]))
        elif v < lo:
            fast.append((name, v, lo, hi, ref_q[name]))
    for name, v, lo, hi, med in fast:
        print(f"  faster  {name}: {v} < ref [{lo}, {hi}] (med {med})")
    for name, v, lo, hi, med in slow:
        print(f"  SLOWER  {name}: {v} > ref [{lo}, {hi}] (med {med})")
    new = sorted(set(cur_q) - set(ref_q))
    gone = sorted(set(ref_q) - set(cur_q))
    if new:
        print(f"  new queries (no reference envelope): {new}")
    if gone:
        print(f"  removed since reference: {gone}")
    print(
        f"{len(slow)} above-envelope, {len(fast)} below, "
        f"{len(set(cur_q) & set(ref_q))} shared"
    )
    raise SystemExit(1 if slow else 0)


if __name__ == "__main__":
    main()
