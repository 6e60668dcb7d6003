"""Refresh RECORDED.txt from every CORRECTNESS_r*.json.

RECORDED.txt drives the registry ordering (queries/__init__.py). One
line per query with a GREEN driver correctness row::

    <name> <last_green_round> <signature>

- Only rows with ``hash_match == true`` count (a query whose only row
  FAILED must stay in the unverified-first prefix so the driver
  re-samples the fix). A row with ``err == "no_oracle"`` that still ran
  (``spark_rows`` recorded) counts as the driver's weaker rows-only
  pass — currently no registered query is oracle-less, but the rule
  keeps a future one from pinning the prefix forever.
- ``signature`` is ``query_signature(name)`` — a hash of the oracle SQL
  + fn source — stamped at refresh time. Run this at ROUND START,
  before editing anything, so the stamped signature is exactly the code
  the driver verified last round; the registry treats a signature
  mismatch as "edited since verification" and re-prioritizes the query.
- Merge semantics: an existing line's round/signature is kept unless a
  NEWER round has a green row, so re-running after mid-round edits
  cannot launder an unverified edit into a verified entry.
- Retired queries: rows whose name is no longer in ``query_map()`` are
  DROPPED at refresh (round-11 verdict: retired probe rows polluted the
  staleness statistics — the "oldest green row" was a dead query).
  RECORDED.txt's line count therefore always equals the subset of the
  live registry with at least one green driver row.

Usage (start of each round, commit the result)::

    python tools/update_recorded.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

# One-time bootstrap invalidations: queries whose oracle/implementation
# was edited AFTER their last green driver row, so the signature stamped
# from today's source would not be the verified one. Forced stale until
# a fresh green row replaces the entry. (training_corpus was retired
# from this set in round 5: its round-4 driver row re-greened the edited
# code, which is exactly the fresh row the mechanism waits for.)
BOOTSTRAP_STALE: set[str] = set()


def green_names(path: str) -> set[str]:
    with open(path) as f:
        rows = json.load(f)
    out = set()
    for name, row in rows.items():
        if row.get("hash_match") is True:
            out.add(name)
        elif row.get("err") == "no_oracle" and row.get("spark_rows") is not None:
            out.add(name)
    return out


def main(root: str = ROOT) -> None:
    from news_data_pipeline_spark.queries import QUERIES, query_signature

    out_path = os.path.join(root, "RECORDED.txt")
    existing: dict[str, tuple[int, str]] = {}
    if os.path.isfile(out_path):
        with open(out_path) as f:
            for line in f:
                parts = line.split()
                if len(parts) == 3 and parts[1].isdigit():
                    existing[parts[0]] = (int(parts[1]), parts[2])

    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1))
        for name in green_names(path):
            if name not in existing or rnd > existing[name][0]:
                sig = (
                    "bootstrap-stale"
                    if name in BOOTSTRAP_STALE
                    else query_signature(name)
                    if name in QUERIES
                    else "unregistered"
                )
                existing[name] = (rnd, sig)

    retired = sorted(set(existing) - set(QUERIES))
    for name in retired:
        del existing[name]

    with open(out_path, "w") as f:
        for name in sorted(existing):
            rnd, sig = existing[name]
            f.write(f"{name} {rnd} {sig}\n")
    stale = sum(1 for _, s in existing.values() if s == "bootstrap-stale")
    print(f"{out_path}: {len(existing)} recorded names ({stale} forced stale)")
    if retired:
        print(f"dropped {len(retired)} retired: {', '.join(retired)}")


if __name__ == "__main__":
    main()
