"""Regenerate RECORDED.txt from every CORRECTNESS_r*.json.

RECORDED.txt drives the registry ordering (queries/__init__.py): names
already holding a recorded correctness row sort AFTER never-recorded
ones, so a budgeted harness sweep spends its prefix on unverified
queries. Run at the start of each round, commit the result:

    python tools/update_recorded.py
"""

from __future__ import annotations

import glob
import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    seen: set[str] = set()
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            seen |= set(json.load(f))
    out = os.path.join(ROOT, "RECORDED.txt")
    with open(out, "w") as f:
        f.write("\n".join(sorted(seen)) + "\n")
    print(f"{out}: {len(seen)} recorded query names")


if __name__ == "__main__":
    main()
