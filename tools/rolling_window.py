#!/usr/bin/env python
"""Stage the next round's _WINDOW_50 under the rolling re-certification
policy (queries.py header): once every registered query holds a green
official CORRECTNESS_r{N} record, each round re-certifies the 50 whose
latest official record is OLDEST (ties broken by current registry
order), so no query's official row goes more than ~3 rounds stale.

Usage (from the repo root):

    python tools/rolling_window.py            # next window, one per line
    python tools/rolling_window.py --tuple    # paste-ready python tuple

Never-driven queries (no record in any CORRECTNESS file) sort first —
the policy degrades gracefully if a future round adds operators.  A
query whose LATEST record failed also sorts first (age 0 = re-drive
immediately); that matches the standing rule that a red row is fixed
and re-driven before anything else rotates.
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def latest_records() -> dict[str, tuple[int, bool]]:
    """name -> (round, latest record green?) across all CORRECTNESS files."""
    out: dict[str, tuple[int, bool]] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int("".join(c for c in os.path.basename(f) if c.isdigit()))
        for name, v in json.load(open(f)).items():
            ok = v.get("hash_match") is True or (
                v.get("err") == "no_oracle" and v.get("spark_rows") is not None
            )
            out[name] = (rnd, ok)
    return out


def next_window(size: int = 50) -> list[str]:
    from dask_obj_spark.queries import QUERIES, load_all_queries

    load_all_queries()
    names = list(QUERIES)
    recs = latest_records()

    def age_key(i_n):
        i, n = i_n
        rnd, ok = recs.get(n, (0, False))
        return (0 if (n not in recs or not ok) else rnd, i)

    ranked = sorted(enumerate(names), key=age_key)
    return [n for _, n in ranked[:size]]


if __name__ == "__main__":
    win = next_window()
    if "--tuple" in sys.argv:
        print("_WINDOW_50 = (")
        for n in win:
            print(f'    "{n}",')
        print(")")
    else:
        print("\n".join(win))
