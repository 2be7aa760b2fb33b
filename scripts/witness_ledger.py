"""Witness-freshness ledger (VERDICT r03 next-round #7).

Reads every ``CORRECTNESS_r*.json`` the driver has produced plus the query
registry, and emits ``WITNESS_LEDGER.json``: per query id, the most recent
round with a driver-witnessed row, what that row said, and whether the id
currently carries a DuckDB oracle. It then computes ``suggested_window`` —
the 50 ids the next ``registry._PRIORITY`` rotation should lead with, so
rotation is computed from the artifact instead of hand-curated.

Staleness policy (oldest-first within each tier):
  1. never witnessed (new ids),
  2. witnessed rows-only but an oracle now exists (upgraded oracles whose
     hash check the driver has never seen — e.g. the r03 sketch upgrades),
  3. oldest ``last_round`` first, ties broken by registration order.

Run from the repo root:  python scripts/witness_ledger.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50  # observed driver CORRECTNESS budget (r01 stopped at 50 of 76)


def load_rounds() -> dict[int, dict]:
    rounds = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        with open(path) as f:
            rounds[int(m.group(1))] = json.load(f)
    return rounds


def classify(row: dict) -> str:
    if row.get("hash_match"):
        return "hash_green"
    if row.get("err") == "no_oracle" and row.get("spark_rows") is not None:
        return "rows_only"
    if row.get("rows_match") and row.get("schema_match"):
        return "rows_schema_green"
    return "fail"


def build_ledger() -> dict:
    sys.path.insert(0, REPO)
    from hadoop_distexec_spark import registry

    specs = registry.specs()
    rounds = load_rounds()

    ledger: dict[str, dict] = {}
    for order, (qid, spec) in enumerate(specs.items()):
        last_round, result = None, "never"
        for r in sorted(rounds):
            if qid in rounds[r]:
                last_round, result = r, classify(rounds[r][qid])
        ledger[qid] = {
            "last_round": last_round,
            "result": result,
            "has_oracle": spec.oracle is not None,
            "registry_order": order,
        }

    def staleness(qid: str) -> tuple:
        e = ledger[qid]
        if e["last_round"] is None:
            tier = 0  # never witnessed
        elif e["result"] == "rows_only" and e["has_oracle"]:
            tier = 1  # oracle upgraded since last witness
        else:
            tier = 2
        return (tier, e["last_round"] or 0, e["registry_order"])

    suggested = sorted(ledger, key=staleness)[:WINDOW]
    return {
        "rounds_seen": sorted(rounds),
        "window": WINDOW,
        "ids": ledger,
        "suggested_window": suggested,
    }


def main() -> None:
    out = build_ledger()
    path = os.path.join(REPO, "WITNESS_LEDGER.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=False)
        f.write("\n")
    ids = out["ids"]
    from collections import Counter

    print(f"wrote {path}: {len(ids)} ids over rounds {out['rounds_seen']}")
    print(Counter((v["last_round"], v["result"]) for v in ids.values()))
    print("suggested _PRIORITY window (stalest first):")
    for qid in out["suggested_window"]:
        e = ids[qid]
        print(f"  {qid:32s} r{e['last_round'] or 0:02d} {e['result']}")


if __name__ == "__main__":
    main()
