"""Witness-freshness ledger (VERDICT r03 next-round #7, r05 #1/#2/#7).

Reads every ``CORRECTNESS_r*.json`` the driver has produced plus the query
registry, and emits ``WITNESS_LEDGER.json``: per query id, the most recent
round with a driver-witnessed row, what that row said, whether the id
currently carries a DuckDB oracle, and the SOURCE FINGERPRINT the id held
at its last witness. The fingerprint powers the change-aware staleness
bound (tests/test_round2_ops.py::test_witness_staleness_bounded): ids
whose registered semantics (function source + oracle SQL) are ATTESTED
untouched since their last hash-green witness may age to latest-5
(the r11+ policy proposed in SURVEY §2.10 and APPROVED — indeed
REQUIRED, the r11 window owes ~65 expiring ids against 50 slots under
latest-4 — by VERDICT r10 next-round #1; it was latest-4 in round 10,
latest-3 through round 9, latest-2 through round 8); any code change,
missing attestation, or rows-only last witness keeps the tight
latest-1 bound. That lifts the registry's witness-bandwidth ceiling to
~6 cohorts x 50 = ~300 ids at 50 witnesses/round, funding the round-11
registration waves (the four r10-drafted tiers plus the four
same-round wave-2 tiers, registry 208 -> 216) and, out of the policy's
steady-state headroom, the r12 registrations (q_stream_full_outer plus
the excision waves q_verbatim_excise / q_line_excise /
q_line_excise_newline / q_decontam_excise / q_intradoc_excise /
q_excise_impact / q_pps_sample, 216 -> 224 — no further notch needed).

Fingerprint carry-forward and ATTESTATION: regeneration is meant to run
IMMEDIATELY after a new CORRECTNESS artifact lands (scripts/rotate.py
does this), i.e. before any round-N code edits — so "current source" is
a faithful proxy for "source the driver just witnessed", and a
fingerprint recorded at that moment is marked ``fp_attested: true``.
Ids whose last witness did not advance keep their previously recorded
fingerprint AND attestation unchanged — the current source is NEVER
back-filled onto a historical witness round (that would fabricate
"untouched since last witness" provenance for code edited after the
witness; found by round-6 code review). Unattested fingerprints do not
qualify for the relaxed latest-2 staleness bound. The one-time r06
bootstrap attested each id by comparing its current fingerprint against
the r05-final tree (commit 4fc86d3) whose 149/149 oracle parity the r05
judge verified — ids edited after that tree stayed unattested.

It also computes ``suggested_window`` — the 50 ids the next rotation
should lead with. Staleness policy (stable sort, no self-referential
tie-breaks):
  1. never witnessed (new ids),
  2. witnessed rows-only — both oracle upgrades the driver has never
     hash-checked AND the contractually rows-only pipe ids (weaker
     witnesses keep tier-1 priority per the approved r09+ policy),
  3. earliest DEADLINE first (last witness + 5 for attested-unchanged
     hash-green ids, + 1 otherwise), then oldest ``last_round``, then qid.

Run ``python scripts/rotate.py`` (regenerates rotation + ledger + parity
in one run); this module alone only rewrites the ledger.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50  # observed driver CORRECTNESS budget (r01 stopped at 50 of 76)
LEDGER_PATH = os.path.join(REPO, "WITNESS_LEDGER.json")


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


def staleness_key(entry: dict, qid: str) -> tuple:
    if entry["last_round"] is None:
        tier = 0  # never witnessed
    elif entry["result"] == "rows_only":
        # rows-only witnesses (both the oracle-upgraded case and the two
        # contractually rows-only pipe ids) keep tier-1 priority per the
        # APPROVED r09+ policy (SURVEY §2.10, VERDICT r08 #2): a rows-only
        # witness is weaker evidence, so it never ages on the relaxed bound
        tier = 1
    else:
        tier = 2
    # APPROVED r09+ policy (VERDICT r08 next-round #2): within tier 2,
    # rank by DEADLINE — the latest driver round at which the id is still
    # within its staleness bound. An id whose fingerprint is ATTESTED
    # unchanged since its last hash-green witness may age to latest-5;
    # unattested or post-witness-edited ids (fp_current_match false) stay
    # at the tight latest-1 bound, so their deadline is two rounds
    # earlier and they rotate first. This replaces the r08-era
    # (last_round, relaxed_ok) sort, which let soon-to-expire unattested
    # ids rank BEHIND older attested ids that still had bound headroom
    # (the exact pigeonhole that left 5 r06-unattested stream ids outside
    # a window full of r05-attested ids at the r08→r09 boundary).
    relaxed_ok = bool(
        entry.get("fp_attested")
        and entry.get("fp_current_match", True)
        and entry.get("result") == "hash_green"
    )
    deadline = (entry["last_round"] or 0) + (5 if relaxed_ok else 1)
    return (tier, deadline, entry["last_round"] or 0, qid)


def build_ledger() -> dict:
    sys.path.insert(0, REPO)
    from hadoop_distexec_spark import registry

    specs = registry.specs()
    rounds = load_rounds()

    old_ids: dict[str, dict] = {}
    if os.path.exists(LEDGER_PATH):
        with open(LEDGER_PATH) as f:
            old_ids = json.load(f).get("ids", {})

    ledger: dict[str, dict] = {}
    for order, (qid, spec) in enumerate(specs.items()):
        last_round, result = None, "never"
        for r in sorted(rounds):
            if qid in rounds[r]:
                last_round, result = r, classify(rounds[r][qid])
        old = old_ids.get(qid, {})
        current_fp = registry.source_fingerprint(spec)
        if (
            old.get("fp") is not None
            and old.get("fp_round") == last_round
            and last_round is not None
        ):
            # no new witness since last recorded — keep fp AND attestation.
            # NEVER-witnessed ids are excluded: there is no historical
            # witness to stay faithful to, so their fp tracks HEAD
            # (pre-fix, an edit between registration and first witness
            # left a stale fp and a misleading fp_current_match=false)
            fp = old["fp"]
            attested = bool(old.get("fp_attested", False))
        else:
            # a NEW witness landed (or the id is new): rotate.py runs
            # immediately after the artifact, before edits, so the
            # current source IS what the driver just witnessed
            fp = current_fp
            attested = last_round is not None
        ledger[qid] = {
            "last_round": last_round,
            "result": result,
            "has_oracle": spec.oracle is not None,
            "registry_order": order,
            "fp": fp,
            "fp_round": last_round,
            "fp_attested": attested,
            # does the witnessed fingerprint still describe HEAD? False
            # means the operator was edited after its witness: the
            # staleness bound tightens to latest-1 and the rotation must
            # prioritize it (staleness_key ranks these with unattested)
            "fp_current_match": fp == current_fp,
        }

    suggested = sorted(ledger, key=lambda q: staleness_key(ledger[q], q))[:WINDOW]
    return {
        "rounds_seen": sorted(rounds),
        "window": WINDOW,
        "ids": ledger,
        "suggested_window": suggested,
    }


def write_ledger(out: dict) -> None:
    with open(LEDGER_PATH, "w") as f:
        json.dump(out, f, indent=1, sort_keys=False)
        f.write("\n")


def main() -> None:
    out = build_ledger()
    write_ledger(out)
    ids = out["ids"]
    from collections import Counter

    print(f"wrote {LEDGER_PATH}: {len(ids)} ids over rounds {out['rounds_seen']}")
    print(Counter((v["last_round"], v["result"]) for v in ids.values()))
    print("suggested _PRIORITY window (stalest first):")
    for qid in out["suggested_window"]:
        e = ids[qid]
        print(f"  {qid:32s} r{e['last_round'] or 0:02d} {e['result']}")


if __name__ == "__main__":
    main()
