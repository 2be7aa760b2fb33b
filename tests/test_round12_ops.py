"""Round-12 operators and gates.

Covers (VERDICT r11 next-round items):
  #1 q_stream_full_outer registration (parity already pinned by
     tests/test_round11_ops.py's draft tests; here we assert the
     registration itself + oracle identity with the tested draft).
  #2 verbatim-span excision transform (draft tier + law tests).
  #3 README surface-count drift gate (counts regenerated from the
     registry so drift is structurally impossible).
"""

from __future__ import annotations

import os
import re

import pytest

from hadoop_distexec_spark import registry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


# ---------------------------------------------------------------------------
# VERDICT r11 #3: README surface counts must match the registry
# ---------------------------------------------------------------------------


def test_readme_counts_match_registry():
    """README.md's hand-maintained surface counts drifted twice (r10: 206/
    208 at a 216 registry). Gate: grep the two count sentences out of the
    README and assert them against ``registry.specs()`` so any future
    registration that forgets the README fails the suite at HEAD."""
    specs = registry.specs()
    total = len(specs)
    with_oracle = sum(1 for s in specs.values() if s.oracle)

    readme = open(os.path.join(REPO, "README.md")).read()
    m = re.search(r"(\d+) of (\d+) registered queries carry oracles", readme)
    assert m, "README.md lost the 'N of M registered queries carry oracles' line"
    assert (int(m.group(1)), int(m.group(2))) == (with_oracle, total), (
        f"README says {m.group(1)}/{m.group(2)} but the registry is "
        f"{with_oracle}/{total} — update README.md"
    )
    m2 = re.search(r"the (\d+)-query relational / streaming /", readme)
    assert m2, "README.md lost the 'the N-query relational / streaming /' line"
    assert int(m2.group(1)) == total, (
        f"README says {m2.group(1)}-query but the registry is {total}"
    )


# ---------------------------------------------------------------------------
# VERDICT r11 #1: q_stream_full_outer is registered, with the tested oracle
# ---------------------------------------------------------------------------


def test_stream_full_outer_registered():
    """The r11 draft tier is now a registered id; its registered oracle is
    the SAME text the r11 draft-parity tests pinned bit-exact at sf0.001
    and sf0.01 (so registration changed visibility, not semantics)."""
    from hadoop_distexec_spark.streaming.windows import (
        STREAM_FULL_OUTER_ORACLE,
        stream_full_outer_data,
    )

    specs = registry.specs()
    assert "q_stream_full_outer" in specs
    spec = specs["q_stream_full_outer"]
    assert spec.oracle == STREAM_FULL_OUTER_ORACLE
    assert spec.fn is stream_full_outer_data
