"""Permanent tripwire for the round-7 Expand-amplification findings:
an ``.agg(...)`` that mixes a DISTINCT aggregate (countDistinct /
count_distinct) with a large-buffer imperative aggregate
(approx_count_distinct / percentile_approx / percentile / collect_*)
plans an Expand whose multiplied rows drag the big buffers through a
sort-based aggregate — measured 360s (sliding_distinct, rsd-0.005 HLL)
and 210s + one JVM reset (q_agg_approx, exact percentiles) at the 10x
lane, vs ~8-12s with the arms split into separate aggregations joined
on the group key. A new mixed call site anywhere fails this test until
it is split, or reviewed and whitelisted with its measured cost."""

import ast
import os

REPO = os.path.join(os.path.dirname(__file__), "..")
PKG = os.path.join(REPO, "hadoop_distexec_spark")

DISTINCT = ("countDistinct", "count_distinct")
BIG_BUFFER = (
    "approx_count_distinct",
    "percentile_approx",
    "percentile(",
    "collect_list",
    "collect_set",
)

# (module-relative path, enclosing function) -> reviewed justification
WHITELIST = {
    ("operators/relational_ext.py", "q_agg_collect"): (
        "collect_set over the 3-value order-status domain: the buffer is "
        "bounded by the tiny domain, not the row count — Expand is 2x "
        "rows of a 3-element set"
    ),
}


def _mixed_agg_sites():
    sites = []
    for root, _, files in os.walk(PKG):
        for f in files:
            if not f.endswith(".py"):
                continue
            p = os.path.join(root, f)
            rel = os.path.relpath(p, PKG).replace(os.sep, "/")
            src = open(p).read()
            tree = ast.parse(src)
            spans = [
                (n.lineno, n.end_lineno, n.name)
                for n in ast.walk(tree)
                if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
            ]
            for node in ast.walk(tree):
                if (
                    isinstance(node, ast.Call)
                    and isinstance(node.func, ast.Attribute)
                    and node.func.attr == "agg"
                ):
                    seg = ast.get_source_segment(src, node) or ""
                    # "count_distinct" is a substring of
                    # "approx_count_distinct" — strip the sketch name
                    # before looking for the distinct markers
                    seg_d = seg.replace("approx_count_distinct", "")
                    if any(d in seg_d for d in DISTINCT) and any(
                        b in seg for b in BIG_BUFFER
                    ):
                        enc = [n for s, e, n in spans if s <= node.lineno <= e]
                        sites.append((rel, enc[-1] if enc else "<module>"))
    return sites


def test_no_unreviewed_distinct_plus_big_buffer_agg():
    sites = [s for s in _mixed_agg_sites() if s not in WHITELIST]
    assert not sites, (
        "agg() mixes a distinct aggregate with a large-buffer imperative "
        "aggregate — split the arms into separate aggregations joined on "
        "the group key (SCALE.md round-7 findings), or review and "
        f"whitelist with a measured cost: {sites}"
    )


def test_agg_mix_whitelist_not_stale():
    sites = set(_mixed_agg_sites())
    gone = sorted(set(WHITELIST) - sites)
    assert not gone, f"whitelist entries with no remaining call site: {gone}"
