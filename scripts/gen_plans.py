"""Generate PLANS.md: the formatted physical plans of a representative
query per family, at sf0.01 — the `.explain("formatted")` evidence behind
SCALE.md's plan-shape claims (pushdown reaching the parquet scan,
WholeStageCodegen spans, broadcast vs shuffle joins, TakeOrdered top-k,
map-side partial aggregation). Regenerate after plan-affecting changes:

    python scripts/gen_plans.py
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = "/root/testdata/sf0.01"

# one representative per family; (qid, what the plan should show)
PICKS = [
    ("q_agg_groupby", "partial/final hash aggregate, scan-level column pruning"),
    ("q_join_broadcast", "BroadcastHashJoin of the projected dim, no lineitem shuffle"),
    ("q_join_multi", "star join: two broadcast dims + shuffle joins on the fact keys"),
    ("q_topk", "TakeOrderedAndProject — per-partition partial top-k, no global sort"),
    ("q_win_running", "single window Exchange, running frame inside codegen"),
    ("q_asof_join", "range-condition join without a cartesian product"),
    ("q_dedup_exact", "one hash-key aggregate Exchange"),
    ("q_dedup_minhash", "band equi-join on (band, bucket) — no BroadcastNestedLoopJoin"),
    ("q_sim_ivf", "broadcast centroid cells; candidates-only join"),
    ("q_quantile_bins", "fused exact+sketch aggregations sharing one Exchange"),
    ("q_key_skew_profile", "map-side-combined key agg + TakeOrdered + 1-row broadcast"),
    ("q_source_top_tokens", "token agg Exchange + per-source rank window, no global sort"),
    # round-7 families
    ("q_vocab_coverage", "TakeOrderedAndProject head, rank window on the bounded top-K only"),
    ("q_pack_efficiency", "single join-free map-side-combinable agg on the bucket key"),
    ("q_embed_pca", "64-cell dim-keyed aggregate; fold materialized below the Generate"),
    ("q_join_card_est", "key-count equi-join, hint-free; one-row audit aggregate"),
]

# registered in round 8 (the former prep APIs, now registry-resolved
# under q_-prefixed ids); PREP_PICKS stays as the hook for future waves
PICKS += [
    ("q_group_ols", "ONE bigint-lane aggregate; int128 reconstruction on |groups| rows only"),
    ("q_itemset_triples", "three LeftSemi closure prunes BEFORE the counting shuffle; TakeOrdered head"),
    ("q_bloom_fpr_eval", "distinct bit-set agg + bucket equi-join; only 1-row scalar nested loops"),
    ("q_pq_recall", "bounded codebook/LUT equi-joins; assignment is an Arrow int64 matmul (FlatMapGroupsInPandas absent - mapInPandas), no fan-out window"),
    ("q_ks_doclen", "conditional agg to distinct-length cells; windows over cells only"),
    ("q_split_leakage", "split flags as pure expressions on the shared pair build; 1-row scalar broadcasts"),
    ("q_mix_temperature", "one map-side agg; integer-quantized sqrt weights over |sources| rows"),
]

# registered in round 9 (the capped edge builders, now registry-resolved)
PICKS += [
    ("q_dedup_embed_capped", "per-cell rank window + explode(sequence) + ONE equi-join on (cell, rank); no m^2 pair join"),
    ("q_dedup_embed_capped_ivf", "assignment: Arrow/BLAS band scoring (ArrowEvalPython) + broadcast-seeds equi-join, decimal rank inside the 1e-6 band only; cells checkpointed so the subtree plans once; window core above the checkpoint is equi-join only"),
]

# registered in round 10 (estimator-audit + multimodal-dedup wave)
PICKS += [
    ("q_multimodal_phash", "banded hash equi-self-join with the df cap — no nested loop; Hamming as bounded band XORs"),
    ("q_dedup_rate_curve", "one shared pair build, then a x9 bounded threshold fan-out — no second corpus scan"),
]

# registered in round 12 (the excision action waves)
PICKS += [
    ("q_verbatim_excise", "the registered share audit's window/df/owner machinery + the affected-slice-only reconstruction: covered checkpointed once, unaffected docs a narrow map-side array_join, affected docs posexplode + (doc_id, pos) anti-join + one doc-keyed ordered collect"),
    ("q_line_excise_newline", "16-byte line-hash df aggregate + heavy-hitter anti-join (AQE-sized) + doc-keyed ordered reconstruction; no windows, no global sort"),
    ("q_decontam_excise", "the cut decision is a pure BROADCAST eval-shingle hash probe — zero corpus-keyed aggregates before reconstruction (the eval side is a benchmark suite, MBs at any corpus size)"),
    ("q_intradoc_excise", "every shuffle doc_id-keyed (window build, first-occurrence agg, join-back, reconstruction) — embarrassingly parallel over documents, no corpus-global state"),
    ("q_excise_impact", "ONE corpus window build: the checkpointed hit frame feeds both the cut and the before audit (whose window totals are len-K+1 arithmetic); only the cleaned text re-windows, the before/after join is a |sources|-row broadcast"),
    ("q_pps_sample", "two bounded aggregates + |sources|xB allocation windows (<= PPS_BUCKETS rows per partition) + the per-(source, bucket) cumsum — no window ever sorts a source's full corpus share"),
    # round-12 wave 5
    ("q_t_closeness", "one map-side (QI, segment) aggregate; the global segment distribution broadcasts; spectrum windows over bounded rows only"),
    ("q_knn_label_purity", "ArrowEvalPython matmul candidates (no pair shuffle); decimal re-rank + label rollup on the bounded survivor frame"),
    ("q_mix_schedule", "broadcast weight join + pure map t + TakeOrderedAndProject — no corpus shuffle, no rank window"),
]

# unregistered library tiers (module-resolved): the plan evidence the
# SCALE.md capped-tier story rests on; PREP_PICKS stays as the hook for
# future waves
PREP_PICKS: list[tuple[str, str]] = []

# round-10 library tiers (r11 registration candidates; resolved by name)
PREP_PICKS += [
    ("substring_runs_plan", "positional-shingle equi-self-join under the df cap + (pair, diagonal) island windows — no BroadcastNestedLoopJoin, no global sort"),
    ("ivf_pq_recall", "broadcast centroid probe -> candidate pruning BEFORE the per-(query, doc) ADC aggregate; bounded codebook/LUT equi-joins; the only nested loops are the two reviewed bounded crosses (|cells| probe + the q_sim_topk exact-arm baseline)"),
    ("line_dedup", "16-byte line-hash keys through one distinct-doc df aggregate + a heavy-hitter left join-back + the per-source rollup; join-free of the text column after the hash projection"),
]

# round-11 wave-2 tiers (registered same-round as q_-prefixed ids, but
# resolved by module name here — same functions)
PREP_PICKS += [
    ("doc_verbatim_share", "rolling-window md5 keys (16-byte shuffle, never text) through one distinct-doc df aggregate + shared-set left join-back + per-doc/per-source rollups; no window functions, no global sort"),
    ("gopher_rules", "pure per-row rule expressions in one WholeStageCodegen span into a single map-side-combinable per-source aggregate — zero joins, zero windows"),
    ("embed_threshold_curve", "the registered capped edge build (rank window + explode + ONE equi-join) feeding a bounded x8 threshold fan-out — no second corpus pass"),
    ("kcore_audit", "the capped edge build feeding 8 checkpointed peel rounds (one degree aggregate + two left-semi joins each, all equi-keyed on the bounded edge set) + a |V|-row label rollup — no nested loops, no global sort"),
]



def _prep_fn(name: str):
    from scripts.sf1_stress import prep_fn  # the one shared resolver

    return prep_fn(name)


def main() -> None:
    from hadoop_distexec_spark import registry
    from hadoop_distexec_spark.session import get_spark

    spark = get_spark("gen-plans")
    specs = registry.specs()
    out = [
        "# PLANS — formatted physical plans (generated: `python scripts/gen_plans.py`)",
        "",
        f"One representative query per family at sf0.01 on `local[*]` with AQE",
        "enabled — the `.explain(\"formatted\")` evidence behind SCALE.md's",
        "plan-shape claims. Note AQE finalizes some exchanges at runtime; these",
        "are the static plans the optimizer commits to before execution.",
        "",
    ]
    for qid, claim in PICKS + PREP_PICKS:
        df = specs[qid].fn(spark, SF) if qid in specs else _prep_fn(qid)(spark, SF)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        out.append(f"## {qid}")
        out.append("")
        out.append(f"*Expected shape:* {claim}")
        out.append("")
        out.append("```")
        out.append(buf.getvalue().rstrip())
        out.append("```")
        out.append("")
    path = os.path.join(REPO, "PLANS.md")
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"wrote {path}: {len(PICKS) + len(PREP_PICKS)} plans")


if __name__ == "__main__":
    main()
