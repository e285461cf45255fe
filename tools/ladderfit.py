#!/usr/bin/env python3
"""Three-decade ladder exponent fit.

Reads the three round-stamped bench artifacts (sf0.1, sf10, sf100 —
same code, same 148-query inventory, exclusive runs) and computes the
per-decade scaling exponent for each query:

    alpha_1 = log10(t_sf10  / t_sf0.1)   (decade 1: 1x -> 10x data)
    alpha_2 = log10(t_sf100 / t_sf10)    (decade 2: 10x -> 100x data)

alpha = 1 is perfectly linear in data volume; alpha < 1 is sub-linear
(fixed overhead amortizing, or work that grows slower than rows);
alpha > 1 is super-linear and must have a named cause. alpha_2 is the
scale-relevant number: by the second decade per-query fixed cost
(planning, codegen, fixture builds) is mostly amortized, so alpha_2
approximates the true data-volume exponent that a further 1000x
extrapolation (100 TB) would ride.

Usage: tools/ladderfit.py BENCH_sf0.1.json BENCH_sf10.json BENCH_sf100.json
"""
import json, math, sys
from collections import defaultdict

FAMILIES = [
    ("stress (declared O(n^2))", lambda q: q in ("dedup_embedding", "dedup_embedding_lsh")),
    ("layout", lambda q: q.startswith("layout_")),
    ("multimodal", lambda q: q.startswith("mm_")),
    ("ann / similarity", lambda q: q.startswith("ann_") or q in ("knn_join", "embed_rp_reduce")),
    ("dedup", lambda q: q.startswith("dedup_") or q in (
        "fuzzy_canonicalize", "pipeline_dedup_corpus", "pipeline_excerpt_dedup", "semdedup")),
    ("text / mix / corpus", lambda q: q.startswith("text_") or q.startswith("bpe_") or
        q.startswith("mix_") or q in (
        "freq_ngrams", "pack_windows", "sample_stratified", "split_holdout",
        "corpus_shard_shuffle", "contamination_matrix", "dataset_card",
        "quality_classifier", "pipeline_training_data")),
    ("etl / sources", lambda q: q.startswith("etl_") or q.startswith("src_") or
        q.startswith("sink_") or q.startswith("incr_") or q in (
        "scd2_merge", "cdc_apply", "batch_upsert", "quality_outliers")),
    ("relational / olap", lambda q: True),  # catch-all: q*, join_*, window_*, agg_*, ...
]

def family(q):
    for name, pred in FAMILIES:
        if pred(q):
            return name
    raise AssertionError(q)

def fit(label, m01, m10, m100, unit, zero_note):
    """Per-query and per-family decade exponents for one metric map."""
    common = sorted(set(m01) & set(m10) & set(m100))
    rows, zeros = [], []
    for q in common:
        a, b, c = m01[q], m10[q], m100[q]
        if min(a, b, c) <= 0:
            zeros.append(q)
            continue
        rows.append((q, family(q), a, b, c,
                     math.log10(b / a), math.log10(c / b)))

    rows.sort(key=lambda r: -r[6])
    print(f"==== {label} ====")
    print(f"{len(rows)} queries on all three rungs"
          + (f"; {len(zeros)} {zero_note}" if zeros else "") + "\n")
    print(f"{'query':34s} {'family':24s} {'sf0.1':>9s} {'sf10':>10s} {'sf100':>10s} {'a1':>6s} {'a2':>6s}")
    for q, f, a, b, c, a1, a2 in rows:
        flag = " <-- super-linear decade 2" if a2 > 1.0 else ""
        print(f"{q:34s} {f:24s} {a:9.2f} {b:10.2f} {c:10.2f} {a1:6.2f} {a2:6.2f}{flag}")

    fams = defaultdict(list)
    for q, f, a, b, c, a1, a2 in rows:
        fams[f].append((a1, a2, c))
    print(f"\n{'family':26s} {'n':>3s} {'med a1':>7s} {'med a2':>7s} {'max a2':>7s} {'sf100 total':>14s}")
    for f, vals in sorted(fams.items(), key=lambda kv: -len(kv[1])):
        a1s = sorted(v[0] for v in vals); a2s = sorted(v[1] for v in vals)
        tot = sum(v[2] for v in vals)
        print(f"{f:26s} {len(vals):3d} {a1s[len(a1s)//2]:7.2f} {a2s[len(a2s)//2]:7.2f} "
              f"{max(a2s):7.2f} {tot:13.1f}{unit}")
    print()

def main(p01, p10, p100):
    j01, j10, j100 = (json.load(open(p)) for p in (p01, p10, p100))
    fit("wall time (steady median, sec)",
        j01["queries"], j10["queries"], j100["queries"], "s",
        "failed/absent")
    # r12: bytes-moved exponents — the cluster-transferable number.
    # Wall time on local[32] conflates data movement with JVM effects;
    # shuffle bytes are what a 1000-executor network actually carries.
    # Queries with ZERO shuffle at every rung (scan->broadcast->local
    # plans) are reported as a count: zero bytes moved is the BEST
    # scaling answer, not missing data.
    for key, label in (("queries_shuffle_write", "shuffle bytes WRITTEN (steady pass, MB)"),
                       ("queries_spill_disk", "disk spill bytes (steady pass, MB)")):
        if key in j01 and key in j10 and key in j100:
            mb = lambda m: {q: v / 1e6 for q, v in m.items()}
            fit(label, mb(j01[key]), mb(j10[key]), mb(j100[key]), "MB",
                "zero at some rung (no shuffle / no spill — reported, not fitted)")

if __name__ == "__main__":
    main(*sys.argv[1:4])
