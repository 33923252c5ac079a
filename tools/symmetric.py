#!/usr/bin/env python3
"""Symmetric-subset computation for BASELINE.md (build-side diagnostic).

Usage: python3 tools/symmetric.py <BENCH_LOCAL_rN.json> <DUCK_BASELINE_rN.json>

The full-catalog Spark/DuckDB ratio mixes in oracles that are
DELIBERATELY asymmetric — the oracle replays a sequential fold
(recursive-CTE per-step rounding) or brute-forces a corpus the engine
serves from a pruned index, so the comparison measures oracle
construction, not engine speed. BASELINE.md's "symmetric subset"
excludes them; this file is the machine-readable home of that list
(r13: the same 24 names every round since r12, reverse-verified against
the committed r13 records to ±0.02 s on both sides).

Prints: subset totals + medians, the excluded mass, and the
floor-vs-head decomposition (sub-0.3 s Spark tail vs the rest).
"""
import sys, json, statistics

# Deliberately-asymmetric oracles (see BASELINE.md for per-entry whys):
#  - ANN probes: oracle brute-forces the corpus, engine reads pruned buckets
#  - sequential replay folds: recursive-CTE per-step-rounded recursions
#  - iterative driver loops vs full recursive closure (pagerank, pack,
#    dedup connected-components family, power iteration)
#  - oracle-side list/window constructions with no engine counterpart
#    (mmr, cm_point, winnow, phash, neardup, source_overlap)
EXCLUDE = [
    "q_ann_batch_multiprobe", "q_ann_bucket_pruned", "q_ann_cdc_probe",
    "q_ann_stream_probe", "q_dedup_cluster", "q_dedup_incremental",
    "q_dedup_source_overlap", "q_dedup_survivors", "q_docs_pack_greedy",
    "q_docs_winnow", "q_emb_neardup", "q_emb_power_iter",
    "q_graph_pagerank", "q_multimodal_phash", "q_pql_holt",
    "q_sim_ann_batch", "q_sim_mmr", "q_sketch_cm_point",
    "q_ts_capped_cumsum", "q_ts_holt_winters", "q_ts_kalman",
    "q_ts_session_capped", "q_ts_theta", "q_user_kaplan_meier",
]

def main(bench_path, duck_path):
    bench = json.load(open(bench_path))["queries"]
    spark = {k: v["min"] for k, v in bench.items()}
    duck = json.load(open(duck_path))["queries"]
    missing = [n for n in EXCLUDE if n not in duck]
    if missing:
        print(f"note: {len(missing)} excluded names not in oracle set: {missing}")
    # ADVICE r13: records from different rounds/catalogs may disagree on
    # the query set — compare only names present in BOTH and say what
    # dropped. ADVICE r14: the two directions are NOT symmetric cases.
    # Bench-only names are expected (the 8 no-oracle sketch/ANN entries);
    # ORACLE names missing from the bench record mean the bench silently
    # dropped measured queries and the headline ratio would be computed
    # over a shrunken set — that is an error unless explicitly allowed.
    only_duck = sorted(set(duck) - set(spark) - set(EXCLUDE))
    only_spark = sorted(set(spark) - set(duck) - set(EXCLUDE))
    if only_duck:
        print(f"ERROR: {len(only_duck)} oracle-covered queries absent from the "
              f"bench record: {only_duck}")
        if "--allow-drop" not in sys.argv:
            print("a headline over the shrunken set would overstate the engine; "
                  "rerun the bench or pass --allow-drop to proceed anyway")
            sys.exit(1)
    if only_spark:
        print(f"note: {len(only_spark)} bench names absent from oracle set "
              f"(expected for no-oracle entries): {only_spark}")
    sym = sorted((set(duck) & set(spark)) - set(EXCLUDE))
    s = {n: spark[n] for n in sym}
    d = {n: duck[n] for n in sym}
    print(f"oracles: {len(duck)} total, {len(EXCLUDE)} excluded, {len(sym)} symmetric")
    print(f"excluded mass: duck {sum(duck[n] for n in EXCLUDE if n in duck):.1f} s, "
          f"spark {sum(spark[n] for n in EXCLUDE if n in spark):.1f} s")
    print(f"symmetric subset: spark {sum(s.values()):.1f} s vs duck {sum(d.values()):.1f} s "
          f"=> {sum(s.values())/sum(d.values()):.2f}x "
          f"(medians {1000*statistics.median(s.values()):.0f} ms vs "
          f"{1000*statistics.median(d.values()):.0f} ms)")
    tail = [n for n in sym if s[n] < 0.3]
    head = [n for n in sym if s[n] >= 0.3]
    print(f"decomposition: {len(tail)} sub-0.3s queries spark {sum(s[n] for n in tail):.1f} s "
          f"vs duck {sum(d[n] for n in tail):.1f} s; "
          f"{len(head)}-query head spark {sum(s[n] for n in head):.1f} s "
          f"vs duck {sum(d[n] for n in head):.1f} s")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
