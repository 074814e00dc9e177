#!/usr/bin/env bash
# Round-13 soak batch (run under nohup; serializes with any other sbt).
#
# Part A — r12 VERDICT #3: the flagged dedup_semantic_incremental ×32
# soak row (19.7 s vs 6.4–8.2 s at its neighbors) gets the standing
# rule's ISOLATED re-probes — three single-row samples, nothing else
# running, same config as the §10 curve (plain scaling, sf0.1 base).
#
# Part B — new-query discipline: ladders for the two r13 rows
# (dedup_semantic_indexed = build + probe of the persisted index;
# q_events_hau_approx = the mergeable HLL twin).
#
# Part C — r12 VERDICT #1 (+#5): the three ×128-jump rows re-run at
# ×64/×128 under the CLUSTER-FAITHFUL profile (high initial shuffle
# partitions + AQE coalesce, SPARK_GRAFT_SOAK_SHUFFLE_PARTS=2000 — the
# GraftSession.clusterBuilder figure), strictly interleaved against
# the fixed-32 arm (A B A B) so ambient drift hits both equally.
# q_events_hau rides the same runs (VERDICT #5's "flat under the #1
# config" clause) with its sketch twin alongside.
set -uo pipefail
cd /root/repo

run() { # label, extra env as KEY=VAL..., writes to /tmp/soak_r13_<label>.log
  local label="$1"; shift
  echo "=== $label start $(date +%T) ==="
  env "$@" sbt -batch "runMain graft.Soak" > "/tmp/soak_r13_${label}.log" 2>&1
  grep -a '"factor"' "/tmp/soak_r13_${label}.log"
  echo "=== $label done $(date +%T) ==="
}

for i in 1 2 3; do
  run "incr32_$i" SPARK_GRAFT_SOAK_FACTORS=32 \
    SPARK_GRAFT_SOAK_QUERIES=dedup_semantic_incremental
done

run newq_ladder SPARK_GRAFT_SOAK_FACTORS=1,8,16,32,64 \
  SPARK_GRAFT_SOAK_QUERIES=dedup_semantic_indexed,q_events_hau_approx

QC=dedup_containment,dedup_semantic,pipe_decontaminate_report,q_events_hau,q_events_hau_approx
run p1_fixed_a   SPARK_GRAFT_SOAK_FACTORS=64,128 SPARK_GRAFT_SOAK_QUERIES=$QC
run p1_cluster_a SPARK_GRAFT_SOAK_FACTORS=64,128 SPARK_GRAFT_SOAK_QUERIES=$QC \
  SPARK_GRAFT_SOAK_SHUFFLE_PARTS=2000
run p1_fixed_b   SPARK_GRAFT_SOAK_FACTORS=64,128 SPARK_GRAFT_SOAK_QUERIES=$QC
run p1_cluster_b SPARK_GRAFT_SOAK_FACTORS=64,128 SPARK_GRAFT_SOAK_QUERIES=$QC \
  SPARK_GRAFT_SOAK_SHUFFLE_PARTS=2000

echo "ALL r13 SOAKS DONE $(date +%T)"
