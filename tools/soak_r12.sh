#!/usr/bin/env bash
# Round-12 soak batch (run under nohup; serializes with any other sbt).
#
# Part 1 — r11 VERDICT #3 measurement: the three ×64 rows that read
# >2× per 2× under FIXED 32 shuffle partitions, re-run with partitions
# scaled ∝ factor (SPARK_GRAFT_SOAK_SHUFFLE_SCALE=1). Interleaved
# fixed/scaled arms (A B A B) so ambient drift hits both equally.
#
# Part 2 — r11 VERDICT #5 + new-query discipline: the decon report and
# dedup_semantic_kmeans up the full ladder to ×64.
set -uo pipefail
cd /root/repo

Q3=graph_part_pagerank_exact,graph_part_communities,q_part_cooccur

run() { # label, extra env as KEY=VAL..., writes to /tmp/soak_r12_<label>.log
  local label="$1"; shift
  echo "=== $label start $(date +%T) ==="
  env "$@" sbt -batch "runMain graft.Soak" > "/tmp/soak_r12_${label}.log" 2>&1
  grep -a '"factor"' "/tmp/soak_r12_${label}.log"
  echo "=== $label done $(date +%T) ==="
}

run p4_fixed_a  SPARK_GRAFT_SOAK_FACTORS=32,64 SPARK_GRAFT_SOAK_QUERIES=$Q3
run p4_scaled_a SPARK_GRAFT_SOAK_FACTORS=32,64 SPARK_GRAFT_SOAK_QUERIES=$Q3 SPARK_GRAFT_SOAK_SHUFFLE_SCALE=1
run p4_fixed_b  SPARK_GRAFT_SOAK_FACTORS=32,64 SPARK_GRAFT_SOAK_QUERIES=$Q3
run p4_scaled_b SPARK_GRAFT_SOAK_FACTORS=32,64 SPARK_GRAFT_SOAK_QUERIES=$Q3 SPARK_GRAFT_SOAK_SHUFFLE_SCALE=1

run p56_ladder SPARK_GRAFT_SOAK_FACTORS=1,8,16,32,64 \
  SPARK_GRAFT_SOAK_QUERIES=pipe_decontaminate_report,dedup_semantic_kmeans

# Part 3 — ladder capstone: ×128 (first time this high; ×32 caught what
# ×16 hid, so keep climbing) on the dedup/decon/mining families. Fixed
# 32 partitions so the ×64 rung overlaps r11's curve point-for-point;
# the partitions-∝-factor evidence comes from part 1's interleaved arms.
run p7_x128 SPARK_GRAFT_SOAK_FACTORS=64,128 \
  SPARK_GRAFT_SOAK_QUERIES=dedup_exact,dedup_containment,dedup_minhash_lsh,dedup_semantic,dedup_semantic_kmeans,pipe_decontaminate,pipe_decontaminate_fuzzy,pipe_decontaminate_semantic,pipe_decontaminate_report,sim_hard_negatives,text_uncertainty_sample

echo "ALL SOAKS DONE $(date +%T)"
