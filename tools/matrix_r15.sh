#!/usr/bin/env bash
# Round-15 round-end determinism matrix (standing rule + r15 axes).
#
# r15 deltas over matrix_r14.sh:
#  - nullify.py now carries the ±Inf embedding-component arms (r15a,
#    vec_id %101/%103) ON TOP of the r14f money arms — the null rows
#    grade the whole dirty-float surface: measures, events.value,
#    embeddings NaN/zero/±Inf.
#  - composed TRIPLE null∘skew∘unicode (r14 VERDICT #8: the pairwise
#    compositions were green first run — raise the bar one notch) and
#    the money∘dup pair (money arms ride nullify; dupify on top
#    stresses the dedup tiers' survivor contracts against sanitized-
#    NULL measures).
#  - round-close gate check: the caller records `git rev-parse HEAD`
#    into the summary, and close_gate.sh asserts src/ is untouched
#    between this run's commit and the round-end commit.
#
# Serializes sbt; run under nohup. Results -> /tmp/matrix_r15_summary.txt
set -uo pipefail
cd /root/repo
S=/tmp/matrix_r15_summary.txt
: > $S
echo "gate-commit: $(git rev-parse HEAD) ($(git diff --stat -- src/ | tail -1 | sed 's/^ *//;s/ *$//'))" | tee -a $S

run() { # label sfdir extra-env...
  local label="$1" sfdir="$2"; shift 2
  local out="/tmp/mx_${label}"
  env "$@" sbt -batch "runMain graft.Verify $sfdir $out" > "/tmp/mx_${label}.log" 2>&1
  local crashes; crashes=$(grep -c 'verify\].*failed' "/tmp/mx_${label}.log" || true)
  local res; res=$(python3 tools/check.py "$sfdir" "$out" 2>&1 | tail -1)
  echo "$label: $res (spark-crashes=$crashes)" | tee -a $S
}

# injected corpora at HEAD
python3 tools/nullify.py  /root/testdata/sf0.01 /tmp/mxc_null001  > /dev/null
python3 tools/nullify.py  /root/testdata/sf0.1  /tmp/mxc_null01   > /dev/null
python3 tools/emptify.py  /root/testdata/sf0.01 /tmp/mxc_empty    > /dev/null
python3 tools/unicodify.py /root/testdata/sf0.01 /tmp/mxc_uni001  > /dev/null
python3 tools/unicodify.py /root/testdata/sf0.1  /tmp/mxc_uni01   > /dev/null
python3 tools/dupify.py   /root/testdata/sf0.01 /tmp/mxc_dup      > /dev/null
python3 tools/skewify.py  /root/testdata/sf0.01 /tmp/mxc_skew001  > /dev/null
python3 tools/skewify.py  /root/testdata/sf0.1  /tmp/mxc_skew01   > /dev/null
python3 tools/nullify.py  /tmp/mxc_skew001      /tmp/mxc_nullskew > /dev/null
python3 tools/dupify.py   /tmp/mxc_uni001       /tmp/mxc_dupuni   > /dev/null
# r15 composed triple + money∘dup
python3 tools/unicodify.py /tmp/mxc_nullskew    /tmp/mxc_nsu      > /dev/null
python3 tools/dupify.py   /tmp/mxc_null001      /tmp/mxc_moneydup > /dev/null

# STANDING axes first (memory rule: sf0.01+sf0.1 stock, CPUS=7, AQE=0,
# null, empty, env arms), then the r14/r15 extended axes. Injected rows
# run at SPARK_GRAFT_CPUS=10: the battery is partition-order
# deterministic and must hash-green under ANY parallelism (that
# invariance is itself part of what the matrix grades — stock001@4 and
# cpus7@7 keep the historical low-parallelism points), and the higher
# setting keeps the 18-row matrix inside the round's wall clock.
run stock001   /root/testdata/sf0.01
run stock01    /root/testdata/sf0.1  SPARK_GRAFT_CPUS=10
run cpus7      /root/testdata/sf0.01 SPARK_GRAFT_CPUS=7
run aqe0       /root/testdata/sf0.01 SPARK_GRAFT_AQE=0
run null001    /tmp/mxc_null001      SPARK_GRAFT_CPUS=10
run null01     /tmp/mxc_null01       SPARK_GRAFT_CPUS=10
run empty      /tmp/mxc_empty        SPARK_GRAFT_CPUS=10
run kmiters0   /root/testdata/sf0.01 SPARK_GRAFT_SEM_KMEANS_ITERS=0 SPARK_GRAFT_CPUS=10
run traincap2  /root/testdata/sf0.01 SPARK_GRAFT_SEM_TRAIN_CAP=2 SPARK_GRAFT_CPUS=10
run moneydup   /tmp/mxc_moneydup     SPARK_GRAFT_CPUS=10
run nsu        /tmp/mxc_nsu          SPARK_GRAFT_CPUS=10
run uni001     /tmp/mxc_uni001       SPARK_GRAFT_CPUS=10
run dup        /tmp/mxc_dup          SPARK_GRAFT_CPUS=10
run skew001    /tmp/mxc_skew001      SPARK_GRAFT_CPUS=10
run nullskew   /tmp/mxc_nullskew     SPARK_GRAFT_CPUS=10
run dupuni     /tmp/mxc_dupuni       SPARK_GRAFT_CPUS=10
run uni01      /tmp/mxc_uni01        SPARK_GRAFT_CPUS=10
run skew01     /tmp/mxc_skew01       SPARK_GRAFT_CPUS=10
echo "MATRIX DONE at $(git rev-parse HEAD)" | tee -a $S
