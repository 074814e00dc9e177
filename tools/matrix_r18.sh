#!/usr/bin/env bash
# Round-18 round-end determinism matrix.
#
# Identical axes to matrix_r17.sh (no knob changes in r18 either):
#  - the sf0.1 armed battery rows (null01, uni01, skew01) are STANDING
#    (r15 VERDICT #2): null01 at sf0.1 is the row that caught the int8
#    candidate flood — sf0.01 arms structurally cannot exceed the
#    50-candidate margin (~15 garbage vectors vs ~125), so the sf0.1
#    armed rows are the only in-matrix grader for every count-shaped
#    knob above its threshold. The full knob-vs-arm-cardinality audit
#    (which row/fixture grades each cap above threshold) lives in
#    NOTES_r16 §5 (unchanged this round — no knob changes in r18).
#  - everything else identical to r16: standing axes first, injected
#    rows at CPUS=10 (parallelism invariance is graded), composed
#    triple nsu + moneydup pair.
#
# Serializes sbt; run under nohup. Results -> /tmp/matrix_r18_summary.txt
set -uo pipefail
cd /root/repo
S=/tmp/matrix_r18_summary.txt
: > $S
echo "gate-commit: $(git rev-parse HEAD) ($(git diff --stat -- src/ | tail -1 | sed 's/^ *//;s/ *$//'))" | tee -a $S

run() { # label sfdir extra-env...
  local label="$1" sfdir="$2"; shift 2
  local out="/tmp/mx18_${label}"
  env "$@" sbt -batch "runMain graft.Verify $sfdir $out" > "/tmp/mx18_${label}.log" 2>&1
  local crashes; crashes=$(grep -c 'verify\].*failed' "/tmp/mx18_${label}.log" || true)
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
python3 tools/unicodify.py /tmp/mxc_nullskew    /tmp/mxc_nsu      > /dev/null
python3 tools/dupify.py   /tmp/mxc_null001      /tmp/mxc_moneydup > /dev/null

# STANDING axes first (memory rule), then the extended axes.
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
