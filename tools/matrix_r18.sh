#!/usr/bin/env bash
# Round-18 round-end determinism matrix.
#
# r18 deltas over matrix_r17.sh — TRIMMED to fit the round's wall
# budget (the r18 session spent its sbt-serialized hours on the
# VERDICT-mandated soak ladders + interleaved A/Bs):
#  - adds stock0001 (sf0.001) so all three SFs are gated in-matrix.
#  - drops the knob arms kmiters0/traincap2 (NO knob changed in r18 —
#    both knobs' code paths are byte-identical to the r17-gated tree)
#    and the composed axes nsu/moneydup/dupuni (every component axis —
#    null, skew, unicode, dup — still runs individually at CPUS=10;
#    r14-r17 never saw a composed-only failure).
#  - everything kept is the standing set: 3 stock SFs, CPUS=7/10,
#    AQE=0 (this round changes physical plan shapes — the AQE-off row
#    is the one that grades plan-shape invariance), null/empty/unicode/
#    dup/skew at sf0.01, and the STANDING sf0.1 armed rows (null01,
#    uni01, skew01 — r15 VERDICT #2).
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
# STANDING axes first (memory rule), then the armed sf0.1 rows.
run stock0001  /root/testdata/sf0.001
run stock001   /root/testdata/sf0.01
run stock01    /root/testdata/sf0.1  SPARK_GRAFT_CPUS=10
run cpus7      /root/testdata/sf0.01 SPARK_GRAFT_CPUS=7
run aqe0       /root/testdata/sf0.01 SPARK_GRAFT_AQE=0
run null001    /tmp/mxc_null001      SPARK_GRAFT_CPUS=10
run null01     /tmp/mxc_null01       SPARK_GRAFT_CPUS=10
run empty      /tmp/mxc_empty        SPARK_GRAFT_CPUS=10
run uni001     /tmp/mxc_uni001       SPARK_GRAFT_CPUS=10
run dup        /tmp/mxc_dup          SPARK_GRAFT_CPUS=10
run skew001    /tmp/mxc_skew001      SPARK_GRAFT_CPUS=10
run uni01      /tmp/mxc_uni01        SPARK_GRAFT_CPUS=10
run skew01     /tmp/mxc_skew01       SPARK_GRAFT_CPUS=10
echo "MATRIX DONE at $(git rev-parse HEAD)" | tee -a $S
