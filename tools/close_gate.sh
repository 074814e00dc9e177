#!/usr/bin/env bash
# Round-close protocol check (r14 VERDICT #3: the final snapshot commit
# shipped a src/ change none of the gate artifacts covered — three
# invariant suites would have caught it and were never run on the
# shipping tree). Every final gate artifact (matrix, sbt test, quiet
# bench, PLANS.md) must be produced at the EXACT commit that ends the
# round; any later src/ change reopens the gate.
#
# Usage: tools/close_gate.sh <gate-commit> <matrix-summary>
#   <gate-commit> = the commit the gate artifacts were produced at.
#   <matrix-summary> = the round's matrix summary file. REQUIRED —
#     a round-pinned default here silently greps a stale summary
#     next round (fails closed, but forces per-round churn).
# Passes iff HEAD's product surface is identical to the gate commit's
# and the working tree carries no further product changes.
set -euo pipefail
cd /root/repo
GATE=${1:?usage: close_gate.sh <gate-commit> <matrix-summary>}

if ! git diff --quiet "$GATE" HEAD -- src/ build.sbt; then
  echo "FAIL: product code changed between gate commit $GATE and HEAD — regate:" >&2
  git diff --stat "$GATE" HEAD -- src/ build.sbt >&2
  exit 1
fi
if ! git diff --quiet -- src/ build.sbt || ! git diff --cached --quiet -- src/ build.sbt; then
  echo "FAIL: uncommitted product changes in the working tree — commit or drop, then regate:" >&2
  git status --short -- src/ build.sbt >&2
  exit 1
fi
S=${2:?usage: close_gate.sh <gate-commit> <matrix-summary>}
if [ -f "$S" ]; then
  if ! grep -q "MATRIX DONE at $(git rev-parse "$GATE")" "$S"; then
    echo "FAIL: matrix summary $S was not produced at gate commit $GATE" >&2
    tail -1 "$S" >&2
    exit 1
  fi
else
  echo "WARN: no matrix summary at $S — run the round's matrix script before closing" >&2
  exit 1
fi
echo "GATE OK: HEAD product surface matches gate commit $GATE and the matrix ran there"
