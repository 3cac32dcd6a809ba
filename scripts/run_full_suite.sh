#!/bin/bash
# Full test-suite artifact run (VERDICT r2 Weak #8): run every test file
# separately, appending to artifacts/testreport_r03.txt so partial
# progress survives interruption; a file already marked done is skipped
# on re-run (resumable).
set -u
cd "$(dirname "$0")/.."
OUT=artifacts/testreport_r04.txt
mkdir -p artifacts

if ! grep -q "^# Full test-suite run" "$OUT" 2>/dev/null; then
  {
    echo "# Full test-suite run, round 4"
    echo "# started: $(date -u +%Y-%m-%dT%H:%M:%SZ)  host: 1-core CPU, virtual 8-device mesh"
    echo "# git: $(git rev-parse HEAD)"
  } > "$OUT"
fi

for f in tests/test_*.py; do
  name=$(basename "$f")
  if grep -q "^== DONE $name rc=0 ==" "$OUT" 2>/dev/null; then
    echo "skip $name (already recorded)"
    continue
  fi
  # drop any partial section for this file from an interrupted run
  python - "$OUT" "$name" <<'EOF'
import sys
out, name = sys.argv[1], sys.argv[2]
lines = open(out).read().splitlines(True)
try:
    i = lines.index(f"== {name} ==\n")
    open(out, "w").writelines(lines[:i])
except ValueError:
    pass
EOF
  echo "== $name ==" >> "$OUT"
  timeout 14400 python -m pytest "tests/$name" -q --no-header -p no:cacheprovider \
    2>&1 | tail -40 >> "$OUT"
  rc=${PIPESTATUS[0]}
  echo "== DONE $name rc=$rc ==" >> "$OUT"
done
echo "# finished: $(date -u +%Y-%m-%dT%H:%M:%SZ)" >> "$OUT"
