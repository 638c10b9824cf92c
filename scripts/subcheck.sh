#!/bin/bash
# Local triage: Verify-dump a SUBSET of queries at a small SF and run the
# DuckDB selfcheck on exactly that subset (oracle_sql.json pruned to the
# dumped dirs). Usage: scripts/subcheck.sh <sfDir> <outDir> <q1> [q2 ...]
set -e
SF="$1"; OUT="$2"; shift 2
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-8} sbt -batch \
  "runMain graft.Verify $SF $OUT $*" 2>&1 | grep -E "\[verify\]|error\]" || true
python3 - "$OUT" <<'EOF'
import json, os, sys
out = sys.argv[1]
o = json.load(open(os.path.join(out, "oracle_sql.json")))
keep = {k: v for k, v in o.items() if os.path.isdir(os.path.join(out, k))}
json.dump(keep, open(os.path.join(out, "oracle_sql.json"), "w"))
print(f"pruned oracle_sql.json to {len(keep)} dumped queries")
EOF
python3 scripts/selfcheck.py "$SF" "$OUT"
