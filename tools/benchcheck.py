#!/usr/bin/env python3
"""Gate on a self-defending bench run: exit 1 if BENCH.json flags contention.

Usage: python3 tools/benchcheck.py [BENCH.json]

The bench already records per-query best-of-2 (plus a band-guarded retry);
a query lands in "contended" only if its min stayed >3x its historical band
after three timed passes. That means either sustained co-tenant load or a
real plan regression -- both are reasons to look before trusting the total.
"""
import json
import sys

path = sys.argv[1] if len(sys.argv) > 1 else "BENCH.json"
with open(path) as f:
    b = json.load(f)

contended = b.get("contended", [])
print(f"total={b.get('value')}s  loadavg_start={b.get('loadavg_start')}  "
      f"loadavg_end={b.get('loadavg_end')}  contended={contended or 'none'}")
if contended:
    print("bench POLLUTED or regressed: re-run the flagged queries solo "
          "(sbt 'runMain graft.tools.TimeQuery <sfDir> " +
          " ".join(contended) + "')")
    sys.exit(1)
