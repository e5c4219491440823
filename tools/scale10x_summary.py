#!/usr/bin/env python3
"""Assemble SCALE10X.json from the decade-up sweep's pieces:
verify outcome (tools/local_verify.py output), per-query seconds at
10x (SCALE10X_BENCH.json) and at 1x (BENCH_full.json), with the
wall-time ratio per query. Driver-side tooling only."""
import json, re, sys

verify_log = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale10x_verify.log"
bench10 = json.load(open("SCALE10X_BENCH.json"))
try:
    bench1 = json.load(open("BENCH_full.json"))["queries"]
except FileNotFoundError:
    bench1 = {}

ok = fails = rows_only = 0
fail_names = []
for line in open(verify_log):
    if line.startswith("  [ok]"):
        ok += 1
    elif line.startswith("  [rows-only]"):
        rows_only += 1
    elif line.startswith("FAIL"):
        m = re.match(r"FAIL (\S+)", line)
        if m and m.group(1).rstrip(":").rstrip(".") not in fail_names:
            fail_names.append(m.group(1).rstrip(":"))
all_ok = any(l.strip() == "ALL OK" for l in open(verify_log))

queries = {}
for name, sec10 in bench10["queries"].items():
    q = {"sec_10x": sec10}
    if name in bench1 and bench1[name] > 0 and sec10 > 0:
        q["sec_1x"] = bench1[name]
        q["ratio"] = round(sec10 / bench1[name], 2)
    queries[name] = q

ratios = sorted(
    (v["ratio"], k) for k, v in queries.items() if "ratio" in v)
summary = {
    "factor": 10,
    "base": bench1 and "BENCH_full.json (sf0.1)" or None,
    "verify": {"all_ok": all_ok, "ok": ok, "rows_only": rows_only,
               "failed": fail_names},
    "bench_total_sec_10x": bench10["value"],
    "bench_failed_10x": bench10.get("failed", []),
    "worst_ratios": [{"query": k, "ratio": r} for r, k in ratios[-10:]][::-1],
    "median_ratio": ratios[len(ratios) // 2][0] if ratios else None,
    "queries": queries,
}
json.dump(summary, open("SCALE10X.json", "w"), indent=1)
print(f"verify all_ok={all_ok} ok={ok} fails={fail_names}")
print(f"bench 10x total={bench10['value']:.1f}s, median ratio="
      f"{summary['median_ratio']}, worst={summary['worst_ratios'][:3]}")
