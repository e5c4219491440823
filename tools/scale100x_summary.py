#!/usr/bin/env python3
"""Assemble SCALE100X.json from the two-decade spot sweep's pieces
(tools/scale100x.sh): per-entry 10x and 100x isolated wall times for
the SNM and graph families, the grouped byteneutral text bench at both
scales, the 100x value-verify outcomes, and the 100x SNM recall.

The artifact's point is the SECOND-decade ratio (100x/10x): the SNM
window cap engages during the FIRST decade, so DEPLOY.md predicts the
second decade is ~linear (ratio ~10) — this is where that prediction
is checked against a measurement.

Usage: scale100x_summary.py [verify_log]
Driver-side tooling only — NOT part of the library.
"""
import glob, json, os, re, sys

def load_entry(path, name):
    if not os.path.exists(path):
        return None
    v = json.load(open(path))["queries"].get(name)
    return v if v is not None and v > 0 else None

summary = {"factor_per_decade": 10,
           "scales": ["10x (~sf1)", "30x (~sf3, SNM past-cap probe)",
                      "100x (~sf10)"],
           "base_corpus": "/root/testdata/sf0.1"}

# ---- SNM family ----------------------------------------------------------
# The full 100x leg is DISK-infeasible for this family on one box: past
# the 256 cap candidates are 255*n, and at n=5M the 1.28B-candidate
# sort spills ~75 GB — more than this box's free disk (both 100x
# dedup_snm legs died in UnsafeExternalSorter with ENOSPC, r17). On a
# cluster that sort shards trivially (~58 B/candidate); on this box the
# past-cap linearity is probed at 30x (384M candidates, ~22 GB spill),
# where linear-in-n predicts a 30x/10x wall ratio of ~3.
snm = {}
for p in glob.glob("/tmp/graft_s100_snm_10x_*.json"):
    name = os.path.basename(p)[len("graft_s100_snm_10x_"):-len(".json")]
    row = {}
    s10 = load_entry(p, name)
    s30 = load_entry(f"/tmp/graft_s100_snm_30x_{name}.json", name)
    s100 = load_entry(f"/tmp/graft_s100_snm_100x_{name}.json", name)
    s10bn = load_entry(f"/tmp/graft_s100_snm_10xbn_{name}.json", name)
    s30bn = load_entry(f"/tmp/graft_s100_snm_30xbn_{name}.json", name)
    s100bn = load_entry(f"/tmp/graft_s100_snm_100xbn_{name}.json", name)
    row["sec_10x"], row["sec_30x"], row["sec_100x"] = s10, s30, s100
    row["sec_10x_byteneutral"] = s10bn
    row["sec_30x_byteneutral"] = s30bn
    row["sec_100x_byteneutral"] = s100bn
    if s10 and s30:
        row["pastcap_3x_ratio"] = round(s30 / s10, 2)
    if s10bn and s30bn:
        row["pastcap_3x_ratio_byteneutral"] = round(s30bn / s10bn, 2)
    if s10 and s100:
        row["decade2_ratio"] = round(s100 / s10, 2)
    if s10bn and s100bn:
        row["decade2_ratio_byteneutral"] = round(s100bn / s10bn, 2)
    snm[name] = row
if snm:
    summary["snm_isolated"] = snm
    r = snm.get("dedup_snm", {}).get("decade2_ratio_byteneutral")
    r3 = snm.get("dedup_snm", {}).get("pastcap_3x_ratio_byteneutral")
    summary["snm_prediction_check"] = {
        "prediction": ("window saturated at 256 during decade 1, so past "
                       "the cap wall is linear in n: byteneutral ratio ~10 "
                       "for 10x->100x, ~3 for the 10x->30x probe, down from "
                       "the 14-21x cap-transition decade (DEPLOY.md, "
                       "sorted-neighborhood section)"),
        "onebox_100x_bound": ("100x infeasible on one box: the 1.28B-"
                              "candidate sort (255*n at n=5M, ~58 B each) "
                              "needs ~75 GB spill > free disk; both 100x "
                              "dedup_snm legs died with ENOSPC (r17). "
                              "Probed at 30x instead (384M candidates)."),
        "measured_dedup_snm_pastcap_3x_ratio_byteneutral": r3,
        "measured_dedup_snm_decade2_ratio_byteneutral": r,
        "verdict": ("CONFIRMED (~linear past cap)" if
                    (r is not None and r <= 13) or
                    (r is None and r3 is not None and r3 <= 4) else
                    None if r is None and r3 is None else
                    f"NOT confirmed (ratios bn100x={r} bn30x={r3})")}

# ---- text family (byteneutral, grouped) ---------------------------------
t10 = ("/tmp/graft_s100_text_10xbn.json")
t100 = ("/tmp/graft_s100_text_100xbn.json")
if os.path.exists(t10) and os.path.exists(t100):
    q10 = json.load(open(t10))["queries"]
    q100 = json.load(open(t100))["queries"]
    text = {}
    for name, s100 in q100.items():
        row = {"sec_10x_byteneutral": q10.get(name),
               "sec_100x_byteneutral": s100}
        if q10.get(name) and s100 and q10[name] > 0 and s100 > 0:
            row["decade2_ratio"] = round(s100 / q10[name], 2)
        text[name] = row
    summary["text_byteneutral"] = text
    ratios = sorted(v["decade2_ratio"] for v in text.values()
                    if "decade2_ratio" in v)
    if ratios:
        summary["text_median_decade2_ratio"] = ratios[len(ratios) // 2]

# ---- graph family --------------------------------------------------------
graph = {}
for p in glob.glob("/tmp/graft_s100_graph_10x_*.json"):
    name = os.path.basename(p)[len("graft_s100_graph_10x_"):-len(".json")]
    s10 = load_entry(p, name)
    s100 = load_entry(f"/tmp/graft_s100_graph_100x_{name}.json", name)
    row = {"sec_10x": s10, "sec_100x": s100}
    if s10 and s100:
        row["decade2_ratio"] = round(s100 / s10, 2)
    graph[name] = row
if graph:
    summary["graph_isolated"] = graph

# ---- 100x verify outcomes ------------------------------------------------
logs = sys.argv[1:] or ["/tmp/scale100x_verify.log"]
status = {}
for lg in logs:
    if not os.path.exists(lg):
        continue
    for line in open(lg):
        m = re.match(r"  \[(ok|rows-only|ok-exempt)\] (\S+):", line)
        if m:
            status[m.group(2)] = m.group(1)
            continue
        m = re.match(r"FAIL (\S+?)[.:]", line)
        if m:
            status[m.group(1)] = "FAIL"
if status:
    summary["verify_100x"] = {
        "ok": sum(1 for v in status.values() if v in ("ok", "ok-exempt")),
        "compared": len(status),
        "failed": sorted(k for k, v in status.items() if v == "FAIL"),
        "entries": status}

# ---- SNM recall at 100x (plus the lower scales for the trend) -----------
recall = {}
for scale, path in [("1x", "/tmp/graft_snm_recall_1x.json"),
                    ("10x", "/tmp/graft_snm_recall_10x.json"),
                    ("30x", "/tmp/graft_snm_recall_30x.json"),
                    ("100x", "/tmp/graft_snm_recall_100x.json")]:
    if os.path.exists(path):
        recall[scale] = json.load(open(path))
if recall:
    summary["snm_recall"] = recall

json.dump(summary, open("SCALE100X.json", "w"), indent=1)
pc = summary.get("snm_prediction_check", {})
print(f"snm past-cap bn ratios: 30x/10x="
      f"{pc.get('measured_dedup_snm_pastcap_3x_ratio_byteneutral')} "
      f"100x/10x={pc.get('measured_dedup_snm_decade2_ratio_byteneutral')} "
      f"-> {pc.get('verdict')}")
if "verify_100x" in summary:
    v = summary["verify_100x"]
    print(f"verify 100x: ok={v['ok']}/{v['compared']} fails={v['failed']}")
