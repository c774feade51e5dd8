#!/usr/bin/env python3
"""Merge per-family .conf_r04/*.json into CONFORMANCE_r04.json and print
the docs summary table."""
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
out = {}
n_pass = n_all = 0
for p in sorted((REPO / ".conf_r04").glob("*.json")):
    d = json.loads(p.read_text())
    for fam, rows in d.items():
        out.setdefault(fam, []).extend(rows)
        for r in rows:
            n_all += 1
            n_pass += bool(r.get("pass"))
summary = {"families": len(out), "points": n_all, "passed": n_pass}
out["_summary"] = summary
(REPO / "CONFORMANCE_r04.json").write_text(json.dumps(out, indent=1))
print(json.dumps(summary))
print()
print("| family | points | pass | detail |")
print("|---|---|---|---|")
for fam in sorted(k for k in out if not k.startswith("_")):
    rows = out[fam]
    np_ = sum(bool(r.get("pass")) for r in rows)
    det = []
    for r in rows:
        bits = [f"{m}:{r[m].get('mld', r[m].get('rms_db', r[m].get('eng')))}"
                for m in ("encode", "encdec", "decode") if m in r]
        det.append(f"{r.get('point')} ({', '.join(bits)})")
    print(f"| {fam} | {len(rows)} | {np_}/{len(rows)} | {'; '.join(det)[:220]} |")
