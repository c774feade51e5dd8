#!/usr/bin/env python3
"""Render the conformance JSON into a styled HTML pass/fail report.

The reference harness emits an HTML summary per run
(conformance/lc3_conformance.py:144-177,966+); this is the equivalent for
tools/conformance.py output: one table per family, one row per operating
point, per-leg metric values with pass/fail coloring and the criterion
used for each leg, plus a totals banner.

Usage: python tools/report.py CONFORMANCE.json [out.html]
"""
from __future__ import annotations

import html
import json
import sys
from pathlib import Path

_CSS = """
body { font-family: -apple-system, 'Segoe UI', sans-serif; margin: 2em;
       color: #1a1a1a; }
h1 { font-size: 1.4em; } h2 { font-size: 1.1em; margin-top: 1.6em; }
table { border-collapse: collapse; margin: 0.6em 0; font-size: 0.88em; }
th, td { border: 1px solid #ccc; padding: 4px 10px; text-align: left; }
th { background: #f2f2f2; }
.pass { background: #e6f4e6; } .fail { background: #f8e0e0; }
.badge { padding: 1px 8px; border-radius: 8px; font-weight: 600; }
.badge.ok { background: #2e7d32; color: white; }
.badge.bad { background: #c62828; color: white; }
.crit { color: #777; font-size: 0.85em; }
.banner { padding: 10px 16px; border-radius: 6px; display: inline-block;
          font-weight: 600; }
.banner.ok { background: #e6f4e6; border: 1px solid #2e7d32; }
.banner.bad { background: #f8e0e0; border: 1px solid #c62828; }
"""

_LEGS = ("encode", "encdec", "decode", "odg")


def _leg_cell(leg: dict | None) -> str:
    if leg is None:
        return "<td>—</td>"
    if "error" in leg:
        return f"<td class=fail>error: {html.escape(str(leg['error'])[:60])}</td>"
    bits = leg.get("bits")
    vals = []
    if bits is not None:
        vals.append(f"{bits} bit / {leg.get('rms_db', '')} dB")
    if "mld" in leg:
        vals.append(f"MLD {leg['mld']}")
    if "delta" in leg:
        vals.append(f"ΔODG {leg['delta']} (ref {leg.get('ref')})")
    if "eng" in leg or "eng_db" in leg:
        vals.append(f"ΔE {leg.get('eng', leg.get('eng_db'))}")
    crit = leg.get("criterion") or leg.get("metric", "")
    ok = leg.get("pass")
    cls = "pass" if ok else "fail"
    return (f"<td class={cls}>{html.escape('; '.join(map(str, vals)))} "
            f"<span class=crit>[{html.escape(str(crit))}]</span></td>")


def render(results: dict) -> str:
    out = ["<html><head><meta charset='utf-8'>",
           f"<style>{_CSS}</style></head><body>",
           "<h1>audio_codec_tpu conformance report</h1>"]
    n_all = n_pass = 0
    body = []
    for fam, rows in results.items():
        if fam.startswith("_"):     # metadata (e.g. _summary), not rows
            continue
        body.append(f"<h2>{html.escape(fam)}</h2><table><tr><th>point</th>"
                    + "".join(f"<th>{m}</th>" for m in _LEGS)
                    + "<th>verdict</th></tr>")
        for r in rows:
            n_all += 1
            ok = bool(r.get("pass"))
            n_pass += ok
            cells = "".join(_leg_cell(r.get(m)) for m in _LEGS)
            badge = ("<span class='badge ok'>PASS</span>" if ok
                     else "<span class='badge bad'>FAIL</span>")
            extra = ""
            if "error" in r:
                extra = f" <span class=crit>{html.escape(str(r['error'])[:80])}</span>"
            body.append(f"<tr><td>{html.escape(str(r.get('point', fam)))}"
                        f"{extra}</td>{cells}<td>{badge}</td></tr>")
        body.append("</table>")
    cls = "ok" if n_pass == n_all else "bad"
    out.append(f"<p><span class='banner {cls}'>{n_pass}/{n_all} points pass"
               f" across {len(results)} families</span></p>")
    out += body
    out.append("</body></html>")
    return "\n".join(out)


def main() -> int:
    src = Path(sys.argv[1])
    dst = Path(sys.argv[2]) if len(sys.argv) > 2 else src.with_suffix(".html")
    dst.write_text(render(json.loads(src.read_text())))
    print(f"wrote {dst}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
