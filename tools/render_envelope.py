"""Render the honest perf envelope (VERDICT r4 item 8) as a markdown
table from docs/BENCH_EXTRA_r05.json — the rate-vs-faces curve across
scene classes, auto-dispatch vs per-mode. Paste the output into README.md
and docs/PERF.md.

    python tools/render_envelope.py [docs/BENCH_EXTRA_r05.json]
"""

from __future__ import annotations

import json
import sys
from collections import defaultdict


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "docs/BENCH_EXTRA_r05.json"
    rows = json.load(open(path))["results"]
    by_scene = defaultdict(dict)
    order = []
    for r in rows:
        if "error" in r or "value" not in r:
            continue
        key = (r["faces"], r["tag"])
        if key not in order:
            order.append(key)
        by_scene[key][r["mode"]] = r

    modes = ["auto", "pallas", "gated", "cull", "sweep"]
    used = [m for m in modes if any(m in v for v in by_scene.values())]
    print("| scene | faces | " + " | ".join(f"{m} M rays/s" for m in used)
          + " | auto ms/frame |")
    print("|---" * (len(used) + 3) + "|")
    for key in sorted(order):
        faces, tag = key
        v = by_scene[key]
        cells = []
        for m in used:
            if m in v:
                cells.append(f"{v[m]['value'] / 1e6:.2f}")
            else:
                cells.append("—")
        ms = v.get("auto", {}).get("ms_per_frame")
        ms_s = f"{ms:.1f}" if ms else "—"
        print(f"| {tag} | {faces} | " + " | ".join(cells) + f" | {ms_s} |")


if __name__ == "__main__":
    main()
