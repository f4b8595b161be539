"""XLA flag sweep for the bench step (each flag set in a fresh subprocess).

The trace profile (tools/prof_trace.py) shows ~21 ms device-busy vs ~28 ms
wall per frame: ~300 sequential HLO ops leave launch/scheduling gaps, and
many fusions run well under HBM peak. Candidate knobs:

- ``xla_tpu_scoped_vmem_limit_kib``: larger scoped VMEM lets XLA build
  bigger fusions (fewer ops, fewer gaps, better locality).
- ``xla_tpu_enable_latency_hiding_scheduler``: overlap DMA with compute.

Runs ``bench.py --iters 2`` per flag set and reports the JSON line.

    python tools/prof_xlaflags.py
"""

import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FLAG_SETS = [
    ("baseline", ""),
    ("vmem64m", "--xla_tpu_scoped_vmem_limit_kib=65536"),
    ("lhs", "--xla_tpu_enable_latency_hiding_scheduler=true"),
    (
        "vmem64m+lhs",
        "--xla_tpu_scoped_vmem_limit_kib=65536 "
        "--xla_tpu_enable_latency_hiding_scheduler=true",
    ),
]


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


for name, flags in FLAG_SETS:
    env = dict(os.environ)
    base = env.get("XLA_FLAGS", "")
    env["XLA_FLAGS"] = (base + " " + flags).strip()
    # Flags change generated code: do not reuse (or pollute) the shared cache.
    env["PBR_TPU_CACHE_DIR"] = f"/tmp/pbr_tpu_jax_cache_{name}"
    log(f"=== {name}: XLA_FLAGS='{flags}'")
    t0 = time.time()
    try:
        out = subprocess.run(
            [sys.executable, "bench.py", "--iters", "2"],
            cwd=ROOT, env=env, capture_output=True, text=True, timeout=1800,
        )
        tail = (out.stderr or "").strip().splitlines()[-3:]
        for line in tail:
            log(f"  {line}")
        log(f"  stdout: {(out.stdout or '').strip()}  ({time.time()-t0:.0f}s)")
    except subprocess.TimeoutExpired:
        log(f"  TIMEOUT after {time.time()-t0:.0f}s")
log("done")
