"""Memory-system diagnostics behind session.py's malloc tuning and
scaling.py's core probing (round-3 measurements on the sandbox host).

Findings this reproduces:

1. First-touch page faults are the hazard, not steady-state DRAM: a cold
   4 MB-buffer copy probe reads 0.0-3 GB/s per core with wild asymmetry,
   but after ONE warm pass every core reads ~20-25 GB/s and the aggregate
   envelope scales 13.6 (1 core) -> 38 (4) -> 145 GB/s (16). The
   "slow cores 0-7" pattern seen on cold probes is fault-service
   contention, not core identity.
2. glibc's default M_MMAP_THRESHOLD (128 KB) makes every large numpy
   temporary a fresh mmap whose pages return to the OS on free — so each
   kernel iteration re-faults its temps, and fault service both serializes
   across processes and is pathologically slow on this host's virtual
   memory backend. MALLOC_MMAP_THRESHOLD_=1GB + MALLOC_TRIM_THRESHOLD_=1GB
   keeps the chunks reusable: a 4-process numpy streaming loop (24 MB
   temps per iteration) measured 13.9 s -> 2.75 s wall, same work.

Usage: python scripts/diag_membw.py  (prints all three experiments;
~60 s). The production knobs derived from this live in
codem_spark/session.py (_malloc_tuning) and scripts/scaling.py
(probe_core_bandwidth / probe_aggregate_bandwidth).
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_scaling():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "scaling", os.path.join(REPO, "scripts", "scaling.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _streaming_control(env: dict[str, str], procs: int, iters: int = 48) -> float:
    """Fixed-total-work numpy streaming loop split over `procs` processes."""
    code = (
        "import os, sys, time\n"
        "import numpy as np\n"
        "from multiprocessing import Process\n"
        "def w(n):\n"
        "    rng = np.random.default_rng(0)\n"
        "    a = rng.standard_normal(3_000_000); b = rng.standard_normal(3_000_000)\n"
        "    s = 0.0\n"
        "    for _ in range(n):\n"
        "        d = a - b\n"
        "        s += float(np.einsum('i,i->i', d, d).sum() * 1e-12)\n"
        "        s += float(np.argsort(d[:500_000])[0])\n"
        "    os._exit(0)\n"
        f"P = {procs}\n"
        f"ps = [Process(target=w, args=({iters} // P,)) for _ in range(P)]\n"
        "t0 = time.time()\n"
        "[p.start() for p in ps]; [p.join() for p in ps]\n"
        "print(f'{time.time()-t0:.2f}')\n"
    )
    full_env = dict(os.environ)
    full_env.update(env)
    full_env["OMP_NUM_THREADS"] = "1"
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, env=full_env
    )
    return float(out.stdout.strip().splitlines()[-1])


def main() -> None:
    sc = _load_scaling()
    print("== per-core copy bandwidth (warm), GB/s ==")
    t0 = time.time()
    bw = sc.probe_core_bandwidth(0.2)
    print([round(x, 1) for x in bw], f"({time.time() - t0:.1f}s)")
    base = max(range(len(bw) - 15), key=lambda b: sum(bw[b : b + 16]))
    window = list(range(base, base + 16))
    print(f"fastest 16-core window: {base}-{base + 15}")
    print("== aggregate envelope (warm), GB/s ==")
    for n in (1, 4, 16):
        print(f"  {n:>2} cores: {sc.probe_aggregate_bandwidth(window[:n], 1.5):.1f}")
    print("== malloc-threshold A/B on a streaming numpy loop (lower is better) ==")
    tuned = {"MALLOC_MMAP_THRESHOLD_": str(1 << 30), "MALLOC_TRIM_THRESHOLD_": str(1 << 30)}
    for label, env in (("glibc defaults", {}), ("1 GB thresholds", tuned)):
        w4 = _streaming_control(env, 4)
        w16 = _streaming_control(env, 16)
        print(f"  {label:>16}: P=4 {w4:.2f}s   P=16 {w16:.2f}s")


if __name__ == "__main__":
    main()
