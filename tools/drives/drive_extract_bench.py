"""TPU micro-bench: ORB extraction device throughput.

Measures the production extract_jit on the real TPU two ways:
  * dependent-chain wall time over fresh staged frames (each iteration's
    input depends on the previous output, so the chain can't overlap;
    fresh pixels every call — the runtime memoizes identical executions),
  * XLA profiler device trace (jit_extract event durations).

Run on the REAL TPU: python tools/drives/drive_extract_bench.py [n_iters]
"""
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    print("devices:", jax.devices(), flush=True)
    from orbslam3_tpu.features.extractor import OrbParams, extract_jit

    p = OrbParams(n_features=1200, n_levels=8)
    HW = (480, 752)
    rng = np.random.default_rng(0)
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    # textured frames (FAST/selection work depends on corner density)
    base = rng.integers(0, 255, (HW[0] // 8, HW[1] // 8))
    tex = np.kron(base, np.ones((8, 8))).astype(np.float32)
    frames = [jnp.asarray(np.clip(
        tex + rng.normal(0, 8, HW), 0, 255).astype(np.uint8))
        for _ in range(iters)]
    jax.block_until_ready(frames[-1])

    @jax.jit
    def step(img, carry):
        ff = extract_jit((img.astype(jnp.float32) + 0.0 * carry)
                         .astype(jnp.uint8), p)
        return ff, ff.response[0]

    t0 = time.time()
    carry = jnp.asarray(0.0)
    ff, carry = step(frames[0], carry)
    jax.block_until_ready(carry)
    print(f"compile+first: {time.time() - t0:.1f}s "
          f"(n_valid {int(jnp.sum(ff.valid.astype(jnp.int32)))})",
          flush=True)

    t0 = time.time()
    for i in range(iters):
        ff, carry = step(frames[i], carry)
    jax.block_until_ready(carry)
    dt = time.time() - t0
    print(f"dependent chain: {1e3 * dt / iters:.3f} ms/frame "
          f"({iters / dt:.1f} fps)", flush=True)

    # device trace
    trace_dir = "/tmp/extract_trace"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for i in range(12):
            ff, carry = step(frames[i], carry)
        jax.block_until_ready(carry)
    time.sleep(1.0)
    evs = []
    for f in glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True):
        with gzip.open(f, "rt") as fh:
            tr = json.load(fh)
        for e in tr.get("traceEvents", []):
            if e.get("ph") == "X" and "jit_step" in e.get("name", ""):
                evs.append(e["dur"])
    if evs:
        evs = sorted(evs)
        print(f"device jit_step: n={len(evs)} median "
              f"{evs[len(evs) // 2] / 1e3:.3f} ms min {evs[0] / 1e3:.3f} "
              f"max {evs[-1] / 1e3:.3f}", flush=True)
    else:
        print("no jit_step events found in trace", flush=True)


if __name__ == "__main__":
    main()
