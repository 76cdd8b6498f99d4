"""Staged probe for bench.py wall-time anomalies (round-4 postmortem).

Round-4 finding: bench.py is SLOW, not wedged. A 30-min silent run was a
cache-hit run whose time went to single-core Python work (the validity
cells' soft-sphere FIRE relaxation of every invalid sample) — this host
has nproc=1 after the mid-round reset, and bench prints its one JSON line
only at the very end. Measured: exit 124 at a 1500 s timeout, success at
2700 s even contended by a concurrent pytest. Budget >= 45 min for bench
on a 1-core host; run nothing else beside it.

Kept as the staged-progress template: prints after each stage (flushed)
plus a faulthandler watchdog, so the next "bench is silent" episode can be
localized in minutes instead of guessed at.
"""
import faulthandler
import os
import sys
import time

faulthandler.dump_traceback_later(120, repeat=True, file=sys.stderr)

t0 = time.perf_counter()


def mark(msg):
    print(f"[{time.perf_counter() - t0:8.1f}s] {msg}", flush=True)


mark("importing jax")
import jax  # noqa: E402

mark(f"devices: {jax.devices()}")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import BUCKET_BATCH, MP40_BUCKET_MIX, _enable_compilation_cache  # noqa: E402

_enable_compilation_cache()
mark("compilation cache enabled")

from chemeleon_tpu.config import get_config  # noqa: E402
from chemeleon_tpu.models.chemeleon import Chemeleon  # noqa: E402

buckets = sorted(MP40_BUCKET_MIX)
cfg = get_config(None, timesteps=1000, compute_dtype="bfloat16",
                 pad_buckets=tuple(buckets))
model = Chemeleon(cfg, text_backend="hash")
mark("model constructed")

model.init_params(jax.random.PRNGKey(0))
mark("params initialized")

n = buckets[0]
B = BUCKET_BATCH[n]
mark(f"first sample: N={n} B={B} T=1000 (compile)")
out = model.sample("bench", n, B, key=jax.random.PRNGKey(1))
mark(f"first sample done: {len(out)} crystals")

t1 = time.perf_counter()
out = model.sample("bench", n, B, key=jax.random.PRNGKey(2))
mark(f"second sample (warm) done in {time.perf_counter() - t1:.1f}s")
print("STALL-REPRO OK", flush=True)
