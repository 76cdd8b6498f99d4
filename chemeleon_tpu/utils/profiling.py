"""Tracing / profiling hooks.

The reference has no profiling at all (SURVEY §5 — tqdm bars only). Here:

  * ``trace(log_dir)`` — context manager around ``jax.profiler`` producing a
    TensorBoard/Perfetto trace of everything inside (cheap: the sampler is
    one compiled scan).
  * ``Timer`` / ``timed`` — lightweight wall-clock phase timing with a
    report, used by the CLI's ``--profile`` paths and the bench.
  * ``profile_sampler`` — per-phase breakdown of a sampling call
    (text encode / compile / device scan / host conversion).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler device trace into ``log_dir``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            lines.append(f"{name:<30s} {total * 1000:10.2f} ms "
                         f"(x{self.counts[name]})")
        return "\n".join(lines)


@contextlib.contextmanager
def timed(name: str) -> Iterator[None]:
    t0 = time.perf_counter()
    try:
        yield
    finally:
        print(f"[chemeleon-tpu] {name}: "
              f"{(time.perf_counter() - t0) * 1000:.1f} ms")


def profile_sampler(model, text: str, n_atoms: int, n_samples: int,
                    key: Optional[jax.Array] = None,
                    trace_dir: Optional[str] = None) -> Dict[str, float]:
    """Phase breakdown of one sampling call (compile measured separately via
    a warm-up run). Returns {phase: seconds}."""
    import jax.numpy as jnp
    import numpy as np
    from chemeleon_tpu.ops.graph import make_empty_batch
    from chemeleon_tpu.utils.trajectory import TrajectoryStep

    if key is None:
        key = jax.random.PRNGKey(0)
    cfg = model.cfg
    timer = Timer()
    natoms = [n_atoms] * n_samples
    texts = [text] * n_samples

    with timer("text_encode"):
        batch0 = make_empty_batch(natoms, buckets=cfg.pad_buckets)
        B, N = batch0.atom_types.shape
        text_embeds = null_embeds = jnp.zeros((B, max(cfg.text_dim, 1)))
        if cfg.text_guide:
            text_embeds, null_embeds = model.text_encoder.embed_cond_and_null(
                model.params["text"], texts)
        text_embeds.block_until_ready()

    run = model._get_compiled_sampler(B, N, False, None)
    ts = jnp.arange(cfg.timesteps, 0, -1)
    args = (model.params["decoder"], batch0.natoms, text_embeds, null_embeds,
            key, 2.0, 1e-5, ts)
    with timer("compile_plus_first_run"):
        final, _ = run(*args)
        jax.block_until_ready(final)

    ctx = trace(trace_dir) if trace_dir else contextlib.nullcontext()
    with ctx:
        with timer("device_scan"):
            final, _ = run(*args)
            jax.block_until_ready(final)

    with timer("host_convert"):
        step = TrajectoryStep(natoms=np.asarray(batch0.natoms),
                              atom_types=np.asarray(final.atom_types),
                              frac_coords=np.asarray(final.frac_coords),
                              lattices=np.asarray(final.lattices))
        step.get_crystals()

    print(timer.report())
    return dict(timer.totals)
