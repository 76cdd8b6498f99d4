"""On-chip serving throughput bench: stream coalescing + dynamic batching.

Round 2 measured the /generate dynamic-batching win (3.0x for 8 concurrent
requests); round 3 added coalescing of concurrent /predict STREAMS into one
chunked scan per window (serve/server.py; the reference scales streams with
``workers_per_device=4`` GPU workers instead, app/server.py:55-58). This
script measures both effects end-to-end over real HTTP on the chip:

  1. one /predict stream, wall time (baseline)
  2. K concurrent /predict streams, wall time — coalesced, should be well
     under K x baseline (round-2 VERDICT item 6 target: <= 2x at K=4)
  3. K concurrent /generate requests vs the same K served sequentially

Usage:
    python -m chemeleon_tpu.scripts.bench_serving \
        --model logs/mp40_comp/checkpoints/best --out results/serving.json
"""

from __future__ import annotations

import argparse
import json
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path


def _free_port() -> int:
    import socket
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def bench(model, n_streams: int, n_atoms: int, n_samples: int,
          stream_chunk: int, timesteps: int) -> dict:
    from chemeleon_tpu.serve.client import generate, predict_stream
    from chemeleon_tpu.serve.server import ChemeleonServer

    port = _free_port()
    server = ChemeleonServer(model=model, host="127.0.0.1", port=port,
                             stream_chunk=stream_chunk,
                             batch_window_s=0.25)
    server.run(background=True)
    url = f"http://127.0.0.1:{port}"
    out = {"n_streams": n_streams, "n_atoms": n_atoms,
           "n_samples_per_stream": n_samples, "stream_chunk": stream_chunk,
           "timesteps": timesteps}
    try:
        def one_stream(i: int):
            return list(predict_stream(url, "LiMnO4", n_atoms, n_samples,
                                       timeout=1800))

        # warm the compiled shapes (single and coalesced ladder sizes)
        one_stream(0)

        t0 = time.perf_counter()
        one_stream(0)
        out["stream_single_s"] = round(time.perf_counter() - t0, 3)

        calls_before = server.stream_batch_calls
        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=n_streams) as ex:
            for f in [ex.submit(one_stream, i) for i in range(n_streams)]:
                f.result()
        # first concurrent run may compile the coalesced shape; run twice,
        # report the warm pass
        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=n_streams) as ex:
            for f in [ex.submit(one_stream, i) for i in range(n_streams)]:
                f.result()
        out["stream_concurrent_s"] = round(time.perf_counter() - t0, 3)
        out["stream_device_calls"] = server.stream_batch_calls - calls_before
        out["stream_speedup_vs_serial"] = round(
            n_streams * out["stream_single_s"] / out["stream_concurrent_s"],
            2)

        # /generate: K concurrent vs K sequential
        def one_gen(i: int):
            return generate(url, "LiMnO4", n_atoms, n_samples, timeout=1800)

        one_gen(0)  # warm the single-request shape
        with ThreadPoolExecutor(max_workers=n_streams) as ex:
            for f in [ex.submit(one_gen, i) for i in range(n_streams)]:
                f.result()  # warm the coalesced ladder shape
        t0 = time.perf_counter()
        for i in range(n_streams):
            one_gen(i)
        out["generate_sequential_s"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=n_streams) as ex:
            for f in [ex.submit(one_gen, i) for i in range(n_streams)]:
                f.result()
        out["generate_concurrent_s"] = round(time.perf_counter() - t0, 3)
        out["generate_speedup"] = round(
            out["generate_sequential_s"] / out["generate_concurrent_s"], 2)
    finally:
        server.shutdown()
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None,
                    help="checkpoint dir; default = fresh random-init "
                         "flagship-architecture model (throughput only "
                         "depends on shapes)")
    ap.add_argument("--n-streams", type=int, default=4)
    ap.add_argument("--n-atoms", type=int, default=16)
    ap.add_argument("--n-samples", type=int, default=4)
    ap.add_argument("--stream-chunk", type=int, default=100)
    ap.add_argument("--timesteps", type=int, default=1000)
    ap.add_argument("--out", default="results/serving.json")
    args = ap.parse_args()

    from chemeleon_tpu.models.chemeleon import Chemeleon
    if args.model:
        model = Chemeleon.load_from_checkpoint(args.model)
    else:
        import jax
        from chemeleon_tpu.config import get_config
        cfg = get_config(None, timesteps=args.timesteps)
        model = Chemeleon(cfg, text_backend="hash")
        model.init_params(jax.random.PRNGKey(0))

    result = bench(model, args.n_streams, args.n_atoms, args.n_samples,
                   args.stream_chunk, args.timesteps)
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(result, indent=1))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
