"""Streaming HTTP inference server.

Rebuild of the reference LitServe app (reference: app/server.py:8-58): POST
``/predict`` with JSON {"n_samples", "n_atoms", "text_input"} streams one
JSON line per recorded sampling step (the reference streams every DDPM step;
here steps arrive in compiled chunks of ``stream_chunk`` — same wire format,
set stream_chunk=1 for per-step latency at reduced throughput).

POST ``/generate`` is the non-streaming, throughput-oriented endpoint with
DYNAMIC BATCHING: concurrent requests arriving within ``batch_window_s`` are
coalesced into ONE padded ``sample_batch`` call (the chip's throughput at
batch 32+ is ~10x its batch-1 throughput, so batching is where serving
capacity comes from on TPU — the analog of the reference's
``workers_per_device=4``, app/server.py:55-58, which multiplies GPU workers
instead).

Implemented on the stdlib http.server (no LitServe/FastAPI in this
environment); threaded so multiple clients can stream concurrently while the
TPU serializes compiled scans.
"""

from __future__ import annotations

import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional

from chemeleon_tpu.chem.structure import Crystal


def crystals_to_payload(crystals, step: Optional[int] = None) -> str:
    """JSON line per streamed step (wire format of app/server.py:49-52 /
    app/utils.py:22-44)."""
    payload = {"atoms": [c.to_dict() for c in crystals]}
    if step is not None:
        payload["step"] = step
    return json.dumps(payload)


class _PendingRequest:
    """One /generate request waiting in the dynamic-batching queue."""

    def __init__(self, n_samples: int, n_atoms: int, text: str,
                 comp_prior: Optional[str] = None,
                 comp_prior_scale: float = 0.0,
                 lattice_system: Optional[str] = None,
                 fixed_types: Optional[list] = None):
        self.n_samples = n_samples
        self.n_atoms = n_atoms
        self.text = text
        self.comp_prior = comp_prior
        self.comp_prior_scale = comp_prior_scale
        self.lattice_system = lattice_system
        self.fixed_types = fixed_types  # CSP clamp (wire field fixed_comp)
        self.event = threading.Event()
        self.result: Optional[List[Crystal]] = None
        self.error: Optional[str] = None
        self.cancelled = False  # set when the waiting handler gave up


class _StreamError:
    def __init__(self, msg: str):
        self.msg = msg


class _StreamJob:
    """One /predict stream in the stream-coalescing queue. The collector
    pushes payload lines (str), a _StreamError, or the None end sentinel.
    Carries the same per-request conditioning as _PendingRequest: a
    coalesced stream window can mix CSP-clamped, prior-biased,
    lattice-clamped, and free rows (None = free)."""

    def __init__(self, n_samples: int, n_atoms: int, text: str,
                 comp_prior: Optional[str] = None,
                 comp_prior_scale: float = 0.0,
                 lattice_system: Optional[str] = None,
                 fixed_types: Optional[list] = None):
        self.n_samples = n_samples
        self.n_atoms = n_atoms
        self.text = text
        self.comp_prior = comp_prior
        self.comp_prior_scale = comp_prior_scale
        self.lattice_system = lattice_system
        self.fixed_types = fixed_types
        self.lines: "queue.Queue" = queue.Queue()
        self.cancelled = False


class ChemeleonServer:
    def __init__(self, model=None, host: str = "0.0.0.0", port: int = 8000,
                 stream_chunk: int = 100, model_kind: str = "general_text",
                 max_batch: int = 64, batch_window_s: float = 0.05,
                 sample_steps: int = 0, profile: str = "validity"):
        if model is None:
            from chemeleon_tpu.models.chemeleon import Chemeleon
            if model_kind == "general_text":
                model = Chemeleon.load_general_text_model()
            else:
                model = Chemeleon.load_composition_model()
        self.model = model
        self.host = host
        self.port = port
        self.stream_chunk = stream_chunk
        self.max_batch = max_batch
        self.batch_window_s = batch_window_s
        # deployment-wide few-step knob (0 = full schedule): a coalesced
        # batch shares ONE compiled program, so K is per-server, not
        # per-request. ~timesteps/K throughput for a measured validity
        # cost (BENCH.md few-step table).
        self.sample_steps = int(sample_steps)
        # deployment-wide corrector profile ("validity" = corrector off,
        # +5-6 pts raw validity; "reference" = upstream step_lr=1e-5).
        # Like sample_steps it is per-server: a coalesced batch shares one
        # compiled program and one step_lr scalar.
        self.profile = profile
        self._lock = threading.Lock()  # one compiled scan at a time
        self._httpd: Optional[ThreadingHTTPServer] = None
        self._queue: "queue.Queue[_PendingRequest]" = queue.Queue()
        # serializes enqueue vs shutdown so no request can slip in after the
        # final drain (see generate()/shutdown())
        self._queue_guard = threading.Lock()
        self._stop = threading.Event()
        self._collector: Optional[threading.Thread] = None
        self._stream_collector: Optional[threading.Thread] = None
        # an overflow request carried to the FRONT of the next window (FIFO
        # fairness: re-queuing to the tail would let later arrivals starve it)
        self._carry: Optional[_PendingRequest] = None
        self._stream_queue: "queue.Queue[_StreamJob]" = queue.Queue()
        self._stream_carry: Optional[_StreamJob] = None
        self.batch_calls = 0  # device calls served by /generate (telemetry)
        self.stream_batch_calls = 0  # coalesced stream scans (telemetry)

    # -- dynamic batching ------------------------------------------------------
    def _quantize_batch(self, total: int) -> int:
        """Round the coalesced sample count UP to a fixed ladder so the
        compiled sampler shapes are bounded (every distinct batch size is a
        fresh 20s+ XLA compile; arbitrary coalesced totals would stall the
        device lock on novel shapes indefinitely). Extra rows are dummy
        samples discarded after the scan."""
        b = 1
        while b < total:
            b *= 2
        return min(b, self.max_batch)

    def _gather_window(self, q: "queue.Queue", carry_attr: str):
        """One dynamic-batching window: first item (carried overflow or a
        blocking get), then whatever arrives within batch_window_s up to the
        max_batch sample cap. Returns the coalesced list (may be empty this
        iteration). Overflow goes to ``carry_attr`` — the FRONT of the next
        window (FIFO fairness: re-queuing to the tail would starve it)."""
        carried = getattr(self, carry_attr)
        if carried is not None:
            first = carried
            setattr(self, carry_attr, None)
        else:
            try:
                first = q.get(timeout=0.1)
            except queue.Empty:
                return []
        if first.cancelled:  # client already gave up — don't burn a
            return []        # full device scan on a dead request
        batch = [first]
        total = first.n_samples
        deadline = time.monotonic() + self.batch_window_s
        while total < self.max_batch:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                item = q.get(timeout=remaining)
            except queue.Empty:
                break
            if item.cancelled:
                continue
            if total + item.n_samples > self.max_batch:
                setattr(self, carry_attr, item)  # strict memory cap
                break
            batch.append(item)
            total += item.n_samples
        return batch

    def _collect_loop(self):
        """Coalesce concurrent /generate requests into one sample_batch."""
        while not self._stop.is_set():
            batch = self._gather_window(self._queue, "_carry")
            if not batch:
                continue
            total = sum(r.n_samples for r in batch)
            natoms, texts, priors, scales, lsys = [], [], [], [], []
            ftypes = []
            for r in batch:
                natoms.extend([r.n_atoms] * r.n_samples)
                texts.extend([r.text] * r.n_samples)
                priors.extend([r.comp_prior] * r.n_samples)
                scales.extend([r.comp_prior_scale] * r.n_samples)
                lsys.extend([r.lattice_system] * r.n_samples)
                ftypes.extend([r.fixed_types] * r.n_samples)
            # pad to the shape ladder with dummy rows (discarded below)
            for _ in range(self._quantize_batch(total) - total):
                natoms.append(batch[0].n_atoms)
                texts.append(batch[0].text)
                priors.append(None)
                scales.append(0.0)
                lsys.append(None)
                ftypes.append(None)
            try:
                with self._lock:
                    # per-row scales/ids: one coalesced batch can mix guided,
                    # unguided, and lattice-clamped requests (None rows carry
                    # no bias / no clamp)
                    crystals = self.model.sample_batch(
                        natoms, texts,
                        comp_prior=(priors if any(p is not None
                                                  for p in priors) else None),
                        comp_prior_scale=scales,
                        sample_steps=self.sample_steps or None,
                        lattice_system=(lsys if any(s is not None
                                                    for s in lsys) else None),
                        fixed_types=(ftypes if any(t is not None
                                                   for t in ftypes)
                                     else None),
                        profile=self.profile)
                self.batch_calls += 1
                i = 0
                for r in batch:
                    r.result = crystals[i: i + r.n_samples]
                    i += r.n_samples
            except Exception as e:  # pragma: no cover - device failures
                for r in batch:
                    r.error = str(e)
            for r in batch:
                r.event.set()
        if self._carry is not None:  # don't strand a handler on shutdown
            self._carry.error = "server shutting down"
            self._carry.event.set()
            self._carry = None

    def _stream_collect_loop(self):
        """Coalesce concurrent /predict streams into ONE chunked scan per
        window and demultiplex each chunk's crystals to the client queues.
        N same-window streams cost ~1 scan of batch N instead of N
        serialized scans (round-2 VERDICT item 6: stream throughput used to
        degrade ~linearly with client count)."""
        # with few-step sampling the stream walks K strided steps; the
        # "step" labels count remaining SCHEDULE steps (K..0), same shape
        # as the full-schedule labels (T..0)
        total_steps = self.sample_steps or self.model.cfg.timesteps
        chunk = self.stream_chunk
        if total_steps % chunk != 0:
            chunk = 1
        while not self._stop.is_set():
            batch = self._gather_window(self._stream_queue, "_stream_carry")
            if not batch:
                continue
            total = sum(r.n_samples for r in batch)
            natoms, texts, priors, scales, lsys, ftypes = ([], [], [], [],
                                                           [], [])
            for r in batch:
                natoms.extend([r.n_atoms] * r.n_samples)
                texts.extend([r.text] * r.n_samples)
                priors.extend([r.comp_prior] * r.n_samples)
                scales.extend([r.comp_prior_scale] * r.n_samples)
                lsys.extend([r.lattice_system] * r.n_samples)
                ftypes.extend([r.fixed_types] * r.n_samples)
            for _ in range(self._quantize_batch(total) - total):
                natoms.append(batch[0].n_atoms)
                texts.append(batch[0].text)
                priors.append(None)
                scales.append(0.0)
                lsys.append(None)
                ftypes.append(None)
            try:
                gen = self.model.sample_batch_stream(
                    natoms, texts, stream_chunk=chunk,
                    sample_steps=self.sample_steps or None,
                    comp_prior=(priors if any(p is not None for p in priors)
                                else None),
                    comp_prior_scale=scales,
                    lattice_system=(lsys if any(s is not None for s in lsys)
                                    else None),
                    fixed_types=(ftypes if any(t is not None for t in ftypes)
                                 else None),
                    profile=self.profile)
                t = total_steps
                while True:
                    # hold the device lock per CHUNK so /generate batches
                    # and other windows interleave fairly
                    with self._lock:
                        try:
                            crystals = next(gen)
                        except StopIteration:
                            break
                    t -= chunk
                    i = 0
                    for r in batch:
                        if not r.cancelled:
                            r.lines.put(crystals_to_payload(
                                crystals[i: i + r.n_samples], step=t))
                        i += r.n_samples
                self.stream_batch_calls += 1
                for r in batch:
                    r.lines.put(None)
            except Exception as e:  # model/device failure mid-stream
                for r in batch:
                    r.lines.put(_StreamError(" ".join(str(e).split())[:500]))
        if self._stream_carry is not None:
            self._stream_carry.lines.put(
                _StreamError("server shutting down"))
            self._stream_carry = None

    def generate(self, req: dict, timeout: float = 600.0) -> List[Crystal]:
        """Enqueue one request into the dynamic batch and wait for results."""
        pending = _PendingRequest(req["n_samples"], req["n_atoms"],
                                  req["text_input"],
                                  comp_prior=req.get("comp_prior"),
                                  comp_prior_scale=req.get(
                                      "comp_prior_scale", 0.0),
                                  lattice_system=req.get("lattice_system"),
                                  fixed_types=req.get("fixed_types"))
        with self._queue_guard:
            # check-and-enqueue is atomic vs shutdown(): either we enqueue
            # before the final drain (and get drained) or we observe _stop
            if self._stop.is_set():
                raise RuntimeError("server shutting down")
            self._queue.put(pending)
        if not pending.event.wait(timeout):
            pending.cancelled = True  # collector will skip it if still queued
            raise TimeoutError("generate timed out")
        if pending.error is not None:
            raise RuntimeError(pending.error)
        return pending.result

    # -- request handling -----------------------------------------------------
    def decode_request(self, body: dict) -> dict:
        """(reference server.py:12-20) — validated: a single oversized
        request must not bypass the max_batch device-memory cap that the
        coalescing loop enforces for everyone else."""
        n_samples = int(body.get("n_samples", 1))
        n_atoms = int(body.get("n_atoms", 4))
        if not 1 <= n_samples <= self.max_batch:
            raise ValueError(
                f"n_samples must be in [1, {self.max_batch}], got {n_samples}")
        max_atoms = max(self.model.cfg.pad_buckets)
        if not 1 <= n_atoms <= max_atoms:
            raise ValueError(
                f"n_atoms must be in [1, {max_atoms}], got {n_atoms}")
        req = {
            "n_samples": n_samples,
            "n_atoms": n_atoms,
            "text_input": body.get("text_input", ""),
        }
        if body.get("comp_prior"):
            # validate at decode time: a bad formula must 400 this request,
            # not poison the whole coalesced device batch
            from chemeleon_tpu.chem.composition import parse_composition
            parse_composition(str(body["comp_prior"]))
            req["comp_prior"] = str(body["comp_prior"])
            req["comp_prior_scale"] = float(body.get("comp_prior_scale", 1.0))
        if body.get("lattice_system"):
            # same decode-time validation rule as comp_prior: an unknown
            # system word must 400 here, not fail the coalesced batch
            from chemeleon_tpu.ops.lattice_proj import system_ids
            system_ids([str(body["lattice_system"])])
            req["lattice_system"] = str(body["lattice_system"])
        if body.get("fixed_comp"):
            # server-side CSP clamp (closes the streamlit CSP-over-server
            # gap): fixed_comp + optional fixed_z expand to the exact type
            # sequence sample_csp would clamp — n_atoms is DERIVED from it
            # (an explicit mismatching n_atoms must 400, not silently
            # generate the wrong cell size)
            if "comp_prior" in req:
                raise ValueError(
                    "fixed_comp and comp_prior are mutually exclusive: CSP "
                    "clamps types, so a type prior has no effect")
            from chemeleon_tpu.chem.composition import composition_to_types
            types = composition_to_types(str(body["fixed_comp"]),
                                         int(body.get("fixed_z", 1)))
            if not 1 <= len(types) <= max_atoms:
                raise ValueError(
                    f"fixed_comp expands to {len(types)} atoms, outside "
                    f"[1, {max_atoms}] (reduce fixed_z?)")
            if "n_atoms" in body and int(body["n_atoms"]) != len(types):
                raise ValueError(
                    f"n_atoms={body['n_atoms']} conflicts with fixed_comp "
                    f"({len(types)} atoms at fixed_z="
                    f"{int(body.get('fixed_z', 1))}); omit n_atoms or match")
            req["n_atoms"] = len(types)
            req["fixed_types"] = types
        return req

    def predict_stream(self, req: dict, timeout: float = 600.0):
        """Enqueue the stream into the coalescing collector and relay its
        demultiplexed payload lines. Wire format unchanged (one NDJSON line
        per recorded step, this client's samples only)."""
        job = _StreamJob(req["n_samples"], req["n_atoms"],
                         req["text_input"],
                         comp_prior=req.get("comp_prior"),
                         comp_prior_scale=req.get("comp_prior_scale", 0.0),
                         lattice_system=req.get("lattice_system"),
                         fixed_types=req.get("fixed_types"))
        with self._queue_guard:
            if self._stop.is_set():
                raise RuntimeError("server shutting down")
            self._stream_queue.put(job)
        try:
            while True:
                item = job.lines.get(timeout=timeout)
                if item is None:
                    return
                if isinstance(item, _StreamError):
                    raise RuntimeError(item.msg)
                yield item
        finally:
            # handler stopped consuming (done, error, or client hung up):
            # let the collector skip this job if it is still queued
            job.cancelled = True

    # -- http plumbing ----------------------------------------------------------
    def make_handler(server_self):
        class Handler(BaseHTTPRequestHandler):
            # chunked transfer-coding is an HTTP/1.1 feature; the stdlib
            # default (HTTP/1.0) would make the /predict stream invalid for
            # spec-compliant clients
            protocol_version = "HTTP/1.1"

            def log_message(self, fmt, *args):
                pass

            def do_GET(self):
                if self.path == "/health":
                    body = b'{"status": "ok"}'
                    self.send_response(200)
                    self.send_header("Content-Type", "application/json")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                else:
                    self.send_error(404)

            def do_POST(self):
                if self.path not in ("/predict", "/generate"):
                    self.send_error(404)
                    return
                try:
                    length = int(self.headers.get("Content-Length", 0))
                    body = json.loads(self.rfile.read(length) or b"{}")
                    if not isinstance(body, dict):
                        raise ValueError("request body must be a JSON object")
                    req = server_self.decode_request(body)
                except (ValueError, json.JSONDecodeError) as e:
                    self.send_error(400, str(e))
                    return
                if self.path == "/generate":
                    try:
                        crystals = server_self.generate(req)
                        data = crystals_to_payload(crystals).encode()
                    except Exception as e:
                        # keep the status line single-line; details (JAX
                        # errors are multi-line) go in the body via explain
                        self.send_error(500, "generation failed",
                                        explain=" ".join(
                                            str(e).split())[:500])
                        return
                    self.send_response(200)
                    self.send_header("Content-Type", "application/json")
                    self.send_header("Content-Length", str(len(data)))
                    self.end_headers()
                    self.wfile.write(data)
                    return
                self.send_response(200)
                self.send_header("Content-Type", "application/x-ndjson")
                self.send_header("Transfer-Encoding", "chunked")
                self.end_headers()
                try:
                    try:
                        for line in server_self.predict_stream(req):
                            data = (line + "\n").encode()
                            self.wfile.write(f"{len(data):X}\r\n".encode())
                            self.wfile.write(data + b"\r\n")
                            self.wfile.flush()
                    except Exception as e:  # model/device failure mid-stream
                        # the 200 is already on the wire; signal the failure
                        # as a final in-band error line so the client is not
                        # left with a silently truncated stream
                        data = (json.dumps(
                            {"error": " ".join(str(e).split())[:500]})
                            + "\n").encode()
                        self.wfile.write(f"{len(data):X}\r\n".encode())
                        self.wfile.write(data + b"\r\n")
                    self.wfile.write(b"0\r\n\r\n")
                except (BrokenPipeError, ConnectionResetError):
                    pass

        return Handler

    def run(self, background: bool = False, warmup: bool = False):
        if warmup:
            # precompile the dynamic-batching shape grid before accepting
            # traffic: every ladder batch x bucket is otherwise a 20-60 s
            # XLA compile paid by the first unlucky request
            ladder, b = [], 1
            while b <= self.max_batch:
                ladder.append(b)
                b *= 2
            chunk = self.stream_chunk
            if (self.sample_steps or self.model.cfg.timesteps) % chunk != 0:
                chunk = 1
            timings = self.model.warmup(batch_sizes=ladder,
                                        stream_chunk=chunk,
                                        sample_steps=self.sample_steps)
            print(f"warmup: {len(timings)} programs, "
                  f"{sum(t['seconds'] for t in timings):.1f}s")
        self._httpd = ThreadingHTTPServer((self.host, self.port),
                                          self.make_handler())
        self._stop.clear()
        self._collector = threading.Thread(target=self._collect_loop,
                                           daemon=True)
        self._collector.start()
        self._stream_collector = threading.Thread(
            target=self._stream_collect_loop, daemon=True)
        self._stream_collector.start()
        print(f"ChemeleonServer listening on {self.host}:{self.port}")
        if background:
            th = threading.Thread(target=self._httpd.serve_forever,
                                  daemon=True)
            th.start()
            return th
        try:
            self._httpd.serve_forever()
        finally:
            self._stop.set()

    def _drain_queue(self, msg: str):
        while True:
            try:
                pending = self._queue.get_nowait()
            except queue.Empty:
                break
            pending.error = msg
            pending.event.set()

    def shutdown(self):
        with self._queue_guard:
            # once _stop is set under the guard, generate() can no longer
            # enqueue — so the drain below is guaranteed to be final
            self._stop.set()
        # fail fast for requests still queued — their handler threads would
        # otherwise block until the client timeout
        self._drain_queue("server shutting down")
        while True:
            try:
                job = self._stream_queue.get_nowait()
            except queue.Empty:
                break
            job.lines.put(_StreamError("server shutting down"))
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd = None


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--stream-chunk", type=int, default=100)
    ap.add_argument("--model-kind", default="general_text",
                    choices=["general_text", "composition"])
    ap.add_argument("--warmup", action="store_true",
                    help="precompile the dynamic-batching shape grid before "
                         "accepting traffic")
    ap.add_argument("--sample-steps", type=int, default=0,
                    help="few-step sampling for the whole deployment: K < "
                         "timesteps strided reverse steps per sample (~T/K "
                         "throughput, measured validity cost — BENCH.md); "
                         "0 = full schedule")
    ap.add_argument("--profile", default="validity",
                    choices=["validity", "reference"],
                    help="corrector profile for the whole deployment: "
                         "'validity' disables the Langevin corrector "
                         "(+5-6 pts raw validity, results/step_lr_sweep"
                         ".json); 'reference' keeps upstream step_lr=1e-5")
    args = ap.parse_args()
    ChemeleonServer(host=args.host, port=args.port,
                    stream_chunk=args.stream_chunk,
                    model_kind=args.model_kind,
                    sample_steps=args.sample_steps,
                    profile=args.profile).run(warmup=args.warmup)


if __name__ == "__main__":
    main()
