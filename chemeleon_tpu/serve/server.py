"""Streaming HTTP inference server.

Rebuild of the reference LitServe app (reference: app/server.py:8-58): POST
``/predict`` with JSON {"n_samples", "n_atoms", "text_input"} streams one
JSON line per recorded sampling step (the reference streams every DDPM step;
here steps arrive in compiled chunks of ``stream_chunk`` — same wire format,
set stream_chunk=1 for per-step latency at reduced throughput).

Implemented on the stdlib http.server (no LitServe/FastAPI in this
environment); threaded so multiple clients can stream concurrently while the
TPU serializes compiled scans (workers_per_device in the reference maps to
server threads here).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

from chemeleon_tpu.chem.structure import Crystal


def crystals_to_payload(crystals, step: Optional[int] = None) -> str:
    """JSON line per streamed step (wire format of app/server.py:49-52 /
    app/utils.py:22-44)."""
    payload = {"atoms": [c.to_dict() for c in crystals]}
    if step is not None:
        payload["step"] = step
    return json.dumps(payload)


class ChemeleonServer:
    def __init__(self, model=None, host: str = "0.0.0.0", port: int = 8000,
                 stream_chunk: int = 100, model_kind: str = "general_text"):
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
        self._lock = threading.Lock()  # one compiled scan at a time
        self._httpd: Optional[ThreadingHTTPServer] = None

    # -- request handling -----------------------------------------------------
    def decode_request(self, body: dict) -> dict:
        """(reference server.py:12-20)"""
        return {
            "n_samples": int(body.get("n_samples", 1)),
            "n_atoms": int(body.get("n_atoms", 4)),
            "text_input": body.get("text_input", ""),
        }

    def predict_stream(self, req: dict):
        total = self.model.cfg.timesteps
        chunk = self.stream_chunk
        if total % chunk != 0:
            chunk = 1
        gen = self.model.sample(req["text_input"], req["n_atoms"],
                                req["n_samples"], stream=True,
                                stream_chunk=chunk)
        t = total
        while True:
            # hold the device lock per CHUNK, not per request: concurrent
            # client streams interleave their compiled scans fairly
            with self._lock:
                try:
                    crystals = next(gen)
                except StopIteration:
                    return
            t -= chunk
            yield crystals_to_payload(crystals, step=t)

    # -- http plumbing ----------------------------------------------------------
    def make_handler(server_self):
        class Handler(BaseHTTPRequestHandler):
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
                if self.path != "/predict":
                    self.send_error(404)
                    return
                try:
                    length = int(self.headers.get("Content-Length", 0))
                    body = json.loads(self.rfile.read(length) or b"{}")
                    req = server_self.decode_request(body)
                except (ValueError, json.JSONDecodeError) as e:
                    self.send_error(400, str(e))
                    return
                self.send_response(200)
                self.send_header("Content-Type", "application/x-ndjson")
                self.send_header("Transfer-Encoding", "chunked")
                self.end_headers()
                try:
                    for line in server_self.predict_stream(req):
                        data = (line + "\n").encode()
                        self.wfile.write(f"{len(data):X}\r\n".encode())
                        self.wfile.write(data + b"\r\n")
                        self.wfile.flush()
                    self.wfile.write(b"0\r\n\r\n")
                except (BrokenPipeError, ConnectionResetError):
                    pass

        return Handler

    def run(self, background: bool = False):
        self._httpd = ThreadingHTTPServer((self.host, self.port),
                                          self.make_handler())
        print(f"ChemeleonServer listening on {self.host}:{self.port}")
        if background:
            th = threading.Thread(target=self._httpd.serve_forever,
                                  daemon=True)
            th.start()
            return th
        self._httpd.serve_forever()

    def shutdown(self):
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
    args = ap.parse_args()
    ChemeleonServer(host=args.host, port=args.port,
                    stream_chunk=args.stream_chunk,
                    model_kind=args.model_kind).run()


if __name__ == "__main__":
    main()
