"""Streaming HTTP client example (reference: app/server_client.py:6-50)."""

import sys

from chemeleon_tpu.serve.client import predict_stream


def client(url: str = "http://127.0.0.1:8000",
           text_input: str = ("A Crystal Structure of LiMnO4 with "
                              "orthorhombic symmetry"),
           n_atoms: int = 6, n_samples: int = 2):
    for payload in predict_stream(url, text_input, n_atoms, n_samples):
        print("step", payload.get("step"),
              "first-sample atoms:", payload["atoms"][0]["atom_types"])


if __name__ == "__main__":
    client(*sys.argv[1:2])
