"""Minimal top-level client example (reference: client.py)."""

from chemeleon_tpu.serve.client import predict

if __name__ == "__main__":
    crystals = predict("http://127.0.0.1:8000",
                       "A Crystal Structure of LiMnO4 with orthorhombic "
                       "symmetry", n_atoms=6, n_samples=2)
    for c in crystals:
        print(c)
