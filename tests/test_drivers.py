"""Training-driver entrypoint tests (run.py / run_crystal_clip.py / sweep
arg parsing) on a synthetic dataset."""

import csv
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from run import _coerce, parse_cli  # noqa: E402


def test_parse_cli():
    name, over = parse_cli(["with", "chemeleon_clip_prompt", "batch_size=64",
                            "lr=0.001", "text_guide=false",
                            "resume_from=None"])
    assert name == "chemeleon_clip_prompt"
    assert over == {"batch_size": 64, "lr": 0.001, "text_guide": False,
                    "resume_from": None}
    name2, over2 = parse_cli(["unguided"])
    assert name2 == "unguided" and over2 == {}


def test_coerce():
    assert _coerce("42") == 42
    assert _coerce("0.5") == 0.5
    assert _coerce("true") is True
    assert _coerce("none") is None
    assert _coerce("[8,16]") == (8, 16)
    assert _coerce("adamw") == "adamw"


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    from chemeleon_tpu.chem.cif import write_cif
    from chemeleon_tpu.chem.lattice import lattice_from_parameters
    from chemeleon_tpu.chem.structure import Crystal
    root = tmp_path_factory.mktemp("drv")
    rng = np.random.default_rng(0)
    for split, count in [("train", 8), ("val", 4), ("test", 4)]:
        with open(root / f"{split}.csv", "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=["cif", "composition", "prompt"])
            w.writeheader()
            for _ in range(count):
                n = int(rng.integers(2, 6))
                c = Crystal(lattice_from_parameters(4, 5, 6, 90, 90, 90),
                            rng.uniform(size=(n, 3)), rng.integers(1, 20, n))
                w.writerow({"cif": write_cif(c),
                            "composition": c.reduced_formula(),
                            "prompt": f"a crystal of {c.reduced_formula()}"})
    return str(root)


def test_run_main(data_dir, tmp_path, monkeypatch):
    import run as run_mod
    monkeypatch.setattr("chemeleon_tpu.train.trainer.Trainer._raw_text",
                        lambda self, texts: None, raising=True)
    # use the unguided preset to avoid text-backend needs entirely
    run_mod.main(["unguided", f"data_dir={data_dir}",
                  f"log_dir={tmp_path}", "max_epochs=1", "batch_size=4",
                  "hidden_dim=16", "num_layers=1", "num_freqs=2",
                  "time_dim=8", "timesteps=10", "pad_buckets=[8]",
                  "early_stopping=100"])


def test_run_crystal_clip_main(data_dir, tmp_path):
    import run_crystal_clip as rcc
    rcc.main(["clip_prompt", f"data_dir={data_dir}", f"log_dir={tmp_path}",
              "max_epochs=1", "batch_size=4", "hidden_dim=16",
              "num_layers=1", "num_freqs=2", "clip_dim=8",
              "text_embed_dim=16", "pad_buckets=[8]", "early_stopping=100"])


def test_run_crystal_clip_main_resumes(data_dir, tmp_path):
    """The driver must thread cfg.resume_from into fit() (regression: it
    used to be silently ignored, restarting interrupted runs from epoch 0)."""
    import json

    import run_crystal_clip as rcc
    common = [f"data_dir={data_dir}", f"log_dir={tmp_path}", "batch_size=4",
              "hidden_dim=16", "num_layers=1", "num_freqs=2", "clip_dim=8",
              "text_embed_dim=16", "pad_buckets=[8]", "early_stopping=100"]
    rcc.main(["clip_prompt", "max_epochs=1"] + common)
    last = tmp_path / "clip_prompt" / "clip_checkpoints" / "last"
    assert last.exists()
    rcc.main(["clip_prompt", "max_epochs=2", f"resume_from={last}"] + common)
    epochs = [json.loads(line)["epoch"]
              for line in open(tmp_path / "clip_prompt" / "metrics.jsonl")
              if "epoch" in line]
    # the resumed run must continue at epoch 1, never re-log epoch 0
    assert epochs.count(0.0) == 1 and 1.0 in epochs
