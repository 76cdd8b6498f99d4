"""End-to-end training tests on a synthetic mp-40-style dataset: diffusion
trainer (checkpoint/resume/early-stop plumbing) and CLIP trainer."""

import csv
import json
import os

import jax
import numpy as np
import pytest

from chemeleon_tpu.chem.cif import write_cif
from chemeleon_tpu.chem.lattice import lattice_from_parameters
from chemeleon_tpu.chem.structure import Crystal
from chemeleon_tpu.config import get_config

TINY = dict(hidden_dim=32, time_dim=16, text_dim=24, num_layers=2,
            num_freqs=4, timesteps=20, text_embed_dim=32,
            pad_buckets=(8,), batch_size=4, patience=2, early_stopping=50,
            gradient_clip_val=0.5, clip_dim=16)


def _random_crystal(rng) -> Crystal:
    n = int(rng.integers(2, 7))
    lat = lattice_from_parameters(*(rng.uniform(3, 6, 3)), 90, 90, 90)
    return Crystal(lat, rng.uniform(size=(n, 3)),
                   rng.integers(1, 30, n))


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("mp40")
    rng = np.random.default_rng(0)
    for split, count in [("train", 12), ("val", 6), ("test", 6)]:
        with open(root / f"{split}.csv", "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=["cif", "composition",
                                              "crystal_system", "prompt"])
            w.writeheader()
            for _ in range(count):
                c = _random_crystal(rng)
                w.writerow({
                    "cif": write_cif(c),
                    "composition": c.reduced_formula(),
                    "crystal_system": "orthorhombic",
                    "prompt": f"a crystal of {c.reduced_formula()}",
                })
    return str(root)


def test_dataset_and_datamodule(data_dir):
    from chemeleon_tpu.data.datamodule import DataModule
    cfg = get_config("chemeleon_bert_prompt", data_dir=data_dir, **TINY)
    dm = DataModule(cfg)
    dm.setup(None)
    assert len(dm.train_dataset) == 12
    batches = list(dm.train_dataloader())
    assert all(b.atom_types.shape[0] == 4 for b, _ in batches)
    batch, texts = batches[0]
    assert batch.atom_types.shape[1] == 8  # padded to bucket
    assert all(t.startswith("a crystal of") for t in texts)
    # cache file created
    assert any(p.startswith(".cache_train") for p in os.listdir(data_dir))


def test_dataset_multi_target_text(data_dir):
    from chemeleon_tpu.data.mp_dataset import MPDataset
    ds = MPDataset(data_dir, "val", text_guide=True,
                   text_targets=["composition", "crystal_system"])
    t = ds[0]["text"]
    assert "composition: " in t and ", crystal_system: orthorhombic" in t


def test_trainer_fit_checkpoint_resume(data_dir, tmp_path):
    from chemeleon_tpu.train.trainer import Trainer
    cfg = get_config("chemeleon_bert_prompt", data_dir=data_dir,
                     log_dir=str(tmp_path / "logs"), **TINY)
    tr = Trainer(cfg, text_backend="hash")
    out = tr.fit(max_epochs=2)
    assert out["epochs"] == 2
    assert np.isfinite(out["best_val_loss"])
    ckpts = os.listdir(tr.ckpt_dir)
    assert "best" in ckpts and "last" in ckpts
    with open(tr.ckpt_dir / "last" / "meta.json") as f:
        meta = json.load(f)
    assert meta["epoch"] == 1

    # metrics were logged with wandb-compatible names
    lines = [json.loads(l) for l in open(
        tr.logger.path)]
    keys = set().union(*[set(l) for l in lines])
    assert "val/loss" in keys and "train/loss" in keys
    assert "val/mae_lattice" in keys and "val/mae_coords" in keys

    # resume from last
    tr2 = Trainer(cfg, text_backend="hash")
    out2 = tr2.fit(max_epochs=3, resume_from=str(tr.ckpt_dir / "last"))
    assert out2["epochs"] == 3  # continued from epoch 2

    # sampling works with trained params
    crystals = tr2.model.sample("a crystal of X", 4, 2,
                                key=jax.random.PRNGKey(0))
    assert len(crystals) == 2


def test_clip_trainer(data_dir, tmp_path):
    from chemeleon_tpu.train.clip_trainer import ClipTrainer
    cfg = get_config("clip_prompt", data_dir=data_dir,
                     log_dir=str(tmp_path / "logs"), **TINY)
    tr = ClipTrainer(cfg, text_backend="hash")
    out = tr.fit(max_epochs=2)
    assert np.isfinite(out["best_val_loss"])
    assert np.isfinite(out["test_loss"])


def test_clip_trainable_hf_tower(data_dir, tmp_path):
    """The trainable-BERT path (random-init, offline) must run end to end."""
    from chemeleon_tpu.models.clip import CrystalClip
    from chemeleon_tpu.ops.graph import batch_from_arrays
    cfg = get_config("clip_prompt", data_dir=data_dir, **TINY)
    clip = CrystalClip(cfg, text_backend="hf")
    assert clip.backend_kind == "hf"
    params = clip.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    batch = batch_from_arrays(
        [rng.integers(1, 20, 4), rng.integers(1, 20, 5)],
        [rng.uniform(size=(4, 3)).astype(np.float32),
         rng.uniform(size=(5, 3)).astype(np.float32)],
        [np.eye(3, dtype=np.float32) * 4] * 2, n_max=8)
    raw = clip.encode_text_raw(params, ["hello world", "crystal TiO2"])
    assert raw.shape == (2, cfg.text_embed_dim)
    loss = clip.loss(params, batch, raw)
    assert np.isfinite(float(loss))


def test_resume_restores_optimizer_state(data_dir, tmp_path):
    """Exact-resume: optimizer state round-trips through the checkpoint."""
    import jax
    from chemeleon_tpu.train.trainer import Trainer
    cfg = get_config("chemeleon_bert_prompt", data_dir=data_dir,
                     log_dir=str(tmp_path / "logs2"), **TINY)
    tr = Trainer(cfg, text_backend="hash")
    tr.fit(max_epochs=1)
    like_params = tr.model.init_params(jax.random.PRNGKey(0))
    like_opt = tr.tx.init(like_params)
    params, meta, opt_state = tr.load_checkpoint(
        str(tr.ckpt_dir / "last"), like_params, opt_state_like=like_opt)
    assert opt_state is not None
    # adam moments must be non-zero after a training epoch
    total = sum(float(np.abs(np.asarray(x)).sum())
                for x in jax.tree.leaves(opt_state)
                if hasattr(x, "shape") and getattr(x, "size", 0) > 1)
    assert total > 0
