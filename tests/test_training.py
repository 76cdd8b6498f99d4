"""End-to-end training tests on a synthetic mp-40-style dataset: diffusion
trainer (checkpoint/resume/early-stop plumbing) and CLIP trainer."""

import csv
import json
import os
from pathlib import Path

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
    # orbax best/last checkpoints with optimizer state + meta
    # (reference ModelCheckpoint, run_crystal_clip.py:74-81)
    ckpts = os.listdir(tr.ckpt_dir)
    assert "best" in ckpts and "last" in ckpts
    assert (tr.ckpt_dir / "last" / "opt_state").exists()
    with open(tr.ckpt_dir / "last" / "meta.json") as f:
        assert json.load(f)["epoch"] == 1

    # exact resume continues from the saved epoch
    tr2 = ClipTrainer(cfg, text_backend="hash")
    out2 = tr2.fit(max_epochs=3, resume_from=str(tr.ckpt_dir / "last"))
    assert np.isfinite(out2["best_val_loss"])
    with open(tr2.ckpt_dir / "last" / "meta.json") as f:
        assert json.load(f)["epoch"] == 2  # epochs 0,1 ran before resume


def test_clip_resume_restores_optimizer_state(data_dir, tmp_path):
    from chemeleon_tpu.train.clip_trainer import ClipTrainer
    cfg = get_config("clip_prompt", data_dir=data_dir,
                     log_dir=str(tmp_path / "logs_c"), **TINY)
    tr = ClipTrainer(cfg, text_backend="hash")
    tr.fit(max_epochs=1)
    like_params = tr.clip.init_params(jax.random.PRNGKey(0))
    like_opt = tr.tx.init(like_params)
    params, meta, opt_state = tr.load_checkpoint(
        str(tr.ckpt_dir / "last"), like_params, opt_state_like=like_opt)
    assert opt_state is not None
    total = sum(float(np.abs(np.asarray(x)).sum())
                for x in jax.tree.leaves(opt_state)
                if hasattr(x, "shape") and getattr(x, "size", 0) > 1)
    assert total > 0  # adam moments moved


def test_clip_trainer_on_mesh(data_dir, tmp_path, eight_devices):
    """CLIP fit with the batch sharded over the 8-device data axis (the DDP
    replacement, run_crystal_clip.py:83-90)."""
    from chemeleon_tpu.train.clip_trainer import ClipTrainer
    cfg = get_config("clip_prompt", data_dir=data_dir,
                     log_dir=str(tmp_path / "logs_m"), mesh_shape=(8, 1),
                     **{**TINY, "batch_size": 8})
    tr = ClipTrainer(cfg, text_backend="hash")
    assert tr.mesh is not None
    out = tr.fit(max_epochs=1)
    assert np.isfinite(out["best_val_loss"])
    assert np.isfinite(out["test_loss"])


def _grad_norm(tree) -> float:
    return sum(float(np.abs(np.asarray(g)).sum())
               for g in jax.tree.leaves(tree))


def test_clip_trainable_hf_tower(data_dir, tmp_path):
    """The trainable-BERT tower must carry gradients: the tower forward runs
    inside the differentiated loss (reference crystal_clip.py:82-96 trains
    the tower with its own 1e-5 LR group, :172-177)."""
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
    text_input = clip.text_inputs(["hello world", "crystal TiO2"])
    loss, grads = jax.value_and_grad(
        lambda p: clip.loss(p, batch, text_input))(params)
    assert np.isfinite(float(loss))
    # gradients REACH the text tower (round-1 gap: tower ran on host outside
    # grad, so the text_tower optimizer group silently trained nothing)
    assert _grad_norm(grads["text_tower"]) > 0
    assert _grad_norm(grads["graph"]) > 0
    assert _grad_norm(grads["text_proj"]) > 0

    # ... and one optimizer step moves the tower params
    from chemeleon_tpu.train.clip_trainer import build_clip_optimizer
    import optax
    tx = build_clip_optimizer(cfg)
    updates, _ = tx.update(grads, tx.init(params), params)
    new_params = optax.apply_updates(params, updates)
    moved = _grad_norm(jax.tree.map(lambda a, b: np.asarray(a) - np.asarray(b),
                                    params["text_tower"],
                                    new_params["text_tower"]))
    assert moved > 0


def test_diffusion_trainable_text_encoder(data_dir):
    """trainable_text_encoder=True on the diffusion model: tokens go through
    the jitted loss and grads reach params['text']['tower'] (reference
    text_encoder.py:36-46)."""
    from chemeleon_tpu.models.chemeleon import Chemeleon
    from chemeleon_tpu.ops.graph import batch_from_arrays
    cfg = get_config("chemeleon_bert_prompt", data_dir=data_dir,
                     trainable_text_encoder=True, **TINY)
    model = Chemeleon(cfg)
    assert model.text_encoder.tower is not None
    params = model.init_params(jax.random.PRNGKey(0))
    assert "tower" in params["text"] and "conditioner" in params["text"]
    rng = np.random.default_rng(0)
    batch = batch_from_arrays(
        [rng.integers(1, 20, 4), rng.integers(1, 20, 5)],
        [rng.uniform(size=(4, 3)).astype(np.float32),
         rng.uniform(size=(5, 3)).astype(np.float32)],
        [np.eye(3, dtype=np.float32) * 4] * 2, n_max=8)
    text_input = model.text_encoder.text_inputs(["a", "b"])
    loss, grads = jax.value_and_grad(
        lambda p: model.loss(p, batch, text_input, jax.random.PRNGKey(1))[0]
    )(params)
    assert np.isfinite(float(loss))
    assert _grad_norm(grads["text"]["tower"]) > 0
    assert _grad_norm(grads["text"]["conditioner"]) > 0

    # sampling still works with the nested text params
    model.params = params
    crystals = model.sample("a crystal of X", 4, 1, key=jax.random.PRNGKey(2))
    assert len(crystals) == 1


def test_trainer_fit_with_trainable_text_encoder(data_dir, tmp_path):
    """Full Trainer.fit with trainable_text_encoder=True: tokens flow
    through the jitted step, the tower params actually move, and sampling
    works from the trained state."""
    from chemeleon_tpu.train.trainer import Trainer
    cfg = get_config("chemeleon_bert_prompt", data_dir=data_dir,
                     log_dir=str(tmp_path / "logs_t"),
                     trainable_text_encoder=True, **TINY)
    tr = Trainer(cfg)
    # same seed fit() uses, so p0 IS the starting point of training
    p0 = jax.tree.map(np.copy,
                      tr.model.init_params(jax.random.PRNGKey(cfg.seed)))
    out = tr.fit(max_epochs=1)
    assert np.isfinite(out["best_val_loss"])
    moved = _grad_norm(jax.tree.map(
        lambda a, b: np.asarray(a, np.float32) - np.asarray(b, np.float32),
        tr.model.params["text"]["tower"], p0["text"]["tower"]))
    assert moved > 0, "tower params did not move during fit"
    crystals = tr.model.sample("a crystal of X", 4, 1,
                               key=jax.random.PRNGKey(1))
    assert len(crystals) == 1


def test_grad_accumulation_matches_mean_gradient():
    """accumulate_grad_batches=4 (optax.MultiSteps, reference config.py:68):
    params freeze for 3 micro-steps, then the applied update equals one step
    on the 4-batch MEAN gradient."""
    import jax.numpy as jnp
    import optax
    from chemeleon_tpu.train.optim import build_optimizer
    cfg4 = get_config(None, accumulate_grad_batches=4, gradient_clip_val=0.0,
                      optimizer="sgd", lr=0.1)
    cfg1 = get_config(None, accumulate_grad_batches=1, gradient_clip_val=0.0,
                      optimizer="sgd", lr=0.1)
    params = {"w": jnp.arange(6.0).reshape(2, 3)}
    rng = np.random.default_rng(0)
    grads = [{"w": jnp.asarray(rng.normal(size=(2, 3)), jnp.float32)}
             for _ in range(4)]

    tx4 = build_optimizer(cfg4)
    st = tx4.init(params)
    p = params
    for i, g in enumerate(grads):
        upd, st = tx4.update(g, st, p)
        p = optax.apply_updates(p, upd)
        if i < 3:  # no movement until the 4th micro-batch
            np.testing.assert_array_equal(np.asarray(p["w"]),
                                          np.asarray(params["w"]))

    tx1 = build_optimizer(cfg1)
    mean_grad = {"w": sum(g["w"] for g in grads) / 4.0}
    upd, _ = tx1.update(mean_grad, tx1.init(params), params)
    p_ref = optax.apply_updates(params, upd)
    np.testing.assert_allclose(np.asarray(p["w"]), np.asarray(p_ref["w"]),
                               rtol=1e-6)


def test_set_learning_rate_functional():
    """set_learning_rate returns a NEW state (no in-place mutation) and
    raises on optimizers without an injected learning rate."""
    import jax.numpy as jnp
    import optax
    from chemeleon_tpu.train.optim import build_optimizer, set_learning_rate
    cfg = get_config(None, optimizer="adam", lr=1e-3,
                     accumulate_grad_batches=2)  # exercise MultiSteps nesting
    tx = build_optimizer(cfg)
    params = {"w": jnp.ones((3,))}
    st = tx.init(params)
    st2 = set_learning_rate(st, 5e-4)
    def has_scalar(state, v):
        return any(getattr(x, "shape", None) == () and
                   abs(float(np.asarray(x)) - v) < 1e-9
                   for x in jax.tree.leaves(state))

    assert has_scalar(st2, 5e-4), "new state must carry the updated lr"
    assert has_scalar(st, 1e-3), "old state must keep the original lr"
    with pytest.raises(ValueError):
        set_learning_rate(optax.sgd(1e-3).init(params), 1e-4)


def test_load_path_warm_start(data_dir, tmp_path):
    """cfg.load_path warm-starts params WITHOUT restoring epoch/optimizer
    (the key upstream declares but never reads, reference config.py:85)."""
    from chemeleon_tpu.train.trainer import Trainer
    cfg = get_config("chemeleon_bert_prompt", data_dir=data_dir,
                     log_dir=str(tmp_path / "w1"), **TINY)
    tr = Trainer(cfg, text_backend="hash")
    tr.fit(max_epochs=1)

    cfg2 = get_config("chemeleon_bert_prompt", data_dir=data_dir,
                      log_dir=str(tmp_path / "w2"),
                      load_path=str(tr.ckpt_dir / "last"), **TINY)
    tr2 = Trainer(cfg2, text_backend="hash")
    init = tr2.model.init_params(jax.random.PRNGKey(cfg2.seed))
    out = tr2.fit(max_epochs=1)
    # warm start: trained from the loaded params, epoch counter fresh
    assert out["epochs"] == 1
    with open(tr2.ckpt_dir / "last" / "meta.json") as f:
        assert json.load(f)["epoch"] == 0
    # and the run did NOT start from the fresh init (params were loaded)
    loaded_like = tr.load_checkpoint(str(tr.ckpt_dir / "last"), init)[0]
    diff = sum(float(np.abs(np.asarray(a) - np.asarray(b)).sum())
               for a, b in zip(jax.tree.leaves(loaded_like),
                               jax.tree.leaves(init)))
    assert diff > 0  # sanity: warm-start source differs from fresh init


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


def test_trainer_mesh_resume(data_dir, tmp_path, eight_devices):
    """Resume on a mesh: the orbax-restored opt state must be re-placed onto
    the mesh device set (regression: params were sharded but opt_state stayed
    on one device -> 'incompatible devices for jitted computation')."""
    from chemeleon_tpu.train.trainer import Trainer
    cfg = get_config("chemeleon_bert_prompt", data_dir=data_dir,
                     log_dir=str(tmp_path / "logs_mr"), mesh_shape=(8, 1),
                     **TINY)
    tr = Trainer(cfg, text_backend="hash")
    tr.fit(max_epochs=1)
    tr2 = Trainer(cfg, text_backend="hash")
    out = tr2.fit(max_epochs=2, resume_from=str(tr.ckpt_dir / "last"))
    assert out["epochs"] == 2
    assert np.isfinite(out["best_val_loss"])


def test_clip_trainer_mesh_resume(data_dir, tmp_path, eight_devices):
    """Same regression for the CLIP trainer (replicated params + restored
    opt state must land on the same device set)."""
    from chemeleon_tpu.train.clip_trainer import ClipTrainer
    cfg = get_config("clip_prompt", data_dir=data_dir,
                     log_dir=str(tmp_path / "logs_cmr"), mesh_shape=(8, 1),
                     **{**TINY, "batch_size": 8})
    tr = ClipTrainer(cfg, text_backend="hash")
    tr.fit(max_epochs=1)
    tr2 = ClipTrainer(cfg, text_backend="hash")
    out = tr2.fit(max_epochs=2,
                  resume_from=str(Path(tr.ckpt_dir) / "last"))
    assert np.isfinite(out["best_val_loss"])


def test_clip_param_labels_projection_heads_get_proj_lr():
    """Reference crystal_clip.py:172-181: graph_proj trains at cfg.lr, not
    the graph-encoder LR — it lives inside the GraphTower tree, so labels
    must descend into params['graph'] (regression: the whole subtree was
    labelled 'graph', silently under-training the projection head 10x)."""
    from chemeleon_tpu.train.clip_trainer import clip_param_labels
    params = {
        "graph": {"params": {"layers_0": {"kernel": 1.0},
                             "graph_proj": {"dense": {"kernel": 2.0}}}},
        "text_proj": {"params": {"kernel": 3.0}},
        "text_tower": {"embedding": 4.0},
    }
    labels = clip_param_labels(params)
    assert labels["graph"]["params"]["layers_0"]["kernel"] == "graph"
    assert labels["graph"]["params"]["graph_proj"]["dense"]["kernel"] == "proj"
    assert labels["text_proj"]["params"]["kernel"] == "proj"
    assert labels["text_tower"]["embedding"] == "text_tower"


def _collect_injected_lrs(opt_state):
    out = {}

    def walk(s, path):
        hp = getattr(s, "hyperparams", None)
        if isinstance(hp, dict) and "learning_rate" in hp:
            out[path] = float(hp["learning_rate"])
        inner = getattr(s, "inner_states", None)
        if isinstance(inner, dict):
            for label, sub in inner.items():
                walk(sub, label)
        if isinstance(s, tuple):
            for x in s:
                walk(x, path)

    walk(opt_state, "")
    return out


def test_clip_plateau_scales_all_lr_groups():
    """ReduceLROnPlateau parity (crystal_clip.py:182-185): the scheduler
    scales every param group's LR by 0.8 after patience bad epochs."""
    import jax.numpy as jnp
    from chemeleon_tpu.train.clip_trainer import build_clip_optimizer
    from chemeleon_tpu.train.optim import PlateauScale, set_group_learning_rates

    cfg = get_config("clip_prompt", **TINY)
    tx = build_clip_optimizer(cfg)
    params = {"graph": {"params": {"graph_proj": {"k": jnp.ones(2)},
                                   "layer": {"k": jnp.ones(2)}}},
              "text_proj": {"params": {"k": jnp.ones(2)}},
              "text_tower": {"k": jnp.ones(2)}}
    state = tx.init(params)
    lrs = _collect_injected_lrs(state)
    assert lrs == {"text_tower": pytest.approx(cfg.text_encoder_lr),
                   "graph": pytest.approx(cfg.graph_encoder_lr),
                   "proj": pytest.approx(cfg.lr)}

    sched = PlateauScale(patience=1)
    assert sched.update(1.0) == 1.0          # improvement
    assert sched.update(1.1) == 1.0          # bad 1 <= patience
    scale = sched.update(1.2)                # bad 2 > patience -> decay
    assert scale == pytest.approx(0.8)
    state2 = set_group_learning_rates(state, {
        "text_tower": cfg.text_encoder_lr * scale,
        "graph": cfg.graph_encoder_lr * scale,
        "proj": cfg.lr * scale})
    lrs2 = _collect_injected_lrs(state2)
    assert lrs2["proj"] == pytest.approx(cfg.lr * 0.8)
    assert lrs2["graph"] == pytest.approx(cfg.graph_encoder_lr * 0.8)
    # round-trip of the host-side state (resume parity)
    clone = PlateauScale(patience=1)
    clone.load_state_dict(sched.state_dict())
    assert clone.scale == sched.scale and clone.bad == sched.bad


def test_resume_restores_scheduler_and_step_state(data_dir, tmp_path):
    """A resumed reduce_on_plateau run must continue at the DECAYED lr and
    the saved global_step, not restart at base lr / step 0."""
    from chemeleon_tpu.train.optim import LRScheduler
    from chemeleon_tpu.train.trainer import Trainer

    cfg = get_config("chemeleon_bert_prompt", data_dir=data_dir,
                     log_dir=str(tmp_path / "logs_sched"),
                     scheduler="reduce_on_plateau", **TINY)
    tr = Trainer(cfg, text_backend="hash")
    # simulate a mid-run decayed scheduler, then checkpoint
    tr.lr_sched.load_state_dict({"lr": cfg.lr * 0.8 ** 3, "best": 0.5,
                                 "bad": 1, "epoch": 4})
    tr.early.load_state_dict({"best": 0.5, "bad": 7})
    params = tr.model.init_params(jax.random.PRNGKey(0))
    tr.save_checkpoint("last", params, tr.tx.init(params), epoch=4,
                       global_step=123, val_loss=0.5)

    tr2 = Trainer(cfg, text_backend="hash")
    out = tr2.fit(max_epochs=6, resume_from=str(tr.ckpt_dir / "last"))
    assert tr2.lr_sched.lr <= cfg.lr * 0.8 ** 3 + 1e-12  # decay kept
    assert tr2.early.best == 0.5
    assert out["global_step"] > 123  # counter continued, not reset


def test_model_params_live_after_aborted_fit(data_dir, tmp_path, monkeypatch):
    """The train step donates params; if fit aborts (non-finite loss guard)
    model.params must still reference LIVE buffers, not donated ones."""
    from chemeleon_tpu.train import trainer as trainer_mod
    from chemeleon_tpu.train.trainer import Trainer

    cfg = get_config("chemeleon_bert_prompt", data_dir=data_dir,
                     log_dir=str(tmp_path / "logs_abort"), **TINY)
    tr = Trainer(cfg, text_backend="hash")
    # poison the loss check: pretend every logged loss is NaN
    real_isfinite = np.isfinite
    monkeypatch.setattr(trainer_mod.np, "isfinite", lambda x: False)
    with pytest.raises(FloatingPointError):
        tr.fit(max_epochs=1)
    monkeypatch.setattr(trainer_mod.np, "isfinite", real_isfinite)
    # params must be materialized (raises if they reference deleted buffers)
    total = sum(float(np.abs(np.asarray(x)).sum())
                for x in jax.tree.leaves(tr.model.params))
    assert np.isfinite(total)


def test_checkpoint_cadence_still_saves_final_last(data_dir, tmp_path):
    """checkpoint_every_n_epochs > 1 skips intermediate rolling saves but a
    final 'last' (and every improved 'best') is always written."""
    from chemeleon_tpu.train.trainer import Trainer

    cfg = get_config("chemeleon_bert_prompt", data_dir=data_dir,
                     log_dir=str(tmp_path / "logs_cad"),
                     checkpoint_every_n_epochs=100, **TINY)
    tr = Trainer(cfg, text_backend="hash")
    out = tr.fit(max_epochs=3)
    with open(tr.ckpt_dir / "last" / "meta.json") as f:
        meta = json.load(f)
    assert meta["epoch"] == 2  # final epoch, despite cadence 100
    assert (tr.ckpt_dir / "best").exists()
    assert out["epochs"] == 3


def test_validity_monitored_checkpoint(data_dir, tmp_path):
    """validity_check_every_n_epochs samples from the live params each N
    epochs, logs val/validity, and saves a 'best_validity' checkpoint —
    selection by sample geometry, not val/loss (the two decouple at
    small-data scale, BENCH.md)."""
    from chemeleon_tpu.train.trainer import Trainer

    cfg = get_config("chemeleon_bert_prompt", data_dir=data_dir,
                     log_dir=str(tmp_path / "logs_vmc"),
                     validity_check_every_n_epochs=1,
                     validity_check_samples=4, validity_check_natoms=4,
                     **TINY)
    tr = Trainer(cfg, text_backend="hash")
    out = tr.fit(max_epochs=2)
    assert all("val/validity" in h for h in out["history"])
    assert 0.0 <= out["history"][0]["val/validity"] <= 1.0
    assert (tr.ckpt_dir / "best_validity" / "meta.json").exists()


def test_ema_checkpoint_and_loading(data_dir, tmp_path):
    """ema_decay > 0: checkpoints carry params_ema, val/loss_ema is logged,
    load_from_checkpoint(use_ema=True) restores weights that differ from the
    raw params, and resume restores the EMA tree."""
    from chemeleon_tpu.models.chemeleon import Chemeleon
    from chemeleon_tpu.train.trainer import Trainer
    cfg = get_config("chemeleon_bert_prompt", data_dir=data_dir,
                     log_dir=str(tmp_path / "logs"), exp_name="ema",
                     ema_decay=0.9, **TINY)
    tr = Trainer(cfg, text_backend="hash")
    tr.fit(max_epochs=2)
    assert (tr.ckpt_dir / "last" / "params_ema").exists()
    lines = [json.loads(l) for l in open(tr.logger.path)]
    keys = set().union(*[set(l) for l in lines])
    assert "val/loss_ema" in keys

    raw = Chemeleon.load_from_checkpoint(str(tr.ckpt_dir / "last"),
                                         text_backend="hash")
    ema = Chemeleon.load_from_checkpoint(str(tr.ckpt_dir / "last"),
                                         use_ema=True, text_backend="hash")
    r = jax.tree.leaves(raw.params["decoder"])[0]
    e = jax.tree.leaves(ema.params["decoder"])[0]
    assert r.shape == e.shape and not np.allclose(r, e)
    # EMA params sample fine
    assert len(ema.sample("a crystal of X", 4, 2,
                          key=jax.random.PRNGKey(0))) == 2

    # resume keeps updating the restored EMA tree (no crash, file persists)
    tr2 = Trainer(cfg, text_backend="hash")
    tr2.fit(max_epochs=3, resume_from=str(tr.ckpt_dir / "last"))
    assert (tr2.ckpt_dir / "last" / "params_ema").exists()


def test_use_ema_errors_without_ema_checkpoint(data_dir, tmp_path):
    from chemeleon_tpu.models.chemeleon import Chemeleon
    from chemeleon_tpu.train.trainer import Trainer
    cfg = get_config("chemeleon_bert_prompt", data_dir=data_dir,
                     log_dir=str(tmp_path / "logs"), exp_name="noema",
                     **TINY)
    tr = Trainer(cfg, text_backend="hash")
    tr.fit(max_epochs=1)
    with pytest.raises(FileNotFoundError, match="params_ema"):
        Chemeleon.load_from_checkpoint(str(tr.ckpt_dir / "last"),
                                       use_ema=True, text_backend="hash")


def test_fit_fails_loud_when_buckets_drop_all_batches(data_dir, tmp_path):
    """drop_last keeps shapes static, but a dataset whose every pad-bucket
    holds < batch_size rows would silently train for max_epochs with ZERO
    gradient steps (found live: 8 rows / batch 8 split across two buckets).
    The trainer must fail loud at the first empty epoch."""
    from chemeleon_tpu.train.trainer import Trainer
    cfg = get_config("chemeleon_bert_prompt", data_dir=data_dir,
                     log_dir=str(tmp_path / "logs"), exp_name="nobatch",
                     **{**TINY, "batch_size": 16})  # 12 train rows < 16
    tr = Trainer(cfg, text_backend="hash")
    with pytest.raises(ValueError, match="0 batches"):
        tr.fit(max_epochs=2)
