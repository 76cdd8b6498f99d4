"""Typed configuration for chemeleon-tpu.

Mirrors the reference's sacred config (reference: chemeleon/config.py:8-95) as a
frozen dataclass plus the 20 named presets (reference: chemeleon/config.py:101-312),
selected via ``get_config(name, **overrides)``.

TPU-specific additions live at the bottom of the dataclass (padding buckets,
mesh shape, dtype policy) — everything above matches the reference key-for-key.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple


@dataclass(frozen=True)
class ChemeleonConfig:
    # base (reference config.py:9-16)
    project_name: str = "Chemeleon_v0.1.1"
    exp_name: str = "chemeleon"
    group_name: str = "mp-40"
    seed: int = 0
    test_only: bool = False
    offline: bool = False
    sweep: bool = False

    # dataset (config.py:19-20)
    dataset_name: str = "mp-40"
    data_dir: str = "data/mp-40"

    # dataloader (config.py:23-25)
    batch_size: int = 128
    num_workers: int = 0
    pin_memory: bool = True  # kept for API parity; no-op on TPU

    # decoder / CSPNet (config.py:28-42)
    hidden_dim: int = 512
    time_dim: int = 128
    text_dim: int = 512
    max_atoms: int = 103 + 1  # 103 elements + 1 dummy/absorbing class
    num_layers: int = 6
    act_fn: str = "silu"
    dis_emb: str = "sin"
    num_freqs: int = 128
    # "fc" is the production path (reference default, config.py:36). "knn"
    # is correct + tested but eval-only: measured 0.27-0.43x fc throughput
    # (results/knn_probe.json, BENCH.md round 4) — its [B,N,27N] neighbor
    # ranking loses to the fused dense fc pass at every mp-40 size.
    edge_style: str = "fc"  # "fc" | "knn"
    max_neighbors: int = 20
    cutoff: float = 6.0
    ln: bool = True
    ip: bool = True
    smooth: bool = False
    pred_atom_types: bool = True

    # chemeleon (config.py:45-60)
    text_guide: bool = True
    text_targets: Tuple[str, ...] = ("composition",)
    trainable_text_encoder: bool = False
    text_encoder: str = "lfoppiano/MatTPUSciBERT"
    text_embed_dim: int = 768
    max_text_len: int = 256
    cond_drop_prob: float = 0.2
    beta_schedule: str = "cosine"  # "cosine" | "linear" | "quadratic" | "sigmoid"
    timesteps: int = 1000
    max_num_atoms: int = 50
    cost_atom_types: float = 1.0
    cost_lattice: float = 1.0
    cost_coords: float = 1.0
    d3pm_hybrid_coeff: float = 1.0

    # crystal-clip (config.py:63-68)
    clip_dim: int = 768
    label_smoothing: float = 0.1
    graph_pooling: str = "mean"  # "mean" | "sum"
    graph_encoder_lr: float = 1e-4
    text_encoder_lr: float = 1e-5
    accumulate_grad_batches: int = 1

    # optimizer (config.py:71-76)
    optimizer: str = "adam"  # "adam" | "sgd" | "adamw"
    lr: float = 1e-3
    weight_decay: float = 0.0
    scheduler: str = "reduce_on_plateau"
    patience: int = 200
    early_stopping: int = 300

    # training (config.py:79-88)
    num_nodes: int = 1
    devices: int = 1
    accelerator: str = "tpu"
    max_epochs: int = 1000
    deterministic: bool = True
    log_dir: str = "./logs"
    load_path: Optional[str] = None
    resume_from: Optional[str] = None
    gradient_clip_val: float = 0.5
    limit_test_batches: float = 1.0

    # test evaluation (config.py:91-95)
    cond_scale: float = 2.0
    meta_stable_test: bool = True
    dynamic_stable_test: bool = True
    optimization_test: bool = False
    wandb_id: Optional[str] = None

    # ---- TPU-native additions (not in reference) ----
    # Static-shape padding: graphs are padded to the smallest bucket >= natoms.
    # Finer grid than {8,16,24,32,40}: edge work is O(N^2), so splitting the
    # heavy mp-40 buckets (20: 127 rows, 36: 131 rows) cuts padding waste —
    # measured ~12% less wall time over the full test set (BENCH.md round-2
    # bucket sweep). More buckets = more compiled shapes; the persistent
    # compilation cache (utils/compilation_cache.py) amortizes that.
    pad_buckets: Tuple[int, ...] = (8, 12, 16, 20, 24, 32, 36, 40, 48)
    # Device mesh (data, model); total must divide jax.device_count() at use time.
    mesh_shape: Tuple[int, int] = (1, 1)
    # Compute dtype for the score network ("float32" | "bfloat16"); params stay f32.
    compute_dtype: str = "float32"
    # Rematerialize CSP layers during training (memory for FLOPs).
    remat: bool = False
    # knn periodic image search range r: images in [-r, r]^3 are searched.
    # Must satisfy r >= ceil(cutoff / min plane spacing); 1 suffices for
    # mp-40 cells at the default 6 A cutoff.
    knn_image_range: int = 1
    # Validity-monitored checkpointing: every N epochs, sample a small
    # batch from the current params and track the fraction passing the
    # reference validity criterion; the best-validity params are saved as
    # the "best_validity" checkpoint. Motivated by a measured decoupling:
    # at small-data scale the best-val/loss checkpoint is NOT the
    # best-geometry one (BENCH.md "Real-data learning check"). 0 = off.
    # CAVEAT (measured, BENCH.md): the probe must be large and cover the
    # deployment size mix — 16 samples at a single small natoms selected a
    # WORSE checkpoint than val/loss; size validity_check_samples like an
    # evaluation, not a smoke test.
    validity_check_every_n_epochs: int = 0
    validity_check_samples: int = 16
    validity_check_natoms: int = 16
    # Cadence of the rolling "last" checkpoint (1 = every epoch, the
    # reference ModelCheckpoint(save_last=True) behavior; 0 = only at the
    # final epoch). The save is a blocking device->host pull of params+opt
    # state (~4 s for a 10M-param model through the TPU tunnel — 40%+ of
    # wall time at 1-s epochs); raise for small fast runs. "best" is
    # always saved, and a final "last" is written when fit ends.
    checkpoint_every_n_epochs: int = 1
    # Trajectory snapshot stride inside the compiled sampler (1 = every step).
    trajectory_stride: int = 1
    # Few-step (strided) sampling: number of reverse steps to run at
    # inference, 0 = all `timesteps` (the reference-parity 1000-step
    # predictor-corrector). K < timesteps picks K timesteps evenly over
    # [1, T] and jumps between them: D3PM absorbing-chain jump posterior for
    # types, DDIM eta=1 for the lattice, coarser VE ladder for coords —
    # sampling wall time scales ~T/K (framework extension; measured
    # validity-vs-steps tradeoff in BENCH.md). Override per call via
    # sample_batch(sample_steps=...).
    sample_steps: int = 0
    # lax.scan unroll factor for the sampler's reverse loop: > 1 replicates
    # the step body so XLA can overlap VPU epilogues / DMA across adjacent
    # timesteps, at the cost of compile time and program size. Numerics are
    # identical by construction (same ops, same order per step). Perf knob
    # for the HBM-pressured N>=32 buckets; sweep on-chip before adopting.
    sampler_scan_unroll: int = 1
    # Exponential moving average of the diffusion params (framework
    # extension; standard diffusion-model practice the reference lacks).
    # > 0 enables: ema = d*ema + (1-d)*params after every step, with the
    # usual (1+step)/(10+step) warmup cap so early EMA tracks the fast-
    # moving params. Every checkpoint then also carries "params_ema"
    # (Chemeleon.load_from_checkpoint(use_ema=True)), and validation logs
    # val/loss_ema alongside val/loss. 0 = off.
    ema_decay: float = 0.0
    # Isovalent element-substitution augmentation (data/augment.py): per
    # accessed training item, each species is swapped to a same-family
    # element with this probability (cell rescaled by covalent-volume
    # ratio, prompt composition rewritten to match). Attacks the 596-row
    # composition-generalization wall (BENCH.md round 3: held-out
    # composition_matching 0.0); new draw every epoch. 0 = off. Applies when
    # all text_targets are composition/symmetry columns or the free-form
    # prompt (whose formula tokens are rewritten under the substitution).
    aug_substitution_prob: float = 0.0
    # Augmentation round 2 (data/augment.py): deterministic 2x-supercell
    # expansion of every row that fits the atom cap (same structure trained
    # at Z and 2Z; static natoms, so bucket plans stay compile-stable) ...
    aug_supercell: bool = False
    # Largest supercell factor emitted by the expansion: every row whose
    # Z*natoms fits the atom cap appears once per factor in 2..max_z (round
    # 5 widening — Z=3 where <=~13 atoms triples the small-cell diversity
    # that moved train-row structure_matching in round 4). 2 = round-4
    # behavior.
    aug_supercell_max_z: int = 2
    # ... and per-epoch lattice-strain jitter (relative amplitude of a
    # random symmetric strain; cells re-canonicalized). 0 = off.
    aug_lattice_noise: float = 0.0
    # Hang watchdog (utils/watchdog.py): abort the process with exit code 17
    # if no training step completes for this many seconds (a wedged TPU
    # tunnel blocks forever inside a device call — process exit is the only
    # recovery), so scripts/train_resilient.py can restart + resume from the
    # "last" checkpoint. 0 = off.
    watchdog_timeout_s: float = 0.0

    def replace(self, **kwargs: Any) -> "ChemeleonConfig":
        return dataclasses.replace(self, **kwargs)

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "ChemeleonConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        clean = {}
        for k, v in d.items():
            if k not in known:
                continue
            if isinstance(v, list):
                v = tuple(v)
            clean[k] = v
        return cls(**clean)


# ---------------------------------------------------------------------------
# Named presets — mirror reference config.py:101-312 exactly.
# ---------------------------------------------------------------------------

def _preset(**kw: Any) -> Dict[str, Any]:
    return kw


NAMED_CONFIGS: Dict[str, Dict[str, Any]] = {
    # Crystal CLIP (config.py:101-130)
    "clip_composition": _preset(
        exp_name="clip_composition", group_name="crystal_clip",
        text_targets=("composition",)),
    "clip_crystal_system": _preset(
        exp_name="clip_crystal_system", group_name="crystal_clip",
        text_targets=("crystal_system",)),
    "clip_composition_crystal_system": _preset(
        exp_name="clip_composition_crystal_system", group_name="crystal_clip",
        text_targets=("composition", "crystal_system")),
    "clip_prompt": _preset(
        exp_name="clip_prompt", group_name="crystal_clip",
        text_targets=("prompt",)),
    # unguided (config.py:138-144)
    "unguided": _preset(
        exp_name="unguided", group_name="unguided",
        text_guide=False, text_targets=()),
    # composition (config.py:152-186)
    "chemeleon_bert_composition": _preset(
        exp_name="chemeleon_bert_composition", group_name="composition",
        text_targets=("composition",)),
    "chemeleon_clip_composition": _preset(
        exp_name="chemeleon_clip_composition", group_name="composition",
        text_targets=("composition",), text_encoder="chemeleon/clip-mp-composition"),
    "chemeleon_t5_composition": _preset(
        exp_name="chemeleon_t5_composition", group_name="composition",
        text_targets=("composition",), text_encoder="t5-3b", text_embed_dim=1024),
    "chemeleon_llama_composition": _preset(
        exp_name="chemeleon_llama_composition", group_name="composition",
        text_targets=("composition",),
        text_encoder="meta-llama/Meta-Llama-3-8B-Instruct", text_embed_dim=4096),
    # crystal_system (config.py:194-228)
    "chemeleon_bert_crystal_system": _preset(
        exp_name="chemeleon_bert_crystal_system", group_name="crystal_system",
        text_targets=("crystal_system",)),
    "chemeleon_clip_crystal_system": _preset(
        exp_name="chemeleon_clip_crystal_system", group_name="crystal_system",
        text_targets=("crystal_system",), text_encoder="chemeleon/clip-mp-crystalsystem"),
    "chemeleon_t5_crystal_system": _preset(
        exp_name="chemeleon_t5_crystal_system", group_name="crystal_system",
        text_targets=("crystal_system",), text_encoder="t5-3b", text_embed_dim=1024),
    "chemeleon_llama_crystal_system": _preset(
        exp_name="chemeleon_llama_crystal_system", group_name="crystal_system",
        text_targets=("crystal_system",),
        text_encoder="meta-llama/Meta-Llama-3-8B-Instruct", text_embed_dim=4096),
    # composition + crystal_system (config.py:236-270)
    "chemeleon_bert_composition_crystal_system": _preset(
        exp_name="chemeleon_bert_composition_crystal_system",
        group_name="composition_crystal_system",
        text_targets=("composition", "crystal_system")),
    "chemeleon_clip_composition_crystal_system": _preset(
        exp_name="chemeleon_clip_composition_crystal_system",
        group_name="composition_crystal_system",
        text_targets=("composition", "crystal_system"),
        text_encoder="chemeleon/clip-mp-composition_crystalsystem"),
    "chemeleon_t5_composition_crystal_system": _preset(
        exp_name="chemeleon_t5_composition_crystal_system",
        group_name="composition_crystal_system",
        text_targets=("composition", "crystal_system"),
        text_encoder="t5-3b", text_embed_dim=1024),
    "chemeleon_llama_composition_crystal_system": _preset(
        exp_name="chemeleon_llama_composition_crystal_system",
        group_name="composition_crystal_system",
        text_targets=("composition", "crystal_system"),
        text_encoder="meta-llama/Meta-Llama-3-8B-Instruct", text_embed_dim=4096),
    # prompt (config.py:278-312)
    "chemeleon_bert_prompt": _preset(
        exp_name="chemeleon_bert_prompt", group_name="prompt",
        text_targets=("prompt",)),
    "chemeleon_clip_prompt": _preset(
        exp_name="chemeleon_clip_prompt", group_name="prompt",
        text_targets=("prompt",), text_encoder="chemeleon/clip-mp-prompt"),
    "chemeleon_t5_prompt": _preset(
        exp_name="chemeleon_t5_prompt", group_name="prompt",
        text_targets=("prompt",), text_encoder="t5-3b", text_embed_dim=1024),
    "chemeleon_llama_prompt": _preset(
        exp_name="chemeleon_llama_prompt", group_name="prompt",
        text_targets=("prompt",),
        text_encoder="meta-llama/Meta-Llama-3-8B-Instruct", text_embed_dim=4096),
    # ---- TPU-native additions: offline composition conditioning ----
    # (text/composition.py: element-fraction featurizer + trainable MLP
    # tower — semantically meaningful conditioning with zero pretrained
    # weights; the reference needs MatSciBERT / Crystal-CLIP for this)
    "chemeleon_composition": _preset(
        exp_name="chemeleon_composition", group_name="composition",
        text_targets=("composition",), text_encoder="composition",
        text_embed_dim=256, trainable_text_encoder=True),
    "chemeleon_composition_crystal_system": _preset(
        exp_name="chemeleon_composition_crystal_system",
        group_name="composition_crystal_system",
        text_targets=("composition", "crystal_system"),
        text_encoder="composition", text_embed_dim=256,
        trainable_text_encoder=True),
    "clip_composition_featurized": _preset(
        exp_name="clip_composition_featurized", group_name="crystal_clip",
        text_targets=("composition",), text_encoder="composition",
        text_embed_dim=256, trainable_text_encoder=True,
        text_encoder_lr=1e-3),  # from-scratch MLP, not a BERT finetune
    # prompt mode on the same featurizer tower: extract_composition's token
    # scan + the crystal-system word + bag-of-words residual make the
    # free-form mp-40 prompts semantically live offline (the reference's
    # headline conditioning mode needs MatSciBERT for this)
    "chemeleon_prompt_featurized": _preset(
        exp_name="chemeleon_prompt_featurized", group_name="prompt",
        text_targets=("prompt",), text_encoder="composition",
        text_embed_dim=256, trainable_text_encoder=True),
    "clip_prompt_featurized": _preset(
        exp_name="clip_prompt_featurized", group_name="crystal_clip",
        text_targets=("prompt",), text_encoder="composition",
        text_embed_dim=256, trainable_text_encoder=True,
        text_encoder_lr=1e-3),
}


def get_config(name: Optional[str] = None, **overrides: Any) -> ChemeleonConfig:
    """Build a config: base + optional named preset + keyword overrides.

    Equivalent to ``python run.py with <name> key=value`` in the reference.
    """
    cfg = ChemeleonConfig()
    if name is not None:
        if name not in NAMED_CONFIGS:
            raise ValueError(
                f"Unknown named config {name!r}. Available: {sorted(NAMED_CONFIGS)}")
        cfg = cfg.replace(**NAMED_CONFIGS[name])
    if overrides:
        if "text_targets" in overrides and isinstance(overrides["text_targets"], list):
            overrides["text_targets"] = tuple(overrides["text_targets"])
        cfg = cfg.replace(**overrides)
    return cfg
