"""Offline composition conditioner: formula text -> element-fraction
features -> small trainable MLP tower.

Why this exists: the reference's composition-conditioned generation
(reference chemeleon/text_encoder/text_encoder.py:129-184 with a frozen
MatSciBERT / trained Crystal-CLIP) makes `sample composition -t TiO2`
actually produce Ti-O cells — its validity filter requires an exact
reduced-composition match (scripts/sample_target_composition.py:57-62).
Pretrained LMs are unreachable in a zero-egress image, but composition
strings are a closed formal language: no LM is needed to embed them
semantically. This module parses the formula (and an optional crystal-system
word) on the host into a fixed feature vector, and a small flax MLP — whose
forward runs INSIDE the jitted, differentiated loss, like the BERT tower in
text/tower.py — learns the conditioning embedding end to end with the
diffusion model.

Feature layout ([FEAT_DIM] = 128, lane-aligned):
  [0:103]   element fractions by atomic number (sum to 1 when parsed)
  [103]     log1p(total atoms in formula unit) / log1p(40)
  [104]     (number of distinct elements) / 8
  [105:112] crystal-system one-hot (triclinic..cubic) when a system word
            appears in the text
  [112]     1.0 when a composition was successfully parsed
  [113:128] bag-of-words hash residual over the remaining (non-formula,
            non-system) tokens — free-text signal for prompt conditioning
            (signed feature hashing, scaled 1/sqrt(n_tokens))
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from chemeleon_tpu.chem.composition import parse_composition
from chemeleon_tpu.chem.elements import Z_BY_SYMBOL

FEAT_DIM = 128

CRYSTAL_SYSTEMS = ("triclinic", "monoclinic", "orthorhombic", "tetragonal",
                   "trigonal", "hexagonal", "cubic")

# "composition: Ca1 O10, crystal_system: tetragonal" (data/mp_dataset.py
# _assemble_text) -> strip the key labels before parsing
_LABEL_RE = re.compile(
    r"\b(composition|crystal[ _]system|prompt|formula)\s*:\s*", re.I)
_TOKEN_SPLIT_RE = re.compile(r"[\s,;:]+")
_STRIP_CHARS = ".,;:!?\"'"


def _try_parse(s: str) -> Optional[Dict[str, float]]:
    try:
        return parse_composition(s)
    except (ValueError, RecursionError):
        return None


def _plausible(comp: Dict[str, float], token: str) -> bool:
    """Guard against English words that happen to parse as element runs
    ("In", "NoW", ...): require a stoichiometric digit or >= 2 distinct
    elements — true for every mp-40 composition string ("Ca1 O10") and for
    the formulas embedded in the LLM prompts ("NaCaH6Ir", "Tc3Se4I")."""
    return any(ch.isdigit() for ch in token) or len(comp) >= 2


def extract_composition(text: str) -> Optional[Dict[str, float]]:
    """Best-effort composition from raw conditioning text. Handles the bare
    formula ("TiO2", "Ca1 O10"), the multi-target assembled form
    ("composition: Ca1 O10, crystal_system: tetragonal"), and free-form
    prompts with an embedded formula token."""
    t = _LABEL_RE.sub(" ", text).strip()
    # 1) whole string / comma segment as a formula (spaces are ignored by
    #    the parser, so "Ca1 O10" works)
    for seg in [t] + [s for s in t.split(",") if s.strip()]:
        seg = seg.strip().strip(_STRIP_CHARS)
        comp = _try_parse(seg)
        if comp and _plausible(comp, seg):
            return comp
    # 2) token scan for prompts: collect unique formula-looking tokens
    seen = []
    for tok in _TOKEN_SPLIT_RE.split(t):
        tok = tok.strip(_STRIP_CHARS)
        if not tok or tok in (s for s, _ in seen):
            continue
        comp = _try_parse(tok)
        if comp and _plausible(comp, tok):
            seen.append((tok, comp))
    if not seen:
        return None
    # merge fragments ("Ca1" + "O10" when the segment parse was defeated by
    # surrounding prose); duplicates were deduped above
    merged: Dict[str, float] = {}
    for _, comp in seen:
        for el, n in comp.items():
            merged[el] = merged.get(el, 0.0) + n
    return merged


def extract_crystal_system(text: str) -> Optional[int]:
    low = text.lower()
    for i, name in enumerate(CRYSTAL_SYSTEMS):
        if name in low:
            return i
    return None


_BOW_LO, _BOW_HI = 113, FEAT_DIM


def _bow_residual(text: str) -> np.ndarray:
    """Signed feature hashing of the non-formula, non-system words —
    free-text tokens ("unique", "arrangement", "exhibiting", ...) the
    structured features do not capture."""
    import hashlib
    dim = _BOW_HI - _BOW_LO
    out = np.zeros((dim,), np.float32)
    words = []
    for tok in _TOKEN_SPLIT_RE.split(text):
        tok = tok.strip(_STRIP_CHARS)
        low = tok.lower()
        if not tok or low in CRYSTAL_SYSTEMS:
            continue
        comp = _try_parse(tok)
        if comp and _plausible(comp, tok):
            continue  # formula token, already covered by [0:103]
        words.append(low)
    for w in words:
        h = hashlib.sha256(w.encode()).digest()
        out[h[0] % dim] += 1.0 if h[1] % 2 else -1.0
    if words:
        out /= np.sqrt(len(words))
    return out


def featurize_text(text: str) -> np.ndarray:
    """One conditioning string -> [FEAT_DIM] float32 feature vector."""
    f = np.zeros((FEAT_DIM,), np.float32)
    comp = extract_composition(text)
    if comp:
        total = float(sum(comp.values()))
        for el, n in comp.items():
            f[Z_BY_SYMBOL[el] - 1] = n / total
        f[103] = np.log1p(total) / np.log1p(40.0)
        f[104] = len(comp) / 8.0
        f[112] = 1.0
    cs = extract_crystal_system(text)
    if cs is not None:
        f[105 + cs] = 1.0
    f[_BOW_LO:_BOW_HI] = _bow_residual(text)
    return f


class CompositionMLP(nn.Module):
    """Two hidden layers of silu; the whole tower is ~0.2M params."""
    out_dim: int
    hidden: int = 256

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.silu(nn.Dense(self.hidden, name="lin1")(x))
        x = nn.silu(nn.Dense(self.hidden, name="lin2")(x))
        return nn.Dense(self.out_dim, name="out")(x)


class CompositionTower:
    """Drop-in tower with the TrainableTextTower interface
    (tokenize / apply / init_params / encode) so the existing
    trainable-text-encoder plumbing (TextEncoder, CrystalClip, both
    trainers) carries it unchanged. Selected with
    ``text_encoder="composition"``."""

    # featurization is deterministic -> memoize per string (training
    # re-encodes the same ~600 rows every epoch)
    def __init__(self, text_embed_dim: int, max_text_len: int = 0):
        self.text_embed_dim = text_embed_dim
        self.model = CompositionMLP(text_embed_dim)
        self._cache: Dict[str, np.ndarray] = {}
        self.random_init = False  # no pretrained weights exist or are needed

    # -- host side -----------------------------------------------------------
    def tokenize(self, texts: List[str]) -> Tuple[jnp.ndarray]:
        out = np.empty((len(texts), FEAT_DIM), np.float32)
        for i, t in enumerate(texts):
            if t not in self._cache:
                self._cache[t] = featurize_text(t)
            out[i] = self._cache[t]
        return (jnp.asarray(out),)

    # -- jit side ------------------------------------------------------------
    def apply(self, tower_params, features: jnp.ndarray) -> jnp.ndarray:
        """[B, text_embed_dim]; pure in ``tower_params``."""
        return self.model.apply(tower_params, features)

    def init_params(self, key: Optional[jax.Array] = None):
        if key is None:
            key = jax.random.PRNGKey(0)
        return self.model.init(key, jnp.zeros((1, FEAT_DIM)))

    def encode(self, tower_params, texts: List[str]) -> jnp.ndarray:
        (feats,) = self.tokenize(texts)
        return self.apply(tower_params, feats)
