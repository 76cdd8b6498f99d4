"""Element-substitution augmentation (data/augment.py).

The augmentation's contract: atom counts and bucketing are unchanged, the
prompt's composition string always matches the substituted types (the whole
point — prompt/structure agreement is what the conditioner trains on), swaps
stay inside isovalent families, and draws are deterministic per (seed, idx)
so runs are reproducible.
"""

import numpy as np
import pytest

from chemeleon_tpu.chem.composition import (
    parse_composition, reduced_composition)
from chemeleon_tpu.chem.elements import symbol_of
from chemeleon_tpu.data.augment import (
    FAMILY_OF, AugmentedView, composition_text, lattice_scale,
    substitute_types)


class FakeDataset:
    """Minimal MPDataset stand-in: TiO2-like + NaCl-like items."""

    text_targets = ["composition"]

    def __init__(self):
        self.items = [
            dict(atom_types=np.array([22, 8, 8, 22, 8, 8], dtype=np.int32),
                 frac_coords=np.random.default_rng(0).random((6, 3))
                 .astype(np.float32),
                 lattice=np.eye(3, dtype=np.float32) * 4.0,
                 text="O2 Ti1"),
            dict(atom_types=np.array([11, 17], dtype=np.int32),
                 frac_coords=np.zeros((2, 3), dtype=np.float32),
                 lattice=np.eye(3, dtype=np.float32) * 3.0,
                 text="Cl1 Na1"),
        ]
        self.rows = [{"composition": it["text"]} for it in self.items]

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return dict(self.items[i])

    def natoms(self):
        return np.asarray([len(it["atom_types"]) for it in self.items])


def test_composition_text_matches_mp40_format():
    # reduced counts, explicit multiplicity, alphabetical: "O2 Ti1" for TiO2
    assert composition_text([22, 8, 8, 22, 8, 8]) == "O2 Ti1"
    assert composition_text([11, 17]) == "Cl1 Na1"
    # gcd reduction: Ca2 O20 -> Ca1 O10
    assert composition_text([20] * 2 + [8] * 20) == "Ca1 O10"


def test_substitution_stays_in_family_and_preserves_counts():
    types = np.array([22, 8, 8, 22, 8, 8], dtype=np.int32)
    hit = False
    for seed in range(40):
        new = substitute_types(types, np.random.default_rng(seed), 0.9)
        if new is None:
            continue
        hit = True
        assert new.shape == types.shape and new.dtype == types.dtype
        # each original species maps to ONE new species in its family
        for old_z in np.unique(types):
            new_zs = np.unique(new[types == old_z])
            assert len(new_zs) == 1
            assert symbol_of(int(new_zs[0])) in FAMILY_OF[symbol_of(int(old_z))]
    assert hit, "p=0.9 over 40 seeds never substituted"


def test_substitution_never_merges_species():
    # Fe and Ru coexist: Fe->Ru (or Ru->Fe) must be skipped, never merged
    types = np.array([26, 44, 8, 8], dtype=np.int32)
    for seed in range(60):
        new = substitute_types(types, np.random.default_rng(seed), 1.0)
        if new is not None:
            assert len(np.unique(new)) == len(np.unique(types))


def test_lattice_scale_direction():
    # Ti->Hf (bigger radius) must expand the cell; O->S likewise
    old = np.array([22, 8, 8], dtype=np.int32)
    bigger = np.array([72, 8, 8], dtype=np.int32)
    assert lattice_scale(old, bigger) > 1.0
    assert lattice_scale(old, old) == pytest.approx(1.0)


def test_view_rewrites_text_to_match_types():
    view = AugmentedView(FakeDataset(), p_species=1.0, seed=3)
    assert view.enabled
    for idx in range(len(view)):
        item = view[idx]
        want = composition_text(item["atom_types"])
        assert item["text"] == want
        # and the string round-trips through the composition parser
        red = reduced_composition(parse_composition(item["text"]))
        got = {symbol_of(int(z)) for z in item["atom_types"]}
        assert set(red) == got


def test_view_deterministic_per_seed_and_fresh_per_epoch():
    ds = FakeDataset()
    a = AugmentedView(ds, 1.0, seed=7)[0]
    b = AugmentedView(ds, 1.0, seed=7)[0]
    np.testing.assert_array_equal(a["atom_types"], b["atom_types"])
    diff_seen = any(
        not np.array_equal(AugmentedView(ds, 1.0, seed=7 + e)[0]["atom_types"],
                           a["atom_types"])
        for e in range(1, 8))
    assert diff_seen, "reseeding never changed the draw"


def test_view_identity_at_zero_prob_and_natoms_stable():
    ds = FakeDataset()
    view = AugmentedView(ds, 0.0, seed=0)
    item, orig = view[0], ds[0]
    np.testing.assert_array_equal(item["atom_types"], orig["atom_types"])
    np.testing.assert_array_equal(item["lattice"], orig["lattice"])
    assert item["text"] == orig["text"]
    np.testing.assert_array_equal(view.natoms(), ds.natoms())


def test_view_rewrites_free_form_prompt_targets():
    """Round 4: the prompt column IS augmentable — formula tokens are
    renamed under the substitution (rewrite_formula_tokens)."""
    ds = FakeDataset()
    ds.text_targets = ["prompt"]
    ds.rows = [{"prompt": "Cubic structure of O2Ti compound"},
               {"prompt": "Rock salt Cl1Na1 arrangement"}]
    view = AugmentedView(ds, 1.0, seed=0)
    assert view.enabled
    item = view[0]
    if not np.array_equal(item["atom_types"], ds[0]["atom_types"]):
        from chemeleon_tpu.data.augment import composition_text, \
            symbol_mapping
        mapping = symbol_mapping(ds[0]["atom_types"], item["atom_types"])
        assert mapping  # something changed
        # the prompt's formula token was renamed consistently
        for old, new in mapping.items():
            assert new in item["text"]
    # targets outside {composition, prompt, invariants} still disable
    ds2 = FakeDataset()
    ds2.text_targets = ["prompt", "band_gap"]
    assert not AugmentedView(ds2, 1.0, seed=0).enabled


def test_multi_target_text_keeps_invariant_columns():
    ds = FakeDataset()
    ds.text_targets = ["composition", "crystal_system"]
    ds.rows = [dict(r, crystal_system="cubic") for r in ds.rows]
    view = AugmentedView(ds, 1.0, seed=1)
    assert view.enabled
    item = view[0]
    comp = composition_text(item["atom_types"])
    assert item["text"] == f"composition: {comp}, crystal_system: cubic"


def test_datamodule_threads_augmentation(tmp_path):
    """cfg.aug_substitution_prob > 0 makes train batches' texts track the
    substituted types end to end through the real DataModule."""
    from chemeleon_tpu.config import get_config
    from chemeleon_tpu.data.datamodule import DataModule

    src = "data/mp-40/test.csv"
    import csv
    import itertools
    csv.field_size_limit(10 ** 9)
    with open(src) as f:
        rows = list(itertools.islice(csv.DictReader(f), 24))
    for split in ("train", "val", "test"):
        with open(tmp_path / f"{split}.csv", "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            w.writeheader()
            w.writerows(rows)

    cfg = get_config("chemeleon_composition", data_dir=str(tmp_path),
                     batch_size=4, aug_substitution_prob=1.0)
    dm = DataModule(cfg)
    dm.setup("fit")
    batch, texts = next(iter(dm.train_dataloader(epoch=0)))
    types = np.asarray(batch.atom_types)
    natoms = np.asarray(batch.natoms)
    for b, text in enumerate(texts):
        assert text == composition_text(types[b][: natoms[b]])


def test_prompt_rewrite_and_enabled():
    """Substitution augmentation applies to the free-form prompt column by
    renaming formula tokens (1:1 symbol rename)."""
    import numpy as np
    from chemeleon_tpu.data.augment import (AugmentedView,
                                            rewrite_formula_tokens,
                                            symbol_mapping)

    assert rewrite_formula_tokens(
        "Tetragonal crystal structure of CaO10 compound",
        {"Ca": "Sr", "O": "S"}) == \
        "Tetragonal crystal structure of SrS10 compound"
    # parenthesized formulas and plain words survive
    assert rewrite_formula_tokens(
        "lattice of Er5(Ge5Ir2)2 compound", {"Er": "Ho"}) == \
        "lattice of Ho5(Ge5Ir2)2 compound"
    # "In" alone (English word == element symbol) is not rewritten
    assert rewrite_formula_tokens("In cubic form", {"In": "Tl"}) == \
        "In cubic form"
    # decimal stoichiometry renames ATOMICALLY: '.' joins the run between
    # alphanumerics, so the formula is not split at '.' and half-renamed
    # ("Na0.5CoO2" was the old failure mode)
    assert rewrite_formula_tokens(
        "layered Li0.5CoO2 cathode", {"Li": "Na", "Co": "Rh", "O": "S"}) == \
        "layered Na0.5RhS2 cathode"
    # sentence-final '.' stays OUTSIDE the run
    assert rewrite_formula_tokens(
        "contains TiO2.", {"Ti": "Zr", "O": "S"}) == "contains ZrS2."
    m = symbol_mapping(np.array([20, 8, 8]), np.array([38, 8, 8]))
    assert m == {"Ca": "Sr"}

    class _DS:
        text_targets = ["prompt"]
        rows = [{"prompt": "Cubic NaCl structure"}]

        def __len__(self):
            return 1

    assert AugmentedView(_DS(), 0.5).enabled
    _DS.text_targets = ["prompt", "band_gap"]
    assert not AugmentedView(_DS(), 0.5).enabled


def test_supercell_view():
    """Z-expansion doubles fitting rows along the shortest axis; reduced
    composition, bucketability (static natoms) and geometry are preserved."""
    from chemeleon_tpu.data.augment import SupercellView

    ds = FakeDataset()
    view = SupercellView(ds, max_atoms=8)
    # 6-atom TiO2 does NOT fit 2x under cap 8; 2-atom NaCl does
    assert len(view) == 3
    assert list(view.natoms()) == [6, 2, 4]
    item = view[2]
    np.testing.assert_array_equal(item["atom_types"], [11, 17, 11, 17])
    base = ds[1]
    # doubled axis: lattice volume doubles, min-image geometry preserved
    assert abs(np.linalg.det(item["lattice"])
               - 2 * np.linalg.det(base["lattice"])) < 1e-4
    from chemeleon_tpu.chem.structure import Crystal
    sup = Crystal(item["lattice"], item["frac_coords"], item["atom_types"])
    orig = Crystal(base["lattice"], base["frac_coords"], base["atom_types"])
    from chemeleon_tpu.chem.matcher import StructureMatcher
    assert StructureMatcher().fit(orig, sup)


def test_supercell_view_z3():
    """max_z=3 adds a triple-cell copy where 3*natoms fits; the Z=3 copy
    is the same crystal (matcher fit) with 3x volume and static natoms."""
    from chemeleon_tpu.data.augment import SupercellView

    ds = FakeDataset()
    view = SupercellView(ds, max_atoms=8, max_z=3)
    # rows: TiO2(6), NaCl(2), NaCl@Z2(4), NaCl@Z3(6)
    assert len(view) == 4
    assert list(view.natoms()) == [6, 2, 4, 6]
    item = view[3]
    np.testing.assert_array_equal(item["atom_types"], [11, 17] * 3)
    base = ds[1]
    assert abs(np.linalg.det(item["lattice"])
               - 3 * np.linalg.det(base["lattice"])) < 1e-4
    # all fractional coords stay in [0, 1)
    assert item["frac_coords"].min() >= 0.0
    assert item["frac_coords"].max() < 1.0
    from chemeleon_tpu.chem.structure import Crystal
    from chemeleon_tpu.chem.matcher import StructureMatcher
    sup = Crystal(item["lattice"], item["frac_coords"], item["atom_types"])
    orig = Crystal(base["lattice"], base["frac_coords"], base["atom_types"])
    assert StructureMatcher().fit(orig, sup)
    # default max_z=2 keeps the round-4 behavior exactly
    assert len(SupercellView(ds, max_atoms=8)) == 3


def test_lattice_noise_view():
    from chemeleon_tpu.data.augment import LatticeNoiseView
    from chemeleon_tpu.models.chemeleon import MASK_LATTICE_MATRIX

    ds = FakeDataset()
    view = LatticeNoiseView(ds, amplitude=0.03, seed=1)
    assert len(view) == len(ds)
    item = view[0]
    base = ds[0]
    rel = np.abs(np.linalg.norm(item["lattice"], axis=1)
                 / np.linalg.norm(base["lattice"], axis=1) - 1.0)
    assert rel.max() < 0.15 and rel.max() > 0.0   # jittered, but small
    # canonical zero pattern preserved (training frame)
    mask = np.asarray(MASK_LATTICE_MATRIX)
    assert np.allclose(item["lattice"][mask == 0], 0.0, atol=1e-6)
    # frac coords co-move (unchanged)
    np.testing.assert_array_equal(item["frac_coords"], base["frac_coords"])
    # per-seed determinism
    again = LatticeNoiseView(ds, amplitude=0.03, seed=1)[0]
    np.testing.assert_array_equal(item["lattice"], again["lattice"])


def test_stacked_views_for_prompt_training():
    """SupercellView -> AugmentedView -> LatticeNoiseView composes (the
    round-4 prompt-flagship training stack)."""
    from chemeleon_tpu.data.augment import (AugmentedView, LatticeNoiseView,
                                            SupercellView)

    ds = FakeDataset()
    ds.text_targets = ["prompt"]
    ds.rows = [{"prompt": "Cubic structure of O2Ti compound"},
               {"prompt": "Rock salt Cl1Na1 arrangement"}]
    view = LatticeNoiseView(
        AugmentedView(SupercellView(ds, max_atoms=8), 1.0, seed=3),
        amplitude=0.02, seed=3)
    assert len(view) == 3
    for i in range(len(view)):
        item = view[i]
        assert item["atom_types"].shape[0] == view.natoms()[i]
        assert isinstance(item["text"], str) and item["text"]
