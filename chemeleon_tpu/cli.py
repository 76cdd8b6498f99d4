"""Chemeleon CLI (reference: chemeleon/cli.py:7-203) — same command tree and
flags: ``chemeleon navigate system``, ``chemeleon sample composition``,
``chemeleon sample prompt``, plus TPU-build extras ``chemeleon evaluate`` and
``chemeleon bench``."""

import json

import click

from chemeleon_tpu.scripts.navigate_chemical_system import navigate_chemical_system
from chemeleon_tpu.scripts.sample_prompt import sample_prompt
from chemeleon_tpu.scripts.sample_target_composition import sample_target_composition


@click.group(help="Chemeleon CLI - A tool for navigating chemical systems "
                  "and sampling target compositions.")
def cli():
    pass


@cli.group(help="Commands related to chemical system navigation.")
def navigate():
    pass


@navigate.command(
    name="system",
    help="""Navigate a chemical system, e.g., Ti-Zn-O or Li-P-S-Cl.

Examples:

  chemeleon navigate system --elements Zn,Ti,O

  chemeleon navigate system --elements Zn,Ti,O --n-samples 100
""")
@click.option("--elements", "-e", default="Zn,Ti,O", show_default=True,
              help="Comma-separated list of elements to navigate the "
                   "chemical system. e.g. Zn,Ti,O")
@click.option("--n-samples", default=100, show_default=True,
              help="Number of samples to generate.")
@click.option("--max-stoich", default=8, show_default=True,
              help="Maximum stoichiometric factor.")
@click.option("--max-natoms", default=40, show_default=True,
              help="Maximum number of atoms allowed in a structure.")
@click.option("--max-factor", default=13, show_default=True,
              help="Maximum multiplication factor for the composition.")
@click.option("--save-dir", "-s", default="results/navigate",
              show_default=True,
              help="Directory where the generated results will be saved.")
@click.option("--csp", is_flag=True, default=False,
              help="CSP mode: clamp atom types per enumerated composition.")
@click.option("--comp-prior-scale", default=0.0, show_default=True,
              help="Composition-prior guidance strength per enumerated "
                   "composition (softer than --csp).")
@click.option("--sample-steps", default=0, show_default=True,
              help="Few-step sampling: K < timesteps strided reverse steps "
                   "(~T/K faster — BENCH.md few-step table). 0 = full "
                   "schedule.")
@click.option("--profile", default="validity", show_default=True,
              type=click.Choice(["validity", "reference"]),
              help="Corrector profile: 'validity' disables the Langevin "
                   "corrector (+5-6 pts raw validity, results/"
                   "step_lr_sweep.json); 'reference' keeps upstream "
                   "step_lr=1e-5 parity.")
def cli_navigate_chemical_system(elements, n_samples, max_stoich, max_natoms,
                                 max_factor, save_dir, csp, comp_prior_scale,
                                 sample_steps, profile):
    navigate_chemical_system(
        elements=elements.split(","), n_samples=n_samples,
        max_stoich=max_stoich, max_natoms=max_natoms, max_factor=max_factor,
        save_dir=save_dir, csp=csp, comp_prior_scale=comp_prior_scale,
        sample_steps=sample_steps, profile=profile)


@cli.group(help="Commands related to sampling target compositions or prompts")
def sample():
    pass


@sample.command(
    name="composition",
    help="""Sample structures with a target composition, e.g., TiO2.

Examples:

  chemeleon sample composition --target-composition TiO2

  chemeleon sample composition -t Li2O --n-samples 50
""")
@click.option("--target-composition", "-t", default="Li2O", show_default=True,
              help="Target composition to sample.")
@click.option("--n-samples", default=100, show_default=True,
              help="Number of samples to generate.")
@click.option("--max-natoms", default=40, show_default=True,
              help="Maximum number of atoms allowed in a structure.")
@click.option("--max-factor", default=13, show_default=True,
              help="Maximum multiplication Z factor for the composition.")
@click.option("--save-dir", "-s", default="results/TiO2", show_default=True,
              help="Directory where the generated results will be saved.")
@click.option("--csp", is_flag=True, default=False,
              help="CSP mode: clamp atom types to the target composition "
                   "(exact composition by construction) instead of relying "
                   "on text guidance + filtering.")
@click.option("--comp-prior-scale", default=0.0, show_default=True,
              help="Composition-prior guidance strength: > 0 biases free "
                   "type diffusion toward the target element fractions "
                   "(softer than --csp, stronger than text guidance alone).")
@click.option("--sample-steps", default=0, show_default=True,
              help="Few-step sampling: K < timesteps strided reverse steps "
                   "(~T/K faster — BENCH.md few-step table). 0 = full "
                   "schedule.")
@click.option("--lattice-system", default=None,
              help="Clamp the cell to this crystal system's metric "
                   "constraints every reverse step (e.g. cubic, hexagonal) "
                   "— exact lattice system by construction; composable "
                   "with --csp.")
@click.option("--profile", default="validity", show_default=True,
              type=click.Choice(["validity", "reference"]),
              help="Corrector profile: 'validity' disables the Langevin "
                   "corrector (+5-6 pts raw validity); 'reference' keeps "
                   "upstream step_lr=1e-5 parity.")
def cli_sample_target_composition(target_composition, n_samples, max_natoms,
                                  max_factor, save_dir, csp,
                                  comp_prior_scale, sample_steps,
                                  lattice_system, profile):
    sample_target_composition(
        target_composition=target_composition, n_samples=n_samples,
        max_natoms=max_natoms, max_factor=max_factor, save_dir=save_dir,
        csp=csp, comp_prior_scale=comp_prior_scale,
        sample_steps=sample_steps, lattice_system=lattice_system,
        profile=profile)


@sample.command(
    name="prompt",
    help="""Sample structures with a text prompt, e.g., "A Crystal Structure
of LiMnO4 with orthorhombic symmetry".

Examples:

  chemeleon sample prompt --text-input "A Crystal Structure of LiMnO4 with orthorhombic symmetry"

  chemeleon sample prompt -t "A Crystal Structure of LiMnO4 with orthorhombic symmetry" --n-samples 50 --n-atoms 6
""")
@click.option("--text-input", "-t",
              default="A Crystal Structure of LiMnO4 with orthorhombic symmetry",
              show_default=True, help="Text input to sample.")
@click.option("--n-atoms", default=6, show_default=True,
              help="Number of atoms in the unit cell.")
@click.option("--n-samples", default=3, show_default=True,
              help="Number of samples to generate.")
@click.option("--save-dir", "-s", default="results/prompt")
@click.option("--sample-steps", default=0, show_default=True,
              help="Few-step sampling: K < timesteps strided reverse steps "
                   "(~T/K faster — BENCH.md few-step table). 0 = full "
                   "schedule.")
@click.option("--lattice-system", default=None,
              help="Clamp the cell to this crystal system's metric "
                   "constraints every reverse step (exact lattice system "
                   "by construction).")
@click.option("--profile", default="validity", show_default=True,
              type=click.Choice(["validity", "reference"]),
              help="Corrector profile: 'validity' disables the Langevin "
                   "corrector (+5-6 pts raw validity); 'reference' keeps "
                   "upstream step_lr=1e-5 parity.")
def cli_sample_prompt(text_input, n_atoms, n_samples, save_dir,
                      sample_steps, lattice_system, profile):
    sample_prompt(text_input=text_input, n_atoms=n_atoms,
                  n_samples=n_samples, save_dir=save_dir,
                  sample_steps=sample_steps, lattice_system=lattice_system,
                  profile=profile)


@cli.command(name="evaluate",
             help="Evaluate a checkpoint on the mp-40 test set.")
@click.option("--model-path", "-m", required=True,
              help="Path to a converted checkpoint directory or a reference "
                   ".ckpt file.")
@click.option("--test-data", default="data/mp-40/test.csv", show_default=True)
@click.option("--n-samples", default=20, show_default=True)
@click.option("--cond-scale", default=2.0, show_default=True)
@click.option("--save-path", default="results", show_default=True)
@click.option("--max-rows", default=None, type=int,
              help="Evaluate only the first N rows.")
@click.option("--csp", is_flag=True, default=False,
              help="Fixed-composition (CSP) protocol: clamp atom types to "
                   "each test row's composition and measure geometry "
                   "quality.")
@click.option("--pack-rows", default=8, show_default=True,
              help="Test rows packed per generation batch (higher = better "
                   "TPU utilization).")
@click.option("--cache-generation", is_flag=True, default=False,
              help="Persist generated chunks under <save-path>/gen_cache so "
                   "an interrupted run resumes where it stopped.")
@click.option("--comp-prior-scale", default=0.0, show_default=True,
              help="Composition-prior guidance strength: > 0 biases each "
                   "row's type diffusion toward its own composition's "
                   "element fractions (types still diffuse freely).")
@click.option("--sample-steps", default=0, show_default=True,
              help="Few-step sampling: run K < timesteps strided reverse "
                   "steps (~T/K faster, measured validity cost — BENCH.md). "
                   "0 = the full reference-parity schedule.")
@click.option("--fixed-cell", is_flag=True, default=False,
              help="Clamp each row's lattice to its own (Niggli-canonical) "
                   "ground-truth cell — known-cell protocol; combine with "
                   "--csp for Rietveld-style coordinate-only diffusion.")
@click.option("--step-lr", default=None, type=float,
              help="Langevin corrector strength (reference chemeleon.py:"
                   "452-462 default 1e-5). 0 disables the corrector noise "
                   "injections — measured +5-6 pts raw validity on the full "
                   "chain (results/step_lr_sweep.json). Overrides "
                   "--profile.")
@click.option("--profile", default="reference", show_default=True,
              type=click.Choice(["validity", "reference"]),
              help="Corrector profile. The evaluate protocol defaults to "
                   "'reference' (upstream step_lr=1e-5) so protocol numbers "
                   "stay comparable with the reference; generation APIs "
                   "default to 'validity'.")
@click.option("--gen-only", is_flag=True, default=False,
              help="Stop after the chip-bound generation phase (requires "
                   "--cache-generation); score later on CPU with "
                   "scripts/recompute_protocol.py.")
@click.option("--use-ema", is_flag=True, default=False,
              help="Evaluate the EMA weights a cfg.ema_decay > 0 run saved "
                   "alongside the raw params (long cosine schedules: the "
                   "EMA val/loss can sit well below raw mid-run).")
def cli_evaluate(model_path, test_data, n_samples, cond_scale, save_path,
                 max_rows, csp, pack_rows, cache_generation,
                 comp_prior_scale, sample_steps, fixed_cell, step_lr,
                 profile, gen_only, use_ema):
    from chemeleon_tpu.eval.evaluate import test_evaluate
    from chemeleon_tpu.models.chemeleon import Chemeleon
    from chemeleon_tpu.models.chemeleon import SAMPLING_PROFILES

    if step_lr is None:
        step_lr = SAMPLING_PROFILES[profile]["step_lr"]

    # .ckpt files are reference Lightning checkpoints (converted on the fly);
    # directories are this framework's orbax checkpoints
    model = Chemeleon.load_from_checkpoint(model_path, use_ema=use_ema)
    test_evaluate(model, test_data=test_data, n_samples=n_samples,
                  cond_scale=cond_scale, save_path=save_path,
                  max_rows=max_rows, csp=csp, pack_rows=pack_rows,
                  cache_generation=cache_generation,
                  comp_prior_scale=comp_prior_scale,
                  sample_steps=sample_steps, fixed_cell=fixed_cell,
                  step_lr=step_lr, gen_only=gen_only)


@cli.command(name="retrieval",
             help="Crystal-CLIP text->graph retrieval evaluation "
                  "(top-1/top-5 over a data split).")
@click.argument("preset")
@click.argument("checkpoint")
@click.option("--split", default="test", show_default=True,
              type=click.Choice(["train", "val", "test"]))
def cli_retrieval(preset, checkpoint, split):
    from chemeleon_tpu.eval.retrieval import main as retrieval_main
    retrieval_main([preset, checkpoint, split])


@cli.command(name="warmup",
             help="Precompile sampler shapes into the persistent XLA "
                  "compilation cache (moves 20-60s first-shape compiles out "
                  "of serving cold-starts).")
@click.option("--model-path", "-m", required=True)
@click.option("--buckets", default=None,
              help="Comma-separated padding buckets; default = the "
                   "checkpoint config's pad_buckets.")
@click.option("--batches", default=None,
              help="Comma-separated batch sizes; default = the 1..64 "
                   "power-of-two ladder the server's dynamic batching uses.")
@click.option("--stream-chunk", default=None, type=int,
              help="Also warm the chunked streaming program (/predict).")
def cli_warmup(model_path, buckets, batches, stream_chunk):
    from chemeleon_tpu.models.chemeleon import Chemeleon

    model = Chemeleon.load_from_checkpoint(model_path)
    timings = model.warmup(
        batch_sizes=[int(x) for x in batches.split(",")] if batches else None,
        buckets=[int(x) for x in buckets.split(",")] if buckets else None,
        stream_chunk=stream_chunk)
    for t in timings:
        click.echo(json.dumps(t))
    click.echo(f"warmed {len(timings)} programs in "
               f"{sum(t['seconds'] for t in timings):.1f}s")


@cli.command(name="bench", help="Run the sampling throughput benchmark.")
def cli_bench():
    import subprocess
    import sys
    from pathlib import Path
    bench = Path(__file__).resolve().parent.parent / "bench.py"
    subprocess.run([sys.executable, str(bench)], check=True)


@cli.command(name="serve", help="Start the streaming inference server.")
@click.option("--port", default=8000, show_default=True)
@click.option("--host", default="0.0.0.0", show_default=True)
@click.option("--stream-chunk", default=100, show_default=True,
              help="Diffusion steps per streamed update.")
@click.option("--model-kind", default="general_text", show_default=True,
              type=click.Choice(["general_text", "composition"]))
def cli_serve(port, host, stream_chunk, model_kind):
    from chemeleon_tpu.serve.server import ChemeleonServer
    ChemeleonServer(host=host, port=port, stream_chunk=stream_chunk,
                    model_kind=model_kind).run()


@cli.command(name="optimize",
             help="Relax generated CIFs with FIRE (MACE when installed, "
                  "soft-sphere surrogate otherwise).")
@click.option("--cif-dir", "-i", required=True,
              help="Directory of .cif files to relax.")
@click.option("--save-dir", "-s", default="results/optimized",
              show_default=True)
@click.option("--fmax", default=0.05, show_default=True)
@click.option("--steps", default=200, show_default=True)
def cli_optimize(cif_dir, save_dir, fmax, steps):
    from pathlib import Path
    from chemeleon_tpu.chem.structure import Crystal
    from chemeleon_tpu.eval.optimize import optimize_atoms_list
    crystals = [Crystal.from_cif(p.read_text())
                for p in sorted(Path(cif_dir).glob("*.cif"))]
    if not crystals:
        raise click.UsageError(f"no .cif files in {cif_dir}")
    out = optimize_atoms_list(crystals, save_dir, fmax=fmax, steps=steps)
    print(f"relaxed {sum(o is not None for o in out)}/{len(out)} -> {save_dir}")


if __name__ == "__main__":
    cli()
