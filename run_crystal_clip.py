"""Crystal-CLIP training entrypoint (reference: run_crystal_clip.py:19-93).

    python run_crystal_clip.py clip_prompt batch_size=64 max_epochs=10
"""

from __future__ import annotations

import sys

from run import parse_cli


def main(argv=None) -> None:
    from chemeleon_tpu.config import get_config
    from chemeleon_tpu.train.clip_trainer import ClipTrainer

    name, overrides = parse_cli(argv if argv is not None else sys.argv[1:])
    cfg = get_config(name, **overrides)
    print(f"exp_name: {cfg.exp_name}\ngroup_name: {cfg.group_name}")

    trainer = ClipTrainer(cfg)
    if cfg.test_only:
        import jax

        trainer.dm.setup("test")
        params = trainer.clip.init_params(jax.random.PRNGKey(cfg.seed))
        ckpt = cfg.resume_from or cfg.load_path
        if ckpt:  # test a trained checkpoint (reference run_crystal_clip.py:89-93)
            params, _, _ = trainer.load_checkpoint(ckpt, params)
        loss = trainer.evaluate(params, trainer.dm.test_dataloader())
        print(f"test/loss: {loss:.5f}")
        return
    result = trainer.fit(resume_from=cfg.resume_from)
    print(f"best val/loss: {result['best_val_loss']:.5f}; "
          f"test/loss: {result['test_loss']:.5f}")


if __name__ == "__main__":
    main()
