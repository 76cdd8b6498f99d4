"""Supervisor for training on a flaky device: restart + resume on watchdog exit.

The trainers' hang watchdog (utils/watchdog.py, config key
``watchdog_timeout_s``) turns a wedged TPU into process exit code 17.
This wrapper runs a training command as a subprocess and, on that exit
code, relaunches it with ``resume_from=<ckpt>`` appended (key=value
overrides are last-wins in run.py's parse_cli, so appending works even if
the command already set resume_from). Checkpoint/resume is exact
(optimizer + scheduler + early-stop state), so at most one checkpoint
interval of work is lost per incident.

    python -m chemeleon_tpu.scripts.train_resilient \
        --retries 3 --ckpt logs/myexp/checkpoints/last -- \
        python run.py chemeleon_composition exp_name=myexp \
            watchdog_timeout_s=900 checkpoint_every_n_epochs=25

The reference has no equivalent (fault tolerance is delegated to
Lightning, never configured — SURVEY §5); this is the elastic-recovery
piece of the aux-subsystem inventory.
"""

from __future__ import annotations

import argparse
import subprocess
import sys
from pathlib import Path

from chemeleon_tpu.utils.watchdog import EXIT_CODE


def supervise(cmd, ckpt, retries: int = 3,
              also_retry_on=frozenset(), runner=subprocess.call,
              resume_flag: str = "resume_from=") -> int:
    """Run ``cmd``; on watchdog exit (or codes in ``also_retry_on``),
    relaunch with ``<resume_flag><ckpt>`` appended, up to ``retries`` times.
    Returns the final exit code.

    ``resume_flag`` matches the trainee's CLI: the default key=value form is
    run.py's syntax; pass ``--resume-from=`` for argparse-style scripts
    (smoke_train) — an appended key=value token would make argparse exit 2
    and the supervisor would never actually resume."""
    retry_codes = {EXIT_CODE} | set(also_retry_on)
    attempt = 0
    while True:
        code = runner(list(cmd) if attempt == 0 or not Path(ckpt).exists()
                      else list(cmd) + [f"{resume_flag}{ckpt}"])
        if code not in retry_codes or attempt >= retries:
            return code
        attempt += 1
        print(f"[train_resilient] exit {code} -> retry {attempt}/{retries} "
              f"resuming from {ckpt}", file=sys.stderr, flush=True)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description=__doc__.splitlines()[0],
        usage="... --retries N --ckpt <last-ckpt-dir> -- <training command>")
    ap.add_argument("--retries", type=int, default=3)
    ap.add_argument("--ckpt", required=True,
                    help="checkpoint dir to resume from after a crash "
                         "(normally logs/<exp>/checkpoints/last; "
                         "clip_checkpoints for the CLIP trainer)")
    ap.add_argument("--retry-on", type=int, nargs="*", default=[],
                    help="additional exit codes to treat as retryable "
                         "(e.g. 1 to also retry hard device crashes)")
    ap.add_argument("--resume-flag", default="resume_from=",
                    help="token prefix for the appended resume argument: "
                         "the default fits run.py's key=value CLI; use "
                         "'--resume-from=' for smoke_train-style argparse")
    args, cmd = ap.parse_known_args(argv)
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        ap.error("no training command given after --")
    return supervise(cmd, args.ckpt, retries=args.retries,
                     also_retry_on=frozenset(args.retry_on),
                     resume_flag=args.resume_flag)


if __name__ == "__main__":
    sys.exit(main())
