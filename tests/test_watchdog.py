"""Hang watchdog + resilient-training supervisor (utils/watchdog.py,
scripts/train_resilient.py): the wedged-TPU recovery path."""

import csv
import subprocess
import sys
import time

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from chemeleon_tpu.chem.cif import write_cif  # noqa: E402
from chemeleon_tpu.chem.lattice import lattice_from_parameters  # noqa: E402
from chemeleon_tpu.chem.structure import Crystal  # noqa: E402
from chemeleon_tpu.config import get_config  # noqa: E402
from chemeleon_tpu.scripts.train_resilient import supervise  # noqa: E402
from chemeleon_tpu.utils.watchdog import EXIT_CODE, HangWatchdog  # noqa: E402


def test_watchdog_kills_a_hung_process():
    # run in a subprocess: the watchdog aborts via os._exit
    code = subprocess.call([sys.executable, "-c", (
        "import sys, time; sys.path.insert(0, '/root/repo')\n"
        "from chemeleon_tpu.utils.watchdog import HangWatchdog\n"
        "wd = HangWatchdog(0.3, where='test hang')\n"
        "time.sleep(30)\n"  # simulated wedge: never beats
    )], timeout=20)
    assert code == EXIT_CODE


def test_watchdog_quiet_while_beating_and_after_stop():
    wd = HangWatchdog(0.4, where="test beat")
    for _ in range(4):
        time.sleep(0.15)
        wd.beat()   # steady progress: must not fire
    wd.stop()
    time.sleep(0.7)  # after stop: must not fire either (we are still alive)


def test_supervisor_resumes_on_watchdog_exit(tmp_path):
    ckpt = tmp_path / "last"
    ckpt.mkdir()
    calls = []

    def fake_runner(cmd):
        calls.append(cmd)
        return EXIT_CODE if len(calls) < 3 else 0

    code = supervise(["train", "a=1"], str(ckpt), retries=5,
                     runner=fake_runner)
    assert code == 0 and len(calls) == 3
    assert calls[0] == ["train", "a=1"]                  # first try: verbatim
    assert calls[1] == ["train", "a=1", f"resume_from={ckpt}"]
    assert calls[2] == calls[1]


def test_supervisor_does_not_resume_from_missing_checkpoint(tmp_path):
    calls = []

    def fake_runner(cmd):
        calls.append(cmd)
        return EXIT_CODE if len(calls) < 2 else 0

    # crash before the first save: relaunch WITHOUT resume_from
    supervise(["train"], str(tmp_path / "never_saved"), retries=2,
              runner=fake_runner)
    assert calls == [["train"], ["train"]]


def test_supervisor_gives_up_after_retries(tmp_path):
    calls = []

    def fake_runner(cmd):
        calls.append(cmd)
        return EXIT_CODE

    code = supervise(["train"], str(tmp_path), retries=2, runner=fake_runner)
    assert code == EXIT_CODE and len(calls) == 3  # 1 try + 2 retries


def test_supervisor_passes_through_real_errors(tmp_path):
    calls = []

    def fake_runner(cmd):
        calls.append(cmd)
        return 1  # a real error, not the watchdog code

    code = supervise(["train"], str(tmp_path), retries=3, runner=fake_runner)
    assert code == 1 and len(calls) == 1


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("wd_data")
    rng = np.random.default_rng(0)
    for split, count in [("train", 8), ("val", 4), ("test", 4)]:
        with open(root / f"{split}.csv", "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=["cif", "composition",
                                              "crystal_system", "prompt"])
            w.writeheader()
            for _ in range(count):
                n = int(rng.integers(2, 7))
                c = Crystal(
                    lattice_from_parameters(*(rng.uniform(3, 6, 3)),
                                            90, 90, 90),
                    rng.uniform(size=(n, 3)), rng.integers(1, 30, n))
                w.writerow({"cif": write_cif(c),
                            "composition": c.reduced_formula(),
                            "crystal_system": "orthorhombic",
                            "prompt": c.reduced_formula()})
    return str(root)


def test_trainer_fit_with_watchdog_enabled(data_dir, tmp_path):
    """watchdog_timeout_s > 0 on a healthy run: fit completes normally and
    the watchdog never fires."""
    from chemeleon_tpu.train.trainer import Trainer
    cfg = get_config("unguided", data_dir=data_dir,
                     log_dir=str(tmp_path / "logs"),
                     hidden_dim=16, time_dim=16, num_layers=1, num_freqs=2,
                     timesteps=10, pad_buckets=(8,), batch_size=4,
                     early_stopping=100, watchdog_timeout_s=120.0)
    tr = Trainer(cfg, text_backend="hash")
    out = tr.fit(max_epochs=1)
    assert out["epochs"] == 1


def test_supervisor_resume_flag_for_argparse_trainees(tmp_path):
    """--resume-flag '--resume-from=' matches smoke_train's argparse CLI
    (the default key=value token would exit 2 there and never resume)."""
    ckpt = tmp_path / "last"
    ckpt.mkdir()
    calls = []

    def fake_runner(cmd):
        calls.append(cmd)
        return EXIT_CODE if len(calls) < 2 else 0

    code = supervise(["smoke_train"], str(ckpt), retries=2,
                     runner=fake_runner, resume_flag="--resume-from=")
    assert code == 0
    assert calls[1] == ["smoke_train", f"--resume-from={ckpt}"]
