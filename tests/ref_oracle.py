"""Load reference modules (torch) directly from /root/reference as golden
oracles for parity tests. Skipped gracefully when the reference tree is not
present (e.g. on a user machine)."""

import importlib.util
import os

import pytest

REF_ROOT = "/root/reference"


def load_ref_module(relpath: str, name: str):
    path = os.path.join(REF_ROOT, relpath)
    if not os.path.exists(path):
        pytest.skip(f"reference oracle not available: {path}")
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def ref_diff_utils():
    return load_ref_module("chemeleon/utils/diff_utils.py", "ref_diff_utils")
