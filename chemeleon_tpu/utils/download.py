"""Streaming file download (reference: chemeleon/utils/download.py:5-12)."""

from __future__ import annotations

import os
import urllib.request
from pathlib import Path


def download_file(url: str, path: str | Path, chunk_size: int = 1 << 20) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(path.suffix + ".part")
    try:
        with urllib.request.urlopen(url) as r, open(tmp, "wb") as f:
            while True:
                chunk = r.read(chunk_size)
                if not chunk:
                    break
                f.write(chunk)
        os.replace(tmp, path)
    except OSError as e:
        if tmp.exists():
            tmp.unlink()
        raise RuntimeError(
            f"Could not download {url} -> {path}. If this environment has no "
            f"network access, download the file elsewhere and place it at "
            f"{path}.") from e
