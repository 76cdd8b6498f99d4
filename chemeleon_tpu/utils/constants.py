"""Checkpoint locations (reference: chemeleon/constants.py:3-14).

Converted (flax/orbax) checkpoints live next to the downloaded Lightning
.ckpt files under the user cache dir.
"""

import os
from pathlib import Path

CHECKPOINT_DIR = Path(os.environ.get(
    "CHEMELEON_TPU_CACHE",
    Path.home() / ".cache" / "chemeleon_tpu" / "checkpoints"))

PATH_CLIP_GENERAL_TEXT = CHECKPOINT_DIR / "clip-upy53q4b.ckpt"
PATH_CHEMELEON_GENERAL_TEXT = CHECKPOINT_DIR / "chemeleon-7fsg68c3.ckpt"
PATH_CLIP_COMPOSITION = CHECKPOINT_DIR / "clip-hlfus38h.ckpt"
PATH_CHEMELEON_COMPOSITION = CHECKPOINT_DIR / "chemeleon-fksq6cgp.ckpt"

CHECKPOINT_URLS = {
    "clip_general_text": "https://figshare.com/ndownloader/files/49891233",
    "chemeleon_general_text": "https://figshare.com/ndownloader/files/49891230",
    "clip_composition": "https://figshare.com/ndownloader/files/49891287",
    "chemeleon_composition": "https://figshare.com/ndownloader/files/49891284",
}
