"""chemeleon-tpu: TPU-native text-guided crystal structure diffusion.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
ryannduma/chemeleon: joint D3PM + DDPM + score-matching diffusion over
(atom types, lattice, fractional coordinates), denoised by a dense CSPNet,
conditioned on text via FiLM + classifier-free guidance.
"""

from chemeleon_tpu.config import ChemeleonConfig, get_config, NAMED_CONFIGS
from chemeleon_tpu.models.chemeleon import Chemeleon
from chemeleon_tpu.chem.structure import Crystal

__version__ = "0.2.0"

__all__ = [
    "Chemeleon",
    "ChemeleonConfig",
    "Crystal",
    "get_config",
    "NAMED_CONFIGS",
    "__version__",
]
