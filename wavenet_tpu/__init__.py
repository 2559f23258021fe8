"""wavenet_tpu — TPU-native WaveNet vocoder framework (JAX/XLA/Pallas).

A from-scratch re-design of the capabilities of musyoku/wavenet for TPU:
mu-law codec, dilated-causal gated conv stack, fast cached-queue AR decode,
mel conditioning, multi-chip sharding, Pallas kernels. See SURVEY.md.
"""

from wavenet_tpu.config import WaveNetConfig, MelConfig, get_config, PRESETS
from wavenet_tpu.models.api import WaveNet

__version__ = "0.1.0"
