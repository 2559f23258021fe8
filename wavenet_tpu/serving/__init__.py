from wavenet_tpu.serving.aot import export_decoder, load_decoder  # noqa: F401
from wavenet_tpu.serving.server import WaveNetServer              # noqa: F401
