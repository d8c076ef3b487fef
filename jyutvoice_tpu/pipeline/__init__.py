from jyutvoice_tpu.pipeline.buckets import pick_bucket  # noqa: F401
from jyutvoice_tpu.pipeline.server import ServingEngine  # noqa: F401
from jyutvoice_tpu.pipeline.synthesize import Synthesizer  # noqa: F401
