from jyutvoice_tpu.nn import core  # noqa: F401
