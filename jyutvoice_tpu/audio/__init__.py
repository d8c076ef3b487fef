from jyutvoice_tpu.audio.mel import MelSpec, mel_filterbank  # noqa: F401
