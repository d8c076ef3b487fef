"""The RUNTIME must not need torch: torch is a weights-conversion-time
dependency only (weights/torch_convert.py, lazily imported), and the seed-0
noise buffer ships as a committed .npy artifact. A subprocess with torch
import-blocked must still import the package and synthesize end to end."""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

_CHILD = r"""
import sys


class _Block:
    def find_spec(self, name, path=None, target=None):
        if name == "torch" or name.startswith("torch."):
            raise ImportError(f"torch blocked for this test ({name})")
        return None


sys.meta_path.insert(0, _Block())

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from jyutvoice_tpu.config import (
    CFMConfig,
    EstimatorConfig,
    JyutVoiceConfig,
    TextEncoderConfig,
    TTSConfig,
)
from jyutvoice_tpu.models.hift import init_hift
from jyutvoice_tpu.models.tts import init_tts
from jyutvoice_tpu.pipeline.synthesize import Synthesizer

cfg = JyutVoiceConfig(
    tts=TTSConfig(
        encoder=TextEncoderConfig(n_layers=1, filter_channels=64),
        cfm=CFMConfig(
            estimator=EstimatorConfig(n_blocks=1, num_mid_blocks=1)
        ),
    )
)
pt = init_tts(jax.random.PRNGKey(0), cfg.tts)
ph = init_hift(jax.random.PRNGKey(1), cfg.hift)
s = Synthesizer(cfg, pt, ph)
r = s.synthesize("佢", lang="yue", phone="keoi5", n_timesteps=2)
wav = np.asarray(r.wav)
assert wav.ndim == 1 and wav.size > 0 and np.isfinite(wav).all()
assert "torch" not in sys.modules
print("TORCHFREE_OK", wav.shape[0])
"""


def test_synthesis_without_torch():
    env = dict(os.environ)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-c", _CHILD],
        env=env,
        capture_output=True,
        timeout=1200,
        text=True,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert "TORCHFREE_OK" in proc.stdout
