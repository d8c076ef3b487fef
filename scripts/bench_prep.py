"""Dataset-prep throughput: row-at-a-time vs batched prompt extraction.

Measures PromptExtractor.__call__ (3-4 device dispatch+readback round trips
per row — each ~28 ms RTT on the tunneled TPU) against extract_batch (one
fused dispatch + one readback per length-bucket group). Full-size native
models (CAM++, S3 tokenizer v2, FlowEncoder) at random init — compute is
identical to converted weights.

Run on TPU: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_prep.py
"""

import os
import time

import numpy as np

import jax

cache_dir = os.environ.get(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_xla")
)
os.makedirs(cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.random as jr  # noqa: E402

from jyutvoice_tpu.config import FlowEncoderConfig
from jyutvoice_tpu.models.campplus import CampPlusConfig, init_campplus
from jyutvoice_tpu.models.flow_encoder import init_flow_encoder
from jyutvoice_tpu.models.s3_tokenizer import S3TokenizerConfig, init_s3_tokenizer
from jyutvoice_tpu.pipeline.prompt import PromptExtractor


def make_extractor() -> PromptExtractor:
    fecfg = FlowEncoderConfig()
    ex = PromptExtractor(
        flow_encoder_params=init_flow_encoder(jr.PRNGKey(2), fecfg),
        flow_encoder_cfg=fecfg,
    )
    ex.embedder.cfg = CampPlusConfig()
    ex.embedder.params = init_campplus(jr.PRNGKey(0), ex.embedder.cfg)
    ex.tokenizer.cfg = S3TokenizerConfig()
    ex.tokenizer.params = init_s3_tokenizer(jr.PRNGKey(1), ex.tokenizer.cfg)
    return ex


def make_rows(n: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    durs = rng.uniform(3.0, 10.0, n)
    audios = [
        rng.uniform(-0.4, 0.4, int(16000 * d)).astype(np.float32) for d in durs
    ]
    return audios, [16000] * n, float(durs.sum())


def main():
    print("devices:", jax.devices())
    ex = make_extractor()
    audios, srs, total_s = make_rows(64)

    # warm EVERY bucket/batch shape both paths will hit: a full untimed
    # pass each (compiles are cached persistently and per-shape)
    t0 = time.perf_counter()
    for a, sr in zip(audios, srs):
        ex._extract_single(a, sr)
    print(f"single warm pass (incl. compiles): {time.perf_counter() - t0:.1f} s")
    t0 = time.perf_counter()
    ex.extract_batch(audios, srs, max_batch=32)
    print(f"batched warm pass (incl. compiles): {time.perf_counter() - t0:.1f} s")

    t0 = time.perf_counter()
    for a, sr in zip(audios, srs):
        ex._extract_single(a, sr)
    t_single = time.perf_counter() - t0

    t0 = time.perf_counter()
    out = ex.extract_batch(audios, srs, max_batch=32)
    t_batch = time.perf_counter() - t0
    assert all(not isinstance(o, Exception) for o in out)

    ex.extract_batch(audios, srs, max_batch=32, device_dsp=True)  # warm
    t0 = time.perf_counter()
    out = ex.extract_batch(audios, srs, max_batch=32, device_dsp=True)
    t_dsp = time.perf_counter() - t0
    assert all(not isinstance(o, Exception) for o in out)

    n = len(audios)
    print(f"rows: {n}, audio total {total_s:.1f} s")
    print(f"row-at-a-time   : {t_single:.2f} s  ({n / t_single:.1f} rows/s)")
    print(f"batched         : {t_batch:.2f} s  ({n / t_batch:.1f} rows/s)")
    print(f"batched +dsp    : {t_dsp:.2f} s  ({n / t_dsp:.1f} rows/s)")
    print(f"speedup         : {t_single / t_batch:.2f}x "
          f"(+dsp {t_single / t_dsp:.2f}x)")


if __name__ == "__main__":
    main()
