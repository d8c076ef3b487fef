"""Streaming-CFM cross-parity: pipeline/streaming.py vs the reference's own
chunked machinery — ConditionalCFM.forward's prompt + z/mu overlap cache
(reference flow_matching.py:196-213) and fade_in_out
(utils/common.py:181-191) — driven chunk by chunk with identical weights,
priors, and noise. A broken crossfade constant or cache update on either
side breaks the per-chunk mel MAE assertion."""

import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import torch

sys.path.insert(0, "tests")
import refshim

refshim.install()

import jax

from jyutvoice_tpu.config import (
    CFMConfig,
    EstimatorConfig,
    JyutVoiceConfig,
    TTSConfig,
)
from jyutvoice_tpu.models.hift import init_hift
from jyutvoice_tpu.pipeline.streaming import (
    OVERLAP,
    StreamingSynthesizer,
    hann_crossfade_window,
)
from jyutvoice_tpu.weights.noise import rand_noise_extended
from jyutvoice_tpu.weights.torch_convert import convert_estimator

EST_CFG = EstimatorConfig(n_blocks=1, num_mid_blocks=2)
P = 16  # prompt frames
CHUNK = 50
N_STEPS = 3
T_TOTAL = 150  # 3 chunks


def _build_ref_cfm():
    from omegaconf import DictConfig
    from jyutvoice.flow.decoder import CausalConditionalDecoder
    from jyutvoice.flow.flow_matching import ConditionalCFM

    torch.manual_seed(0)
    est = CausalConditionalDecoder(
        in_channels=EST_CFG.in_channels,
        out_channels=EST_CFG.out_channels,
        channels=list(EST_CFG.channels),
        dropout=EST_CFG.dropout,
        attention_head_dim=EST_CFG.attention_head_dim,
        n_blocks=EST_CFG.n_blocks,
        num_mid_blocks=EST_CFG.num_mid_blocks,
        num_heads=EST_CFG.num_heads,
        act_fn=EST_CFG.act_fn,
        static_chunk_size=EST_CFG.static_chunk_size,
        num_decoding_left_chunks=EST_CFG.num_decoding_left_chunks,
    )
    est.eval()
    cfm_cfg = CFMConfig(estimator=EST_CFG)
    cfm = ConditionalCFM(
        in_channels=cfm_cfg.in_channels,
        cfm_params=DictConfig(
            {
                "sigma_min": cfm_cfg.sigma_min,
                "solver": "euler",
                "t_scheduler": "cosine",
                "training_cfg_rate": cfm_cfg.training_cfg_rate,
                "inference_cfg_rate": cfm_cfg.inference_cfg_rate,
                "reg_loss_type": "l1",
            }
        ),
        n_spks=1,
        spk_emb_dim=cfm_cfg.spk_emb_dim,
        estimator=est,
    )
    return cfm, est


def _ref_streamed_chunks(cfm, mu_y, prompt_h, prompt_feat, spk, noise_full,
                         monkeypatch):
    """Drive the reference ConditionalCFM.forward chunk by chunk with its
    own cache, emitting crossfaded mel chunks the way the hold-34 protocol
    does (fade_in_out semantics, utils/common.py:181-191)."""
    window = torch.from_numpy(hann_crossfade_window(OVERLAP))

    # deterministic per-segment noise: the cached columns are overwritten
    # by the cache inside forward, so only the fresh tail must line up with
    # the absolute-position noise buffer
    queue = []
    real_randn_like = torch.randn_like

    def fake_randn_like(x):
        if queue:
            return queue.pop(0)
        return real_randn_like(x)

    monkeypatch.setattr(torch, "randn_like", fake_randn_like)

    cache = torch.zeros(1, 80, 0, 2)
    held = None
    chunks = []
    pos = 0
    while pos < T_TOTAL:
        n_new = min(CHUNK, T_TOTAL - pos)
        cs = cache.shape[2]
        if cs == 0:
            seg_mu = np.concatenate([prompt_h, mu_y[:n_new]], axis=0)
            z_fill = noise_full[: P + n_new]
        else:
            seg_mu = np.concatenate(
                [np.zeros((cs, 80), np.float32), mu_y[pos : pos + n_new]],
                axis=0,
            )
            z_fill = np.concatenate(
                [
                    np.zeros((cs, 80), np.float32),
                    noise_full[P + pos : P + pos + n_new],
                ],
                axis=0,
            )
        w = seg_mu.shape[0]
        mu_t = torch.from_numpy(seg_mu.T[None].copy()).float()
        mask = torch.ones(1, 1, w)
        cond = torch.zeros(1, 80, w)
        cond[0, :, :P] = torch.from_numpy(prompt_feat.T)
        queue.append(torch.from_numpy(z_fill.T[None].copy()).float())
        with torch.no_grad():
            mel, cache = cfm(
                mu_t, mask, n_timesteps=N_STEPS,
                spks=torch.from_numpy(spk[None].copy()).float(),
                cond=cond, prompt_len=P, cache=cache,
            )
        this_mel = mel[:, :, P:].clone()  # strip prompt; keep regen + fresh
        if held is not None:
            this_mel[:, :, :OVERLAP] = (
                this_mel[:, :, :OVERLAP] * window[:OVERLAP]
                + held * window[OVERLAP:]
            )
        is_last = pos + n_new >= T_TOTAL
        if is_last:
            chunks.append(this_mel[0].numpy().T)
            held = None
        else:
            chunks.append(this_mel[0, :, :-OVERLAP].numpy().T)
            held = this_mel[:, :, -OVERLAP:].clone()
        pos += n_new
    return chunks


def test_streaming_cfm_cross_parity(monkeypatch):
    cfm, est = _build_ref_cfm()
    est_params = convert_estimator(
        {k: v.detach().numpy() for k, v in est.state_dict().items()}, EST_CFG
    )

    rng = np.random.default_rng(0)
    mu_y = rng.normal(size=(T_TOTAL, 80)).astype(np.float32)
    prompt_h = rng.normal(size=(P, 80)).astype(np.float32)
    prompt_feat = rng.normal(size=(P, 80)).astype(np.float32)
    spk = rng.normal(size=(80,)).astype(np.float32)
    noise_full = rand_noise_extended(P + T_TOTAL)[0]

    want_chunks = _ref_streamed_chunks(
        cfm, mu_y, prompt_h, prompt_feat, spk, noise_full, monkeypatch
    )

    cfg = JyutVoiceConfig(tts=TTSConfig(cfm=CFMConfig(estimator=EST_CFG)))
    params_tts = {"decoder": est_params}
    params_hift = init_hift(jax.random.PRNGKey(1), cfg.hift)
    ss = StreamingSynthesizer(
        cfg, params_tts, params_hift, chunk_frames=CHUNK, prompt_frames=P,
        n_timesteps=N_STEPS,
    )
    got_chunks = [
        mel for _wav, mel in ss.stream(
            mu_y, spk, prompt_feat, prompt_h, emit_mel=True
        )
    ]

    assert [len(c) for c in got_chunks] == [len(c) for c in want_chunks]
    for i, (got, want) in enumerate(zip(got_chunks, want_chunks)):
        mae = float(np.mean(np.abs(got - want)))
        assert mae < 1e-2, f"chunk {i}: mel MAE {mae}"
        # same weights + same inputs: difference should be numeric only
        assert mae < 2e-3, f"chunk {i}: mel MAE {mae} beyond numeric noise"
