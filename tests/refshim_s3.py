"""Torch stand-in of the CosyVoice2 speech tokenizer v2 (test-only).

The reference consumes this model only as speech_tokenizer_v2.onnx through
onnxruntime (reference infer.py:98-145; downloaded by
download_pretrain_weights.py:223-224): whisper 128-bin log-mel @100 fps ->
6561-vocab speech tokens @25 Hz. That blob is the FunAudioLLM
"S3" supervised speech tokenizer v2: a 6-layer whisper-style audio encoder
(two stride-2 convs -> 4x time downsample, sinusoidal positions, pre-LN
attention blocks with the whisper (d/h)^-0.25 double scaling) followed by
finite-scalar quantization (project to 8 dims, tanh, round to {-1,0,1},
code = sum digit_i * 3^i -> 3^8 = 6561 codes).

This restates that public architecture (openai/whisper encoder blocks +
the s3tokenizer project's published FSQ head) so the native JAX
implementation (jyutvoice_tpu/models/s3_tokenizer.py) and its weight
converter can be parity-tested without artifacts. Parameter names match
the s3tokenizer torch checkpoints so the converter sees realistic keys.
"""

import math
from dataclasses import dataclass

import torch
import torch.nn.functional as F
from torch import nn


@dataclass
class S3Config:
    n_mels: int = 128
    n_audio_ctx: int = 1500
    n_audio_state: int = 1280
    n_audio_head: int = 20
    n_audio_layer: int = 6
    n_fsq_dims: int = 8
    fsq_level: int = 3


def sinusoids(length, channels, max_timescale=10000):
    """whisper's sinusoidal position table: [sin | cos] halves."""
    assert channels % 2 == 0
    log_timescale_increment = math.log(max_timescale) / (channels // 2 - 1)
    inv_timescales = torch.exp(
        -log_timescale_increment * torch.arange(channels // 2)
    )
    scaled_time = torch.arange(length)[:, None] * inv_timescales[None, :]
    return torch.cat([torch.sin(scaled_time), torch.cos(scaled_time)], dim=1)


class MultiHeadAttention(nn.Module):
    def __init__(self, n_state: int, n_head: int):
        super().__init__()
        self.n_head = n_head
        self.query = nn.Linear(n_state, n_state)
        self.key = nn.Linear(n_state, n_state, bias=False)
        self.value = nn.Linear(n_state, n_state)
        self.out = nn.Linear(n_state, n_state)

    def forward(self, x: torch.Tensor):
        q, k, v = self.query(x), self.key(x), self.value(x)
        b, t, d = q.shape
        scale = (d // self.n_head) ** -0.25
        q = q.view(b, t, self.n_head, -1).permute(0, 2, 1, 3) * scale
        k = k.view(b, t, self.n_head, -1).permute(0, 2, 3, 1) * scale
        v = v.view(b, t, self.n_head, -1).permute(0, 2, 1, 3)
        w = torch.softmax((q @ k).float(), dim=-1).to(q.dtype)
        out = (w @ v).permute(0, 2, 1, 3).reshape(b, t, d)
        return self.out(out)


class ResidualAttentionBlock(nn.Module):
    def __init__(self, n_state: int, n_head: int):
        super().__init__()
        self.attn = MultiHeadAttention(n_state, n_head)
        self.attn_ln = nn.LayerNorm(n_state)
        n_mlp = n_state * 4
        self.mlp = nn.Sequential(
            nn.Linear(n_state, n_mlp), nn.GELU(), nn.Linear(n_mlp, n_state)
        )
        self.mlp_ln = nn.LayerNorm(n_state)

    def forward(self, x: torch.Tensor):
        x = x + self.attn(self.attn_ln(x))
        x = x + self.mlp(self.mlp_ln(x))
        return x


class AudioEncoderV2(nn.Module):
    """Two stride-2 convs (4x downsample: 100 fps mel -> 25 Hz) + blocks."""

    def __init__(self, cfg: S3Config):
        super().__init__()
        self.conv1 = nn.Conv1d(cfg.n_mels, cfg.n_audio_state, 3, stride=2, padding=1)
        self.conv2 = nn.Conv1d(
            cfg.n_audio_state, cfg.n_audio_state, 3, stride=2, padding=1
        )
        self.register_buffer(
            "positional_embedding", sinusoids(cfg.n_audio_ctx, cfg.n_audio_state)
        )
        self.blocks = nn.ModuleList(
            ResidualAttentionBlock(cfg.n_audio_state, cfg.n_audio_head)
            for _ in range(cfg.n_audio_layer)
        )

    def forward(self, mel: torch.Tensor):  # (B, n_mels, T)
        x = F.gelu(self.conv1(mel))
        x = F.gelu(self.conv2(x))
        x = x.permute(0, 2, 1)
        x = (x + self.positional_embedding[: x.shape[1]]).to(x.dtype)
        for block in self.blocks:
            x = block(x)
        return x


class FSQCodebook(nn.Module):
    """Finite scalar quantization head (s3tokenizer v2 FSQ, levels=3^8)."""

    def __init__(self, dim: int, n_dims: int = 8, level: int = 3):
        super().__init__()
        self.project_down = nn.Linear(dim, n_dims)
        self.level = level

    @torch.inference_mode()
    def encode(self, x: torch.Tensor):  # (B, T, D) -> (B, T) int codes
        b, t, _ = x.shape
        h = self.project_down(x.reshape(b * t, -1))
        h = h.tanh() * 0.9990000128746033  # keeps round() in {-1, 0, 1}
        h = h.round() + (self.level // 2)
        powers = torch.pow(
            self.level, torch.arange(h.shape[-1], device=x.device)
        )
        mu = torch.sum(h * powers.unsqueeze(0), dim=-1)
        return mu.reshape(b, t).to(torch.int64)


class S3TokenizerV2(nn.Module):
    def __init__(self, cfg: S3Config = S3Config()):
        super().__init__()
        self.encoder = AudioEncoderV2(cfg)
        self.quantizer = FSQCodebook(cfg.n_audio_state, cfg.n_fsq_dims, cfg.fsq_level)

    @torch.inference_mode()
    def forward(self, mel: torch.Tensor):  # (B, n_mels, T) -> (B, T//4)
        return self.quantizer.encode(self.encoder(mel))
