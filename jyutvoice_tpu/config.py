"""Configuration dataclasses for jyutvoice_tpu.

Plain dataclasses replace the reference's code-executing hyperpyyaml config
(/root/reference/configs/base.yaml). Defaults reproduce the reference's live
configuration exactly.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class AudioConfig:
    """Audio frontend parameters (configs/base.yaml:16-24, infer.py:169-179)."""

    sample_rate: int = 24000
    n_fft: int = 1920
    hop_length: int = 480
    win_length: int = 1920
    n_mels: int = 80
    f_min: float = 0.0
    f_max: Optional[float] = 8000.0  # infer.py passes fmax=8000 explicitly

    @property
    def frames_per_second(self) -> float:
        return self.sample_rate / self.hop_length


@dataclasses.dataclass(frozen=True)
class TextEncoderConfig:
    """RoPE transformer text encoder (configs/base.yaml:51-67)."""

    n_vocab: int = 97
    n_lang: int = 4  # pad + yue/zh/en
    n_tone: int = 7  # pad + 6 tones
    n_word_pos: int = 4
    n_syllable_pos: int = 4
    n_feats: int = 80
    n_channels: int = 192
    filter_channels: int = 768
    n_heads: int = 2
    n_layers: int = 6
    kernel_size: int = 3
    p_dropout: float = 0.1
    gin_channels: int = 192  # speaker embedding dim
    prenet: bool = True

    @property
    def hidden_channels(self) -> int:
        # phoneme (n_channels) + lang emb (n_channels) + tiled speaker embed
        return self.n_channels * 2 + self.gin_channels


@dataclasses.dataclass(frozen=True)
class DurationPredictorConfig:
    """Duration predictor (configs/base.yaml:69-74)."""

    in_channels: int = 576  # = TextEncoderConfig.hidden_channels
    filter_channels: int = 256
    kernel_size: int = 3
    p_dropout: float = 0.1
    gin_channels: int = 192


@dataclasses.dataclass(frozen=True)
class EstimatorConfig:
    """Causal CFM estimator U-Net (configs/base.yaml:88-99).

    With a single channel level the network never changes temporal
    resolution: 1 down stage + num_mid_blocks mid stages + 1 up stage, each
    [CausalResnetBlock -> n_blocks transformer blocks], plus causal-conv
    bridges (reference: jyutvoice/flow/decoder.py:798-1018).
    """

    in_channels: int = 320  # pack([x, mu, spks, cond]) = 80*4
    out_channels: int = 80
    channels: Tuple[int, ...] = (256,)
    dropout: float = 0.0
    attention_head_dim: int = 64
    n_blocks: int = 4
    num_mid_blocks: int = 12
    num_heads: int = 8
    act_fn: str = "gelu"
    static_chunk_size: int = 50  # mel frames per streaming chunk (25 tokens * 2)
    num_decoding_left_chunks: int = -1
    # "xla" lets the compiler fuse the bias path, auto-switching to the
    # stock jax TPU flash kernel for long-form full attention (T >= 2048,
    # models/estimator.py::use_stock_flash — 1.60-1.75x end-to-end on the
    # 10-step solve, scripts/profile_stockflash_solve.py); "xla_scores"
    # forces the score-materializing path (REQUIRED inside GSPMD-sharded
    # graphs — dist/sp.py sets it — where a pallas custom call cannot be
    # sharded); "pallas" uses the in-repo kernel (nn/pallas/attention.py)
    # when T is block-aligned. Measured on v5e: XLA wins or ties at
    # synthesis shapes; the in-repo kernel wins only as an isolated op on
    # long chunked sequences (scripts/bench_attention.py).
    attention_backend: str = "xla"
    # "banded" backend geometry (attention_backend="banded" or the
    # long-form banded gate): query chunk c attends key chunks
    # [c-banded_left, c+banded_right] — linear-in-T attention
    # (nn/attention.py::banded_sdpa). Chunks are MXU-aligned (128)
    # rather than the reference's 50-frame streaming chunks; the window
    # is (banded_left+1+banded_right)*banded_chunk frames (defaults:
    # 640 frames ≈ 12.8 s of symmetric context around each query — the
    # measured speed/divergence sweet spot; (4,4) halves the divergence
    # at ~0.6x the speed win, scripts/profile_dense_banded.py).
    banded_chunk: int = 128
    banded_left: int = 2
    banded_right: int = 2  # lookahead chunks (full attention is bidirectional)
    # Default long-form gate: full-attention "xla" graphs at
    # T >= banded_long_threshold (TPU, 128-aligned) route to a (2,2)
    # chunk-band — 640-frame (12.8 s) symmetric context per query.
    # Measured on the 10-step solve (scripts/profile_dense_banded.py,
    # v5e): 1.23-1.57x at T=2048-4096, 2.46x at 8192, 3.29x at 12288;
    # mel MAE vs full attention 1.7-2.3e-2 (~2% of |out|) — an order
    # less divergence than the reference's own streaming chunk semantics
    # produce (5.8e-2-1.4e-1). Threshold lowered 8192 -> 2048 in round 5
    # on VOCODED-domain evidence (scripts/eval_banded_vocoded.py, TPU):
    # MCD 1.65-1.75 dB FLAT across T=2048-12288 (no per-third
    # accumulation), log-mel distortion 0.19 dB, CAM++ spk-embed cosine
    # at the measurement noise floor at every bucket, prompted decodes
    # included — the 2048-4096 range is quality-indistinguishable from
    # the long buckets that already shipped banded in round 4.
    # 0 disables (stock flash stays the long-form backend);
    # attention="exact" pins the flash path per request, and bench.py
    # regression-guards the exact series separately.
    banded_long_threshold: int = 2048
    # "matmul" expresses the k=3 causal convs as shifted matmuls: identical
    # math, but avoids XLA conv<->matmul layout boundaries that break fusion
    # when convs interleave with attention at larger batches — 2.7x faster
    # at batch 6 (2B=12), never slower (scripts/profile_conv_as_matmul.py).
    conv_backend: str = "matmul"

    @property
    def time_embed_dim(self) -> int:
        return self.channels[0] * 4


@dataclasses.dataclass(frozen=True)
class CFMConfig:
    """Conditional flow matching (configs/base.yaml:76-87)."""

    in_channels: int = 240
    n_spks: int = 1
    spk_emb_dim: int = 80
    sigma_min: float = 1e-6
    solver: str = "euler"
    t_scheduler: str = "cosine"
    training_cfg_rate: float = 0.2
    inference_cfg_rate: float = 0.7
    # Fixed noise buffer length: 50 fps * 300 s (flow_matching.py:354)
    rand_noise_frames: int = 15000
    estimator: EstimatorConfig = dataclasses.field(default_factory=EstimatorConfig)


@dataclasses.dataclass(frozen=True)
class FlowEncoderConfig:
    """CosyVoice2 speech-token encoder (infer.py:35-82)."""

    vocab_size: int = 6561
    input_size: int = 512
    output_size: int = 512
    proj_size: int = 80
    attention_heads: int = 8
    linear_units: int = 2048
    num_blocks: int = 6
    num_up_blocks: int = 4
    pre_lookahead_len: int = 3
    upsample_stride: int = 2
    static_chunk_size: int = 25
    dropout_rate: float = 0.1
    # full conformer options (reference upsample_encoder.py:155-166,
    # encoder_layer.py:241-319). The live FlowEncoder config disables both
    # (reference infer.py:55-56); CosyVoice2-style encoder configs enable
    # them.
    macaron_style: bool = False
    use_cnn_module: bool = False
    cnn_module_kernel: int = 15
    cnn_module_norm: str = "batch_norm"  # or "layer_norm"
    causal_cnn: bool = False


@dataclasses.dataclass(frozen=True)
class HiFTConfig:
    """HiFT NSF+iSTFT vocoder (configs/base.yaml:26-48)."""

    in_channels: int = 80
    base_channels: int = 512
    nb_harmonics: int = 8
    sampling_rate: int = 24000
    nsf_alpha: float = 0.1
    nsf_sigma: float = 0.003
    nsf_voiced_threshold: float = 10.0
    upsample_rates: Tuple[int, ...] = (8, 5, 3)
    upsample_kernel_sizes: Tuple[int, ...] = (16, 11, 7)
    istft_n_fft: int = 16
    istft_hop_len: int = 4
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = (
        (1, 3, 5),
        (1, 3, 5),
        (1, 3, 5),
    )
    source_resblock_kernel_sizes: Tuple[int, ...] = (7, 7, 11)
    source_resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = (
        (1, 3, 5),
        (1, 3, 5),
        (1, 3, 5),
    )
    lrelu_slope: float = 0.1
    audio_limit: float = 0.99
    f0_predictor_cond_channels: int = 512
    # run each stage's 3 parallel ResBlocks as feature-grouped convs
    # (numerically identical — zero-padded kernels). Measured on v5e: XLA
    # lowers grouped convs ~4x SLOWER than separate convs, so default off.
    fuse_resblock_branches: bool = False
    # "pallas": fused whole-stage ResBlock kernel (nn/pallas/resblock.py) for
    # stages with C <= 128 on TPU; "xla": reference-style separate convs.
    # Measured on v5e @ T=512 mel: xla 12.6 ms vs pallas 19.8 ms (the fused
    # kernel is small-matmul latency-bound) -> default xla.
    resblock_backend: str = "xla"

    @property
    def total_upsample(self) -> int:
        total = self.istft_hop_len
        for r in self.upsample_rates:
            total *= r
        return total  # 8*5*3*4 = 480 = hop_length


@dataclasses.dataclass(frozen=True)
class TTSConfig:
    """Top-level acoustic model (configs/base.yaml:50-110)."""

    encoder: TextEncoderConfig = dataclasses.field(default_factory=TextEncoderConfig)
    dp: DurationPredictorConfig = dataclasses.field(
        default_factory=DurationPredictorConfig
    )
    cfm: CFMConfig = dataclasses.field(default_factory=CFMConfig)
    output_size: int = 80
    spk_embed_dim: int = 192
    freeze_encoder: bool = False
    freeze_decoder: bool = True


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training hyperparameters (configs/base.yaml:106-144)."""

    learning_rate: float = 2e-4
    weight_decay: float = 0.0
    warmup_steps: int = 100
    max_epochs: int = 20
    gradient_clip_val: float = 1.0
    batch_size: int = 8
    seed: int = 42
    diff_loss_weight: float = 0.1  # total = dur + prior + 0.1*diff
    # prefix teacher-forcing of conds: 50% chance, up to 0.3*len
    cond_prob: float = 0.5
    cond_max_ratio: float = 0.3
    precision: str = "bf16"  # activations; params/optimizer state stay f32
    # optional main LR schedule after warmup (reference SequentialLR hook,
    # baselightningmodule.py:38-60; the live config has scheduler: null):
    # None | "cosine" | "exponential"
    scheduler: Optional[str] = None
    scheduler_decay_steps: int = 100_000  # cosine horizon
    scheduler_gamma: float = 0.999995  # exponential per-step decay


@dataclasses.dataclass(frozen=True)
class JyutVoiceConfig:
    audio: AudioConfig = dataclasses.field(default_factory=AudioConfig)
    tts: TTSConfig = dataclasses.field(default_factory=TTSConfig)
    flow_encoder: FlowEncoderConfig = dataclasses.field(
        default_factory=FlowEncoderConfig
    )
    hift: HiFTConfig = dataclasses.field(default_factory=HiFTConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    token_frame_rate: int = 25
    token_mel_ratio: int = 2
    add_blank: bool = True


DEFAULT_CONFIG = JyutVoiceConfig()
