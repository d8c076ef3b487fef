"""Import shims so the PUBLIC reference's torch modules load in this env.

The reference (read-only at /root/reference) depends on packages absent here
(hydra, omegaconf, lightning, conformer, wandb, librosa, diffusers, whisper).
For numerical-parity tests we import its model code with random weights; the
shims below provide:

  * permissive no-op stand-ins for config/orchestration packages whose
    behavior never touches the math,
  * FAITHFUL re-implementations of the diffusers building blocks the CFM
    estimator actually computes with (Attention == SDPA with additive mask,
    GELU/GEGLU projections, LoRACompatibleLinear == Linear), written from
    their public API semantics.

Import `install()` BEFORE any `jyutvoice.*` import. This file is test
infrastructure only — nothing here ships in jyutvoice_tpu.
"""

from __future__ import annotations

import importlib.abc
import importlib.machinery
import sys
import types

import torch
import torch.nn as nn
import torch.nn.functional as F

REF_PATH = "/root/reference"


class _AnyObject:
    def __init__(self, *a, **kw):
        pass

    def __call__(self, *a, **kw):
        return _AnyObject()

    def __getattr__(self, name):
        return _AnyObject()


def _permissive_module(name: str) -> types.ModuleType:
    mod = types.ModuleType(name)
    mod.__path__ = []  # make it a package so submodules resolve

    def module_getattr(attr):
        if attr.startswith("__") and attr.endswith("__"):
            # inspect/importlib probe __file__/__spec__ etc.; answering with
            # _AnyObject breaks them (e.g. torch.onnx.export's source lookup)
            raise AttributeError(attr)
        return _AnyObject()

    mod.__getattr__ = module_getattr
    return mod


# --------------------------------------------------------------------------
# Faithful diffusers stand-ins (public API semantics)
# --------------------------------------------------------------------------


class LoRACompatibleLinear(nn.Linear):
    # mirrors diffusers/models/lora.py::LoRACompatibleLinear — identical to
    # nn.Linear when no LoRA layer is set (the reference never sets one)
    pass


class GELU(nn.Module):
    """mirrors diffusers/models/activations.py::GELU: Linear proj + gelu
    with the `approximate` kwarg forwarded to F.gelu."""

    def __init__(self, dim_in, dim_out, approximate="none", bias=True):
        super().__init__()
        self.proj = nn.Linear(dim_in, dim_out, bias=bias)
        self.approximate = approximate

    def forward(self, x):
        return F.gelu(self.proj(x), approximate=self.approximate)


class GEGLU(nn.Module):
    # mirrors diffusers/models/activations.py::GEGLU: Linear(dim, 2*dim) then
    # h * gelu(gate) over the chunked halves
    def __init__(self, dim_in, dim_out, bias=True):
        super().__init__()
        self.proj = nn.Linear(dim_in, dim_out * 2, bias=bias)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * F.gelu(gate)


class ApproximateGELU(nn.Module):
    # mirrors diffusers/models/activations.py::ApproximateGELU:
    # x * sigmoid(1.702 * x) after the projection
    def __init__(self, dim_in, dim_out, bias=True):
        super().__init__()
        self.proj = nn.Linear(dim_in, dim_out, bias=bias)

    def forward(self, x):
        return self.proj(x) * torch.sigmoid(1.702 * self.proj(x))


class AdaLayerNorm(nn.Module):  # not on the live config path
    # mirrors diffusers/models/normalization.py::AdaLayerNorm (timestep
    # embedding -> silu -> linear -> scale/shift around a no-affine LN)
    def __init__(self, embedding_dim, num_embeddings):
        super().__init__()
        self.emb = nn.Embedding(num_embeddings, embedding_dim)
        self.silu = nn.SiLU()
        self.linear = nn.Linear(embedding_dim, embedding_dim * 2)
        self.norm = nn.LayerNorm(embedding_dim, elementwise_affine=False)

    def forward(self, x, timestep):
        emb = self.linear(self.silu(self.emb(timestep)))
        scale, shift = torch.chunk(emb, 2)
        return self.norm(x) * (1 + scale) + shift


class AdaLayerNormZero(nn.Module):  # not on the live config path
    # constructor-shape-only stub of
    # diffusers/models/normalization.py::AdaLayerNormZero (never called)
    def __init__(self, embedding_dim, num_embeddings):
        super().__init__()
        self.norm = nn.LayerNorm(embedding_dim, elementwise_affine=False)


class Attention(nn.Module):
    """mirrors diffusers/models/attention_processor.py::Attention with the
    default AttnProcessor2_0 (F.scaled_dot_product_attention) path.

    Matches the configuration the reference uses (flow/transformer.py:211-219):
    self-attention, bias-free q/k/v, to_out = [Linear(bias=True), Dropout],
    additive float attention mask broadcast over heads.
    """

    def __init__(
        self,
        query_dim,
        heads=8,
        dim_head=64,
        dropout=0.0,
        bias=False,
        cross_attention_dim=None,
        upcast_attention=False,
        out_bias=True,
        scale_qk=True,
    ):
        super().__init__()
        inner_dim = dim_head * heads
        kv_dim = cross_attention_dim if cross_attention_dim is not None else query_dim
        self.heads = heads
        self.dim_head = dim_head
        self.scale = dim_head**-0.5 if scale_qk else 1.0
        self.to_q = nn.Linear(query_dim, inner_dim, bias=bias)
        self.to_k = nn.Linear(kv_dim, inner_dim, bias=bias)
        self.to_v = nn.Linear(kv_dim, inner_dim, bias=bias)
        self.to_out = nn.ModuleList([nn.Linear(inner_dim, query_dim, bias=out_bias), nn.Dropout(dropout)])

    def forward(self, hidden_states, encoder_hidden_states=None, attention_mask=None):
        ctx = encoder_hidden_states if encoder_hidden_states is not None else hidden_states
        b, t_q, _ = hidden_states.shape
        q = self.to_q(hidden_states)
        k = self.to_k(ctx)
        v = self.to_v(ctx)

        def heads_split(x):
            return x.view(b, -1, self.heads, self.dim_head).transpose(1, 2)

        q, k, v = heads_split(q), heads_split(k), heads_split(v)
        if attention_mask is not None:
            # diffusers prepare_attention_mask: (B, Tq, Tk) float bias
            # -> broadcast over heads
            attention_mask = attention_mask[:, None, :, :]
        out = F.scaled_dot_product_attention(q, k, v, attn_mask=attention_mask)
        out = out.transpose(1, 2).reshape(b, t_q, self.heads * self.dim_head)
        out = self.to_out[0](out)
        out = self.to_out[1](out)
        return out


def get_activation(name):
    # mirrors diffusers/models/activations.py::get_activation name table
    return {
        "silu": nn.SiLU(),
        "swish": nn.SiLU(),
        "mish": nn.Mish(),
        "gelu": nn.GELU(),
        "relu": nn.ReLU(),
    }[name]


def maybe_allow_in_graph(cls):
    # mirrors diffusers/utils/torch_utils.py::maybe_allow_in_graph — identity
    # unless torch.compile tracing is active (never, in these tests)
    return cls


def _build_diffusers():
    root = _permissive_module("diffusers")
    models = _permissive_module("diffusers.models")
    attention = _permissive_module("diffusers.models.attention")
    attention.GEGLU = GEGLU
    attention.GELU = GELU
    attention.AdaLayerNorm = AdaLayerNorm
    attention.AdaLayerNormZero = AdaLayerNormZero
    attention.ApproximateGELU = ApproximateGELU
    attn_proc = _permissive_module("diffusers.models.attention_processor")
    attn_proc.Attention = Attention
    lora = _permissive_module("diffusers.models.lora")
    lora.LoRACompatibleLinear = LoRACompatibleLinear
    activations = _permissive_module("diffusers.models.activations")
    activations.get_activation = get_activation
    utils = _permissive_module("diffusers.utils")
    torch_utils = _permissive_module("diffusers.utils.torch_utils")
    torch_utils.maybe_allow_in_graph = maybe_allow_in_graph
    return {
        "diffusers": root,
        "diffusers.models": models,
        "diffusers.models.attention": attention,
        "diffusers.models.attention_processor": attn_proc,
        "diffusers.models.lora": lora,
        "diffusers.models.activations": activations,
        "diffusers.utils": utils,
        "diffusers.utils.torch_utils": torch_utils,
    }


class DictConfig(dict):
    """omegaconf.DictConfig stand-in: attr access + 'content' ctor arg."""

    def __init__(self, content=None, **kw):
        super().__init__(**(content or {}), **kw)

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e


_PERMISSIVE_ROOTS = [
    "hydra",
    "omegaconf",
    "lightning",
    "conformer",
    "wandb",
    "librosa",
    "whisper",
    "matplotlib",
    "onnxruntime",
    "gdown",
    "wget",
]


class _ShimFinder(importlib.abc.MetaPathFinder, importlib.abc.Loader):
    def find_spec(self, fullname, path=None, target=None):
        root = fullname.split(".")[0]
        if root in _PERMISSIVE_ROOTS and fullname not in sys.modules:
            return importlib.machinery.ModuleSpec(fullname, self)
        return None

    def create_module(self, spec):
        return _permissive_module(spec.name)

    def exec_module(self, module):
        if module.__name__ == "omegaconf":
            module.DictConfig = DictConfig
            module.OmegaConf = _AnyObject()
        if module.__name__ == "conformer":
            module.ConformerBlock = object
        if module.__name__ == "lightning":

            class _LightningModule(nn.Module):
                def save_hyperparameters(self, *a, **kw):
                    pass

                def log(self, *a, **kw):
                    pass

                def log_dict(self, *a, **kw):
                    pass

            module.LightningModule = _LightningModule
            module.LightningDataModule = object
            module.Callback = object
        if module.__name__ == "lightning.pytorch.utilities":
            module.rank_zero_only = lambda f: f


def _numpy_maximum_path_c(paths, values, t_xs, t_ys, max_neg_val=-1e9):
    """Drop-in for the reference Cython kernel (monotonic_align/core.pyx):
    the prebuilt .so targets python 3.11 and cannot load here.

    DP: value[x, y] = max(value[x, y-1], value[x-1, y-1]) + value[x, y],
    then backtrack from (t_x-1, t_y-1).
    """
    import numpy as np

    for b in range(values.shape[0]):
        value = values[b]
        t_x, t_y = int(t_xs[b]), int(t_ys[b])
        for y in range(t_y):
            for x in range(max(0, t_x + y - t_y), min(t_x, y + 1)):
                v_cur = max_neg_val if x == y else value[x, y - 1]
                if x == 0:
                    v_prev = 0.0 if y == 0 else max_neg_val
                else:
                    v_prev = value[x - 1, y - 1]
                value[x, y] = max(v_cur, v_prev) + value[x, y]
        index = t_x - 1
        for y in range(t_y - 1, -1, -1):
            paths[b, index, y] = 1
            if index != 0 and (
                index == y or value[index, y - 1] < value[index - 1, y - 1]
            ):
                index -= 1


def _install_mas_core():
    mod = types.ModuleType("jyutvoice.utils.monotonic_align.core")
    mod.maximum_path_c = _numpy_maximum_path_c
    sys.modules["jyutvoice.utils.monotonic_align.core"] = mod


_installed = False


def install():
    global _installed
    if _installed:
        return
    sys.modules.update(_build_diffusers())
    sys.meta_path.insert(0, _ShimFinder())
    if REF_PATH not in sys.path:
        sys.path.append(REF_PATH)
    _install_mas_core()
    _installed = True
