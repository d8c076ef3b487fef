"""On-hardware verification: compiled Pallas kernels + jitted graphs vs the
XLA reference paths, ON the real TPU (CI runs them interpret-mode on CPU;
this checks the Mosaic-compiled versions).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/verify_tpu.py
"""

import os

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_xla")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    assert jax.devices()[0].platform == "tpu", jax.devices()

    from jyutvoice_tpu.nn import core
    from jyutvoice_tpu.nn.attention import sdpa
    from jyutvoice_tpu.nn.pallas.attention import flash_attention

    rng = np.random.default_rng(0)

    # ---- flash attention (compiled) vs XLA SDPA
    bh, t, d = 4, 256, 64
    q, k, v = (
        jnp.asarray(rng.standard_normal((bh, t, d)), jnp.float32)
        for _ in range(3)
    )
    lens = jnp.asarray([256, 200, 256, 128], jnp.int32)
    scale = 1.0 / np.sqrt(d)
    for chunk in (0, 50):
        pad = core.sequence_mask(lens, t)
        bias = core.mask_to_bias(core.chunk_attn_mask(pad, chunk))[:, None]
        ref = sdpa(q[:, None], k[:, None], v[:, None], bias, scale=scale)[:, 0]
        out = flash_attention(q, k, v, lens, scale=scale, chunk_size=chunk)
        for i, L in enumerate(np.asarray(lens)):
            err = np.abs(np.asarray(out)[i, :L] - np.asarray(ref)[i, :L]).max()
            assert err < 6e-3, (chunk, i, err)
        print(f"flash_attention compiled ok (chunk={chunk})", flush=True)

    # ---- fused resblock stage (compiled) vs unfused XLA
    from jyutvoice_tpu.models.hift import apply_resblock, init_resblock
    from jyutvoice_tpu.nn.pallas.resblock import (
        fused_resblock_stage,
        pack_stage_weights,
    )

    ks, dil = (3, 7, 11), (1, 3, 5)
    c, tt = 64, 700
    branches = [
        init_resblock(jax.random.fold_in(jax.random.PRNGKey(0), i), c, ks[i], dil)
        for i in range(3)
    ]
    x = jnp.asarray(rng.standard_normal((1, tt, c)) * 0.5, jnp.float32)
    ref = sum(apply_resblock(branches[i], x, ks[i], dil) for i in range(3)) / 3.0
    out = fused_resblock_stage(
        x[0], pack_stage_weights(branches, dil), kernel_sizes=ks, dilations=dil
    )
    err = np.abs(np.asarray(out) - np.asarray(ref)[0]).max()
    assert err < 6e-3, err
    print("fused_resblock_stage compiled ok", flush=True)

    # ---- MAS wavefront on TPU vs host C++
    from jyutvoice_tpu import align

    value = rng.standard_normal((3, 9, 21)).astype(np.float32)
    mask = np.zeros((3, 9, 21), np.float32)
    for i, (tx, ty) in enumerate([(9, 21), (5, 13), (7, 7)]):
        mask[i, :tx, :ty] = 1
    host = align.maximum_path(value, mask)
    dev = np.asarray(
        jax.jit(align.maximum_path_jax)(jnp.asarray(value), jnp.asarray(mask))
    )
    np.testing.assert_array_equal(host, dev)
    print("MAS wavefront on TPU ok", flush=True)
    print("ALL TPU VERIFICATIONS PASSED")


if __name__ == "__main__":
    main()
