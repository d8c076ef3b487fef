"""Diagnostic: loss curves for the overfit convergence test (CPU).

Prints dur/prior/diff every 25 steps for 500 steps so the test
thresholds in tests/test_train_convergence.py are set from data.
"""
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from tests.test_train_convergence import _make_rows, _mas_duration_corr


def main():
    import jax.numpy as jnp

    from jyutvoice_tpu.config import (
        CFMConfig, EstimatorConfig, TextEncoderConfig, TrainConfig, TTSConfig,
    )
    from jyutvoice_tpu.models import tts as tts_mod
    from jyutvoice_tpu.models.tts import init_tts
    from jyutvoice_tpu.train.datamodule import DataConfig, collate, row_to_example
    from jyutvoice_tpu.train.step import init_train_state, make_train_step

    tiny = TTSConfig(
        encoder=TextEncoderConfig(n_layers=2, filter_channels=128),
        cfm=CFMConfig(estimator=EstimatorConfig(n_blocks=1, num_mid_blocks=1)),
        freeze_decoder=False,
    )
    train_cfg = TrainConfig(learning_rate=5e-4, warmup_steps=20)
    rows, true_durs = _make_rows(8)
    dm_cfg = DataConfig(batch_size=8, bucket_text=False)
    examples = [row_to_example(r, dm_cfg) for r in rows]
    batch = {k: jnp.asarray(v) for k, v in collate(examples, dm_cfg).items()}

    params = init_tts(jax.random.PRNGKey(0), tiny)
    state, tx = init_train_state(params, tiny, train_cfg)
    step = jax.jit(make_train_step(tiny, train_cfg, tx, train_dropout=False))

    for i in range(500):
        state, metrics = step(state, jax.random.PRNGKey(1000 + i), batch)
        if i % 25 == 0 or i == 499:
            losses = tts_mod.compute_losses(
                state.params, tiny, jax.random.PRNGKey(7),
                batch["x"], batch["x_lengths"], batch["y"],
                batch["y_lengths"], batch["lang"], batch["tone"],
                batch["word_pos"], batch["syllable_pos"],
                batch["spk_embed"], batch["decoder_h"],
                train_dropout=False,
            )
            corr = _mas_duration_corr(
                np.asarray(losses.attn), batch["x_lengths"], true_durs
            )
            print(
                f"step {i:4d}: dur {float(metrics['dur_loss']):.4f} "
                f"prior {float(metrics['prior_loss']):.4f} "
                f"diff {float(metrics['diff_loss']):.4f} "
                f"(eval dur {float(losses.dur_loss):.4f} "
                f"prior {float(losses.prior_loss):.4f}) corr {corr:.3f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
