"""Transfer-learning convergence speedup, demonstrated end-to-end.

The reference's headline claim is 3-5x faster convergence from fine-tuning
against a frozen pretrained CosyVoice2 decoder vs training from scratch
(/root/reference/README.md:8-9). Real pretrained weights are unreachable
here, so this demonstrates the MECHANISM on the structured synthetic set
(tests/test_train_convergence.py rows):

  phase A  "pretrain": train the FULL model (decoder included) on the
           48-row set until the CFM loss converges;
  phase B1 "transfer": re-init the text half (encoder + dp), keep the
           phase-A decoder FROZEN (the production fine-tune config), and
           count steps until total loss reaches tau;
  phase B2 "scratch": full re-init, everything trainable, same tau.

Steps(B2)/Steps(B1) is the synthetic analog of the README claim. The
total loss includes the diff term, which B1 starts with already-trained:
tau is set from the trainable-path losses (dur + prior) PLUS requiring
the diff loss be below its phase-A converged level, so B2 cannot pass on
a lucky diff-loss init.

CPU, ~20-40 min. Results recorded in docs/design.md.
"""
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    import jax.numpy as jnp

    from tests.test_train_convergence import _make_rows
    from jyutvoice_tpu.config import (
        CFMConfig, EstimatorConfig, TextEncoderConfig, TrainConfig, TTSConfig,
    )
    from jyutvoice_tpu.models.tts import init_tts
    from jyutvoice_tpu.train.datamodule import (
        DataConfig, collate, row_to_example,
    )
    from jyutvoice_tpu.train.step import init_train_state, make_train_step

    def cfgs(freeze_decoder):
        return TTSConfig(
            encoder=TextEncoderConfig(n_layers=2, filter_channels=128),
            cfm=CFMConfig(
                estimator=EstimatorConfig(n_blocks=1, num_mid_blocks=1)
            ),
            freeze_decoder=freeze_decoder,
        )

    train_cfg = TrainConfig(learning_rate=5e-4, warmup_steps=20)
    rows, _ = _make_rows(48)
    dm = DataConfig(batch_size=48, bucket_text=False)
    batch = {
        k: jnp.asarray(v)
        for k, v in collate([row_to_example(r, dm) for r in rows], dm).items()
    }

    def train(params, tts_cfg, n_steps, tau=None, seed=0):
        state, tx = init_train_state(params, tts_cfg, train_cfg)
        step = jax.jit(
            make_train_step(tts_cfg, train_cfg, tx, train_dropout=False)
        )
        for i in range(n_steps):
            state, m = step(state, jax.random.PRNGKey(seed * 10000 + i), batch)
            dur, prior, diff = (float(m["dur_loss"]), float(m["prior_loss"]),
                                float(m["diff_loss"]))
            if i % 50 == 0:
                print(f"    step {i:4d}: dur {dur:.4f} prior {prior:.4f} "
                      f"diff {diff:.4f}", flush=True)
            if tau is not None and dur < tau[0] and prior < tau[1] \
                    and diff < tau[2]:
                return state.params, i + 1, (dur, prior, diff)
        return state.params, None, (dur, prior, diff)

    print("phase A: pretrain full model (400 steps)", flush=True)
    pre = init_tts(jax.random.PRNGKey(0), cfgs(False))
    pre_params, _, (dA, pA, fA) = train(pre, cfgs(False), 400, seed=1)
    print(f"  converged: dur {dA:.4f} prior {pA:.4f} diff {fA:.4f}")

    # tau: modestly above the converged level — both phases must reach the
    # same quality bar
    tau = (max(2 * dA, 0.08), pA + 0.08, fA * 1.3)
    print(f"tau (dur, prior, diff) = ({tau[0]:.4f}, {tau[1]:.4f}, {tau[2]:.4f})")

    print("phase B1: transfer (re-init text half, frozen phase-A decoder)",
          flush=True)
    fresh = init_tts(jax.random.PRNGKey(7), cfgs(True))
    b1 = dict(pre_params)
    b1["encoder"] = fresh["encoder"]
    b1["dp"] = fresh["dp"]
    _, steps_b1, lb1 = train(b1, cfgs(True), 1200, tau=tau, seed=2)
    print(f"  steps to tau: {steps_b1} (final {lb1})")

    print("phase B2: from scratch (everything trainable)", flush=True)
    b2 = init_tts(jax.random.PRNGKey(7), cfgs(False))
    _, steps_b2, lb2 = train(b2, cfgs(False), 1200, tau=tau, seed=2)
    print(f"  steps to tau: {steps_b2} (final {lb2})")

    if steps_b1 and steps_b2:
        print(f"transfer speedup: {steps_b2 / steps_b1:.2f}x "
              f"({steps_b2} vs {steps_b1} steps) — reference claims 3-5x "
              f"(README.md:8)")
    else:
        print("one phase did not reach tau within the budget; raise steps")


if __name__ == "__main__":
    main()
