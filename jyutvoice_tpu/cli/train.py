"""Training CLI — the analog of `python -m jyutvoice.train`
(reference jyutvoice/train.py:12-117 + baselightningmodule.py).

Fine-tunes the text encoder + duration predictor against a frozen CosyVoice2
flow decoder, data-parallel over all visible devices.

  python -m jyutvoice_tpu.cli.train --dataset tmp/dataset_small \
      --pretrain pretrained_models_tpu/tts.npz --ckpt-dir checkpoints

Use --dummy for the smoke-train path (reference BASELINE config 5).
"""

from __future__ import annotations

import argparse
import logging
import time

import numpy as np

log = logging.getLogger("jyutvoice_tpu.train")


def _log_val_sample(cfg, state, dm, tb, step, mesh):
    """Synthesize one validation row and log mel/attn images
    (the reference's on_validation_end visualization)."""
    import jax
    import jax.numpy as jnp

    from jyutvoice_tpu.models.tts import synthesize_mel
    from jyutvoice_tpu.pipeline import buckets as bkt
    from jyutvoice_tpu.weights.noise import rand_noise

    vbatch = next(iter(dm.valid_batches()), None)
    # skip only when NO image sink exists: tb.mel_image/attn_image handle
    # the wandb-only case (utils/tb_logging.py), so --wandb-project without
    # --tb-dir must still get the validation images
    if vbatch is None or (tb.writer is None and tb.wandb is None):
        return
    i = 0
    n = int(vbatch["x_lengths"][i])
    t_text = bkt.pick_bucket(n, bkt.TEXT_BUCKETS)
    t_mel = bkt.pick_bucket(int(vbatch["y_lengths"][i]) + 64, bkt.MEL_BUCKETS)
    dev0 = jax.devices()[0]
    # device_put gathers replicated/sharded params onto dev0 directly —
    # the former tree_map(np.asarray, ...) bounced every leaf through the
    # host (~28 ms tunnel RTT per leaf) then re-uploaded the whole model
    params = jax.device_put(state.params, dev0)

    # ONE cached jitted graph (identity-keyed; jit retraces per bucket but
    # never per call) — the former raw synthesize_mel call dispatched
    # op-by-op over the tunnel every epoch
    fn = getattr(_log_val_sample, "_fn", None)
    if fn is None:

        def _sample(params, cfg_tts, x, n, lang, tone, wp, sp, spk, noise,
                    t_mel):
            zero = jnp.zeros((1, 0, 80), jnp.float32)
            return synthesize_mel(
                params, cfg_tts, x, n, lang, tone, wp, sp, spk,
                zero, zero, jnp.zeros((1,), jnp.int32),
                t_mel_max=t_mel, n_timesteps=10, rand_noise=noise,
            )

        fn = jax.jit(_sample, static_argnames=("cfg_tts", "t_mel"))
        _log_val_sample._fn = fn

    def cut(key):
        a = np.zeros((1, t_text), np.int32)
        a[0, :n] = np.asarray(vbatch[key])[i, :n]
        return jnp.asarray(a)

    out = fn(
        params, cfg.tts, cut("x"), jnp.asarray([n], jnp.int32), cut("lang"),
        cut("tone"), cut("word_pos"), cut("syllable_pos"),
        jnp.asarray(np.asarray(vbatch["spk_embed"])[i : i + 1]),
        jnp.asarray(rand_noise(t_mel)), t_mel,
    )
    mel, enc_mel, attn, lens = jax.device_get(
        (out.mel, out.encoder_mel, out.attn, out.mel_lengths)
    )
    frames = int(lens[0])
    tb.mel_image("val/generated_mel", mel[0, :frames], step)
    tb.mel_image("val/encoder_mel", enc_mel[0, :frames], step)
    gt = np.asarray(vbatch["y"])[i, : int(vbatch["y_lengths"][i])]
    tb.mel_image("val/ground_truth_mel", gt, step)
    tb.attn_image("val/alignment", attn[0, :n, :frames], step)


def _validation_pass(cfg, tr, state, dm, mesh, n_dev, rep):
    """Average eval-mode losses over the validation set (reference
    baselightningmodule.py:162-204). Returns None when there is no val data."""
    import jax
    import jax.numpy as jnp

    from jyutvoice_tpu.dist import shard_batch
    from jyutvoice_tpu.train.step import jit_loss_fn

    # process-wide wrapper: re-traces neither per batch nor per epoch
    jit_loss = jit_loss_fn()
    key = jax.device_put(jax.random.PRNGKey(0), rep)
    val_metrics = []
    for vbatch in dm.valid_batches():
        b = vbatch["x"].shape[0]
        vbatch = {k: jnp.asarray(v) for k, v in vbatch.items()}
        if b % n_dev == 0:
            vbatch = shard_batch(vbatch, mesh)
        else:
            # indivisible final batch: evaluate REPLICATED (exact) instead
            # of padding with duplicated rows — duplicate rows would enter
            # the loss average and bias val_loss (and the top-k checkpoint
            # ranking that keys off it)
            vbatch = {k: jax.device_put(v, rep) for k, v in vbatch.items()}
        # eval mode: dropout off, like the reference's model.eval()
        _, m = jit_loss(state.params, cfg.tts, tr, key, vbatch, False)
        val_metrics.append((b, {k: float(v) for k, v in m.items()}))
    if not val_metrics:
        return None
    total = sum(b for b, _ in val_metrics)
    # row-weighted mean: batches contribute by how many utterances they hold
    return {
        k: float(sum(b * m[k] for b, m in val_metrics) / total)
        for k in val_metrics[0][1]
    }


# ---------------------------------------------------------------------------
# Preemption safety: TPU pool evictions deliver SIGTERM with a grace window.
# The reference has no preemption story (Lightning just dies mid-epoch);
# here the signal requests a stop at the next step boundary and the normal
# end-of-training checkpoint save makes the run resumable via --ckpt-dir.
# ---------------------------------------------------------------------------

import threading as _threading

_PREEMPTED = _threading.Event()


def request_stop() -> None:
    """Programmatic preemption request (what SIGTERM/SIGINT trigger)."""
    _PREEMPTED.set()


def _install_preemption_handler() -> None:
    import signal

    def _on_signal(signum, frame):  # noqa: ARG001
        _PREEMPTED.set()

    try:
        signal.signal(signal.SIGTERM, _on_signal)
        signal.signal(signal.SIGINT, _on_signal)
    except ValueError:
        pass  # not the main thread (e.g. tests driving main() in a thread)


def main(argv=None):
    parser = argparse.ArgumentParser(description="JyutVoice-TPU training")
    parser.add_argument("--dataset", default=None, help="HF dataset dir")
    parser.add_argument("--dummy", action="store_true", help="synthetic smoke data")
    parser.add_argument("--dummy-rows", type=int, default=64,
                        help="synthetic row count (with --dummy)")
    parser.add_argument("--dummy-mel", default="48,160",
                        help="LO,HI synthetic mel-frame range (with --dummy); "
                             "e.g. 1200,2000 lands batches in the 2048 bucket "
                             "so the flash-backward gate fires")
    parser.add_argument("--pretrain", default=None,
                        help="pretrained tts weights (.npz/.pt/.ckpt)")
    parser.add_argument("--ckpt-dir", default="checkpoints")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--batch-size", type=int, default=None)
    parser.add_argument("--lr", type=float, default=None)
    parser.add_argument("--max-steps", type=int, default=None)
    parser.add_argument("--log-every", type=int, default=10)
    parser.add_argument("--tb-dir", default=None, help="TensorBoard log dir")
    parser.add_argument("--wandb-project", default=None,
                        help="optional WandB project (mirrors the TB "
                             "surface; reference base.yaml:164-172)")
    parser.add_argument("--save-every", type=int, default=500)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--validate-only", action="store_true",
                        help="run one eval-mode validation pass and exit "
                             "(reference train.py:120-145)")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    import dataclasses
    import os

    import jax

    # persistent XLA compile cache (CLAUDE.md: first-conv autotune costs
    # 2-8 min/process on this platform; every bucket-shaped train/val/
    # sample graph pays it again after each --resume restart otherwise).
    # TPU executables are keyed by target — safe to share; CPU entries are
    # host-AOT blobs stamped with the compiling machine's ISA (cross-VM
    # reuse risks SIGILL, see __graft_entry__), so CPU runs skip it.
    try:
        if jax.default_backend() != "cpu":
            cache_dir = os.environ.get(
                "JAX_COMPILATION_CACHE_DIR",
                os.path.expanduser("~/.cache/jax_xla"),
            )
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0
            )
    except Exception:  # noqa: BLE001 — cache is an optimization only
        pass

    from jyutvoice_tpu.config import JyutVoiceConfig
    from jyutvoice_tpu.dist import batch_sharding, make_mesh, replicate, shard_batch
    from jyutvoice_tpu.models.tts import init_tts
    from jyutvoice_tpu.train import checkpoints as ckpt
    from jyutvoice_tpu.train.datamodule import (
        DataConfig,
        TextMelDataModule,
        dummy_rows,
    )
    from jyutvoice_tpu.train.step import (
        TrainState,
        init_train_state,
        make_train_step,
    )

    cfg = JyutVoiceConfig()
    tr = cfg.train
    if args.epochs:
        tr = dataclasses.replace(tr, max_epochs=args.epochs)
    if args.batch_size:
        tr = dataclasses.replace(tr, batch_size=args.batch_size)
    if args.lr:
        tr = dataclasses.replace(tr, learning_rate=args.lr)

    if args.pretrain:
        from jyutvoice_tpu.cli.infer import _load_params

        params = _load_params(args.pretrain, "tts", cfg)
        log.info("loaded pretrained weights from %s", args.pretrain)
    else:
        params = init_tts(jax.random.PRNGKey(args.seed), cfg.tts)
        log.warning("training from scratch (no --pretrain)")

    dm_cfg = DataConfig(batch_size=tr.batch_size, seed=args.seed)
    if args.dummy or not args.dataset:
        log.warning("using dummy dataset (smoke mode)")
        lo, hi = (int(v) for v in args.dummy_mel.split(","))
        dm = TextMelDataModule(
            dummy_rows(args.dummy_rows, seed=args.seed, mel_frames=(lo, hi)),
            dm_cfg,
        )
    else:
        dm = TextMelDataModule(args.dataset, dm_cfg)

    state, tx = init_train_state(params, cfg.tts, tr)
    start_step = 0
    start_epoch = 0
    if args.resume:
        latest = ckpt.latest_step(args.ckpt_dir)
        if latest is not None:
            base = {"params": state.params, "opt_state": state.opt_state,
                    "step": 0}
            try:
                restored = ckpt.restore(
                    args.ckpt_dir, latest, template={**base, "epoch": 0}
                )
                start_epoch = int(restored["epoch"])
            except Exception:  # noqa: BLE001 — pre-epoch-key checkpoint
                restored = ckpt.restore(args.ckpt_dir, latest, template=base)
            state = TrainState(
                restored["params"], restored["opt_state"],
                jax.numpy.asarray(restored["step"]),
            )
            start_step = int(restored["step"])
            log.info(
                "resumed from step %d (continuing at epoch %d; a mid-epoch "
                "checkpoint restarts that epoch from its beginning)",
                start_step, start_epoch,
            )

    mesh = make_mesh()
    n_dev = len(mesh.devices.flatten())
    log.info("mesh: %d device(s): %s", n_dev, mesh)
    if n_dev > 1:
        # batch-sharded GSPMD graphs must not contain the stock-flash
        # pallas call (train/step.py::gspmd_safe_tts_cfg); single-device
        # training keeps the measured flash win at long mel buckets
        from jyutvoice_tpu.train.step import gspmd_safe_tts_cfg

        cfg = dataclasses.replace(cfg, tts=gspmd_safe_tts_cfg(cfg.tts))

    if args.validate_only:
        with mesh:
            rep = replicate(mesh)
            state = jax.device_put(state, rep)
            avg = _validation_pass(cfg, tr, state, dm, mesh, n_dev, rep)
        if avg is None:
            log.warning("no validation data")
            return None
        log.info(
            "validate-only | val_loss %.4f (dur %.4f prior %.4f diff %.4f)",
            avg["loss"], avg["dur_loss"], avg["prior_loss"], avg["diff_loss"],
        )
        return avg

    step_fn = make_train_step(cfg.tts, tr, tx)

    from jyutvoice_tpu.utils.observability import log_param_counts
    from jyutvoice_tpu.utils.tb_logging import TrainLogger

    log_param_counts(params)
    tb = TrainLogger(args.tb_dir, wandb_project=args.wandb_project)

    with mesh:
        rep = replicate(mesh)
        state = jax.device_put(state, rep)
        jit_step = jax.jit(
            step_fn,
            in_shardings=(rep, rep, batch_sharding(mesh)),
            out_shardings=(rep, rep),
            donate_argnums=(0,),
        )

        key = jax.random.PRNGKey(args.seed)
        if start_step:
            # a resumed run must not replay the exact dropout/cond-RNG
            # stream it already trained on
            key = jax.random.fold_in(key, start_step)
        global_step = start_step
        cur_epoch = start_epoch
        t_start = time.time()
        from jyutvoice_tpu.train.prefetch import prefetch

        _install_preemption_handler()

        for epoch in range(start_epoch, tr.max_epochs):
            cur_epoch = epoch
            for batch in prefetch(dm.train_batches(epoch)):
                b = batch["x"].shape[0]
                if b < tr.batch_size or b % n_dev != 0:
                    # pad the tail batch up to the FULL configured batch
                    # (an already-compiled shape, rounded to the mesh
                    # size): any other realized batch dim is a fresh
                    # multi-minute XLA compile on this platform. Padding
                    # repeats row 0 — those rows enter the loss mean for
                    # this one batch per epoch (same trade the previous
                    # n_dev-only padding made)
                    target = max(tr.batch_size, b)
                    target += (-target) % n_dev
                    padb = target - b
                    batch = {
                        k: np.concatenate([v] + [v[:1]] * padb, axis=0)
                        for k, v in batch.items()
                    }
                batch = shard_batch(
                    {k: jax.numpy.asarray(v) for k, v in batch.items()}, mesh
                )
                key, sub = jax.random.split(key)
                state, metrics = jit_step(state, jax.device_put(sub, rep), batch)
                global_step += 1
                if global_step % args.log_every == 0:
                    m = {k: float(v) for k, v in metrics.items()}
                    tb.scalars("train", m, global_step)
                    log.info(
                        "step %d | loss %.4f (dur %.4f prior %.4f diff %.4f) "
                        "| grad %.3f | %.2f steps/s",
                        global_step, m["loss"], m["dur_loss"], m["prior_loss"],
                        m["diff_loss"], m["grad_norm"],
                        args.log_every / max(time.time() - t_start, 1e-9),
                    )
                    t_start = time.time()
                if global_step % args.save_every == 0:
                    ckpt.save(
                        args.ckpt_dir, global_step,
                        {"params": state.params, "opt_state": state.opt_state,
                         "step": global_step, "epoch": epoch},
                    )
                if args.max_steps and global_step >= args.max_steps:
                    break
                if _PREEMPTED.is_set():
                    log.warning(
                        "preemption signal received: stopping at step %d "
                        "(resumable checkpoint follows)", global_step,
                    )
                    break
            else:
                # ---- validation at epoch end (reference runs val every
                # epoch + logs val_loss, baselightningmodule.py:162-204)
                avg = _validation_pass(cfg, tr, state, dm, mesh, n_dev, rep)
                if avg:
                    tb.scalars("val", avg, global_step)
                    log.info(
                        "epoch %d | val_loss %.4f (dur %.4f prior %.4f diff %.4f)",
                        epoch, avg["loss"], avg["dur_loss"], avg["prior_loss"],
                        avg["diff_loss"],
                    )
                    # top-k by val_loss (reference ModelCheckpoint
                    # monitor=val_loss save_top_k=10, base.yaml:146-159)
                    ckpt.save_best(
                        args.ckpt_dir, global_step,
                        {"params": state.params, "opt_state": state.opt_state,
                         "step": global_step, "epoch": epoch + 1},
                        val_loss=avg["loss"],
                    )
                # validation-end sample synthesis + mel/attn images
                # (reference baselightningmodule.py:206-300); never fatal
                try:
                    _log_val_sample(cfg, state, dm, tb, global_step, mesh)
                except Exception as e:  # noqa: BLE001
                    log.warning("val sample logging failed: %s", e)
                continue
            break

        # resume epoch: an interrupted run restarts its current epoch, a
        # completed run resumes past the last one (i.e. does nothing more)
        stopped_early = _PREEMPTED.is_set() or bool(
            args.max_steps and global_step >= args.max_steps
        )
        ckpt.save(
            args.ckpt_dir, global_step,
            {"params": state.params, "opt_state": state.opt_state,
             "step": global_step,
             "epoch": cur_epoch if stopped_early else tr.max_epochs},
        )
        log.info("done at step %d", global_step)
        # flush the event-file tail + finish the wandb run (SummaryWriter
        # flushes on a ~2 min interval otherwise — a short run would lose
        # its final scalars)
        tb.close()


if __name__ == "__main__":
    main()
