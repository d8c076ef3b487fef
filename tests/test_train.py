"""Training loop tests: frozen-decoder fine-tune step, datamodule, orbax
checkpoints, data-parallel step over the 8-device CPU mesh."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp
import optax

from jyutvoice_tpu.config import (
    CFMConfig,
    EstimatorConfig,
    JyutVoiceConfig,
    TextEncoderConfig,
    TrainConfig,
    TTSConfig,
)
from jyutvoice_tpu.models.tts import init_tts
from jyutvoice_tpu.train.datamodule import (
    DataConfig,
    TextMelDataModule,
    collate,
    dummy_rows,
    fix_len_compatibility,
    row_to_example,
)
from jyutvoice_tpu.train.step import (
    init_train_state,
    make_train_step,
    trainable_mask,
)

# tiny model so CPU tests stay fast
TINY = TTSConfig(
    encoder=TextEncoderConfig(n_layers=2, filter_channels=128),
    cfm=CFMConfig(estimator=EstimatorConfig(n_blocks=1, num_mid_blocks=1)),
)
TRAIN = TrainConfig(warmup_steps=4)


@pytest.fixture(scope="module")
def params():
    return init_tts(jax.random.PRNGKey(0), TINY)


@pytest.fixture(scope="module")
def batch():
    dm_cfg = DataConfig(batch_size=4, bucket_text=False)
    rows = dummy_rows(4)
    examples = [row_to_example(r, dm_cfg) for r in rows]
    b = collate(examples, dm_cfg)
    return {k: jnp.asarray(v) for k, v in b.items()}


def test_fix_len_compatibility():
    assert fix_len_compatibility(37) == 40
    assert fix_len_compatibility(40) == 40


def test_datamodule_batches():
    dm = TextMelDataModule(dummy_rows(10), DataConfig(batch_size=3, valid_ratio=0.1))
    batches = list(dm.train_batches())
    assert sum(b["x"].shape[0] for b in batches) == 9  # 1 row held out
    vb = list(dm.valid_batches())
    assert len(vb) == 1 and vb[0]["x"].shape[0] == 1
    b0 = batches[0]
    assert b0["y"].shape[1] % 4 == 0
    assert b0["y"].shape[2] == 80


def test_frozen_mask(params):
    mask = trainable_mask(params, TINY)
    flat = jax.tree.leaves(mask["decoder"])
    assert not any(flat)  # decoder frozen
    assert all(jax.tree.leaves(mask["encoder"]))
    assert all(jax.tree.leaves(mask["dp"]))
    assert not any(jax.tree.leaves(mask["spk_embed_affine_layer"]))


def test_train_step_updates_only_trainable(params, batch):
    state, tx = init_train_state(params, TINY, TRAIN)
    step = jax.jit(make_train_step(TINY, TRAIN, tx))
    new_state, metrics = step(state, jax.random.PRNGKey(1), batch)

    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["grad_norm"]))
    # decoder params unchanged (frozen)
    dec_before = jax.tree.leaves(params["decoder"])
    dec_after = jax.tree.leaves(new_state.params["decoder"])
    for a, b_ in zip(dec_before, dec_after):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
    # encoder params changed
    enc_before = np.concatenate(
        [np.ravel(x) for x in jax.tree.leaves(params["encoder"])]
    )
    enc_after = np.concatenate(
        [np.ravel(x) for x in jax.tree.leaves(new_state.params["encoder"])]
    )
    assert not np.allclose(enc_before, enc_after)


def test_warmup_schedule(params, batch):
    state, tx = init_train_state(params, TINY, TRAIN)
    step = jax.jit(make_train_step(TINY, TRAIN, tx))
    losses = []
    for i in range(3):
        state, metrics = step(state, jax.random.PRNGKey(i), batch)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert int(state.step) == 3


def test_data_parallel_step_8_devices(params, batch):
    from jyutvoice_tpu.dist import batch_sharding, make_mesh, replicate, shard_batch

    mesh = make_mesh(8)
    state, tx = init_train_state(params, TINY, TRAIN)
    step_fn = make_train_step(TINY, TRAIN, tx)

    # replicate batch of 4 -> 8 rows so it shards evenly
    batch8 = {k: jnp.concatenate([v, v], axis=0) for k, v in batch.items()}
    with mesh:
        rep = replicate(mesh)
        state = jax.device_put(state, rep)
        batch8 = shard_batch(batch8, mesh)
        key = jax.device_put(jax.random.PRNGKey(0), rep)
        jstep = jax.jit(
            step_fn,
            in_shardings=(rep, rep, batch_sharding(mesh)),
            out_shardings=(rep, rep),
        )
        new_state, metrics = jstep(state, key, batch8)
    assert np.isfinite(float(metrics["loss"]))

    # single-device result with the same batch must match the sharded one
    sstep = jax.jit(step_fn)
    dev0 = jax.devices()[0]
    batch8_local = jax.tree.map(lambda x: jax.device_put(x, dev0), batch8)
    sstate, smetrics = sstep(
        jax.device_put(state, dev0), jax.random.PRNGKey(0), batch8_local
    )
    np.testing.assert_allclose(
        float(metrics["loss"]), float(smetrics["loss"]), rtol=1e-5
    )


def test_orbax_checkpoint_roundtrip(tmp_path, params, batch):
    from jyutvoice_tpu.train import checkpoints as ckpt

    state, tx = init_train_state(params, TINY, TRAIN)
    step = jax.jit(make_train_step(TINY, TRAIN, tx))
    state, _ = step(state, jax.random.PRNGKey(1), batch)

    d = str(tmp_path / "ckpts")
    ckpt.save(d, 1, {"params": state.params, "step": 1})
    assert ckpt.latest_step(d) == 1
    restored = ckpt.restore(d, template={"params": state.params, "step": 0})
    leaves_a = jax.tree.leaves(state.params)
    leaves_b = jax.tree.leaves(restored["params"])
    for a, b_ in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


def test_prefetch_iterator():
    from jyutvoice_tpu.train.prefetch import prefetch

    items = list(range(20))
    out = list(prefetch(iter(items), depth=3))
    assert out == items

    def boom():
        yield 1
        raise RuntimeError("producer failed")

    it = prefetch(boom())
    assert next(it) == 1
    with pytest.raises(RuntimeError):
        list(it)


def test_viz_and_tb_logger(tmp_path):
    from jyutvoice_tpu.utils.tb_logging import TrainLogger
    from jyutvoice_tpu.utils.viz import colormap, save_attn_png, save_mel_png

    rng = np.random.default_rng(0)
    mel = rng.standard_normal((60, 80)).astype(np.float32)
    img = colormap(mel)
    assert img.shape == (60, 80, 3) and img.dtype == np.uint8
    save_mel_png(str(tmp_path / "mel.png"), mel)
    save_attn_png(str(tmp_path / "attn.png"), rng.random((10, 60)))
    assert (tmp_path / "mel.png").exists()

    tb = TrainLogger(str(tmp_path / "tb"))
    tb.scalars("train", {"loss": 1.0}, 1)
    tb.mel_image("val/mel", mel, 1)
    tb.attn_image("val/attn", rng.random((10, 60)), 1)
    tb.close()
    assert any((tmp_path / "tb").iterdir())


def test_multihost_init_noop(monkeypatch):
    from jyutvoice_tpu.dist import multihost

    for var in ("JAX_COORDINATOR_ADDRESS", "NUM_PROCESSES", "PROCESS_ID",
                "TPU_WORKER_HOSTNAMES"):
        monkeypatch.delenv(var, raising=False)
    assert multihost.init_distributed() is False

    mesh, sharding = multihost.global_batch_sharding()
    assert len(mesh.devices.flatten()) == 8


def test_observability_utils(tmp_path):
    from jyutvoice_tpu.utils.observability import (
        StageTimer,
        log_param_counts,
        param_count,
    )

    timer = StageTimer()
    with timer.stage("mel"):
        pass
    with timer.stage("mel"):
        pass
    with timer.stage("voc"):
        pass
    report = timer.report(audio_seconds=10.0)
    assert report["mel"]["count"] == 2
    assert "xrt" in report["voc"]

    params = {"a": {"w": jnp.ones((3, 4))}, "b": {"w": jnp.ones((5,))}}
    assert param_count(params) == 17
    counts = log_param_counts(params)
    assert counts["total"] == 17


def test_checkpoint_with_opt_state(tmp_path, params, batch):
    """The train CLI saves {params, opt_state, step}: optax multi_transform
    state (nested namedtuples) must round-trip through orbax."""
    from jyutvoice_tpu.train import checkpoints as ckpt

    state, tx = init_train_state(params, TINY, TRAIN)
    step = jax.jit(make_train_step(TINY, TRAIN, tx))
    state, _ = step(state, jax.random.PRNGKey(1), batch)

    d = str(tmp_path / "ckpts")
    payload = {"params": state.params, "opt_state": state.opt_state, "step": 1}
    ckpt.save(d, 1, payload)
    restored = ckpt.restore(
        d, template={"params": state.params, "opt_state": state.opt_state,
                     "step": 0},
    )
    for a, b_ in zip(
        jax.tree.leaves(state.opt_state), jax.tree.leaves(restored["opt_state"])
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
    # training continues from the restored state without error
    state2 = type(state)(restored["params"], restored["opt_state"],
                         jnp.asarray(restored["step"]))
    state2, metrics = step(state2, jax.random.PRNGKey(2), batch)
    assert np.isfinite(float(metrics["loss"]))


def test_best_checkpoint_retention(tmp_path):
    """save_best keeps the lowest-val_loss checkpoints (reference
    ModelCheckpoint monitor=val_loss save_top_k, base.yaml:146-159)."""
    import numpy as np

    from jyutvoice_tpu.train import checkpoints as ckpt

    d = str(tmp_path / "ck")
    losses = {10: 3.0, 20: 1.5, 30: 2.5, 40: 1.0}
    for step, loss in losses.items():
        ckpt.save_best(
            d, step, {"w": np.full((2,), float(step))}, val_loss=loss,
            max_to_keep=2,
        )
    assert ckpt.best_step(d) == 40  # lowest val_loss
    restored = ckpt.restore_best(d, template={"w": np.zeros((2,))})
    np.testing.assert_array_equal(restored["w"], np.full((2,), 40.0))
    # only the top-2 remain on disk
    import os

    kept = {
        int(s) for s in os.listdir(os.path.join(d, "best")) if s.isdigit()
    }
    assert kept == {20, 40}


@pytest.mark.slow
def test_train_cli_validate_only(tmp_path):
    """--validate-only runs one eval-mode pass and returns avg losses
    (reference train.py:120-145 trainer.validate path)."""
    from jyutvoice_tpu.cli.train import main

    avg = main([
        "--dummy", "--batch-size", "4", "--validate-only",
        "--ckpt-dir", str(tmp_path / "ck"),
    ])
    assert avg is not None
    for k in ("loss", "dur_loss", "prior_loss", "diff_loss"):
        assert np.isfinite(avg[k])


def test_lr_schedule_composition():
    """Warmup-only matches the shipped config; cosine/exponential compose
    after warmup (reference SequentialLR hook, baselightningmodule.py:38-60)."""
    import dataclasses

    from jyutvoice_tpu.config import TrainConfig
    from jyutvoice_tpu.train.step import lr_schedule

    base = TrainConfig(learning_rate=1e-3, warmup_steps=10)
    warm = lr_schedule(base)
    assert float(warm(0)) == pytest.approx(1e-4)
    assert float(warm(9)) == pytest.approx(1e-3)
    assert float(warm(1000)) == pytest.approx(1e-3)  # constant after warmup

    cos = lr_schedule(dataclasses.replace(
        base, scheduler="cosine", scheduler_decay_steps=100))
    assert float(cos(9)) == pytest.approx(1e-3)
    assert float(cos(10)) == pytest.approx(1e-3)  # main schedule starts at lr
    assert float(cos(60)) < 1e-3
    assert float(cos(110)) == pytest.approx(0.0)

    exp = lr_schedule(dataclasses.replace(
        base, scheduler="exponential", scheduler_gamma=0.9))
    assert float(exp(10)) == pytest.approx(1e-3)
    assert float(exp(20)) == pytest.approx(1e-3 * 0.9**10)

    with pytest.raises(ValueError):
        lr_schedule(dataclasses.replace(base, scheduler="bogus"))


def test_preemption_stop_saves_resumable_checkpoint(tmp_path):
    """SIGTERM-path (request_stop is what the handler sets): the loop stops
    at the next step boundary and writes a resumable checkpoint."""
    from jyutvoice_tpu.cli import train as train_cli
    from jyutvoice_tpu.train import checkpoints as ckpt

    train_cli.request_stop()  # pre-armed: stop after the first step
    try:
        train_cli.main([
            "--dummy", "--batch-size", "8", "--epochs", "3",
            "--ckpt-dir", str(tmp_path), "--save-every", "100000",
        ])
    finally:
        train_cli._PREEMPTED.clear()
    step = ckpt.latest_step(str(tmp_path))
    assert step == 1  # stopped at the first boundary, checkpoint written
    restored = ckpt.restore(str(tmp_path), step)
    assert restored["step"] == 1


def test_gspmd_safe_tts_cfg():
    """Multi-device DP steps must not trace the stock-flash pallas call:
    the helper rewrites 'xla' to 'xla_scores' and is a no-op otherwise."""
    from jyutvoice_tpu.config import JyutVoiceConfig
    from jyutvoice_tpu.train.step import gspmd_safe_tts_cfg

    tts = JyutVoiceConfig().tts
    assert tts.cfm.estimator.attention_backend == "xla"
    safe = gspmd_safe_tts_cfg(tts)
    assert safe.cfm.estimator.attention_backend == "xla_scores"
    assert gspmd_safe_tts_cfg(safe) is safe


def test_gspmd_safe_tts_cfg_rewrites_banded():
    """A reused long-form serving config (attention_backend='banded') must
    NOT pass through to the sharded train step: cfm_loss maps 'banded' to
    'xla', which re-enables the stock-flash pallas gate at T>=2048 inside
    the DP jit — the exact unshardable-custom-call hazard the helper
    exists to prevent. Inference-side gspmd_safe_cfm_cfg keeps 'banded'
    (pure-XLA einsums, genuinely GSPMD-shardable)."""
    import dataclasses

    from jyutvoice_tpu.config import JyutVoiceConfig
    from jyutvoice_tpu.dist.gspmd import gspmd_safe_cfm_cfg
    from jyutvoice_tpu.train.step import gspmd_safe_tts_cfg

    tts = JyutVoiceConfig().tts
    banded = dataclasses.replace(
        tts,
        cfm=dataclasses.replace(
            tts.cfm,
            estimator=dataclasses.replace(
                tts.cfm.estimator, attention_backend="banded"
            ),
        ),
    )
    safe = gspmd_safe_tts_cfg(banded)
    assert safe.cfm.estimator.attention_backend == "xla_scores"
    # inference pass-through unchanged
    assert gspmd_safe_cfm_cfg(banded.cfm) is banded.cfm


def test_row_to_example_hf_null_columns():
    """HF load_from_disk materializes EVERY column on every row with None
    for missing values — null-valued columns must behave exactly like
    absent ones (the old `key in row` checks crashed on np.asarray(None))."""
    from jyutvoice_tpu.train.datamodule import DataConfig, row_to_example

    cfg = DataConfig()
    mel = np.zeros((40, 80), np.float32)
    base = dict(
        phone_ids=[1, 2, 3], tones=None, word_pos=None, syllable_pos=None,
        lang_ids=None, mel=mel, spk_emb=None, decoder_h=None, audio=None,
        text=None, lang=None, phone=None,
    )
    ex = row_to_example(base, cfg)
    assert ex is not None
    # add_blank intersperses: 3 ids -> 7 tokens; null tones -> all zeros
    assert ex["tone"].shape == (7,) and (ex["tone"] == 0).all()
    assert ex["spk_emb"].shape == (cfg.spk_embed_dim,)
    assert (ex["spk_emb"] == 0).all()

    # null mel AND null audio -> invalid row, skipped (not a TypeError)
    assert row_to_example({**base, "mel": None}, cfg) is None
    # null phone_ids + null text -> invalid row
    assert row_to_example(
        {**base, "phone_ids": None, "mel": mel}, cfg
    ) is None


def test_row_to_example_skips_overlong_rows():
    """A single >300 s (or >8192-token) outlier row must be SKIPPED like
    other invalid rows — collate's pick_bucket would otherwise raise and
    kill the whole training run mid-epoch."""
    from jyutvoice_tpu.pipeline.buckets import MEL_BUCKETS, TEXT_BUCKETS
    from jyutvoice_tpu.train.datamodule import DataConfig, row_to_example

    cfg = DataConfig()
    too_long_mel = np.zeros((MEL_BUCKETS[-1] + 2, 80), np.float32)
    assert row_to_example(
        dict(phone_ids=[1, 2, 3], mel=too_long_mel), cfg
    ) is None
    # interspersal doubles the ids: 2n+1 must stay within the text table
    n_ph = TEXT_BUCKETS[-1]  # -> 2*8192+1 interspersed tokens, over the cap
    assert row_to_example(
        dict(phone_ids=[1] * n_ph, mel=np.zeros((40, 80), np.float32)), cfg
    ) is None
    # boundary case still accepted
    ok = row_to_example(
        dict(phone_ids=[1] * 10, mel=np.zeros((40, 80), np.float32)), cfg
    )
    assert ok is not None
