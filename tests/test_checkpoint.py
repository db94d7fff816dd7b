"""Checkpoint ABI: log-dir roundtrips, optimizer-state restore, registry load."""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    from trustedai_cl_vae_ad_tpu.config import save_config
    from trustedai_cl_vae_ad_tpu.registry import load_model_from_config

    config = {
        "data": {"image_size": [16, 16, 3]},
        "loss": {"kurtosis": 1.8, "w_kl_divergence": 0.0, "w_kurtosis": 1e-4, "w_mse": 1.0,
                 "w_skew": 0.0, "w_z_l1_reg": 0.0},
        "model": {"type": "KurtosisSingle", "decoder_dense_filters": 4,
                  "latent_dimensions": 8, "layers": [4]},
        "training": {"batch_size": 8, "beta": 1e-6, "learning_rate": 1e-3, "max_epochs": 1},
    }
    model = load_model_from_config(config)
    model.compile()
    x = np.random.RandomState(0).random((8, 16, 16, 3)).astype(np.float32)
    for _ in range(3):
        model.train_step(x)
    d = tmp_path_factory.mktemp("ckpt")
    save_config(config, os.path.join(d, "config.yml"))
    model.save_model(str(d))
    return model, config, str(d), x


def test_layout(trained):
    _, _, d, _ = trained
    assert os.path.isdir(os.path.join(d, "encoder"))
    assert os.path.isdir(os.path.join(d, "decoder"))
    assert os.path.isdir(os.path.join(d, "optimizer"))
    assert os.path.isfile(os.path.join(d, "config.yml"))


def test_weights_roundtrip(trained):
    from trustedai_cl_vae_ad_tpu.registry import load_model_from_directory

    model, _, d, x = trained
    m2, cfg2 = load_model_from_directory(d)
    y1 = np.asarray(model.call(x))
    y2 = np.asarray(m2.call(x))
    np.testing.assert_array_equal(y1, y2)
    assert cfg2["model"]["type"] == "KurtosisSingle"


def test_optimizer_state_restored(trained):
    """Adam moments survive the roundtrip (the reference's resume gap, fixed)."""
    import jax

    from trustedai_cl_vae_ad_tpu.registry import load_model_from_directory

    model, _, d, x = trained
    m2, _ = load_model_from_directory(d)
    m2.compile()
    m2.load_model(d)  # restores optimizer/ now that the model is compiled
    mu1 = jax.tree_util.tree_leaves(model.opt_state.inner_state[0].mu)[0]
    mu2 = jax.tree_util.tree_leaves(m2.opt_state.inner_state[0].mu)[0]
    np.testing.assert_array_equal(np.asarray(mu1), np.asarray(mu2))
    # continued training from the restored state matches continued training
    # from the original (pin both rng streams so the latent eps agree)
    key = jax.random.PRNGKey(7)
    model._rng = key
    m2._rng = key
    l1 = float(model.train_step(x)["loss"])
    l2 = float(m2.train_step(x)["loss"])
    np.testing.assert_allclose(l1, l2, rtol=1e-5)


def test_load_missing_dir_raises(trained, tmp_path):
    from trustedai_cl_vae_ad_tpu.config import save_config
    from trustedai_cl_vae_ad_tpu.registry import load_model_from_directory

    _, config, _, _ = trained
    bad = tmp_path / "incomplete"
    bad.mkdir()
    save_config(config, str(bad / "config.yml"))
    with pytest.raises(AssertionError, match="encoder"):
        load_model_from_directory(str(bad))


def test_optimizer_restore_contract(trained):
    """restore_optimizer=True compiles+restores Adam moments; the default
    inference loaders never allocate optimizer state (it's ~8 GB on the
    flagship); the streaming-engine loader uses the True path."""
    import jax

    from trustedai_cl_vae_ad_tpu.registry import load_model_from_directory

    _, _, d, _ = trained
    # inference default: no optimizer allocation
    m2, _ = load_model_from_directory(d)
    assert m2.optimizer is None

    # explicit CL-resume path: compiled + trained (nonzero) moments
    m2.load_model(d, restore_optimizer=True)
    assert m2.optimizer is not None
    mu2 = jax.tree_util.tree_leaves(m2.opt_state.inner_state[0].mu)
    assert any(np.abs(np.asarray(m)).max() > 0 for m in mu2)

    # streaming-engine loader resumes the same state
    from trustedai_cl_vae_ad_tpu.stream.engine import load_engine_from_directory

    eng = load_engine_from_directory(d)
    mu3 = jax.tree_util.tree_leaves(eng.model.opt_state.inner_state[0].mu)
    for a, b in zip(mu2, mu3):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bf16_adam_lean_state_roundtrip(small_config, tmp_path):
    """bf16 models checkpoint adam_lean's state (bf16 moments + rng=None
    leaf) — the Orbax roundtrip must restore it exactly and training must
    continue from the restored moments."""
    import jax
    import numpy as np

    from trustedai_cl_vae_ad_tpu.registry import load_model_from_config

    cfg = dict(small_config)
    cfg["training"] = dict(cfg["training"], precision="bfloat16")
    model = load_model_from_config(cfg)
    model.compile()
    x = np.random.RandomState(0).random((4, 64, 64, 3)).astype(np.float32)
    for _ in range(2):
        model.train_step(x)
    d = tmp_path / "ck"
    d.mkdir()
    model.save_model(str(d))

    model2 = load_model_from_config(cfg)
    model2.compile()
    model2.load_model(str(d), restore_optimizer=True)
    for a, b in zip(jax.tree_util.tree_leaves(model.params),
                    jax.tree_util.tree_leaves(model2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # moment dtypes and values survive
    la = [l for l in jax.tree_util.tree_leaves(model.opt_state) if hasattr(l, "dtype")]
    lb = [l for l in jax.tree_util.tree_leaves(model2.opt_state) if hasattr(l, "dtype")]
    assert len(la) == len(lb)
    for a, b in zip(la, lb):
        assert a.dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # identical continued step from identical state (same injected rng)
    rng = jax.random.PRNGKey(5)
    p1 = model._train_step_j(model.params, model.opt_state,
                             jax.numpy.asarray(x), rng)[0]
    p2 = model2._train_step_j(model2.params, model2.opt_state,
                              jax.numpy.asarray(x), rng)[0]
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_adam_fp8_legacy_treedef_restore(small_config, tmp_path):
    """Optimizer checkpoints written by earlier builds (AdamFp8State with a
    4th ``treedef`` field, always None) must still resume: the restore
    fallback retries with a treedef-augmented target and strips the stale
    field (ADVICE r3, medium)."""
    import shutil

    import jax
    import orbax.checkpoint as ocp

    from trustedai_cl_vae_ad_tpu.ops.adam8 import AdamFp8State
    from trustedai_cl_vae_ad_tpu.registry import load_model_from_config
    from trustedai_cl_vae_ad_tpu.train.checkpoint import _LegacyAdamFp8State

    cfg = dict(small_config)
    cfg["training"] = dict(cfg["training"], optimizer="adam_fp8")
    model = load_model_from_config(cfg)
    model.compile()
    x = np.random.RandomState(0).random((4, 64, 64, 3)).astype(np.float32)
    for _ in range(2):
        model.train_step(x)
    d = tmp_path / "ck"
    d.mkdir()
    model.save_model(str(d))

    # rewrite optimizer/ in the LEGACY on-disk layout
    def _is_fp8(n):
        return isinstance(n, AdamFp8State)

    legacy = jax.tree_util.tree_map(
        lambda n: _LegacyAdamFp8State(n.count, n.mu, n.nu, None) if _is_fp8(n) else n,
        model.opt_state,
        is_leaf=_is_fp8,
    )
    opt_path = (d / "optimizer").resolve()
    shutil.rmtree(opt_path)
    ck = ocp.StandardCheckpointer()
    ck.save(str(opt_path), legacy, force=True)
    ck.wait_until_finished()

    m2 = load_model_from_config(cfg)
    m2.load_model(str(d), restore_optimizer=True)
    fp8_a = m2.opt_state.inner_state[0]
    fp8_b = model.opt_state.inner_state[0]
    assert isinstance(fp8_a, AdamFp8State) and not hasattr(fp8_a, "treedef")
    assert int(fp8_a.count) == int(fp8_b.count) == 2
    for a, b in zip(jax.tree_util.tree_leaves(fp8_a), jax.tree_util.tree_leaves(fp8_b)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_incompatible_optimizer_checkpoint_warns_and_resumes_fresh(small_config, tmp_path):
    """A structurally incompatible optimizer/ checkpoint (e.g. saved under a
    different training.optimizer) must not crash --resume: params restore,
    the optimizer falls back to fresh init with a warning."""
    import jax

    from trustedai_cl_vae_ad_tpu.registry import load_model_from_config

    cfg_lean = dict(small_config)
    cfg_lean["training"] = dict(cfg_lean["training"], optimizer="adam_lean")
    model = load_model_from_config(cfg_lean)
    model.compile()
    x = np.random.RandomState(0).random((4, 64, 64, 3)).astype(np.float32)
    model.train_step(x)
    d = tmp_path / "ck"
    d.mkdir()
    model.save_model(str(d))

    cfg_fp8 = dict(small_config)
    cfg_fp8["training"] = dict(cfg_fp8["training"], optimizer="adam_fp8")
    m2 = load_model_from_config(cfg_fp8)
    m2.compile()
    with pytest.warns(UserWarning, match="fresh"):
        m2.load_model(str(d), restore_optimizer=True)
    # params restored, optimizer fresh
    for a, b in zip(jax.tree_util.tree_leaves(model.params),
                    jax.tree_util.tree_leaves(m2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(m2.opt_state.inner_state[0].count) == 0


def test_optimizer_restore_io_error_propagates():
    """Only STRUCTURE mismatches may fall back to a fresh optimizer; an I/O
    error on a perfectly compatible checkpoint must propagate so the user can
    retry instead of silently resuming with zeroed Adam moments."""
    from trustedai_cl_vae_ad_tpu.train.checkpoint import (
        _restore_optimizer_with_fallback,
    )

    class IOErrorCk:
        def restore(self, path, like):
            raise OSError("read failed: connection reset by peer")

    with pytest.raises(OSError):
        _restore_optimizer_with_fallback(IOErrorCk(), "/x/optimizer", {"count": 0})

    class MismatchCk:
        def restore(self, path, like):
            raise ValueError(
                "Tree structures do not match: treedef: Source: MISSING")

    with pytest.warns(UserWarning, match="fresh"):
        out = _restore_optimizer_with_fallback(
            MismatchCk(), "/x/optimizer", {"count": 0})
    assert out is None


def test_structure_mismatch_excludes_corruption():
    """Corrupt-payload errors ('checksum mismatch', 'CRC-32C mismatch') must
    NOT classify as structure mismatches — papering over them with a fresh
    optimizer would silently zero Adam moments on a compatible checkpoint."""
    from trustedai_cl_vae_ad_tpu.train.checkpoint import _is_structure_mismatch

    assert _is_structure_mismatch(
        ValueError("Tree structures do not match: treedef: Source: MISSING"))
    assert _is_structure_mismatch(
        ValueError("user-provided restore item ... does not match the current"))
    assert not _is_structure_mismatch(ValueError("checksum mismatch on shard 3"))
    assert not _is_structure_mismatch(OSError("CRC-32C mismatch reading array"))
    assert not _is_structure_mismatch(OSError("read failed: connection reset"))


def test_async_saver_roundtrip_with_donated_buffers(tmp_path):
    """AsyncSaver: the disk write is backgrounded, but the device->host copy
    happens inside save() — deleting the device buffers the moment save()
    returns (exactly what the donating train step does on the next batch)
    must not corrupt the checkpoint. Commit callbacks run at wait(), never
    before, and only once."""
    import jax.numpy as jnp

    from trustedai_cl_vae_ad_tpu.train.checkpoint import (
        AsyncSaver, restore_checkpoint)

    params = {
        "encoder": {"w": jnp.arange(4096, dtype=jnp.float32).reshape(64, 64)},
        "decoder": {"w": jnp.full((32, 32), 7.0, jnp.bfloat16)},
    }
    expected_enc = np.asarray(params["encoder"]["w"])
    expected_dec = np.asarray(params["decoder"]["w"], dtype=np.float32)

    saver = AsyncSaver()
    commits = []
    try:
        saver.save(str(tmp_path), params)
        saver.add_commit_callback(lambda: commits.append("round1"))
        # simulate donation: the caller's device buffers die immediately
        params["encoder"]["w"].delete()
        params["decoder"]["w"].delete()
        assert commits == []  # sidecar must not land before the weights
        saver.wait()
        assert commits == ["round1"]
        saver.wait()
        assert commits == ["round1"]  # callbacks fire exactly once
    finally:
        saver.close()

    like = {"encoder": {"w": np.zeros((64, 64), np.float32)},
            "decoder": {"w": np.zeros((32, 32), jnp.bfloat16)}}
    restored, _ = restore_checkpoint(str(tmp_path), like)
    np.testing.assert_array_equal(np.asarray(restored["encoder"]["w"]), expected_enc)
    np.testing.assert_array_equal(
        np.asarray(restored["decoder"]["w"], dtype=np.float32), expected_dec)


def test_async_saver_second_save_waits_out_the_first(tmp_path):
    """A second save() round drains the first (orbax forbids overlapping
    saves per checkpointer) and commits its callbacks before starting."""
    import jax.numpy as jnp

    from trustedai_cl_vae_ad_tpu.train.checkpoint import (
        AsyncSaver, restore_checkpoint)

    saver = AsyncSaver()
    order = []
    try:
        p1 = {"encoder": {"w": jnp.zeros((8, 8))}, "decoder": {"w": jnp.zeros((8, 8))}}
        saver.save(str(tmp_path), p1)
        saver.add_commit_callback(lambda: order.append("commit1"))
        p2 = {"encoder": {"w": jnp.ones((8, 8))}, "decoder": {"w": jnp.ones((8, 8))}}
        saver.save(str(tmp_path), p2)  # must commit round 1 first
        assert order == ["commit1"]
        saver.add_commit_callback(lambda: order.append("commit2"))
    finally:
        saver.close()
    assert order == ["commit1", "commit2"]
    like = {"encoder": {"w": np.zeros((8, 8), np.float32)},
            "decoder": {"w": np.zeros((8, 8), np.float32)}}
    restored, _ = restore_checkpoint(str(tmp_path), like)
    np.testing.assert_array_equal(np.asarray(restored["encoder"]["w"]), 1.0)
