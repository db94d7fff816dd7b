"""Multi-device sharding: dp train step equivalence, tp placement, dryrun."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def setup():
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from trustedai_cl_vae_ad_tpu.models import KurtosisGlobalCVAE, make_optimizer

    config = {
        "data": {"image_size": [16, 16, 3]},
        "loss": {"kurtosis": 1.8, "w_kl_divergence": 0.0, "w_kurtosis": 1e-4, "w_mse": 1.0,
                 "w_skew": 0.0, "w_z_l1_reg": 1e-3},
        "model": {"decoder_dense_filters": 4, "latent_dimensions": 8, "layers": [4]},
        "training": {"batch_size": 16, "beta": 1e-6, "learning_rate": 1e-3, "max_epochs": 1},
    }
    core = KurtosisGlobalCVAE(config)
    params = core.init(jax.random.PRNGKey(0))
    return core, params, make_optimizer(1e-3)


def test_dp_matches_single_device(setup):
    """One data-parallel step over 8 devices == the same step on one device.

    Note: eps noise must be identical, so training=False in the loss for this
    equivalence check (the rng path is exercised elsewhere)."""
    import jax
    import jax.numpy as jnp
    import optax

    from trustedai_cl_vae_ad_tpu.parallel.mesh import make_mesh, replicate, shard_batch

    core, params, optimizer = setup
    x = np.random.RandomState(0).random((16, 16, 16, 3)).astype(np.float32)

    def loss_fn(p, xx):
        return core.compute_loss(p, xx, training=False)["loss"]

    def step(p, o, xx):
        g = jax.grad(loss_fn)(p, xx)
        u, o = optimizer.update(g, o, p)
        return optax.apply_updates(p, u), o

    # single device
    p1, _ = jax.jit(step)(params, optimizer.init(params), jnp.asarray(x))

    # 8-device dp
    mesh = make_mesh()
    pd = replicate(params, mesh)
    od = replicate(optimizer.init(params), mesh)
    xd = shard_batch(x, mesh)
    p2, _ = jax.jit(step)(pd, od, xd)

    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_tp_param_placement(setup):
    import jax
    from jax.sharding import PartitionSpec as P

    from trustedai_cl_vae_ad_tpu.parallel.mesh import make_mesh
    from trustedai_cl_vae_ad_tpu.parallel.tp import param_shardings

    core, params, _ = setup
    mesh = make_mesh(n_data=4, n_model=2)
    sh = param_shardings(params, mesh)
    flat = dict(
        ("/".join(str(getattr(p, "key", p)) for p in path), s)
        for path, s in jax.tree_util.tree_flatten_with_path(sh)[0]
    )
    # small model: all kernels < 1M params -> everything replicated
    assert all(s.spec == P() for s in flat.values())

    # flagship-size dense kernel gets model-axis sharding
    import jax.numpy as jnp

    big = {"encoder": {"Dense_0": {"kernel": jnp.zeros((4096, 512)), "bias": jnp.zeros(512)}}}
    sh2 = param_shardings(big, mesh)
    assert sh2["encoder"]["Dense_0"]["kernel"].spec == P(None, "model")
    assert sh2["encoder"]["Dense_0"]["bias"].spec == P()


def test_tp_step_runs_and_matches(setup):
    """dp x tp sharded step == single-device step (eval-mode loss)."""
    import jax
    import jax.numpy as jnp
    import optax

    from trustedai_cl_vae_ad_tpu.parallel.mesh import make_mesh, shard_batch
    from trustedai_cl_vae_ad_tpu.parallel.tp import place_params

    core, params, optimizer = setup
    x = np.random.RandomState(1).random((8, 16, 16, 3)).astype(np.float32)

    def loss_fn(p, xx):
        return core.compute_loss(p, xx, training=False)["loss"]

    def step(p, o, xx):
        g = jax.grad(loss_fn)(p, xx)
        u, o = optimizer.update(g, o, p)
        return optax.apply_updates(p, u), o

    p_ref, _ = jax.jit(step)(params, optimizer.init(params), jnp.asarray(x))

    mesh = make_mesh(n_data=4, n_model=2)
    pd = place_params(params, mesh)
    od = optimizer.init(pd)
    xd = shard_batch(x, mesh)
    p_tp, _ = jax.jit(step)(pd, od, xd)
    for a, b in zip(jax.tree_util.tree_leaves(p_ref), jax.tree_util.tree_leaves(p_tp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_graft_dryrun_smoke():
    import subprocess
    import sys

    import os

    repo_root = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    result = subprocess.run(
        [sys.executable, os.path.join(repo_root, "__graft_entry__.py")],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=repo_root,
    )
    assert result.returncode == 0, result.stderr[-500:]
    assert "dryrun_multichip ok" in result.stdout

def test_place_on_mesh_preserves_state(setup):
    """Resume-then-parallel: moving a compiled model onto a mesh keeps its
    params and Adam moments bit-identical (train.py --resume + dp)."""
    import jax
    import numpy as np

    from trustedai_cl_vae_ad_tpu.models import VAEModel
    from trustedai_cl_vae_ad_tpu.parallel.mesh import make_mesh

    core, _, _ = setup
    model = VAEModel(core)
    model.compile()
    x = np.random.RandomState(0).random((8, 16, 16, 3)).astype(np.float32)
    model.train_step(x)
    params_before = jax.device_get(model.params)
    mu_before = jax.device_get(model.opt_state.inner_state[0].mu)

    model.place_on_mesh(make_mesh())
    for a, b in zip(jax.tree_util.tree_leaves(params_before),
                    jax.tree_util.tree_leaves(jax.device_get(model.params))):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(jax.tree_util.tree_leaves(mu_before),
                    jax.tree_util.tree_leaves(jax.device_get(model.opt_state.inner_state[0].mu))):
        np.testing.assert_array_equal(a, b)
    # and training continues on the mesh
    loss = model.train_step(x)
    assert np.isfinite(float(loss["loss"]))


def test_zero1_matches_replicated(setup):
    """ZeRO-1 sharded optimizer state must produce the same trained params as
    the replicated-state dp step (GSPMD only changes placement/collectives,
    not math)."""
    import jax
    import jax.numpy as jnp
    import optax

    from trustedai_cl_vae_ad_tpu.parallel.dp import build_train_step
    from trustedai_cl_vae_ad_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from trustedai_cl_vae_ad_tpu.parallel.zero import place_zero1, zero1_shardings

    core, _, optimizer = setup
    # fresh params: replicate() aliases source buffers, and the donating
    # steps below would delete the module-scoped fixture tree
    params = core.init(jax.random.PRNGKey(21))
    mesh = make_mesh()  # all 8 devices on 'data'
    x = np.random.RandomState(1).random((16, 16, 16, 3)).astype(np.float32)
    rng = jax.random.PRNGKey(7)

    # place BOTH variants up front (donation consumes the placed trees and,
    # via device_put aliasing, the host originals)
    p_rep = replicate(jax.tree_util.tree_map(jnp.copy, params), mesh)
    o_rep = replicate(optimizer.init(params), mesh)
    # ZeRO-1 sharded state: shard EVERY eligible leaf (min_elems=1 forces
    # even this tiny model's moments onto the data axis)
    p_z = replicate(jax.tree_util.tree_map(jnp.copy, params), mesh)
    o_z0 = optimizer.init(params)
    osh = zero1_shardings(o_z0, mesh, min_elems=1)
    o_z = jax.device_put(o_z0, osh)

    step_rep = build_train_step(core, optimizer, mesh)
    xd = shard_batch(x, mesh)
    p_rep, o_rep, loss_rep, _ = step_rep(p_rep, o_rep, xd, rng)
    # at least one moment leaf must actually be sharded for the test to mean
    # anything
    from jax.sharding import PartitionSpec as P

    specs = [s.spec for s in jax.tree_util.tree_leaves(
        osh, is_leaf=lambda s: hasattr(s, "spec"))]
    assert any(sp == P("data") for sp in specs)
    step_z = build_train_step(core, optimizer, mesh, opt_state_shardings=osh)
    xd2 = shard_batch(x, mesh)
    p_z, o_z, loss_z, _ = step_z(p_z, o_z, xd2, rng)

    np.testing.assert_allclose(float(loss_z["loss"]), float(loss_rep["loss"]),
                               rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p_rep), jax.tree_util.tree_leaves(p_z)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)
    # moments stayed sharded on the output side
    big = jax.tree_util.tree_leaves(o_z)
    assert any(
        getattr(l, "sharding", None) is not None
        and getattr(l.sharding, "spec", None) == P("data")
        for l in big if hasattr(l, "sharding")
    )


def test_vaemodel_zero1_compile(setup):
    """VAEModel.compile(mesh, zero1=True) trains with sharded moments."""
    import jax

    from trustedai_cl_vae_ad_tpu.models import KurtosisGlobalCVAE
    from trustedai_cl_vae_ad_tpu.models.wrapper import VAEModel
    from trustedai_cl_vae_ad_tpu.parallel.mesh import make_mesh

    core, _, _ = setup
    model = VAEModel(core)
    mesh = make_mesh()
    model.compile(mesh=mesh, zero1=True)
    x = np.random.RandomState(2).random((16, 16, 16, 3)).astype(np.float32)
    before = np.asarray(jax.tree_util.tree_leaves(model.params)[0]).copy()
    loss, _ = model.train_step_and_run(x)
    assert np.isfinite(float(loss["loss"]))
    after = np.asarray(jax.tree_util.tree_leaves(model.params)[0])
    assert not np.allclose(before, after)


def test_train_step_accepts_device_resident_batch(small_config):
    """A batch already on device (the ingest pipeline's DeviceStream) must
    train identically to a host numpy batch — and without a host round-trip
    (the reshard is device_put, not np.asarray)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from trustedai_cl_vae_ad_tpu.parallel.mesh import make_mesh
    from trustedai_cl_vae_ad_tpu.registry import load_model_from_config

    mesh = make_mesh()
    x_np = np.random.RandomState(0).random((8, 64, 64, 3)).astype(np.float32)

    losses = []
    for feed in (x_np, jnp.asarray(x_np)):
        cfg = dict(small_config)
        cfg["model"] = dict(cfg["model"], type="KurtosisGlobal")
        model = load_model_from_config(cfg)
        model.compile(mesh=mesh)
        losses.append(float(model.train_step(feed)["loss"]))
    assert losses[0] == losses[1]


def test_place_on_mesh_honors_zero1(setup):
    """Resume-into-dp with training.zero1: restored Adam moments land in the
    ZeRO-1 sharded layout, not silently replicated per chip."""
    import copy

    import jax
    from jax.sharding import PartitionSpec as P

    from trustedai_cl_vae_ad_tpu.models import KurtosisGlobalCVAE, VAEModel
    from trustedai_cl_vae_ad_tpu.parallel.mesh import DATA_AXIS, make_mesh

    core, _, _ = setup
    config = copy.deepcopy(core.config)
    config["training"]["zero1"] = True
    # latent 256 -> encoder dense kernel 256x512 = 131072 elems: above the
    # zero1 min_elems threshold (2^16), so its moments actually shard
    config["model"]["latent_dimensions"] = 256
    z_core = KurtosisGlobalCVAE(config)
    model = VAEModel(z_core)
    model.compile()  # single-device, as after a checkpoint restore
    x = np.random.RandomState(1).random((8, 16, 16, 3)).astype(np.float32)
    model.train_step(x)
    mu_before = jax.device_get(model.opt_state.inner_state[0].mu)

    model.place_on_mesh(make_mesh())
    # the big moment leaves carry the data-axis sharding...
    specs = {
        tuple(getattr(lf.sharding, "spec", P())) for lf in
        jax.tree_util.tree_leaves(model.opt_state.inner_state[0].mu)
        if lf.size >= 2**16
    }
    assert (DATA_AXIS,) in specs, specs
    # ...with values preserved bit-exactly
    for a, b in zip(jax.tree_util.tree_leaves(mu_before),
                    jax.tree_util.tree_leaves(jax.device_get(model.opt_state.inner_state[0].mu))):
        np.testing.assert_array_equal(a, b)
    loss = model.train_step(x)
    assert np.isfinite(float(loss["loss"]))


def test_zero1_composes_with_tp(setup):
    """dp x tp x zero1 on ONE mesh (the shipped multi-chip recipe): three
    composed train steps match the known-good replicated dp path, and the
    moments of a TP-sharded kernel actually carry P('data', 'model')."""
    import jax
    from jax.sharding import PartitionSpec as P

    from trustedai_cl_vae_ad_tpu.parallel.dp import (
        build_train_step,
        build_train_step_sharded,
    )
    from trustedai_cl_vae_ad_tpu.parallel.mesh import (
        make_mesh,
        replicate,
        shard_batch,
    )
    from trustedai_cl_vae_ad_tpu.parallel.tp import param_shardings
    from trustedai_cl_vae_ad_tpu.parallel.zero import zero1_shardings

    core, params, optimizer = setup
    rng = jax.random.PRNGKey(7)
    rs = np.random.RandomState(2)
    batches = [rs.random((16, 16, 16, 3)).astype(np.float32) for _ in range(3)]

    # reference: replicated dp over all 8 devices. replicate() may ALIAS the
    # source buffers and the step donates them (mesh.py footgun) — place from
    # a host copy so `params` survives for the composed run below.
    host_params = jax.tree_util.tree_map(np.asarray, params)
    ref_mesh = make_mesh()
    p_ref = replicate(host_params, ref_mesh)
    o_ref = replicate(optimizer.init(host_params), ref_mesh)
    ref_step = build_train_step(core, optimizer, ref_mesh)
    for x in batches:
        p_ref, o_ref, loss_ref, _ = ref_step(p_ref, o_ref, shard_batch(x, ref_mesh), rng)

    # composed: data=4 x model=2, TP-sharded kernels (min_params=1 so the
    # tiny test model's dense kernels shard), zero1 moments on the same mesh
    mesh = make_mesh(n_data=4, n_model=2)
    psh = param_shardings(params, mesh, min_params=1)
    p_c = jax.device_put(host_params, psh)
    o_c0 = optimizer.init(p_c)  # moments inherit the TP placements
    osh = zero1_shardings(o_c0, mesh, min_elems=1)
    o_c = jax.device_put(o_c0, osh)

    # the composed layout really is composed: a TP-sharded kernel's moment
    # leaf is sharded over BOTH axes
    flat_p = dict(
        ("/".join(str(getattr(k, "key", k)) for k in path), s)
        for path, s in jax.tree_util.tree_flatten_with_path(psh)[0]
    )
    tp_kernels = [k for k, s in flat_p.items() if s.spec == P(None, "model")]
    assert tp_kernels, "no TP-sharded kernel in the test model"
    flat_o = dict(
        ("/".join(str(getattr(k, "key", k)) for k in path), s)
        for path, s in jax.tree_util.tree_flatten_with_path(osh)[0]
    )
    composed = [k for k, s in flat_o.items()
                if tuple(s.spec) == ("data", "model")]
    assert composed, f"no P('data','model') moment leaf: {set(map(str, {tuple(s.spec) for s in flat_o.values()}))}"

    step = build_train_step_sharded(core, optimizer, mesh, psh, osh)
    for x in batches:
        p_c, o_c, loss_c, _ = step(p_c, o_c, shard_batch(x, mesh), rng)

    np.testing.assert_allclose(float(loss_c["loss"]), float(loss_ref["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                    jax.tree_util.tree_leaves(p_c)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    # layout is stable across steps (outputs pinned to the same shardings)
    for path, s in jax.tree_util.tree_flatten_with_path(
            jax.tree_util.tree_map(lambda l: l.sharding, o_c))[0]:
        key = "/".join(str(getattr(k, "key", k)) for k in path)
        assert tuple(s.spec) == tuple(flat_o[key].spec), key
