"""Offline anomaly pipeline + CDF threshold object tests."""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_model():
    from trustedai_cl_vae_ad_tpu.registry import load_model_from_config

    config = {
        "data": {"dataset": "synthetic", "image_size": [16, 16, 3], "n_train": 16, "n_val": 8},
        "loss": {"kurtosis": 1.8, "w_kl_divergence": 0.0, "w_kurtosis": 1e-4, "w_mse": 1.0,
                 "w_skew": 0.0, "w_z_l1_reg": 0.0},
        "model": {"type": "KurtosisSingle", "decoder_dense_filters": 4,
                  "latent_dimensions": 8, "layers": [4]},
        "training": {"batch_size": 8, "beta": 1e-6, "learning_rate": 1e-3, "max_epochs": 1},
    }
    return load_model_from_config(config), config


def test_two_pass_scoring(tiny_model):
    from trustedai_cl_vae_ad_tpu.anomaly.offline import evaluate_anomalies, get_data_scale
    from trustedai_cl_vae_ad_tpu.data.loader import load_data

    model, config = tiny_model
    data = load_data(config)
    scale = get_data_scale(model, config, data)
    assert scale["sigma"] >= 0 and scale["max"] >= scale["min"]
    assert scale["z_scores"].shape == (16,)
    # z-scores of the reference distribution are standardized
    np.testing.assert_allclose(np.mean(scale["z_scores"]), 0.0, atol=1e-5)

    results = evaluate_anomalies(model, config, data, scale, anomaly_threshold=3.0)
    assert results["z_scores"].shape == (16,)
    assert results["rec"].shape == (16, 16, 16, 3)
    assert results["norm_errs"].shape == (16, 16, 16)
    assert results["anomalies"].dtype == bool
    # same data as reference distribution -> roughly matching z-scores
    np.testing.assert_allclose(
        np.sort(results["z_scores"]), np.sort(scale["z_scores"]), atol=1e-3
    )


def test_two_pass_scoring_uint8_matches_normalized_float(tiny_model):
    """The scoring passes honor the uint8 contract (raw 0-255 pixels): a
    uint8 batch source produces the same mu/sigma/z as its f32/255 twin —
    it used to cast uint8 straight to f32 and diff raw 0-255 pixels against
    [0,1] reconstructions (review r4)."""
    from trustedai_cl_vae_ad_tpu.anomaly.offline import evaluate_anomalies, get_data_scale

    model, config = tiny_model
    rng = np.random.RandomState(7)
    u8 = rng.randint(0, 256, (8, 16, 16, 3)).astype(np.uint8)
    d_u8 = {"train": [u8], "val": [u8]}
    d_f32 = {"train": [u8.astype(np.float32) / 255.0],
             "val": [u8.astype(np.float32) / 255.0]}
    s_u8 = get_data_scale(model, config, d_u8)
    s_f32 = get_data_scale(model, config, d_f32)
    for k in ("meu", "sigma", "min", "max"):
        np.testing.assert_allclose(s_u8[k], s_f32[k], rtol=1e-5, err_msg=k)
    r_u8 = evaluate_anomalies(model, config, d_u8, s_f32, 3.0, keep_maps=False)
    r_f32 = evaluate_anomalies(model, config, d_f32, s_f32, 3.0, keep_maps=False)
    np.testing.assert_allclose(r_u8["z_scores"], r_f32["z_scores"], atol=1e-4)


def test_two_pass_scoring_quantized(tiny_model):
    """--quantize runs both passes on the int8-dense forward; decisions and
    the z-score distribution track the float pipeline (ops/quant.py)."""
    from unittest import mock

    from trustedai_cl_vae_ad_tpu.anomaly.offline import evaluate_anomalies, get_data_scale
    from trustedai_cl_vae_ad_tpu.data.loader import load_data
    from trustedai_cl_vae_ad_tpu.ops import quant

    model, config = tiny_model
    data = load_data(config)
    scale_f = get_data_scale(model, config, data)
    res_f = evaluate_anomalies(model, config, data, scale_f, 3.0, keep_maps=False)
    with mock.patch.object(quant, "DEFAULT_MIN_ELEMS", 0):
        scale_q = get_data_scale(model, config, data, quantize=True)
        res_q = evaluate_anomalies(model, config, data, scale_q, 3.0,
                                   keep_maps=False, quantize=True)
    # reference distribution barely moves under quantization...
    np.testing.assert_allclose(scale_q["meu"], scale_f["meu"], rtol=0.02)
    # ...and per-frame decisions match (same data as the reference set, so
    # everything is well under the z=3 threshold in both pipelines)
    np.testing.assert_array_equal(res_q["anomalies"], res_f["anomalies"])
    np.testing.assert_allclose(res_q["z_scores"], res_f["z_scores"], atol=0.25)


def test_output_artifacts(tiny_model, tmp_path):
    from trustedai_cl_vae_ad_tpu.anomaly.offline import (
        evaluate_anomalies,
        get_data_scale,
        output_anomalies,
    )
    from trustedai_cl_vae_ad_tpu.data.loader import load_data

    model, config = tiny_model
    data = load_data(config)
    scale = get_data_scale(model, config, data)
    results = evaluate_anomalies(model, config, data, scale, 3.0)
    out = tmp_path / "anomaly_out"
    out.mkdir()
    output_anomalies(data, results, scale, str(out), 3.0)
    assert (out / "anomaly_fig.png").exists()
    assert (out / "anomaly_list.csv").exists()
    for sub in ("err", "heatmap", "overlay", "rec", "orig"):
        files = list((out / sub).glob("*.png"))
        assert len(files) == 16, f"{sub}: {len(files)}"
    rows = (out / "anomaly_list.csv").read_text().strip().splitlines()
    assert rows[0] == "orig_filepath,z_score"
    assert len(rows) == 17
    # sorted descending by z-score
    zs = [float(r.split(",")[1]) for r in rows[1:]]
    assert zs == sorted(zs, reverse=True)


def test_streamed_artifacts_match_accumulated(tiny_model, tmp_path):
    """artifact_path mode (O(batch) host memory) must produce the same
    artifact set and CSV ordering as the legacy accumulate-everything path."""
    import csv

    from trustedai_cl_vae_ad_tpu.anomaly.offline import (
        evaluate_anomalies,
        get_data_scale,
        output_anomalies,
    )
    from trustedai_cl_vae_ad_tpu.data.loader import load_data

    model, config = tiny_model
    data = load_data(config)
    scale = get_data_scale(model, config, data)

    out_s = tmp_path / "streamed"
    out_s.mkdir()
    results_s = evaluate_anomalies(
        model, config, data, scale, 3.0, keep_maps=False, artifact_path=str(out_s)
    )
    assert "rec" not in results_s  # no whole-set maps held in RAM
    assert len(results_s["orig_paths"]) == 16
    output_anomalies(data, results_s, scale, str(out_s), 3.0)

    out_a = tmp_path / "accumulated"
    out_a.mkdir()
    results_a = evaluate_anomalies(model, config, data, scale, 3.0)
    output_anomalies(data, results_a, scale, str(out_a), 3.0)

    for sub in ("err", "heatmap", "overlay", "rec", "orig"):
        fs = sorted(p.name for p in (out_s / sub).glob("*.png"))
        fa = sorted(p.name for p in (out_a / sub).glob("*.png"))
        assert fs == fa and len(fs) == 16
        for name in fs:  # byte-identical artifact PNGs
            assert (out_s / sub / name).read_bytes() == (out_a / sub / name).read_bytes()

    def rows(p):
        with open(p / "anomaly_list.csv") as f:
            return [(r[0].split("/")[-1], float(r[1])) for r in list(csv.reader(f))[1:]]

    assert rows(out_s) == rows(out_a)


def test_histogram_only(tiny_model, tmp_path):
    from trustedai_cl_vae_ad_tpu.anomaly.offline import (
        evaluate_anomalies,
        get_data_scale,
        output_anomalies,
    )
    from trustedai_cl_vae_ad_tpu.data.loader import load_data

    model, config = tiny_model
    data = load_data(config)
    scale = get_data_scale(model, config, data)
    results = evaluate_anomalies(model, config, data, scale, 3.0, keep_maps=False)
    out = tmp_path / "hist_only"
    out.mkdir()
    output_anomalies(data, results, scale, str(out), 3.0, histogram_only=True)
    assert (out / "anomaly_fig.png").exists()
    assert not (out / "err").exists()


def test_cdf_object_matches_distribution():
    from trustedai_cl_vae_ad_tpu.anomaly.cdf import CDFObject

    rng = np.random.RandomState(0)
    x = rng.gamma(shape=2.0, scale=0.25, size=10000)
    cdf = CDFObject(x)
    # P(X <= median) ~ 0.5 (up to one histogram-bin of mass)
    med = float(np.median(x))
    assert abs(cdf.get_prob_by_value(med) - 0.5) < 0.06
    # quantile roundtrip
    v95 = cdf.get_value_by_prob(0.95)
    assert abs(np.mean(x <= v95) - 0.95) < 0.03
    # vectorized lookups
    ps = cdf.get_prob_by_value(np.array([med, med * 2]))
    assert ps.shape == (2,) and ps[1] > ps[0]
    # reset with new data
    cdf.reset(rng.normal(size=5000))
    assert abs(cdf.get_prob_by_value(0.0) - 0.5) < 0.06


def test_bst_prob_parity():
    from trustedai_cl_vae_ad_tpu.anomaly.cdf import BSTProb, CDFObject

    rng = np.random.RandomState(1)
    x = rng.normal(size=500)
    cdf = CDFObject(x, bins=32)
    bst = BSTProb(cdf.bin_edges[1:], cdf.cdf)
    for q in (-1.0, 0.0, 0.5, 1.5):
        tree_p = bst[q]
        fast_p = cdf.get_prob_by_value(q)
        assert abs(tree_p - fast_p) < 0.08, (q, tree_p, fast_p)


def test_bst_prob_duplicates_and_custom_match():
    """Array-backed tree edge cases: duplicate values collapse to one leaf;
    a custom match_fun (strict <) is honored at build and query time."""
    from trustedai_cl_vae_ad_tpu.anomaly.cdf import BSTProb

    # duplicates: every query lands on a well-defined leaf
    x = np.array([1.0, 1.0, 1.0, 2.0, 2.0, 5.0])
    p = np.array([0.1, 0.1, 0.1, 0.4, 0.4, 1.0])
    bst = BSTProb(x, p)
    assert bst[0.0] == 0.1 and bst[1.5] == 0.4 and bst[10.0] == 1.0
    # single element degenerates to a one-leaf tree
    assert BSTProb([3.0], [0.7])[999.0] == 0.7
    # custom match_fun: strict less-than flips which side boundary queries take
    bst_lt = BSTProb(x, p, match_fun=lambda a, b: a < b)
    assert isinstance(bst_lt[2.0], float)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        BSTProb([], [])


def test_bst_prob_one_ulp_apart_terminates():
    """np.mean of values one ULP apart can round ONTO the larger value
    (round-to-even), sending the whole subset left forever — the degenerate
    split must collapse to a leaf instead of hanging reset()."""
    from trustedai_cl_vae_ad_tpu.anomaly.cdf import BSTProb

    a, b = 1.0 + 2.0**-52, 1.0 + 2.0**-51
    assert np.mean([a, b]) == b  # the pathological rounding this guards
    bst = BSTProb([a, b], [0.1, 0.9])
    assert bst[0.0] == 0.1
    assert isinstance(bst[2.0], float)


def test_dump_frame_single_channel(tmp_path):
    """(H, W, 1) rec/orig frames (single-channel models) must write all 5
    artifact PNGs — a hard-coded PIL mode=\"RGB\" crashed here."""
    from trustedai_cl_vae_ad_tpu.anomaly.offline import _artifact_dirs, _dump_frame

    dirs = _artifact_dirs(str(tmp_path))
    rng = np.random.RandomState(0)
    x = rng.rand(8, 8, 1).astype(np.float32)
    rec = rng.rand(8, 8, 1).astype(np.float32)
    norm_err = rng.rand(8, 8).astype(np.float32)
    orig_path = _dump_frame(dirs, 0, x, rec, norm_err)
    assert os.path.exists(orig_path)
    for name, d in dirs.items():
        assert os.listdir(d), f"missing artifact in {name}/"


def test_capped_auto_bins_heavy_tail():
    """'auto' bins on heavy-tailed z-scores (range ~1e9, bulk IQR ~1) must
    stay bounded instead of asking numpy for billions of bins."""
    from trustedai_cl_vae_ad_tpu.viz.plots import _capped_auto_bins

    rng = np.random.RandomState(0)
    z = np.concatenate([rng.normal(size=2000), [1e9]])
    assert _capped_auto_bins(z) == 4096
    # well-behaved data keeps the numpy estimate (well under the cap)
    assert 10 <= _capped_auto_bins(rng.normal(size=2000)) < 200
    assert _capped_auto_bins(np.array([1.0])) == 10
    assert _capped_auto_bins(np.array([np.nan, np.inf])) == 10


def test_sharded_scoring_matches_single_device(tiny_model):
    """mesh-sharded two-pass scoring == single-device scoring (ragged last
    batch included: padded rows must be dropped from z/maps pairing)."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from trustedai_cl_vae_ad_tpu.anomaly.offline import evaluate_anomalies, get_data_scale
    from trustedai_cl_vae_ad_tpu.data.loader import load_data
    from trustedai_cl_vae_ad_tpu.parallel.mesh import make_mesh

    model, config = tiny_model
    cfg = dict(config)
    # 14 % 8 != 0 -> the final (only) batch is ragged on the 8-device mesh
    cfg["data"] = dict(cfg["data"], n_train=14)
    cfg["training"] = dict(cfg["training"], batch_size=14)
    data = load_data(cfg)
    mesh = make_mesh()

    scale_ref = get_data_scale(model, cfg, data)
    scale_sh = get_data_scale(model, cfg, data, mesh=mesh)
    for k in ("meu", "sigma", "min", "max"):
        np.testing.assert_allclose(scale_sh[k], scale_ref[k], rtol=1e-5)
    np.testing.assert_allclose(scale_sh["z_scores"], scale_ref["z_scores"],
                               rtol=1e-4, atol=1e-5)

    res_ref = evaluate_anomalies(model, cfg, data, scale_ref, 3.0)
    res_sh = evaluate_anomalies(model, cfg, data, scale_ref, 3.0, mesh=mesh)
    assert res_sh["z_scores"].shape == res_ref["z_scores"].shape == (14,)
    np.testing.assert_allclose(res_sh["z_scores"], res_ref["z_scores"],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(res_sh["norm_errs"], res_ref["norm_errs"],
                               rtol=1e-4, atol=1e-5)


def test_cdf_below_distribution_floor():
    """P(X <= x) for x below the data minimum is 0, not the first bin's mass
    (a far-below-distribution score must not be credited probability)."""
    from trustedai_cl_vae_ad_tpu.anomaly.cdf import CDFObject

    cdf = CDFObject(np.linspace(10.0, 11.0, 200))
    assert cdf.get_prob_by_value(0.0) == 0.0
    assert cdf.get_prob_by_value(9.999) == 0.0
    assert cdf.get_prob_by_value(11.5) == 1.0
    arr = cdf.get_prob_by_value(np.array([0.0, 10.5, 12.0]))
    assert arr[0] == 0.0 and 0.3 < arr[1] < 0.7 and arr[2] == 1.0


def test_degenerate_scale_yields_finite_z(tiny_model):
    """sigma=0 / flat error maps (single-frame reference set) must not
    produce NaN z-scores that read as 'no anomalies'."""
    from trustedai_cl_vae_ad_tpu.anomaly.offline import evaluate_anomalies
    from trustedai_cl_vae_ad_tpu.data.loader import load_data

    model, config = tiny_model
    data = load_data(config)
    scale = {"meu": 5.0, "sigma": 0.0, "min": 2.0, "max": 2.0, "z_scores": np.zeros(1)}
    res = evaluate_anomalies(model, config, data, scale, 3.0, keep_maps=True)
    assert np.isfinite(res["z_scores"]).all()
    assert np.isfinite(res["norm_errs"]).all()


def test_normal_ppf_accuracy():
    from trustedai_cl_vae_ad_tpu.anomaly.cdf import normal_ppf

    # round-trip against the error function (no scipy dependency): check
    # known standard-normal quantiles
    known = {0.5: 0.0, 0.9: 1.2815515655, 0.975: 1.9599639845,
             0.995: 2.5758293035, 0.0228: -1.9990772150}
    for p, z in known.items():
        assert abs(normal_ppf(p) - z) < 1e-6, p


def test_threshold_from_cdf_robust_to_contamination():
    """A handful of huge anomaly scores in the history must NOT drag the
    robust threshold up (the raw empirical quantile IS those scores)."""
    import numpy as np

    from trustedai_cl_vae_ad_tpu.anomaly.cdf import CDFObject, threshold_from_cdf

    rng = np.random.RandomState(0)
    clean = rng.normal(0.0, 1.0, 1000)
    contaminated = np.concatenate([clean, np.full(8, 50.0)])  # 8 anomalies
    thr_clean = threshold_from_cdf(CDFObject(clean), 0.995)
    thr_cont = threshold_from_cdf(CDFObject(contaminated), 0.995)
    # robust: both near z(0.995)=2.58 (histogram-bin slack)
    assert 2.0 < thr_clean < 3.6, thr_clean
    assert abs(thr_cont - thr_clean) < 0.7, (thr_clean, thr_cont)
    # the raw quantile collapses onto the contamination
    raw = threshold_from_cdf(CDFObject(contaminated), 0.995, robust=False)
    assert raw > 10.0, raw


def test_threshold_from_cdf_extreme_quantiles():
    """quantile >= 1.0 was valid before the robust default (raw empirical
    quantile clamps to the top bin); the robust path must clamp instead of
    asserting inside normal_ppf and killing the stream loop."""
    import numpy as np

    from trustedai_cl_vae_ad_tpu.anomaly.cdf import CDFObject, threshold_from_cdf

    cdf = CDFObject(np.random.RandomState(0).normal(0, 1, 500))
    thr = threshold_from_cdf(cdf, 1.0, robust=True)
    assert np.isfinite(thr) and thr > threshold_from_cdf(cdf, 0.9, robust=True)
    assert np.isfinite(threshold_from_cdf(cdf, 0.0, robust=True))


def test_bst_prob_nan_prob_is_a_valid_leaf():
    """A leaf whose stored prob is legitimately NaN (empty histogram bins,
    0/0 normalizations) must return NaN like the reference's dict tree did —
    leafness is an explicit flag, not a NaN-in-prob sentinel."""
    from trustedai_cl_vae_ad_tpu.anomaly.cdf import BSTProb

    bst = BSTProb([1.0, 2.0, 3.0], [0.1, np.nan, 0.9])
    assert np.isnan(bst[2.0])
    assert bst[1.0] == 0.1 and bst[3.0] == 0.9
