"""Native C++ frame loader: build, decode correctness, batch API."""

import os

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def native_mod():
    from trustedai_cl_vae_ad_tpu.data import native

    if not native.available():
        pytest.skip("native frame loader not buildable in this environment")
    return native


def test_single_decode_matches_pil(native_mod, tmp_path):
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (33, 47, 3), np.uint8)
    p = tmp_path / "x.png"
    Image.fromarray(img).save(p)
    got = native_mod.decode_png(str(p))
    np.testing.assert_array_equal(got, img)


def test_rgba_and_gray(native_mod, tmp_path):
    rng = np.random.RandomState(1)
    rgba = rng.randint(0, 255, (16, 20, 4), np.uint8)
    p1 = tmp_path / "rgba.png"
    Image.fromarray(rgba, "RGBA").save(p1)
    got = native_mod.decode_png(str(p1))
    np.testing.assert_array_equal(got, rgba[..., :3])

    gray = rng.randint(0, 255, (16, 20), np.uint8)
    p2 = tmp_path / "gray.png"
    Image.fromarray(gray, "L").save(p2)
    got = native_mod.decode_png(str(p2))
    np.testing.assert_array_equal(got, np.stack([gray] * 3, axis=-1))


def test_batch_decode(native_mod, tmp_path):
    rng = np.random.RandomState(2)
    paths = []
    imgs = []
    for i in range(6):
        img = rng.randint(0, 255, (24, 32, 3), np.uint8)
        p = tmp_path / f"{i}.png"
        Image.fromarray(img).save(p)
        paths.append(str(p))
        imgs.append(img)
    paths.append(str(tmp_path / "missing.png"))  # decode failure slot
    out, ok = native_mod.decode_batch(paths, (24, 32))
    assert out.shape == (7, 24, 32, 3)
    assert ok[:6].all() and not ok[6]
    for i in range(6):
        np.testing.assert_array_equal(out[i], imgs[i])
    assert (out[6] == 0).all()


def test_decode_chain_uses_native_or_cv2(tmp_path):
    from trustedai_cl_vae_ad_tpu.data.pipeline import decode_image_rgb

    img = np.random.RandomState(3).randint(0, 255, (8, 8, 3), np.uint8)
    p = tmp_path / "c.png"
    Image.fromarray(img).save(p)
    got = decode_image_rgb(str(p))
    np.testing.assert_array_equal(got, img)
    assert decode_image_rgb(str(tmp_path / "nope.png")) is None
