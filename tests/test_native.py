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


def test_palette_and_gray_alpha(native_mod, tmp_path):
    """Color types 3 (palette) and 4 (gray+alpha) — the two PLTE/LA branches
    of the C++ expander (frame_loader.cpp color_type switch) that the
    RGB/RGBA/gray tests never reach."""
    rng = np.random.RandomState(3)
    rgb = rng.randint(0, 255, (21, 17, 3), np.uint8)
    pal_img = Image.fromarray(rgb).convert("P", palette=Image.ADAPTIVE, colors=64)
    p1 = tmp_path / "pal.png"
    pal_img.save(p1)
    got = native_mod.decode_png(str(p1))
    np.testing.assert_array_equal(got, np.asarray(pal_img.convert("RGB")))

    la = rng.randint(0, 255, (21, 17, 2), np.uint8)
    p2 = tmp_path / "la.png"
    Image.fromarray(la, "LA").save(p2)
    got = native_mod.decode_png(str(p2))
    np.testing.assert_array_equal(got, np.stack([la[..., 0]] * 3, axis=-1))


def test_all_scanline_filters_roundtrip(native_mod, tmp_path):
    """Force every PNG scanline filter (0-4) through the unfilter loop: PIL's
    adaptive encoder rarely emits Average/Paeth on noise images, so re-encode
    a gradient image (filters 2-4 win there) AND hand-build a zlib stream with
    one fixed filter per row."""
    import struct
    import zlib

    # gradient: PIL's heuristic picks Up/Average/Paeth on smooth content
    y, x = np.mgrid[0:40, 0:40]
    img = np.stack([(y * 3) % 256, (x * 5) % 256, ((x + y) * 2) % 256],
                   axis=-1).astype(np.uint8)
    p = tmp_path / "grad.png"
    Image.fromarray(img).save(p)
    np.testing.assert_array_equal(native_mod.decode_png(str(p)), img)

    # explicit per-row filters 0..4 over known RGB content
    h, w = 5, 7
    rows = (np.arange(h * w * 3, dtype=np.uint32) * 37 % 256).astype(np.uint8)
    ref = rows.reshape(h, w, 3)

    def _paeth(a, b, c):
        pp = int(a) + int(b) - int(c)
        pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    raw = bytearray()
    prev = np.zeros(w * 3, np.uint8)
    for r in range(h):
        line = ref[r].reshape(-1)
        f = r % 5
        raw.append(f)
        enc = np.zeros(w * 3, np.uint8)
        for i in range(w * 3):
            left = int(line[i - 3]) if i >= 3 else 0
            up = int(prev[i])
            ul = int(prev[i - 3]) if i >= 3 else 0
            if f == 0:
                enc[i] = line[i]
            elif f == 1:
                enc[i] = (int(line[i]) - left) % 256
            elif f == 2:
                enc[i] = (int(line[i]) - up) % 256
            elif f == 3:
                enc[i] = (int(line[i]) - (left + up) // 2) % 256
            else:
                enc[i] = (int(line[i]) - _paeth(left, up, ul)) % 256
        raw.extend(enc.tobytes())
        prev = line
    def _chunk(ctype, body):
        c = ctype + body
        return struct.pack(">I", len(body)) + c + struct.pack(
            ">I", zlib.crc32(c) & 0xFFFFFFFF)

    png = (b"\x89PNG\r\n\x1a\n"
           + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
           + _chunk(b"IDAT", zlib.compress(bytes(raw)))
           + _chunk(b"IEND", b""))
    p2 = tmp_path / "filters.png"
    p2.write_bytes(png)
    np.testing.assert_array_equal(native_mod.decode_png(str(p2)), ref)
    np.testing.assert_array_equal(np.asarray(Image.open(p2).convert("RGB")), ref)


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


def _png_chunks(data: bytes):
    """Yield (offset, length, type, body) for each chunk of a PNG byte string."""
    pos = 8
    while pos + 8 <= len(data):
        length = int.from_bytes(data[pos : pos + 4], "big")
        ctype = data[pos + 4 : pos + 8]
        yield pos, length, ctype, data[pos + 8 : pos + 8 + length]
        pos += 12 + length


def test_truncated_idat_rejected(native_mod, tmp_path):
    """A PNG whose IDAT stream is cut short must fail (ok=0), not load as a
    partially-black frame reported as a successful decode."""
    import struct
    import zlib

    rng = np.random.RandomState(4)
    img = rng.randint(0, 255, (24, 32, 3), np.uint8)
    p = tmp_path / "good.png"
    Image.fromarray(img).save(p)
    data = p.read_bytes()

    # rebuild the file with the IDAT body truncated to half its length
    out = bytearray(data[:8])
    for _off, _length, ctype, body in _png_chunks(data):
        if ctype == b"IDAT":
            body = body[: len(body) // 2]
        out += struct.pack(">I", len(body)) + ctype + body
        out += struct.pack(">I", zlib.crc32(ctype + body))
    trunc = tmp_path / "trunc.png"
    trunc.write_bytes(bytes(out))

    assert native_mod.decode_png(str(trunc)) is None
    batch, ok = native_mod.decode_batch([str(p), str(trunc)], (24, 32))
    assert ok[0] and not ok[1]
    assert (batch[1] == 0).all()


def test_hostile_ihdr_dims_rejected(native_mod, tmp_path):
    """A corrupt IHDR claiming giant dimensions must be rejected by the native
    batch path (pixel cap), not drive a multi-GB allocation that escapes the
    worker pool as std::bad_alloc and kills the process."""
    import struct
    import zlib

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(
            ">I", zlib.crc32(ctype + body)
        )

    # 1e6 x 1e6 RGB header (3e12 pixels) with a tiny bogus IDAT
    ihdr = struct.pack(">IIBBBBB", 1_000_000, 1_000_000, 8, 2, 0, 0, 0)
    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"\x00" * 16))
        + chunk(b"IEND", b"")
    )
    p = tmp_path / "hostile.png"
    p.write_bytes(data)

    assert native_mod.decode_png(str(p)) is None
    batch, ok = native_mod.decode_batch([str(p)], (24, 32))
    assert not ok[0]
    assert (batch[0] == 0).all()


def test_decode_chain_uses_native_or_cv2(tmp_path):
    from trustedai_cl_vae_ad_tpu.data.pipeline import decode_image_rgb

    img = np.random.RandomState(3).randint(0, 255, (8, 8, 3), np.uint8)
    p = tmp_path / "c.png"
    Image.fromarray(img).save(p)
    got = decode_image_rgb(str(p))
    np.testing.assert_array_equal(got, img)
    assert decode_image_rgb(str(tmp_path / "nope.png")) is None


def test_jpeg_decode_and_dims(native_mod, tmp_path):
    """JPEG decodes through the same native path (format-sniffed); pixels
    match PIL's decode of the same file (both sit on libjpeg)."""
    rng = np.random.RandomState(5)
    img = rng.randint(0, 255, (48, 64, 3), np.uint8)
    p = tmp_path / "x.jpg"
    Image.fromarray(img).save(p, format="JPEG", quality=90)
    want = np.asarray(Image.open(p).convert("RGB"))
    got = native_mod.decode_png(str(p))  # sniffs format despite the name
    assert got is not None and got.shape == (48, 64, 3)
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.max() <= 1, diff.max()  # IDCT rounding at most

    batch, ok = native_mod.decode_batch([str(p)], (48, 64))
    assert ok[0]
    assert np.abs(batch[0].astype(int) - want.astype(int)).max() <= 1


def test_mixed_png_jpeg_batch(native_mod, tmp_path):
    rng = np.random.RandomState(6)
    img_png = rng.randint(0, 255, (24, 32, 3), np.uint8)
    img_jpg = rng.randint(0, 255, (24, 32, 3), np.uint8)
    p1 = tmp_path / "a.png"
    p2 = tmp_path / "b.jpg"
    Image.fromarray(img_png).save(p1)
    Image.fromarray(img_jpg).save(p2, format="JPEG", quality=95)
    batch, ok = native_mod.decode_batch([str(p1), str(p2)], (24, 32))
    assert ok.all()
    np.testing.assert_array_equal(batch[0], img_png)
    want = np.asarray(Image.open(p2).convert("RGB"))
    assert np.abs(batch[1].astype(int) - want.astype(int)).max() <= 1


def test_corrupt_jpeg_rejected(native_mod, tmp_path):
    p = tmp_path / "bad.jpg"
    p.write_bytes(b"\xff\xd8\xff" + b"\x00" * 64)
    assert native_mod.decode_png(str(p)) is None
    batch, ok = native_mod.decode_batch([str(p)], (8, 8))
    assert not ok[0]


def test_jpeg_dims_past_64kb_metadata(native_mod, tmp_path):
    """Camera JPEGs carry EXIF/ICC APP segments that can push SOF far past
    64 KB; the probe must follow segment lengths, not a fixed head budget."""
    import ctypes
    import io

    rng = np.random.RandomState(9)
    img = rng.randint(0, 255, (24, 32, 3), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=90)
    jpg = buf.getvalue()

    def app1(n):
        blob = b"Exif\x00\x00" + b"\x00" * n
        return b"\xff\xe1" + (len(blob) + 2).to_bytes(2, "big") + blob

    p = tmp_path / "exif_big.jpg"
    p.write_bytes(jpg[:2] + app1(40000) + app1(40000) + jpg[2:])

    lib = native_mod._load()
    w, h = ctypes.c_int(), ctypes.c_int()
    rc = lib.fl_png_dims(str(p).encode(), ctypes.byref(w), ctypes.byref(h))
    assert rc == 0 and (w.value, h.value) == (32, 24)
    out = native_mod.decode_png(str(p))
    assert out is not None and out.shape == (24, 32, 3)


def test_stale_so_detection(native_mod):
    """_stale(): the built .so must be considered stale when a source file is
    newer than it — otherwise edits to frame_loader.cpp silently never take
    effect (the library is only rebuilt when the .so is missing)."""
    from trustedai_cl_vae_ad_tpu.data import native

    so, cpp = native._SO_PATH, os.path.join(native._NATIVE_DIR, "frame_loader.cpp")
    if not (os.path.exists(so) and os.path.exists(cpp)):
        pytest.skip("built .so or source not present")
    so_m, cpp_m = os.path.getmtime(so), os.path.getmtime(cpp)
    try:
        os.utime(cpp, (so_m + 10, so_m + 10))
        assert native._stale()
        os.utime(cpp, (so_m - 10, so_m - 10))
        assert not native._stale()
    finally:
        os.utime(cpp, (cpp_m, cpp_m))
