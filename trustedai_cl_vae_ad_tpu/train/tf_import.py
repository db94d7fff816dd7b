"""Reference-checkpoint importer: TF SavedModel variables -> flax params.

The reference persists models as Keras SavedModel directories
(``encoder/`` + ``decoder/`` + ``config.yml``, reference train.py:127-128,
loaded at abstract_cvae.py:95-106). This module transplants those weights
into this framework's flax parameter tree so a reference user's trained
models carry over, and so the <1e-5 reconstruction-parity target
(BASELINE.json) is checkable end-to-end.

No TensorFlow runtime is required: SavedModel variables live in a TensorFlow
"TensorBundle" (``variables/variables.index`` + ``.data-*-of-*``), whose
index is a LevelDB-style table of protobuf BundleEntryProto values — both are
stable on-disk formats parsed here directly. When TF *is* importable it is
used only as a cross-check/fallback (``tf.train.load_checkpoint``).

Supported checkpoint key layouts:
  * Keras 2 SavedModel (the reference's TF<2.11 format):
    ``layer_with_weights-N/kernel/.ATTRIBUTES/VARIABLE_VALUE``
  * Keras 3 / tf.saved_model.save export:
    ``_layers/N/_kernel/.ATTRIBUTES/VARIABLE_VALUE``

Kernel layouts map directly (validated by tests/test_tf_import.py transplant
parity):
  * Conv2D       (kh, kw, in, out)  == flax nn.Conv kernel
  * Dense        (in, out)          == flax nn.Dense kernel
  * Conv2DTranspose (kh, kw, out, in) == flax nn.ConvTranspose kernel with
    ``transpose_kernel=True`` (both compute gradient-of-conv).
"""

from __future__ import annotations

import glob
import os
import re
import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# TensorBundle reader (pure Python)
# ---------------------------------------------------------------------------

_TABLE_MAGIC = 0xDB4775248B80FB57

# tensorflow DataType enum -> numpy
_DTYPES = {
    1: np.float32,
    2: np.float64,
    3: np.int32,
    4: np.uint8,
    5: np.int16,
    6: np.int8,
    9: np.int64,
    10: np.bool_,
    14: None,  # bfloat16: handled specially (ml_dtypes)
    17: np.uint16,
    19: np.float16,
    22: np.uint32,
    23: np.uint64,
}


def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7


def _parse_block_entries(block: bytes) -> List[Tuple[bytes, bytes]]:
    """Parse all (key, value) entries of one LevelDB-format table block."""
    if len(block) < 4:
        return []
    num_restarts = struct.unpack("<I", block[-4:])[0]
    data_end = len(block) - 4 - 4 * num_restarts
    entries = []
    pos = 0
    key = b""
    while pos < data_end:
        shared, pos = _read_varint(block, pos)
        non_shared, pos = _read_varint(block, pos)
        value_len, pos = _read_varint(block, pos)
        key = key[:shared] + block[pos : pos + non_shared]
        pos += non_shared
        value = block[pos : pos + value_len]
        pos += value_len
        entries.append((key, value))
    return entries


def _read_table_block(data: bytes, offset: int, size: int) -> bytes:
    """Read one block given its handle; trailer = 1B compression + 4B crc."""
    comp = data[offset + size]
    block = data[offset : offset + size]
    if comp == 0:  # kNoCompression
        return block
    if comp == 1:  # kSnappyCompression — never used by TF bundle indexes
        raise NotImplementedError("snappy-compressed bundle index")
    raise ValueError(f"unknown block compression {comp}")


def _iter_index_entries(index_path: str):
    """Yield (key, raw BundleEntryProto bytes) for a bundle .index file."""
    with open(index_path, "rb") as f:
        data = f.read()
    magic = struct.unpack("<Q", data[-8:])[0]
    if magic != _TABLE_MAGIC:
        raise ValueError(f"{index_path}: not a TF bundle index (bad magic)")
    footer = data[-48:]
    pos = 0
    _mi_off, pos = _read_varint(footer, pos)
    _mi_size, pos = _read_varint(footer, pos)
    idx_off, pos = _read_varint(footer, pos)
    idx_size, pos = _read_varint(footer, pos)
    index_block = _read_table_block(data, idx_off, idx_size)
    for _k, handle in _parse_block_entries(index_block):
        hpos = 0
        b_off, hpos = _read_varint(handle, hpos)
        b_size, hpos = _read_varint(handle, hpos)
        for key, value in _parse_block_entries(_read_table_block(data, b_off, b_size)):
            yield key.decode("utf-8"), value


def _parse_bundle_entry(raw: bytes) -> dict:
    """Decode BundleEntryProto: dtype(1), shape(2), shard_id(3), offset(4),
    size(5), crc32c(6 fixed32), slices(7)."""
    entry = {"dtype": 0, "shape": [], "shard_id": 0, "offset": 0, "size": 0}
    pos = 0
    while pos < len(raw):
        tag, pos = _read_varint(raw, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 0:
            val, pos = _read_varint(raw, pos)
            if field == 1:
                entry["dtype"] = val
            elif field == 3:
                entry["shard_id"] = val
            elif field == 4:
                entry["offset"] = val
            elif field == 5:
                entry["size"] = val
        elif wire == 2:
            ln, pos = _read_varint(raw, pos)
            body = raw[pos : pos + ln]
            pos += ln
            if field == 2:  # TensorShapeProto: repeated Dim dim = 2
                spos = 0
                dims = []
                while spos < len(body):
                    stag, spos = _read_varint(body, spos)
                    sfield, swire = stag >> 3, stag & 7
                    if sfield == 2 and swire == 2:
                        dlen, spos = _read_varint(body, spos)
                        dim_body = body[spos : spos + dlen]
                        spos += dlen
                        dpos = 0
                        size = None
                        while dpos < len(dim_body):
                            dtag, dpos = _read_varint(dim_body, dpos)
                            if dtag >> 3 == 1 and dtag & 7 == 0:
                                size, dpos = _read_varint(dim_body, dpos)
                            elif dtag & 7 == 2:
                                nlen, dpos = _read_varint(dim_body, dpos)
                                dpos += nlen
                        if size is not None:
                            dims.append(size)
                    elif swire == 0:
                        _, spos = _read_varint(body, spos)
                    elif swire == 2:
                        sl, spos = _read_varint(body, spos)
                        spos += sl
                entry["shape"] = dims
        elif wire == 5:
            pos += 4
        elif wire == 1:
            pos += 8
        else:
            raise ValueError(f"unexpected wire type {wire}")
    return entry


def read_tf_bundle(prefix: str) -> Dict[str, np.ndarray]:
    """Read every tensor of a TensorBundle checkpoint (pure Python).

    ``prefix`` is the path WITHOUT the .index/.data suffix, e.g.
    ``<savedmodel>/variables/variables``.
    """
    index_path = prefix + ".index"
    assert os.path.exists(index_path), index_path
    shards = sorted(glob.glob(prefix + ".data-*-of-*"))
    shard_data = [open(p, "rb").read() for p in shards]
    out = {}
    for key, raw in _iter_index_entries(index_path):
        if key == "":
            continue  # BundleHeaderProto
        entry = _parse_bundle_entry(raw)
        np_dtype = _DTYPES.get(entry["dtype"])
        if entry["dtype"] == 14:  # bfloat16
            import ml_dtypes

            np_dtype = ml_dtypes.bfloat16
        if np_dtype is None:
            continue  # non-numeric (e.g. string assets): not model weights
        buf = shard_data[entry["shard_id"]][entry["offset"] : entry["offset"] + entry["size"]]
        arr = np.frombuffer(buf, dtype=np_dtype).reshape(entry["shape"])
        out[key] = arr
    return out


def read_savedmodel_variables(savedmodel_dir: str) -> Dict[str, np.ndarray]:
    """All checkpoint variables of a SavedModel dir; pure reader with a TF
    cross-check fallback when the format surprises us."""
    prefix = os.path.join(savedmodel_dir, "variables", "variables")
    try:
        return read_tf_bundle(prefix)
    except Exception as e:  # pragma: no cover - fallback path
        try:
            import tensorflow as tf
        except ImportError:
            raise RuntimeError(
                f"pure-python bundle read failed ({e}) and tensorflow is not "
                f"importable for the fallback"
            ) from e
        reader = tf.train.load_checkpoint(prefix)
        return {
            k: np.asarray(reader.get_tensor(k))
            for k in reader.get_variable_to_shape_map()
        }


# ---------------------------------------------------------------------------
# Variable -> layer extraction
# ---------------------------------------------------------------------------

_LAYER_PATTERNS = [
    # Keras 2 SavedModel (reference format, TF<2.11)
    re.compile(r"(?:^|/)layer_with_weights-(\d+)/_?([a-zA-Z_]+)/\.ATTRIBUTES/VARIABLE_VALUE$"),
    # Keras 3 / tf.saved_model.save export
    re.compile(r"(?:^|/)_layers/(\d+)/_?([a-zA-Z_]+)/\.ATTRIBUTES/VARIABLE_VALUE$"),
]

_SKIP_SUBSTRINGS = ("optimizer", "OPTIMIZER", "keras_api", "OBJECT_GRAPH")


def extract_weighted_layers(variables: Dict[str, np.ndarray]) -> List[Dict[str, np.ndarray]]:
    """Group checkpoint variables into network-ordered weighted layers
    ({'kernel': ..., 'bias': ...} dicts)."""
    for pattern in _LAYER_PATTERNS:
        layers: Dict[int, Dict[str, np.ndarray]] = {}
        for key, arr in variables.items():
            if any(s in key for s in _SKIP_SUBSTRINGS):
                continue
            m = pattern.search(key)
            if m:
                idx, var = int(m.group(1)), m.group(2).lstrip("_")
                layers.setdefault(idx, {})[var] = arr
        if layers:
            return [layers[i] for i in sorted(layers)]
    raise ValueError(
        "no recognizable layer variables in checkpoint; keys were: "
        + ", ".join(sorted(variables)[:20])
    )


# ---------------------------------------------------------------------------
# Mapping into the flax parameter tree
# ---------------------------------------------------------------------------

def _encoder_layer_names(config: dict) -> List[str]:
    """Network-ordered flax module names of the encoder's weighted layers
    (cvae.py Encoder: Conv_0.., [Dense_0,] Dense_last)."""
    n_conv = len(config["model"]["layers"])
    names = [f"Conv_{i}" for i in range(n_conv)]
    if config["model"].get("encoder_dense_filters"):
        names += ["Dense_0", "Dense_1"]
    else:
        names += ["Dense_0"]
    return names


def _decoder_layer_names(config: dict) -> List[str]:
    """cvae.py Decoder: Dense_0, ConvTranspose_0..L (last is the stride-1
    output conv)."""
    n_conv = len(config["model"]["layers"])
    return ["Dense_0"] + [f"ConvTranspose_{i}" for i in range(n_conv + 1)]


def _transplant(tf_layers: List[Dict[str, np.ndarray]], flax_tree: dict,
                layer_names: List[str], what: str) -> dict:
    if len(tf_layers) != len(layer_names):
        raise ValueError(
            f"{what}: checkpoint has {len(tf_layers)} weighted layers, "
            f"model expects {len(layer_names)} ({layer_names})"
        )
    new_tree = dict(flax_tree)
    for name, tf_vars in zip(layer_names, tf_layers):
        target = flax_tree[name]
        updated = dict(target)
        for var in ("kernel", "bias"):
            if var not in tf_vars:
                raise ValueError(f"{what}.{name}: checkpoint layer missing {var}")
            src, dst = tf_vars[var], np.asarray(target[var])
            if tuple(src.shape) != tuple(dst.shape):
                raise ValueError(
                    f"{what}.{name}.{var}: shape {tuple(src.shape)} != model "
                    f"{tuple(dst.shape)} — architecture/config mismatch"
                )
            updated[var] = np.asarray(src, dtype=dst.dtype)
        new_tree[name] = updated
    return new_tree


def import_tf_checkpoint(ref_dir: str, config: Optional[dict] = None):
    """Load a reference log dir (encoder/ + decoder/ SavedModels + config.yml)
    into a fresh VAEModel of the same architecture.

    Returns (model, config). Mirrors load_model_from_directory
    (reference load_model.py:74-83 + abstract_cvae.py:95-106) but sourcing the
    weights from the TF SavedModel checkpoints.
    """
    from trustedai_cl_vae_ad_tpu.config import load_config
    from trustedai_cl_vae_ad_tpu.registry import load_model_from_config

    if config is None:
        config = load_config(os.path.join(ref_dir, "config.yml"))
    model = load_model_from_config(config)

    enc_vars = read_savedmodel_variables(os.path.join(ref_dir, "encoder"))
    dec_vars = read_savedmodel_variables(os.path.join(ref_dir, "decoder"))
    params = dict(model.params)
    params["encoder"] = _transplant(
        extract_weighted_layers(enc_vars), model.params["encoder"],
        _encoder_layer_names(config), "encoder",
    )
    params["decoder"] = _transplant(
        extract_weighted_layers(dec_vars), model.params["decoder"],
        _decoder_layer_names(config), "decoder",
    )
    import jax

    model.params = jax.device_put(params)
    return model, config
