#!/usr/bin/env python3
"""Write an int8 serving checkpoint next to a trained log dir.

Usage:
  python tools/quantize_checkpoint.py -m <logdir> [--min-elems N]

Loads the float checkpoint once, quantizes the big dense kernels
(ops/quant.py: symmetric per-output-channel int8), and persists the
quantized tree under ``<logdir>/quantized``. After this,
``python serve.py -m <logdir> --quantize`` boots from the int8 tree:
~half the checkpoint upload and no on-device quantization pass
(BENCH_NOTES r4: the flagship's 1.6 GB bf16 upload dominated the 338-549 s
cold boot).

New TPU-native serving capability — the reference serves the float Keras
model as-is (camera_streamer_qt.py:1263-1408) and has no quantization.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model-dir", "-m", required=True)
    parser.add_argument("--min-elems", type=int, default=None,
                        help="quantize Dense kernels with >= this many "
                             "elements (default ops/quant.DEFAULT_MIN_ELEMS)")
    args = parser.parse_args()

    from trustedai_cl_vae_ad_tpu.ops.quant import (
        quantize_params,
        save_quantized_checkpoint,
    )
    from trustedai_cl_vae_ad_tpu.registry import load_model_from_directory

    model, config = load_model_from_directory(args.model_dir)
    qparams = quantize_params(model.core, model.params, min_elems=args.min_elems)
    path = save_quantized_checkpoint(args.model_dir, qparams)
    import jax
    import numpy as np

    n_bytes = sum(np.asarray(l).nbytes for l in jax.tree_util.tree_leaves(qparams))
    print(f"quantized checkpoint written: {path} ({n_bytes / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
