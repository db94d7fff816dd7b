#!/usr/bin/env python3
"""CLI: VIRAT directory (videos_original/ + annotations/) -> frame records.

Parity with reference build_virat_dataset.py:29-420.
"""

import argparse

from trustedai_cl_vae_ad_tpu.data.builders.virat import (
    create_dataset,
    extract_frames,
    load_meta_data,
)


def get_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("virat_directory", type=str, help="VIRAT root directory")
    parser.add_argument("--output-path", "-o", type=str, default="virat_dataset")
    parser.add_argument(
        "--extract-frames", type=int, default=0, metavar="STRIDE",
        help="Also decode every STRIDE-th video frame into a trainable saved "
             "dataset (the reference stores annotations only)",
    )
    parser.add_argument("--max-frames-per-video", type=int, default=None)
    # reference flag (build_virat_dataset.py:--batchsize/-b): batch size for
    # processing frames; here it sizes the extracted-frame batches
    parser.add_argument("--batchsize", "-b", type=int, default=32)
    return parser.parse_args()


def main():
    args = get_args()
    meta_data = load_meta_data(args.virat_directory)
    create_dataset(meta_data, args.output_path)
    if args.extract_frames > 0:
        extract_frames(
            meta_data, args.output_path, frame_stride=args.extract_frames,
            max_frames_per_video=args.max_frames_per_video,
            batch_size=args.batchsize,
        )


if __name__ == "__main__":
    main()
