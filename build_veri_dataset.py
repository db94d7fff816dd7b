#!/usr/bin/env python3
"""CLI: VeRi image directories -> saved train/validation dataset.

Parity with reference build_veri_dataset.py:22-66 (224x224, batch 32).
"""

import argparse

from trustedai_cl_vae_ad_tpu.data.builders.veri import build_veri_dataset


def get_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("train_path", type=str)
    parser.add_argument("val_path", type=str)
    parser.add_argument("--output-path", "-o", type=str, default="VeRi_dataset")
    return parser.parse_args()


def main():
    args = get_args()
    build_veri_dataset(args.train_path, args.val_path, args.output_path)


if __name__ == "__main__":
    main()
