#!/usr/bin/env python3
"""CLI: reorganize raw RAITE event captures into per-match datasets.

Parity with reference fix_raite_event_data.py:20-171.
"""

import argparse
import os
import sys

from trustedai_cl_vae_ad_tpu.data.builders.fix_raite import fix_raite_event_data


def get_args():
    parser = argparse.ArgumentParser()
    # reference surface (fix_raite_event_data.py:161-164): output via
    # --output-dir/-o; the positional form is kept as a convenience alias
    parser.add_argument("root_dir", type=str, help="Root directory of raw event captures")
    parser.add_argument("output_dir", type=str, nargs="?", default=None,
                        help="Output directory (== --output-dir)")
    parser.add_argument("--output-dir", "-o", type=str, default=None,
                        dest="output_dir_opt", help="Path to output directory")
    parser.add_argument("--force", "-f", action="store_true", help="Allow existing output dir")
    args = parser.parse_args()
    args.output_dir = args.output_dir or args.output_dir_opt
    if args.output_dir is None:
        parser.error("provide an output directory (positional or -o)")

    assert os.path.exists(args.root_dir)
    assert os.path.isdir(args.root_dir)
    if os.path.exists(args.output_dir):
        if not args.force:
            print(
                f"Error, output path exists (call --force to overwrite): {args.output_dir}",
                file=sys.stderr,
            )
            raise SystemExit(1)
        assert os.path.isdir(args.output_dir)
    else:
        os.makedirs(args.output_dir)
    return args


def main():
    args = get_args()
    fix_raite_event_data(args.root_dir, args.output_dir)


if __name__ == "__main__":
    main()
