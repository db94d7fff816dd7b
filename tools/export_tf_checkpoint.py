#!/usr/bin/env python3
"""CLI: export one of this framework's log dirs to the reference's TF
SavedModel layout (encoder/ + decoder/ + config.yml).

    python tools/export_tf_checkpoint.py <our_logdir> <out_dir>

Requires tensorflow. The inverse of tools/import_tf_checkpoint.py.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("log_dir", help="Our log dir (Orbax encoder/decoder + config.yml)")
    parser.add_argument("out_dir", help="Output dir for the TF SavedModel layout")
    args = parser.parse_args()

    from trustedai_cl_vae_ad_tpu.train.tf_export import export_tf_checkpoint

    enc, dec = export_tf_checkpoint(args.log_dir, args.out_dir)
    print(f"Exported TF SavedModels: {enc}, {dec}")


if __name__ == "__main__":
    main()
