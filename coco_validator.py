#!/usr/bin/env python3
"""CLI: validate a COCO labels.json file.

Parity with reference coco_validator.py:10-68.
"""

import argparse
import json

from trustedai_cl_vae_ad_tpu.data.coco import validate_coco_data


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("json_path", type=str, help="COCO labels.json to validate")
    args = parser.parse_args()

    with open(args.json_path) as f:
        data = json.load(f)
    validate_coco_data(data)
    print(f"OK: {args.json_path} ({len(data['images'])} images, "
          f"{len(data['annotations'])} annotations)")


if __name__ == "__main__":
    main()
