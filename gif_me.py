#!/usr/bin/env python3
"""CLI: build an animated GIF from a list of images.

Parity with reference gif_me.py:15-45.
"""

import argparse
import os

from PIL import Image


def get_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("img_list", type=str, nargs="+", help="Images, in order")
    parser.add_argument("--output-filename", "-o", type=str, default="output.gif")
    parser.add_argument("--period", "-p", type=int, default=500, help="Frame period (ms)")
    return parser.parse_args()


def save_gif(img_list: list, output_filename: str, period: int):
    assert len(img_list) > 0
    for img_path in img_list:
        assert os.path.isfile(img_path), img_path

    imgs = [Image.open(p) for p in img_list]
    # a blank seed frame precedes the appended images — reference quirk
    # (gif_me.py:36-41): frame 0 of the GIF is empty, preserved for parity
    output_gif = Image.new(imgs[0].mode, imgs[0].size)
    out_path = os.path.abspath(output_filename)
    print(f"{len(imgs)} frames at {imgs[0].size} -> {out_path} "
          f"({period} ms/frame)")
    output_gif.save(
        output_filename, format="GIF", save_all=True, append_images=imgs,
        duration=period, loop=0,
    )


def main():
    args = get_args()
    save_gif(args.img_list, args.output_filename, args.period)


if __name__ == "__main__":
    main()
