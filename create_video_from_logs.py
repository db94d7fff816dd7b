#!/usr/bin/env python3
"""CLI: compose recording-log image streams into a 2x2 playback video.

Parity with reference create_video_from_logs.py:38-153: reads a recording
directory (frames/ heatmap/ overlay/ err/ rec/ of timestamped PNGs named
%Y%m%d-%H%M%S-%f), unions timestamps, renders a 2x2 matplotlib panel
(Original / Error / Overlay / Heatmap) per timestep, and writes a video via
cv2.VideoWriter (mp4v by default; X264 when available).
"""

import argparse
import datetime
import os

import numpy as np


def get_args():
    # reference surface (create_video_from_logs.py:28-34): --input-directory/-i,
    # recording.mkv default, --frame-rate-fps 20, --force. The positional form
    # is kept as a convenience alias for the input directory.
    parser = argparse.ArgumentParser()
    parser.add_argument("log_directory", type=str, nargs="?", default=None,
                        help="Recording directory (== --input-directory)")
    parser.add_argument("--input-directory", "-i", type=str, default=None,
                        help="Input Log Directory containing output directories")
    parser.add_argument("--output-path", "-o", type=str, default="recording.mkv")
    parser.add_argument("--frame-rate-fps", "--frame-rate", "-r", type=int,
                        default=20, dest="frame_rate")
    parser.add_argument("--force", "-f", action="store_true",
                        help="Force overwrite of the output file")
    parser.add_argument("--codec", "-c", type=str, default="mp4v")
    args = parser.parse_args()
    args.log_directory = args.log_directory or args.input_directory
    if args.log_directory is None:
        parser.error("provide a recording directory (positional or -i)")
    if os.path.exists(args.output_path) and not args.force:
        parser.error(f"{args.output_path} exists (use --force)")
    return args


def load_data_from_directory(log_directory: str) -> dict:
    assert os.path.isdir(log_directory)

    def _get_data(minor: str) -> dict:
        d = os.path.join(log_directory, minor)
        data = {}
        if not os.path.isdir(d):
            return data
        for root, _dirs, filenames in os.walk(d):
            for f in filenames:
                base, ext = os.path.splitext(os.path.basename(f))
                if ext.lower() != ".png":
                    continue
                try:
                    dt = datetime.datetime.strptime(base, "%Y%m%d-%H%M%S-%f")
                except ValueError:
                    continue
                data[dt] = os.path.join(root, f)
        return data

    return {name: _get_data(name) for name in ("frames", "heatmap", "overlay", "err", "rec")}


def write_video(data: dict, output_path: str, frame_rate: int, codec: str = "mp4v"):
    import cv2
    import matplotlib

    matplotlib.use("agg")
    import matplotlib.pyplot as plt

    dt_keys = sorted({dt for stream in data.values() for dt in stream})
    assert dt_keys, "no timestamped frames found"
    print(f"{len(dt_keys)} timesteps")

    fourcc = cv2.VideoWriter_fourcc(*codec)
    out_cap = cv2.VideoWriter(output_path, fourcc, frame_rate, (1000, 800))
    try:
        fig, ((frame_ax, err_ax), (overlay_ax, heatmap_ax)) = plt.subplots(2, 2, figsize=(10, 8))

        def _plot_axis(ax, stream, dt, title):
            path = stream.get(dt)
            ax.clear()
            if path:
                bgr = cv2.imread(path)
                if bgr is None:
                    # a recorder killed mid-write leaves truncated PNGs with
                    # valid timestamp names — skip the panel like a missing
                    # path instead of aborting the whole render
                    print(f"WARNING: unreadable frame skipped: {path}")
                else:
                    ax.imshow(cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB))
            ax.set_title(title)
            ax.axis("off")

        start_dt = dt_keys[0]
        for dt in dt_keys:
            fig.suptitle(f"Log Playback: {(dt - start_dt).total_seconds():3.2f} s")
            _plot_axis(frame_ax, data["frames"], dt, "Original")
            _plot_axis(err_ax, data["err"], dt, "Error Image")
            _plot_axis(overlay_ax, data["overlay"], dt, "Overlay")
            _plot_axis(heatmap_ax, data["heatmap"], dt, "Heatmap")
            fig.canvas.draw()
            buf = np.asarray(fig.canvas.buffer_rgba())
            img = cv2.cvtColor(cv2.resize(buf, (1000, 800)), cv2.COLOR_RGBA2BGR)
            out_cap.write(img)
        print(f"Video File written to: {os.path.abspath(output_path)}")
    finally:
        out_cap.release()


def main():
    args = get_args()
    data = load_data_from_directory(args.log_directory)
    write_video(data, args.output_path, args.frame_rate, args.codec)


if __name__ == "__main__":
    main()
