"""VIRAT surveillance dataset builder: videos + annotation txt -> frame records.

Capability parity with reference build_virat_dataset.py:42-420:
  * walk <virat_dir>/videos_original for .mp4, pair each with
    <virat_dir>/annotations/<basename>.viratdata.{events,mapping,objects}.txt
    (missing files -> None with a console note), :42-94;
  * parse the three whitespace-separated annotation schemas
    (events 10-col, mapping 6+N-col, objects 8-col), :97-176;
  * decode group/scene/sequence (+ optional segment/start/end seconds) from
    the VIRAT filename convention, :197-226;
  * frame-indexed event/object maps, :229-242;
  * emit one record per video frame carrying the video metadata plus that
    frame's event/object annotation lists, :245-310. As in the reference,
    image bytes are intentionally NOT stored (reference :300 commented out) —
    records hold only annotations.

Serialization is JSONL shards + index.json (replacing tf.train.Example/
TFRecord, which is TF-specific); ViratFrameDataset streams them back.
"""

from __future__ import annotations

import json
import os
from collections import defaultdict

import numpy as np
from typing import Iterator, Optional


def load_meta_data(virat_directory: str) -> dict:
    assert os.path.exists(virat_directory)
    assert os.path.isdir(virat_directory)
    virat_directory = os.path.abspath(virat_directory)

    annotations_dir = os.path.join(virat_directory, "annotations")
    videos_dir = os.path.join(virat_directory, "videos_original")
    assert os.path.isdir(annotations_dir)
    assert os.path.isdir(videos_dir)

    meta = {}
    for dirpath, _dirnames, filenames in os.walk(videos_dir):
        for filename in sorted(filenames):
            basename, ext = os.path.splitext(filename)
            if ext.lower() != ".mp4":
                continue
            paths = {}
            for kind in ("events", "mapping", "objects"):
                p = os.path.join(annotations_dir, f"{basename}.viratdata.{kind}.txt")
                if not os.path.isfile(p):
                    print(f"No {kind.capitalize()} File: {basename}")
                    p = None
                paths[f"{kind}_path"] = p
            meta[basename] = {"video_path": os.path.join(dirpath, filename), **paths}
    return meta


_EVENT_FIELDS = (
    "event_id", "event_type", "duration", "start_frame", "end_frame",
    "current_frame", "bbox_lefttop_x", "bbox_lefttop_y", "bbox_width", "bbox_height",
)
_OBJECT_FIELDS = (
    "obj_id", "duration", "current_frame", "bbox_lefttop_x", "bbox_lefttop_y",
    "bbox_width", "bbox_height", "obj_type",
)


def _parse_rows(path: Optional[str], fields: tuple) -> Optional[list]:
    if path is None or not os.path.isfile(path):
        return None
    out = []
    with open(path, "r") as ifile:
        for row in ifile:
            s = row.split()
            if not s:
                continue
            out.append({k: int(v) for k, v in zip(fields, s)})
    return out


def get_event_annotations_from_file(path):
    return _parse_rows(path, _EVENT_FIELDS)


def get_object_annotations_from_file(path):
    return _parse_rows(path, _OBJECT_FIELDS)


def get_mapping_annotations_from_file(path: Optional[str]) -> Optional[list]:
    if path is None or not os.path.isfile(path):
        return None
    out = []
    with open(path, "r") as ifile:
        for row in ifile:
            s = row.split()
            if not s:
                continue
            out.append(
                {
                    "event_id": int(s[0]),
                    "event_type": int(s[1]),
                    "duration": int(s[2]),
                    "start_frame": int(s[3]),
                    "end_frame": int(s[4]),
                    "num_objects": int(s[5]),
                    "obj_col_map": [int(i) for i in s[6:]],
                }
            )
    return out


def parse_annotations(meta_data: dict) -> dict:
    return {
        basename: {
            "events": get_event_annotations_from_file(obj["events_path"]),
            "mapping": get_mapping_annotations_from_file(obj["mapping_path"]),
            "objects": get_object_annotations_from_file(obj["objects_path"]),
        }
        for basename, obj in meta_data.items()
    }


def parse_video_name_data(basename: str) -> dict:
    """VIRAT_S_GGSSQQ[_seg_start_end] filename convention (reference :197-226)."""
    seg = basename.split("_")
    out = {
        "basename": basename,
        "group_id": None,
        "scene_id": None,
        "sequence_id": None,
        "segment_id": None,
        "start_seconds": None,
        "end_seconds": None,
    }
    if len(seg) >= 3:
        code = seg[2]
        out["group_id"] = int(code[0:2])
        out["scene_id"] = int(code[2:4])
        out["sequence_id"] = int(code[4:6])
    if len(seg) >= 6:  # baseline scenes lack segment metadata
        out["segment_id"] = int(seg[3])
        out["start_seconds"] = int(seg[4])
        out["end_seconds"] = int(seg[5])
    return out


def build_event_frame_map(annotations_entry: dict) -> dict:
    m = defaultdict(list)
    for idx, e in enumerate(annotations_entry.get("events") or []):
        m[e["current_frame"]].append(idx)
    return m


def build_object_frame_map(annotations_entry: dict) -> dict:
    m = defaultdict(list)
    for idx, o in enumerate(annotations_entry.get("objects") or []):
        m[o["current_frame"]].append(idx)
    return m


def frame_records(basename: str, meta_data: dict, annotations: dict) -> Iterator[dict]:
    """One annotation record per video frame (image bytes not stored)."""
    entry = meta_data[basename]
    ann = annotations[basename]
    video_path = entry.get("video_path")
    if video_path is None or not os.path.isfile(video_path):
        return

    name_data = parse_video_name_data(basename)
    event_map = build_event_frame_map(ann)
    obj_map = build_object_frame_map(ann)

    total = _count_video_frames(video_path)
    for frame_id in range(total):
        yield {
            **name_data,
            "frame_id": frame_id,
            "events": [ann["events"][i] for i in event_map.get(frame_id, [])],
            "objects": [ann["objects"][i] for i in obj_map.get(frame_id, [])],
        }


def _count_video_frames(video_path: str) -> int:
    try:
        import cv2

        cap = cv2.VideoCapture(video_path)
        if not cap.isOpened():
            print(f"Failed to open video: {video_path}")
            return 0
        n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        cap.release()
        return max(n, 0)
    except ImportError:
        print(f"cv2 unavailable; cannot count frames of {video_path}")
        return 0


def create_dataset(meta_data: dict, output_path: str, shard_size: int = 50000) -> dict:
    """Join frames + annotations and write JSONL shards + index."""
    annotations = parse_annotations(meta_data)
    os.makedirs(output_path, exist_ok=True)
    shards = []
    count = 0
    shard_rows: list = []

    def flush():
        nonlocal shard_rows
        if not shard_rows:
            return
        name = f"frames_{len(shards):05d}.jsonl"
        with open(os.path.join(output_path, name), "w") as f:
            for r in shard_rows:
                f.write(json.dumps(r) + "\n")
        shards.append({"file": name, "num_items": len(shard_rows)})
        shard_rows = []

    for basename in meta_data:
        for rec in frame_records(basename, meta_data, annotations):
            shard_rows.append(rec)
            count += 1
            if len(shard_rows) >= shard_size:
                flush()
    flush()
    index = {"num_items": count, "shards": shards, "format": "virat-jsonl-v1"}
    with open(os.path.join(output_path, "index.json"), "w") as f:
        json.dump(index, f, indent=1)
    return index


def extract_frames(
    meta_data: dict,
    output_path: str,
    frame_stride: int = 30,
    max_frames_per_video: Optional[int] = None,
    batch_size: int = 32,
) -> Optional[dict]:
    """Decode video frames into a saved dataset (train/ split layout).

    The reference intentionally stores NO pixels (build_virat_dataset.py:300
    commented out), which leaves its VIRAT records untrainable. This extracts
    every ``frame_stride``-th frame of each video into the npz saved-dataset
    format, so the continual-learning stream (BASELINE config #3) can train
    on actual VIRAT imagery. Filepaths record ``<basename>#<frame_id>``.
    """
    try:
        import cv2
    except ImportError:
        print("cv2 unavailable; cannot extract VIRAT frames")
        return None

    from trustedai_cl_vae_ad_tpu.data.saved_dataset import save_dataset

    def batches():
        # VIRAT mixes resolutions (1080p/720p/480p). A saved dataset must be
        # uniform (shards concatenate across batches), so every frame is
        # brought to the FIRST video's size; without this, a batch spanning
        # a video boundary — or save_dataset's shard flush — would crash on
        # np.stack/np.concatenate of mismatched shapes.
        target_hw = [None]
        buf_imgs, buf_paths = [], []
        for basename, entry in meta_data.items():
            video_path = entry.get("video_path")
            if video_path is None or not os.path.isfile(video_path):
                continue
            cap = cv2.VideoCapture(video_path)
            if not cap.isOpened():
                print(f"Failed to open video: {video_path}")
                continue
            frame_id = 0
            taken = 0
            while True:
                ok, frame = cap.read()
                if not ok:
                    break
                if frame_id % frame_stride == 0:
                    rgb = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
                    if target_hw[0] is None:
                        target_hw[0] = rgb.shape[:2]
                    elif rgb.shape[:2] != target_hw[0]:
                        h, w = target_hw[0]
                        rgb = cv2.resize(rgb, (w, h), interpolation=cv2.INTER_AREA)
                    buf_imgs.append(rgb)
                    buf_paths.append(f"{basename}#{frame_id}")
                    taken += 1
                    if len(buf_imgs) >= batch_size:
                        yield {"image": np.stack(buf_imgs), "filepath": buf_paths}
                        buf_imgs, buf_paths = [], []
                    if max_frames_per_video and taken >= max_frames_per_video:
                        break
                frame_id += 1
            cap.release()
        if buf_imgs:
            yield {"image": np.stack(buf_imgs), "filepath": buf_paths}

    return save_dataset(os.path.join(output_path, "train"), batches())


class ViratFrameDataset:
    """Stream frame annotation records back from a built VIRAT dataset."""

    def __init__(self, path: str):
        with open(os.path.join(path, "index.json")) as f:
            self.index = json.load(f)
        self.path = path

    def __len__(self):
        return self.index["num_items"]

    def __iter__(self) -> Iterator[dict]:
        for shard in self.index["shards"]:
            with open(os.path.join(self.path, shard["file"])) as f:
                for line in f:
                    yield json.loads(line)
