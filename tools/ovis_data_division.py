"""OVIS preprocessing (reference: OVIS_Preprocess/division/
ovis_train_valid_data_division.py + yolox/data/datasets/ovis.py __main__):

1. split the OVIS VIS-format train json into train/valid video subsets,
2. convert VIS json (per-video annotations with per-frame bbox lists)
   into per-frame COCO detection json usable by OVISVideoDataset.

Usage:
  python tools/ovis_data_division.py --src annotations_train.json \
      --out_dir datasets/OVIS --valid_ratio 0.1 --seed 42
"""

import argparse
import json
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def vis_to_per_frame_coco(vis: dict, video_ids) -> dict:
    """VIS json -> per-frame COCO detection json. Frames get sequential
    image ids; each image carries `sid` (video index) and `fid` (frame
    index) like the reference converter."""
    video_ids = set(video_ids)
    images, annotations = [], []
    img_id, ann_id = 0, 1
    videos_out = []
    frame_key = {}
    for sid, video in enumerate(vis["videos"]):
        if video["id"] not in video_ids:
            continue
        videos_out.append(video)
        for fid, file_name in enumerate(video["file_names"]):
            images.append({
                "id": img_id, "file_name": file_name,
                "width": video["width"], "height": video["height"],
                "sid": len(videos_out) - 1, "fid": fid,
            })
            frame_key[(video["id"], fid)] = img_id
            img_id += 1
    for ann in vis["annotations"]:
        if ann["video_id"] not in video_ids:
            continue
        for fid, bbox in enumerate(ann["bboxes"]):
            if bbox is None:
                continue
            key = (ann["video_id"], fid)
            if key not in frame_key:
                continue
            annotations.append({
                "id": ann_id, "image_id": frame_key[key],
                "category_id": ann["category_id"], "bbox": bbox,
                "area": (ann["areas"][fid]
                         if ann.get("areas") and ann["areas"][fid]
                         else bbox[2] * bbox[3]),
                "iscrowd": ann.get("iscrowd", 0),
            })
            ann_id += 1
    return {"images": images, "annotations": annotations,
            "categories": vis["categories"], "videos": videos_out}


def main():
    p = argparse.ArgumentParser("ovis data division")
    p.add_argument("--src", required=True, help="OVIS VIS train json")
    p.add_argument("--out_dir", default="datasets/OVIS")
    p.add_argument("--valid_ratio", type=float, default=0.1)
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args()

    with open(args.src) as f:
        vis = json.load(f)
    vids = [v["id"] for v in vis["videos"]]
    rng = random.Random(args.seed)
    rng.shuffle(vids)
    n_valid = max(int(len(vids) * args.valid_ratio), 1)
    valid_ids, train_ids = vids[:n_valid], vids[n_valid:]

    os.makedirs(args.out_dir, exist_ok=True)
    for name, ids in (("annotations_train.json", train_ids),
                      ("annotations_valid.json", valid_ids)):
        coco = vis_to_per_frame_coco(vis, ids)
        path = os.path.join(args.out_dir, name)
        with open(path, "w") as f:
            json.dump(coco, f)
        print(f"{path}: {len(coco['videos'])} videos, "
              f"{len(coco['images'])} frames, "
              f"{len(coco['annotations'])} annotations")


if __name__ == "__main__":
    main()
