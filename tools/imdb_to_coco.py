"""imdb-pickle -> COCO-json prediction converter (reference:
tools/imdb_to_coco.py)."""

import argparse
import json
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser("imdb_to_coco")
    p.add_argument("src", help="imdb pickle ({video: {frame: [dets]}})")
    p.add_argument("dst", help="COCO-json output")
    p.add_argument("--image_id_map", default=None,
                   help="optional json {frame_path: image_id}")
    args = p.parse_args()

    with open(args.src, "rb") as f:
        imdb = pickle.load(f)
    id_map = {}
    if args.image_id_map:
        with open(args.image_id_map) as f:
            id_map = json.load(f)

    out = []
    for video, frames in imdb.items():
        for name, dets in frames.items():
            key = f"{video}/{name}"
            img_id = id_map.get(key, key)
            for d in dets:
                cls = int(np.argmax(d["scores"]))
                out.append({
                    "image_id": img_id,
                    "category_id": cls + 1,
                    "bbox": [float(v) for v in d["bbox"]],
                    "score": float(d["scores"][cls]),
                })
    with open(args.dst, "w") as f:
        json.dump(out, f)
    print(f"wrote {args.dst}: {len(out)} predictions")


if __name__ == "__main__":
    main()
