"""Alias of vid_demo with REPP post-processing on by default
(reference: tools/vid_demo_wpost.py)."""

import sys

from vid_demo import main, make_parser  # noqa: F401

if __name__ == "__main__":
    if "--post" not in sys.argv:
        sys.argv.append("--post")
    main()
