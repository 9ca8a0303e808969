"""Scripted 2-stage VID workflow (reference: README.md:88-154).

The reference documents its full pipeline as manual shell steps:
train stage-1 YOLOX (tools/train.py) -> init TSCD from those weights
and train stage-2 (tools/tscd_train.py) -> rough eval
(tools/tscd_eval.py) -> dump REPP-format predictions
(tools/val_to_imdb.py) -> REPP post-processing + motion-mAP breakdown
(tools/REPPM.py --evaluate [--post]). This tool scripts that chain
through the SAME CLIs, so one command reproduces the whole recipe and
its regression oracle (REPP --post should not hurt, and under score
flicker should help — reference README.md:141-144).

Every stage is a subprocess of the real tool, not an import — what a
user runs is what this runs. Prints one JSON summary at the end.

Usage:
  python tools/run_vid_workflow.py --yolox-exp exps/... --tscd-exp \
      exps/... --workdir out/ [--coco-ckpt w.msgpack] \
      [--annotations gts.pkl] [--tnum N] [--skip-stage1] [--post-only]
"""

import argparse
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TOOLS = os.path.join(REPO, "tools")


def run(cmd, log_path):
    """Run one stage; tee output to a log file; die loudly on failure."""
    print("[workflow] $", " ".join(cmd), flush=True)
    r = subprocess.run(cmd, capture_output=True, text=True)
    with open(log_path, "w") as f:
        f.write(r.stdout + "\n=== stderr ===\n" + r.stderr)
    if r.returncode != 0:
        sys.stderr.write(r.stdout[-2000:] + "\n" + r.stderr[-4000:])
        raise SystemExit(
            f"stage failed (rc={r.returncode}): {' '.join(cmd)}; "
            f"log: {log_path}")
    return r.stdout


def ckpt_of(exp_file, name_override=None):
    from tscd_tpu.exp import get_exp
    exp = get_exp(exp_file)
    name = name_override or exp.exp_name
    return os.path.join(exp.output_dir, name, "latest_ckpt.msgpack")


def parse_motion(stdout):
    """Last {'mAP_total': ...} dict printed by tools/REPP.py --evaluate."""
    for line in reversed(stdout.strip().splitlines()):
        if "mAP_total" in line:
            return json.loads(re.sub(r"'", '"', line.strip()))
    return None


def make_parser():
    p = argparse.ArgumentParser("run_vid_workflow")
    p.add_argument("--yolox-exp", required=True,
                   help="stage-1 still-image exp (reference "
                        "exps/ovis_default/ovis_yolox_l.py analogue)")
    p.add_argument("--tscd-exp", required=True,
                   help="stage-2 video exp")
    p.add_argument("--coco-ckpt", default=None,
                   help="COCO-pretrained init for stage-1 (README.md:88)")
    p.add_argument("--workdir", required=True)
    p.add_argument("--annotations", default=None,
                   help="gt pickle {video: {frame: (N,5)}} -> also run "
                        "the motion-mAP breakdown with and without "
                        "--post (README.md:141-144)")
    p.add_argument("--tnum", type=int, default=-1)
    p.add_argument("--min-tubelet-score", type=float, default=0.3)
    p.add_argument("--int8-eval", type=int, default=0, metavar="K",
                   help="also evaluate the stage-2 checkpoint in int8 "
                        "serving mode (static scales calibrated on the "
                        "first K val windows — the deployment analog of "
                        "the reference's TensorRT int8 path) and record "
                        "the fp-vs-int8 mAP delta in the summary")
    p.add_argument("--skip-stage1", action="store_true",
                   help="reuse an existing stage-1 checkpoint")
    p.add_argument("--stage1-opts", nargs="*", default=[])
    p.add_argument("--stage2-opts", nargs="*", default=[])
    return p


def main():
    args = make_parser().parse_args()
    os.makedirs(args.workdir, exist_ok=True)
    py = sys.executable
    summary = {}

    # 1. stage-1 YOLOX fine-tune (README.md:88: tools/train.py -f ... -c
    #    [COCO weights])
    if not args.skip_stage1:
        cmd = [py, os.path.join(TOOLS, "train.py"), "-f", args.yolox_exp]
        if args.coco_ckpt:
            cmd += ["-c", args.coco_ckpt]
        cmd += list(args.stage1_opts)
        run(cmd, os.path.join(args.workdir, "stage1_train.log"))
    stage1_ckpt = ckpt_of(args.yolox_exp)
    assert os.path.exists(stage1_ckpt), stage1_ckpt
    summary["stage1_ckpt"] = stage1_ckpt

    # 2. stage-2 TSCD init from stage-1 weights (README.md:93:
    #    tools/tscd_train.py -f ... -c [stage-1 weights])
    cmd = [py, os.path.join(TOOLS, "tscd_train.py"), "-f",
           args.tscd_exp, "-c", stage1_ckpt] + list(args.stage2_opts)
    run(cmd, os.path.join(args.workdir, "stage2_train.log"))
    stage2_ckpt = ckpt_of(args.tscd_exp)
    assert os.path.exists(stage2_ckpt), stage2_ckpt
    summary["stage2_ckpt"] = stage2_ckpt

    # 3. rough eval (README.md:150: tools/tscd_eval.py --tnum N)
    out = run([py, os.path.join(TOOLS, "tscd_eval.py"), "-f",
               args.tscd_exp, "-c", stage2_ckpt, "--tnum",
               str(args.tnum)],
              os.path.join(args.workdir, "rough_eval.log"))
    last = out.strip().splitlines()[-1].split()
    summary["rough_mAP"], summary["rough_AP50"] = (float(last[0]),
                                                   float(last[1]))

    # 3b. optional int8 serving-mode eval of the SAME checkpoint:
    #     static scales calibrated on the first K val windows
    #     (tools/tscd_eval.py --int8-calib), mAP delta vs the fp eval
    #     above — the per-run accuracy check a deployment wants before
    #     switching precisions.
    if args.int8_eval:
        out = run([py, os.path.join(TOOLS, "tscd_eval.py"), "-f",
                   args.tscd_exp, "-c", stage2_ckpt, "--tnum",
                   str(args.tnum), "--int8", "--int8-calib",
                   str(args.int8_eval)],
                  os.path.join(args.workdir, "int8_eval.log"))
        last = out.strip().splitlines()[-1].split()
        summary["int8_mAP"], summary["int8_AP50"] = (float(last[0]),
                                                     float(last[1]))
        summary["int8_mAP_drop"] = round(
            summary["rough_mAP"] - summary["int8_mAP"], 4)

    # 4. REPP-format prediction dump (README.md:135: tools/val_to_imdb.py)
    imdb = os.path.join(args.workdir, "val_imdb.pkl")
    run([py, os.path.join(TOOLS, "val_to_imdb.py"), "-f", args.tscd_exp,
         "-c", stage2_ckpt, "--tnum", str(args.tnum), "--output", imdb],
        os.path.join(args.workdir, "val_to_imdb.log"))
    summary["imdb"] = imdb

    # 5. REPP without and with --post (README.md:139-144 — the (--post)
    #    step and its regression oracle)
    for tag, extra in (("repp", []), ("repp_post", ["--post"])):
        out_json = os.path.join(args.workdir, f"{tag}_coco.json")
        cmd = [py, os.path.join(TOOLS, "REPP.py"), "--predictions",
               imdb, "--out", out_json, "--min_tubelet_score",
               str(args.min_tubelet_score)] + extra
        if args.annotations:
            cmd += ["--evaluate", "--annotations", args.annotations]
        out = run(cmd, os.path.join(args.workdir, f"{tag}.log"))
        summary[tag] = {"coco_json": out_json}
        if args.annotations:
            summary[tag]["motion"] = parse_motion(out)

    print(json.dumps(summary))


if __name__ == "__main__":
    main()
