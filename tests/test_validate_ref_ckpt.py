"""Dress rehearsal of the real-checkpoint validation harness
(tools/validate_reference_ckpt.py --selftest): converts a randomly
initialized FULL reference torch TSCD (backbone + head + matcher, built
exactly as /root/reference/exps/TSCD_VID/vid_tscd_large.py:95-155
builds it), evaluates it through the real tools/tscd_eval.py CLI AND
through the original torch model on identical windows, and gates on
mAP equality plus detection-level agreement (IoU-matched boxes/scores).

This is the standing "mAP parity on real VID/OVIS checkpoints" gap
reduced to its only unreachable variable — the weights file: every
other link (conversion of all 630 tensors, loader, resume semantics,
eval accounting) is exercised by this test.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_validate_reference_ckpt_selftest(tmp_path):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "tools", "validate_reference_ckpt.py"),
         "--selftest", "--workdir", str(tmp_path)],
        capture_output=True, text=True, env=env, timeout=1500)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-3000:]
    report = json.loads(r.stdout[r.stdout.index("{\n"):])
    assert report["pass"] is True
    det = report["det_level"]
    # identical weights => near-identical detections through both stacks
    assert det["n_ours"] > 100 and det["n_ref"] > 100
    assert det["matched_frac"] >= 0.8
    assert det["mean_matched_iou"] >= 0.85
    assert det["mean_score_delta"] <= 0.05
    assert report["delta_AP50"] <= 0.05
