"""The MVBench replication gate's dry run is part of the suite, so the
standing real-weights recipe (script/replicate_mvbench.py: convert ->
parity -> 20-task harness, plus the --tome and --serving-slots arms that
certify the headline surfaces) can't rot between rounds."""

import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def test_replicate_dryrun_all_arms(tmp_path):
    pytest.importorskip("cv2")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, str(REPO / "script" / "replicate_mvbench.py"),
         "--dry-run"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1100)
    out = r.stdout + r.stderr
    assert r.returncode == 0, out[-4000:]
    # all three stages ran, plus both headline-surface arms
    for marker in ("[replicate:convert] OK",
                   "[replicate:parity] OK",
                   "Total Acc",
                   "arm 2/3: --tome auto",
                   "arm 3/3: --serving-slots 2",
                   "[replicate:done] all stages passed"):
        assert marker in out, (marker, out[-4000:])
