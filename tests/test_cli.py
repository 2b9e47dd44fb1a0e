"""CLI smoke tests: the shipped scripts run end-to-end on CPU (subprocess,
SATMVS_PLATFORM=cpu) over a tiny synthetic on-disk dataset."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout=900):
    env = dict(os.environ, SATMVS_PLATFORM="cpu")
    env.pop("JAX_PLATFORMS", None)
    return subprocess.run(
        [sys.executable] + args, cwd=ROOT, env=env,
        capture_output=True, text=True, timeout=timeout,
    )


@pytest.mark.slow
def test_train_cli_and_predict_cli(tmp_path):
    from satmvs_tpu.data import synthetic

    root = str(tmp_path / "ds")
    synthetic.write_synthetic_dataset(root, num_scenes=2, width=32, height=32,
                                      h_amp=40.0, h_scale=120.0)
    logdir = str(tmp_path / "logs")

    # --use_qc exercises the QC-form warp path end-to-end (params are
    # identical either way, so the later basis-path restores still work)
    r = _run([
        "scripts/train.py", "--mode=train", "--model=red", "--geo_model=rpc",
        f"--dataset_root={root}", f"--logdir={logdir}", "--use_qc",
        "--ndepths", "8,4,4", "--epochs", "1", "--summary_freq", "1",
    ])
    assert r.returncode == 0, r.stderr[-3000:]
    workdir = os.path.join(logdir, "red", "rpc")
    assert os.path.exists(os.path.join(workdir, "train_record.txt"))

    # test mode restores the checkpoint and prints metrics
    r = _run([
        "scripts/train.py", "--mode=test", "--model=red", "--geo_model=rpc",
        f"--dataset_root={root}", f"--logdir={logdir}", "--ndepths", "8,4,4",
    ])
    assert r.returncode == 0, r.stderr[-3000:]
    assert "abs_depth_acc" in r.stdout

    # predict writes the reference's mvs_results layout, then fuses a DSM
    r = _run([
        "scripts/predict.py", "--model=red", "--geo_model=rpc",
        f"--dataset_root={root}", f"--loadckpt={workdir}",
        "--ndepths", "8,4,4", "--fuse", "--geo_consist_num", "1",
        "--d_ratio", "50", "--p_ratio", "5", "--confidence_ratio", "0.0",
    ])
    assert r.returncode == 0, r.stderr[-3000:]
    assert os.path.exists(os.path.join(root, "mvs_results", "2", "init", "scene0000.pfm"))
    assert os.path.exists(os.path.join(root, "mvs_results", "2", "prob", "scene0000.pfm"))
    import glob

    assert glob.glob(os.path.join(root, "mvs_results", "*_dsm.pfm")), os.listdir(
        os.path.join(root, "mvs_results")
    )


@pytest.mark.slow
def test_profile_mode(tmp_path):
    from satmvs_tpu.data import synthetic

    root = str(tmp_path / "ds")
    synthetic.write_synthetic_dataset(root, num_scenes=1, width=32, height=32,
                                      h_amp=40.0, h_scale=120.0)
    logdir = str(tmp_path / "logs")
    r = _run([
        "scripts/train.py", "--mode=profile", "--model=casmvs", "--geo_model=rpc",
        f"--dataset_root={root}", f"--logdir={logdir}", "--ndepths", "8,8,8",
    ])
    assert r.returncode == 0, r.stderr[-3000:]
    profile_dir = os.path.join(logdir, "casmvs", "rpc", "profile")
    assert os.path.isdir(profile_dir) and os.listdir(profile_dir)
