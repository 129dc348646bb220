"""Subprocess-level smoke tests for every CLI entry point.

The reference's public surface is its shell scripts and ``python -m``
entries (FCGF_APR/train.py:29-88, FCGF_APR/scripts/test_apr.py:226-260,
Predator_APR/main.py:20-121, scripts/train_apr_kitti.sh).  Everything here
runs the real files as real OS processes — parser, config overlay,
launcher env-var plumbing, artifact writing — on a fake-KITTI tree, and
asserts the on-disk artifacts (config.json, metrics.jsonl, checkpoints,
results.npz).

Children are forced onto the CPU backend via an injected sitecustomize
(the axon TPU plugin ignores JAX_PLATFORMS, so plain env vars don't work —
see tests/conftest.py).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY_FLAGS = [
    "--trainer", "GenerativePairTrainer",
    "--dataset", "PairComplementKittiDataset",
    "--model", "ResUNetBN2",
    "--model_n_out", "16",
    "--conv1_kernel_size", "3",
    "--generator_model", "GenerativeMLP_54",
    "--point_generation_ratio", "2",
    "--batch_size", "2",
    "--num_pos_per_batch", "64",
    "--num_hn_samples_per_batch", "32",
    "--voxel_size", "1.0",
    "--point_capacity", "2048",
    "--capacities", "1024", "512", "256", "128",
    "--apc_capacity", "2048",
    "--pair_min_dist", "5",
    "--pair_max_dist", "10",
    "--complement_pair_dist", "4",
    "--num_complement_one_side", "2",
    "--use_old_pose", "false",
    "--max_epoch", "1",
    "--stat_freq", "1",
]


@pytest.fixture(scope="module")
def cpu_env(tmp_path_factory):
    """Env for child processes: CPU backend via injected sitecustomize."""
    d = tmp_path_factory.mktemp("forcecpu")
    (d / "sitecustomize.py").write_text(
        "import os\n"
        "if os.environ.get('APR_FORCE_CPU') == '1':\n"
        "    import jax\n"
        "    jax.config.update('jax_platforms', 'cpu')\n"
    )
    env = os.environ.copy()
    env["APR_FORCE_CPU"] = "1"
    env["PYTHONPATH"] = f"{d}:{REPO}" + (
        ":" + env["PYTHONPATH"] if env.get("PYTHONPATH") else "")
    return env


@pytest.fixture(scope="module")
def fake_kitti_full(tmp_path_factory):
    """KITTI tree covering ALL split drives (train 0-5, val 6-7, test 8-10).

    Drives 0 and 8 carry enough frames to form complement pairs; the rest
    are stubs (too short for pairs) so the split walk stays cheap.
    """
    from apr_tpu.data.synthetic import synthetic_lidar_frame

    root = tmp_path_factory.mktemp("kitti_full")
    frames = {0: 60, 8: 40}
    for drive in range(11):
        n_frames = frames.get(drive, 6)
        seq = root / "sequences" / ("%02d" % drive)
        (seq / "velodyne").mkdir(parents=True)
        with open(seq / "calib.txt", "w") as f:
            tr = np.eye(4)[:3].reshape(-1)
            f.write("Tr: " + " ".join(str(v) for v in tr) + "\n")
        poses = []
        for t in range(n_frames):
            pose = np.eye(4)
            pose[0, 3] = 2.0 * t
            poses.append(pose[:3].reshape(-1))
            pts = synthetic_lidar_frame(
                seed=drive * 1000 + t, n_points=1500, extent=25.0)
            xyzr = np.concatenate(
                [pts, np.ones((len(pts), 1), np.float32)], axis=1)
            xyzr.astype(np.float32).tofile(
                seq / "velodyne" / ("%06d.bin" % t))
        with open(seq / "poses.txt", "w") as f:
            for p in poses:
                f.write(" ".join(str(v) for v in p) + "\n")
    return str(root)


def _run(cmd, env, cwd=REPO, timeout=900):
    r = subprocess.run(cmd, env=env, cwd=cwd, timeout=timeout,
                       capture_output=True, text=True)
    assert r.returncode == 0, (
        f"{' '.join(cmd[:4])}... rc={r.returncode}\n"
        f"--- stdout tail ---\n{r.stdout[-2000:]}\n"
        f"--- stderr tail ---\n{r.stderr[-4000:]}")
    return r


@pytest.fixture(scope="module")
def trained_run(fake_kitti_full, cpu_env, tmp_path_factory):
    """`python train.py` as a real process; the run dir feeds test_apr."""
    out = tmp_path_factory.mktemp("run_cli")
    _run([sys.executable, "train.py",
          "--kitti_root", fake_kitti_full,
          "--out_dir", str(out), *TINY_FLAGS], cpu_env)
    return str(out)


@pytest.mark.slow
@pytest.mark.veryslow
def test_train_cli_process(trained_run):
    """train.py artifacts: config.json, metrics.jsonl (train rows),
    checkpoints/ (reference FCGF_APR/train.py:29-88 surface)."""
    assert os.path.exists(os.path.join(trained_run, "config.json"))
    lines = [json.loads(l)
             for l in open(os.path.join(trained_run, "metrics.jsonl"))]
    train_rows = [r for r in lines
                  if r["phase"] in ("train", "train_epoch") and "loss" in r]
    assert train_rows and np.isfinite(train_rows[-1]["loss"])
    assert os.path.isdir(os.path.join(trained_run, "checkpoints"))
    cfg = json.load(open(os.path.join(trained_run, "config.json")))
    assert cfg["dataset"] == "PairComplementKittiDataset"


@pytest.mark.slow
@pytest.mark.veryslow
def test_scripts_test_apr_process(trained_run, fake_kitti_full, cpu_env):
    """`python -m scripts.test_apr`: config.json rehydrate + CLI overrides
    + checkpoint load + results.npz (reference scripts/test_apr.py:226-260)."""
    _run([sys.executable, "-m", "scripts.test_apr",
          "--save_dir", trained_run,
          "--kitti_root", fake_kitti_full,
          "--pair_min_dist", "5", "--pair_max_dist", "10",
          "--num_pairs", "2"], cpu_env)
    res = np.load(os.path.join(trained_run, "results.npz"))
    assert res["rte"].shape == (2,) and np.isfinite(res["rte"]).all()
    assert os.path.exists(os.path.join(trained_run, "success_dists.npy"))


@pytest.mark.slow
@pytest.mark.veryslow
def test_sh_launcher_process(fake_kitti_full, cpu_env, tmp_path):
    """./scripts/train_apr_kitti.sh: env-var plumbing + tee log + env.txt
    (reference FCGF_APR/scripts/train_apr_kitti.sh:10-95)."""
    out = tmp_path / "run_sh"
    env = dict(cpu_env,
               KITTI_ROOT=str(tmp_path / "ignored"),  # overridden via $@
               MODEL="ResUNetBN2", MODEL_N_OUT="16",
               GENERATOR="GenerativeMLP_54", GEN_RATIO="2",
               MAX_EPOCH="1", BATCH_SIZE="2", VOXEL_SIZE="1.0",
               CMPL_DIST="4", CMPL_NUM="2",
               MIN_DIST="5", MAX_DIST="10",
               OUT_DIR=str(out))
    _run(["bash", "scripts/train_apr_kitti.sh",
          "--kitti_root", fake_kitti_full,
          "--conv1_kernel_size", "3",
          "--num_pos_per_batch", "64",
          "--num_hn_samples_per_batch", "32",
          "--point_capacity", "2048",
          "--capacities", "1024", "512", "256", "128",
          "--apc_capacity", "2048",
          "--stat_freq", "1"], env)
    assert (out / "config.json").exists()
    assert (out / "env.txt").exists()
    logs = list(out.glob("log_*.txt"))
    assert logs, "launcher must tee its log into OUT_DIR"
    lines = [json.loads(l) for l in open(out / "metrics.jsonl")]
    assert any(r["phase"] in ("train", "train_epoch") for r in lines)


@pytest.mark.slow
@pytest.mark.veryslow
def test_main_yaml_process(fake_kitti_full, cpu_env, tmp_path):
    """`python main.py <yaml>`: Predator YAML flatten + dispatch
    (reference Predator_APR/main.py:20-121 surface)."""
    out = tmp_path / "run_yaml"
    yaml_path = tmp_path / "tiny_kitti.yaml"
    yaml_path.write_text(f"""
misc:
  mode: train
  trainer: PredatorTrainer
  out_dir: {out}
  seed: 3
model:
  num_layers: 4
  first_feats_dim: 32
  final_feats_dim: 16
  first_subsampling_dl: 1.0
  conv_radius: 2.5
  num_kernel_points: 15
  gnn_feats_dim: 32
  dgcnn_k: 6
  num_head: 2
generator:
  generator_model: GenerativeMLP_54
  point_generation_ratio: 2
optimizer:
  optimizer: SGD
  lr: 0.01
  max_epoch: 1
  batch_size: 1
dataset:
  dataset: PairComplementKittiDataset
  kitti_root: {fake_kitti_full}
  pair_min_dist: 5.0
  pair_max_dist: 10.0
  complement_pair_dist: 4.0
  num_complement_one_side: 2
  use_old_pose: false
  point_capacity: 2048
  apc_capacity: 2048
  kp_capacities: [1024, 512, 256, 128]
  neighborhood_limits: [16, 16, 16, 16]
  stat_freq: 1
""")
    _run([sys.executable, "main.py", str(yaml_path)], cpu_env)
    assert (out / "config.json").exists()
    lines = [json.loads(l) for l in open(out / "metrics.jsonl")]
    train_rows = [r for r in lines
                  if r["phase"] in ("train", "train_epoch") and "loss" in r]
    assert train_rows and np.isfinite(train_rows[-1]["loss"])
    assert os.path.isdir(out / "checkpoints")
