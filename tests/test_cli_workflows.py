"""End-to-end CLI workflow: the reference's train -> render -> metrics
-> eval_seg pipeline driven through the actual command-line entry
points on a tiny synthetic COLMAP scene (ref:train.py, render.py:13-55,
metrics.py:25-92, eval_seg.py:31-62)."""

import json
import os

import numpy as np
from PIL import Image

from tests.test_data_io import _make_colmap_scene


def test_train_render_metrics_cli(tmp_path, capsys):
    root = str(tmp_path / "scene")
    model = str(tmp_path / "model")
    _make_colmap_scene(root)

    # distillation starts from a pre-trained 3DGS (the reference trains
    # RGB first, then distills; train.py loads point_cloud/iteration_1)
    from goi_tpu.configs.params import ModelParams
    from goi_tpu.data.scene import Scene
    pre = Scene(ModelParams(source_path=root, model_path=model,
                            eval=True))
    pre.save(1)

    import train as train_cli
    train_cli.main([
        "-s", root, "-m", model, "--iterations", "12",
        "--ape_dim", "8", "--tab_len", "8", "--eval",
        "--test_iterations", "12", "--save_iterations", "12",
        "--quiet",
    ])
    # the validation report fired at the test iteration
    assert "Evaluating test: PSNR" in capsys.readouterr().out
    # the distillation artifacts the reference saves (PLY + decoder/LUT)
    pc = os.path.join(model, "point_cloud", "iteration_12")
    assert os.path.exists(os.path.join(pc, "point_cloud.ply"))
    assert os.path.exists(os.path.join(model, "cfg_args.json"))

    import render as render_cli
    render_cli.main(["-m", model, "--iteration", "12",
                     "--max_instances", str(1 << 14)])
    test_renders = os.path.join(model, "test", "ours_12", "renders")
    test_gt = os.path.join(model, "test", "ours_12", "gt")
    assert sorted(os.listdir(test_renders)) == ["00000.png"]
    assert sorted(os.listdir(test_gt)) == ["00000.png"]
    train_renders = os.path.join(model, "train", "ours_12", "renders")
    assert len(os.listdir(train_renders)) == 3

    import metrics as metrics_cli
    metrics_cli.evaluate([model])
    with open(os.path.join(model, "results.json")) as f:
        res = json.load(f)
    (method, vals), = res.items()
    assert method == "ours_12"
    assert np.isfinite(vals["PSNR"]) and 0.0 <= vals["SSIM"] <= 1.0
    with open(os.path.join(model, "per_view.json")) as f:
        pv = json.load(f)
    assert list(pv["ours_12"]["PSNR"]) == ["00000.png"]


def test_eval_seg_cli(tmp_path, capsys):
    """eval_seg m360 protocol: per-prompt mask dirs vs predicted masks
    (half-overlapping boxes -> known IoU)."""
    eval_root = tmp_path / "gt"
    saving_root = tmp_path / "pred"
    scene = "room"
    for prompt in ("chair", "table"):
        mdir = eval_root / scene / prompt / "masks"
        pdir = saving_root / scene / prompt
        mdir.mkdir(parents=True)
        pdir.mkdir(parents=True)
        for view in ("v0", "v1"):
            gt = np.zeros((32, 32), np.uint8)
            gt[:, :16] = 255
            pred = np.zeros((32, 32), np.uint8)
            pred[:, 8:24] = 255           # IoU 1/3 vs the gt box
            Image.fromarray(gt).save(mdir / f"{view}.png")
            Image.fromarray(pred).save(pdir / f"{view}.png")

    import eval_seg as eval_cli
    res = eval_cli.main(["-e", str(eval_root), "-s", str(saving_root),
                         "--scene_list", scene, "-d", "m360"])
    (iou, mpa, mp), = res
    assert abs(iou - 1 / 3) < 1e-6
    assert 0.0 < mp <= 1.0 and 0.0 < mpa <= 1.0


def _fake_model_dir(path, seed, psnr_offset=0.0):
    """A model dir with pre-rendered test/ours_1/renders+gt pairs."""
    rdir = os.path.join(path, "test", "ours_1", "renders")
    gdir = os.path.join(path, "test", "ours_1", "gt")
    os.makedirs(rdir)
    os.makedirs(gdir)
    rng = np.random.default_rng(seed)
    for i in range(2):
        g = rng.uniform(0, 1, (16, 16, 3))
        r = np.clip(g + rng.normal(0, 0.05 + psnr_offset, g.shape),
                    0, 1)
        Image.fromarray((g * 255).astype(np.uint8)).save(
            os.path.join(gdir, f"{i:05d}.png"))
        Image.fromarray((r * 255).astype(np.uint8)).save(
            os.path.join(rdir, f"{i:05d}.png"))


def test_eval_sweep_single_process(tmp_path):
    m1, m2 = str(tmp_path / "m1"), str(tmp_path / "m2")
    _fake_model_dir(m1, 1)
    _fake_model_dir(m2, 2, psnr_offset=0.1)
    out = str(tmp_path / "sweep.json")

    import eval_sweep
    sweep = eval_sweep.main(["-m", m1, m2, "--skip_render",
                             "--out", out])
    assert set(sweep["scenes"]) == {m1, m2}
    assert sweep["scenes"][m1]["PSNR"] > sweep["scenes"][m2]["PSNR"]
    expect = np.mean([sweep["scenes"][m]["PSNR"] for m in (m1, m2)])
    assert abs(sweep["mean"]["PSNR"] - expect) < 1e-9
    with open(out) as f:
        assert json.load(f)["mean"] == sweep["mean"]


def test_eval_sweep_two_process(tmp_path):
    """BASELINE config 5: the sweep divides scenes across a 2-process
    jax.distributed job and process 0 aggregates."""
    import socket
    import subprocess
    import sys as _sys

    m1, m2 = str(tmp_path / "m1"), str(tmp_path / "m2")
    _fake_model_dir(m1, 1)
    _fake_model_dir(m2, 2)
    out = str(tmp_path / "sweep.json")

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env_base = {k: v for k, v in os.environ.items()
                if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "PYTHONPATH")}
    procs = []
    for pid in range(2):
        env = dict(env_base, PYTHONPATH=repo,
                   GOI_COORD=f"127.0.0.1:{port}",
                   GOI_NUM_PROCS="2", GOI_PROC_ID=str(pid),
                   JAX_PLATFORMS="cpu")
        procs.append(subprocess.Popen(
            [_sys.executable,
             os.path.join(repo, "tests", "eval_sweep_worker.py"),
             out, m1, m2],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True))
    logs = []
    for p in procs:
        o, e = p.communicate(timeout=300)
        assert p.returncode == 0, f"worker failed:\n{o}\n{e}"
        assert "WORKER_DONE" in o
        logs.append(o)
    # each process took one scene
    assert f"scenes: ['{m1}']" in logs[0]
    assert f"scenes: ['{m2}']" in logs[1]
    with open(out) as f:
        sweep = json.load(f)
    assert set(sweep["scenes"]) == {m1, m2}
    assert "PSNR" in sweep["mean"]
