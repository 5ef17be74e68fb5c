"""convert.py (COLMAP SfM wrapper) output/directory contract.

The colmap binary is absent here, so a FAKE colmap on PATH records the
exact invocations and fabricates the undistorter's output layout; the
test then checks the command sequence (feature_extractor ->
exhaustive_matcher -> mapper -> image_undistorter,
ref:convert.py:29-68) and the sparse/* -> sparse/0 move + images_{2,4,8}
resize pyramid (ref:convert.py:70-111)."""

import json
import os
import stat
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import convert  # noqa: E402

FAKE_COLMAP = """#!{python}
import json, os, sys
args = sys.argv[1:]
log = os.environ["FAKE_COLMAP_LOG"]
with open(log, "a") as f:
    f.write(json.dumps(args) + "\\n")
if args[0] == "image_undistorter":
    out = args[args.index("--output_path") + 1]
    # the real undistorter writes images/ + sparse/ (flat, no 0/)
    os.makedirs(os.path.join(out, "sparse"), exist_ok=True)
    os.makedirs(os.path.join(out, "images"), exist_ok=True)
    for name in ("cameras.bin", "images.bin", "points3D.bin"):
        open(os.path.join(out, "sparse", name), "wb").close()
    src_imgs = os.path.join(out, "input")
    for name in os.listdir(src_imgs):
        with open(os.path.join(src_imgs, name), "rb") as a, \\
                open(os.path.join(out, "images", name), "wb") as b:
            b.write(a.read())
"""


@pytest.fixture
def fake_scene(tmp_path, monkeypatch):
    src = tmp_path / "scene"
    (src / "input").mkdir(parents=True)
    from PIL import Image
    rng = np.random.default_rng(0)
    for i in range(2):
        Image.fromarray(
            rng.integers(0, 255, (32, 48, 3), np.uint8)).save(
            src / "input" / f"im{i}.png")
    bindir = tmp_path / "bin"
    bindir.mkdir()
    exe = bindir / "colmap"
    exe.write_text(FAKE_COLMAP.format(python=sys.executable))
    exe.chmod(exe.stat().st_mode | stat.S_IEXEC)
    log = tmp_path / "log.jsonl"
    monkeypatch.setenv("PATH",
                       f"{bindir}:{os.environ.get('PATH', '')}")
    monkeypatch.setenv("FAKE_COLMAP_LOG", str(log))
    return src, log


def test_convert_directory_contract(fake_scene):
    src, log = fake_scene
    convert.main(["-s", str(src), "--no_gpu", "--resize"])

    calls = [json.loads(line) for line in
             log.read_text().strip().splitlines()]
    names = [c[0] for c in calls]
    assert names == ["feature_extractor", "exhaustive_matcher",
                     "mapper", "image_undistorter"]
    fe = calls[0]
    assert fe[fe.index("--ImageReader.camera_model") + 1] == "OPENCV"
    assert fe[fe.index("--SiftExtraction.use_gpu") + 1] == "0"
    assert fe[fe.index("--image_path") + 1] == f"{src}/input"
    un = calls[3]
    assert un[un.index("--input_path") + 1] == \
        f"{src}/distorted/sparse/0"
    assert un[un.index("--output_type") + 1] == "COLMAP"

    # the readers' expected layout (ref:scene/dataset_readers.py:137:
    # sparse/0/{cameras,images,points3D}.bin next to images/)
    for name in ("cameras.bin", "images.bin", "points3D.bin"):
        assert (src / "sparse" / "0" / name).exists()
    assert not (src / "sparse" / "cameras.bin").exists()
    # resize pyramid at 50/25/12.5%
    from PIL import Image
    for div in (2, 4, 8):
        p = src / f"images_{div}" / "im0.png"
        assert p.exists()
        with Image.open(p) as im:
            assert (im.width, im.height) == (48 // div, 32 // div)


def test_convert_skip_matching(fake_scene):
    src, log = fake_scene
    (src / "distorted" / "sparse" / "0").mkdir(parents=True)
    convert.main(["-s", str(src), "--skip_matching"])
    calls = [json.loads(line) for line in
             log.read_text().strip().splitlines()]
    assert [c[0] for c in calls] == ["image_undistorter"]


def test_convert_missing_binary(tmp_path, monkeypatch):
    monkeypatch.setenv("PATH", str(tmp_path))
    with pytest.raises(SystemExit):
        convert.main(["-s", str(tmp_path)])
