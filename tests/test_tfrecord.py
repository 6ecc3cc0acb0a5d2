"""Native TFRecord + tf.Example reader (data/tfrecord.py) and the
tensorflow-free Waymo decode path (data/preprocess.decode_waymo_tfrecords)."""

import io
import os

import numpy as np
import pytest

from unboundednerfpytorch_tpu.data import preprocess, tfrecord as tfr


def test_example_roundtrip():
    feats = {
        "image": b"\x89PNGfakebytes",
        "height": [7],
        "width": np.array([9]),
        "equivalent_exposure": np.array([1.25], np.float32),
        "ray_origins": np.arange(12, dtype=np.float32),
    }
    payload = tfr.encode_example(feats)
    out = tfr.parse_example(payload)
    assert out["image"][0] == feats["image"]
    assert out["height"] == [7]
    assert out["width"] == [9]
    np.testing.assert_allclose(out["equivalent_exposure"], [1.25])
    np.testing.assert_allclose(out["ray_origins"], np.arange(12))


@pytest.mark.parametrize("compress", [False, True])
@pytest.mark.parametrize("verify", [False, True])
def test_records_roundtrip(tmp_path, compress, verify):
    payloads = [b"a" * 3, b"", os.urandom(1000)]
    p = str(tmp_path / ("r.tfrecord" + (".gz" if compress else "")))
    tfr.write_records(p, payloads, compress=compress)
    got = tfr.read_records(p, verify_crc=verify)
    assert got == payloads


def test_crc_detects_corruption(tmp_path):
    p = str(tmp_path / "r.tfrecord")
    tfr.write_records(p, [b"hello world" * 10])
    raw = bytearray(open(p, "rb").read())
    raw[20] ^= 0xFF  # flip a payload byte
    open(p, "wb").write(bytes(raw))
    with pytest.raises(ValueError):
        tfr.read_records(p, verify_crc=True)


@pytest.mark.parametrize("verify", [False, True])
def test_huge_rec_len_rejected(verify):
    """A corrupt header with rec_len near 2^64 must raise, not wrap the
    bounds check (unsigned overflow) and read out of bounds / segfault."""
    import struct

    length_bytes = struct.pack("<Q", 2**64 - 8)
    buf = length_bytes + struct.pack("<I", tfr.masked_crc(length_bytes))
    buf += b"\x00" * 64  # some in-bounds "payload" bytes
    with pytest.raises(ValueError):
        tfr._split_records_python(buf, verify)
    nat = tfr._native_lib()
    if nat is not None:
        with pytest.raises(ValueError):
            tfr._split_records_native(buf, verify)


def test_native_matches_python_framing(tmp_path):
    payloads = [os.urandom(n) for n in (1, 100, 4096, 0)]
    p = str(tmp_path / "r.tfrecord")
    tfr.write_records(p, payloads)
    buf = open(p, "rb").read()
    py = tfr._split_records_python(buf, True)
    nat = tfr._split_records_native(buf, True)
    if nat is None:
        pytest.skip("native toolchain unavailable")
    assert [(int(o), int(l)) for o, l in nat] == py


def _synth_frame(rng, h=6, w=8, cam_idx=0):
    """A fake Waymo frame with a known pose."""
    import imageio.v2 as iio

    from scipy.spatial.transform import Rotation

    fx = fy = 10.0
    R = Rotation.from_euler("zyx", rng.uniform(-0.5, 0.5, 3)).as_matrix()
    origin = rng.uniform(-1, 1, 3)
    j, i = np.mgrid[0:h, 0:w].astype(np.float32)
    cam_dirs = np.stack(
        [(i - w / 2 + 0.5) / fx, -(j - h / 2 + 0.5) / fy, -np.ones_like(i)], -1
    )
    cam_dirs /= np.linalg.norm(cam_dirs, axis=-1, keepdims=True)
    world_dirs = cam_dirs @ R.T
    img = (rng.uniform(0, 1, (h, w, 3)) * 255).astype(np.uint8)
    buf = io.BytesIO()
    iio.imwrite(buf, img, format="png")
    feats = {
        "image_hash": [123],
        "cam_idx": [cam_idx],
        "equivalent_exposure": np.array([0.5], np.float32),
        "height": [h],
        "width": [w],
        "image": buf.getvalue(),
        "ray_origins": np.broadcast_to(
            origin.astype(np.float32), (h, w, 3)
        ).reshape(-1),
        "ray_dirs": world_dirs.astype(np.float32).reshape(-1),
        "intrinsics": np.array([fx, fy], np.float32),
    }
    return feats, R, origin


def test_decode_waymo_tfrecords_tf_free(tmp_path):
    rng = np.random.default_rng(0)
    frames = [_synth_frame(rng, cam_idx=k % 2) for k in range(3)]
    payloads = [tfr.encode_example(f[0]) for f in frames]
    rec = str(tmp_path / "waymo_train.tfrecord.gz")
    tfr.write_records(rec, payloads, compress=True)

    out = str(tmp_path / "decoded")
    meta = preprocess.decode_waymo_tfrecords([rec], out, splits=("train",))
    m = meta["train"]
    assert len(m["file_path"]) == 3
    for k, (feats, R, origin) in enumerate(frames):
        c2w = np.asarray(m["cam2world"][k])
        np.testing.assert_allclose(c2w[:3, :3], R, atol=1e-4)
        np.testing.assert_allclose(c2w[:3, 3], origin, atol=1e-5)
        assert os.path.exists(os.path.join(out, m["file_path"][k]))
    assert m["cam_idx"] == [0, 1, 0]


def test_extract_block_meta(tmp_path):
    import json

    root = tmp_path / "root"
    for split in ("train", "val"):
        (root / split / "rgbs").mkdir(parents=True)
    meta = {
        f"img{k}": {
            "cam_idx": k % 2,
            "c2w": [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, float(k)]],
            "W": 8, "H": 6, "intrinsics": [10.0, 10.0],
            "origin_pos": [0.0, 0.0, float(k)],
        }
        for k in range(4)
    }
    split_train = {"block_0": {"centroid": [0, 0, 0],
                               "elements": [["img0", 0], ["img1", 1]]}}
    split_val = {"block_0": [["img2", 0]]}
    json.dump(split_train, open(root / "train" / "split_block_train.json", "w"))
    json.dump(meta, open(root / "train" / "train_all_meta.json", "w"))
    json.dump(split_val, open(root / "val" / "split_block_val.json", "w"))
    json.dump(meta, open(root / "val" / "val_all_meta.json", "w"))

    out = tmp_path / "block0"
    unified = preprocess.extract_block_meta(
        str(root), 0, str(out), copy_images=False
    )
    assert len(unified["train"]["file_path"]) == 2
    # test split == val split except the image folder prefix (:93-96)
    for k in unified["val"]:
        if k != "file_path":
            assert unified["test"][k] == unified["val"][k]
    assert unified["test"]["file_path"][0].startswith("images_test/")
    c2w = np.asarray(unified["train"]["cam2world"][1])
    assert c2w.shape == (4, 4) and c2w[2, 3] == 1.0
    p2c = np.asarray(unified["train"]["pix2cam"][0])
    # K @ pix2cam should map the principal point ray to (0, 0, -1)
    np.testing.assert_allclose(p2c @ np.array([4.0, 3.0, 1.0]), [0, 0, -1],
                               atol=1e-9)
    assert os.path.exists(out / "metadata.json")


@pytest.mark.parametrize("verify", [False, True])
def test_truncation_and_mutation_fuzz_never_crashes(verify):
    """Deterministic fuzz: every truncation point and a sweep of single-byte
    mutations of a valid stream must either parse cleanly or raise
    ValueError — never crash, hang, or return out-of-bounds spans — and the
    native C++ framing must agree with the python reader on WHICH inputs
    are rejected."""
    rng = np.random.default_rng(0)
    payloads = [bytes(rng.integers(0, 256, n, dtype=np.uint8))
                for n in (0, 1, 37, 300)]
    buf = io.BytesIO()
    import struct

    for p in payloads:
        length = struct.pack("<Q", len(p))
        buf.write(length)
        buf.write(struct.pack("<I", tfr.masked_crc(length)))
        buf.write(p)
        buf.write(struct.pack("<I", tfr.masked_crc(p)))
    data = buf.getvalue()
    nat = tfr._native_lib()

    def outcomes(b):
        try:
            py = ("ok", tfr._split_records_python(b, verify))
        except ValueError:
            py = ("err", None)
        if nat is None:
            return py, py
        try:
            na = ("ok", tfr._split_records_native(b, verify))
        except ValueError:
            na = ("err", None)
        return py, na

    # every truncation point
    for cut in range(len(data) + 1):
        py, na = outcomes(data[:cut])
        assert py == na, f"native/python disagree at truncation {cut}"
        if py[0] == "ok":
            for off, length in py[1]:
                assert 0 <= off and 0 <= length and off + length <= cut
    # single-byte mutations at a stride (covers headers, CRCs, payloads)
    for pos in range(0, len(data), 5):
        mutated = bytearray(data)
        mutated[pos] ^= 0xA5
        py, na = outcomes(bytes(mutated))
        assert py == na, f"native/python disagree at mutation {pos}"


def test_visualize_cameras_cli(tmp_path, monkeypatch, capsys):
    """The headless visualize CLI (counterpart of the reference's
    data_preprocess/visualize_cameras.py --data_path) renders per-split
    camera PNGs + the block-split map from a preprocessed block dir."""
    import json
    import sys

    from unboundednerfpytorch_tpu.utils import visualize

    root = tmp_path / "root"
    for split in ("train", "val"):
        (root / split / "rgbs").mkdir(parents=True)
    meta = {
        f"img{k}": {
            "cam_idx": k % 2,
            "c2w": [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, float(k)]],
            "W": 8, "H": 6, "intrinsics": [10.0, 10.0],
            "origin_pos": [0.0, 0.0, float(k)],
        }
        for k in range(4)
    }
    split_train = {"block_0": {"centroid": [0, 0, 0],
                               "elements": [["img0", 0], ["img1", 1]]}}
    json.dump(split_train, open(root / "train" / "split_block_train.json", "w"))
    json.dump(meta, open(root / "train" / "train_all_meta.json", "w"))
    json.dump({"block_0": [["img2", 0]]},
              open(root / "val" / "split_block_val.json", "w"))
    json.dump(meta, open(root / "val" / "val_all_meta.json", "w"))
    block_dir = root / "block0"
    preprocess.extract_block_meta(str(root), 0, str(block_dir),
                                  copy_images=False)

    monkeypatch.setattr(sys, "argv",
                        ["visualize", "--data_path", str(block_dir)])
    assert visualize._main() == 0
    wrote = capsys.readouterr().out.strip().splitlines()
    assert len(wrote) == 4  # train/val/test cameras + block split
    for p in wrote:
        assert os.path.getsize(p) > 0
    assert any(p.endswith("block_split.png") for p in wrote)
