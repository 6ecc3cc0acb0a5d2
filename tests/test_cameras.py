"""Camera-model layer: radial/tangential undistortion, fisheye projection,
NDC conversion, distortion-aware pixel->ray generation, and the COLMAP ->
cams_meta / poses_bounds export path (reference: camera_utils.py +
run_colmap2standard.py)."""

import os
import struct

import numpy as np
import pytest

from unboundednerfpytorch_tpu.data import cameras, colmap


# ---------------------------------------------------------------------------
# distortion / undistortion
# ---------------------------------------------------------------------------

def test_undistort_inverts_distort():
    rng = np.random.default_rng(0)
    x = rng.uniform(-0.4, 0.4, size=(64,))
    y = rng.uniform(-0.4, 0.4, size=(64,))
    params = dict(k1=0.05, k2=-0.02, k3=0.004, p1=0.001, p2=-0.002)
    xd, yd = cameras.distort(x, y, **params)
    xu, yu = cameras.undistort(xd, yd, **params)
    # jax default f32: Newton converges to single-precision roundoff
    np.testing.assert_allclose(np.asarray(xu), x, atol=1e-6)
    np.testing.assert_allclose(np.asarray(yu), y, atol=1e-6)


def test_undistort_identity_when_no_distortion():
    x = np.linspace(-0.3, 0.3, 11)
    xu, yu = cameras.undistort(x, -x)
    np.testing.assert_allclose(np.asarray(xu), x, atol=1e-12)
    np.testing.assert_allclose(np.asarray(yu), -x, atol=1e-12)


def test_undistort_jits():
    import jax

    f = jax.jit(lambda a, b: cameras.undistort(a, b, k1=0.1, p1=0.01))
    xd, yd = cameras.distort(np.array([0.2]), np.array([-0.1]), k1=0.1, p1=0.01)
    xu, yu = f(np.asarray(xd), np.asarray(yd))
    np.testing.assert_allclose(float(xu[0]), 0.2, atol=1e-6)
    np.testing.assert_allclose(float(yu[0]), -0.1, atol=1e-6)


# ---------------------------------------------------------------------------
# pixels_to_rays
# ---------------------------------------------------------------------------

def _pinhole_pixtocam(fx, fy, cx, cy):
    return np.linalg.inv(cameras.intrinsic_matrix(fx, fy, cx, cy))


def test_pixels_to_rays_pinhole_center_pixel():
    # camera with principal point exactly on a pixel center: the central
    # ray must be the optical axis (0,0,-1) in OpenGL/NeRF coords
    pixtocam = _pinhole_pixtocam(64.0, 64.0, 32.5, 32.5)
    c2w = np.eye(4)[:3]  # identity pose
    o, d, v, r, ip = cameras.pixels_to_rays(
        np.array([32]), np.array([32]), pixtocam, c2w
    )
    np.testing.assert_allclose(np.asarray(o)[0], 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(v)[0], [0, 0, -1], atol=1e-7)
    np.testing.assert_allclose(np.asarray(ip)[0], 0.0, atol=1e-7)
    # radii: neighbor rays differ by 1/fx in x (resp. y), so
    # radii = mean(1/64, 1/64)/2 * 2 * 2/sqrt(12)... i.e. (1/64)*2/sqrt(12)/2*2
    expected = (0.5 * (1 / 64 + 1 / 64)) * 2 / np.sqrt(12.0)
    np.testing.assert_allclose(np.asarray(r)[0, 0], expected, rtol=1e-6)


def test_pixels_to_rays_applies_pose_rotation_and_origin():
    pixtocam = _pinhole_pixtocam(50.0, 50.0, 25.0, 25.0)
    # 90-degree rotation about y: OpenGL -z maps to -x... verify via matmul
    Ry = np.array([[0, 0, 1.0], [0, 1, 0], [-1, 0, 0]])
    c2w = np.concatenate([Ry, np.array([[1.0], [2.0], [3.0]])], axis=1)
    o, d, v, r, _ = cameras.pixels_to_rays(
        np.array([12]), np.array([7]), pixtocam, c2w
    )
    np.testing.assert_allclose(np.asarray(o)[0], [1, 2, 3], atol=1e-7)
    cam_dir = np.array([(12.5 - 25) / 50, -(7.5 - 25) / 50, -1.0])
    np.testing.assert_allclose(np.asarray(d)[0], Ry @ cam_dir, atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(v)[0]), 1.0, rtol=1e-6)


def test_pixels_to_rays_fisheye_preserves_polar_angle():
    # equidistant fisheye: planar radius in camera coords == angle from axis
    pixtocam = _pinhole_pixtocam(100.0, 100.0, 50.0, 50.0)
    c2w = np.eye(4)[:3]
    xs = np.array([80, 95, 50])
    ys = np.array([50, 60, 85])
    _, _, v, _, _ = cameras.pixels_to_rays(
        xs, ys, pixtocam, c2w, camtype=cameras.ProjectionType.FISHEYE
    )
    v = np.asarray(v)
    for i in range(len(xs)):
        x = (xs[i] + 0.5 - 50) / 100
        y = (ys[i] + 0.5 - 50) / 100
        theta = np.sqrt(x * x + y * y)
        cos_angle = v[i] @ np.array([0, 0, -1.0])
        np.testing.assert_allclose(cos_angle, np.cos(theta), atol=1e-6)


def test_pixels_to_rays_undistorts():
    pixtocam = _pinhole_pixtocam(100.0, 100.0, 50.0, 50.0)
    c2w = np.eye(4)[:3]
    params = dict(k1=0.08, k2=-0.01, p1=0.002, p2=-0.001)
    _, d, _, _, _ = cameras.pixels_to_rays(
        np.array([70]), np.array([30]), pixtocam, c2w,
        distortion_params=params,
    )
    # the undistorted camera-plane point must re-distort to the pixel's
    # normalized coordinates
    d = np.asarray(d)[0]
    x_cam, y_cam = d[0] / -d[2], -d[1] / -d[2]  # invert the OpenGL flip
    xd, yd = cameras.distort(x_cam, y_cam, **params)
    np.testing.assert_allclose(xd, (70.5 - 50) / 100, atol=1e-6)
    np.testing.assert_allclose(yd, (30.5 - 50) / 100, atol=1e-6)


def test_convert_to_ndc_near_far_bounds():
    rng = np.random.default_rng(1)
    o = rng.normal(size=(32, 3))
    d = rng.normal(size=(32, 3))
    o[:, 2] = np.abs(o[:, 2])  # in front of the near plane
    d[:, 2] = -np.abs(d[:, 2]) - 0.1  # forward-facing (dz < 0)
    pixtocam = _pinhole_pixtocam(80.0, 80.0, 40.0, 40.0)
    o_ndc, d_ndc = cameras.convert_to_ndc(o, d, pixtocam, near=1.0)
    o_ndc, d_ndc = np.asarray(o_ndc), np.asarray(d_ndc)
    # near plane maps to z=-1, infinity to z=+1 (i.e. z of o+1*d == +1)
    np.testing.assert_allclose(o_ndc[:, 2], -1.0, atol=1e-6)
    np.testing.assert_allclose((o_ndc + d_ndc)[:, 2], 1.0, atol=1e-6)


# ---------------------------------------------------------------------------
# COLMAP camera-type dispatch
# ---------------------------------------------------------------------------

def test_colmap_distortion_dispatch():
    d, t = cameras.colmap_distortion_params("PINHOLE", [50, 50, 25, 25])
    assert d is None and t == cameras.ProjectionType.PERSPECTIVE
    d, t = cameras.colmap_distortion_params("SIMPLE_RADIAL", [50, 25, 25, 0.1])
    assert d == {"k1": 0.1} and t == cameras.ProjectionType.PERSPECTIVE
    d, t = cameras.colmap_distortion_params(
        "OPENCV", [50, 50, 25, 25, 0.1, 0.02, 0.003, 0.004]
    )
    assert d == {"k1": 0.1, "k2": 0.02, "p1": 0.003, "p2": 0.004}
    d, t = cameras.colmap_distortion_params(
        "OPENCV_FISHEYE", [50, 50, 25, 25, 0.1, 0.02, 0.003, 0.004]
    )
    assert d == {"k1": 0.1, "k2": 0.02, "k3": 0.003, "k4": 0.004}
    assert t == cameras.ProjectionType.FISHEYE
    with pytest.raises(ValueError):
        cameras.colmap_distortion_params("FOV", [1, 2, 3, 4, 5])


# ---------------------------------------------------------------------------
# COLMAP -> cams_meta / poses_bounds export (+ free-loader round trip)
# ---------------------------------------------------------------------------

def _write_opencv_colmap_model(d, n_images=6, w=10, h=8):
    """Sparse model with an OPENCV camera, n_images posed cameras looking at
    +z, and a shared cloud of 3D points in front of all of them."""
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 4, w, h))  # model 4 = OPENCV
        f.write(struct.pack("<" + "d" * 8, 12.0, 12.0, w / 2, h / 2,
                            0.05, -0.01, 0.001, 0.002))

    rng = np.random.default_rng(3)
    pts = rng.normal(size=(30, 3)) * 0.5 + np.array([0, 0, 2.0])
    pt_ids = np.arange(1, 31)

    def qvec_from_angle(a):  # rotation about y
        return np.array([np.cos(a / 2), 0.0, np.sin(a / 2), 0.0])

    with open(os.path.join(d, "images.bin"), "wb") as f:
        f.write(struct.pack("<Q", n_images))
        for i in range(n_images):
            a = 0.05 * i
            q = qvec_from_angle(a)
            R = colmap.qvec2rotmat(q)
            center = np.array([0.2 * i, 0.05 * i, -3.0])
            t = -R @ center
            name = f"im_{n_images - i:03d}.png".encode()  # reverse name order
            f.write(struct.pack("<idddddddi", i + 1, *q, *t, 1))
            f.write(name + b"\x00")
            f.write(struct.pack("<Q", len(pt_ids)))
            for pid in pt_ids:
                f.write(struct.pack("<ddq", 1.0, 1.0, int(pid)))

    with open(os.path.join(d, "points3D.bin"), "wb") as f:
        f.write(struct.pack("<Q", len(pt_ids)))
        for pid, xyz in zip(pt_ids, pts):
            f.write(struct.pack("<QdddBBBd", int(pid), *xyz, 128, 128, 128, 0.5))
            f.write(struct.pack("<Q", n_images))
            for i in range(n_images):
                f.write(struct.pack("<ii", i + 1, 0))
    return pts


def test_export_cams_meta_and_poses_bounds(tmp_path):
    base = str(tmp_path)
    _write_opencv_colmap_model(os.path.join(base, "sparse", "0"))

    data = colmap.export_cams_meta(base, out_mode="cams_meta")
    assert data.shape == (6, 27)
    assert os.path.exists(os.path.join(base, "cams_meta.npy"))

    poses = data[:, :12].reshape(-1, 3, 4)
    # NeRF frame: rotation block orthonormal with det +1
    for R in poses[:, :3, :3]:
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-8)
        assert np.linalg.det(R) > 0.99
    # name-sorted: im_001 is COLMAP image 6 (center x = 0.2*5)
    np.testing.assert_allclose(poses[0, :, 3], [1.0, 0.25, -3.0], atol=1e-8)

    K = data[0, 12:21].reshape(3, 3)
    np.testing.assert_allclose(np.diag(K), [12.0, 12.0, 1.0], atol=1e-10)
    np.testing.assert_allclose(data[0, 21:25], [0.05, -0.01, 0.001, 0.002])

    bounds = data[:, 25:27]
    assert (bounds[:, 0] > 0).all() and (bounds[:, 1] > bounds[:, 0]).all()
    # cameras sit ~5 from the point cloud: near ~ 0.5*depth, far ~ 5*depth
    assert (bounds[:, 0] > 1.0).all() and (bounds[:, 1] < 50.0).all()

    pb = colmap.export_cams_meta(base, out_mode="poses_bounds")
    raw = colmap.export_cams_meta(base, out_mode="poses_bounds_raw")
    assert pb.shape == (6, 17) and raw.shape == (6, 17)
    # hwf from the camera record (no images/ dir): h=8, w=10, f=12
    np.testing.assert_allclose(pb[0].reshape(-1)[:15].reshape(3, 5)[:, 4],
                               [8, 10, 12])
    # raw permutes pose columns to (-y, x, z)
    p = pb[:, :15].reshape(-1, 3, 5)
    r = raw[:, :15].reshape(-1, 3, 5)
    np.testing.assert_allclose(r[:, :, 0], -p[:, :, 1])
    np.testing.assert_allclose(r[:, :, 1], p[:, :, 0])
    np.testing.assert_allclose(r[:, :, 2:], p[:, :, 2:])


def test_cams_meta_feeds_free_loader(tmp_path):
    """End-to-end: COLMAP model -> cams_meta.npy -> the free-trajectory
    dataset loader (the repo format that consumes cams_meta)."""
    imageio = pytest.importorskip("imageio.v2")
    base = str(tmp_path)
    w, h = 10, 8
    _write_opencv_colmap_model(os.path.join(base, "sparse", "0"), w=w, h=h)
    os.makedirs(os.path.join(base, "images"))
    rng = np.random.default_rng(0)
    for i in range(6):
        imageio.imwrite(
            os.path.join(base, "images", f"im_{i + 1:03d}.png"),
            rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8),
        )

    colmap.export_cams_meta(base, out_mode="cams_meta")

    from unboundednerfpytorch_tpu.data.extra_loaders import load_free_data

    imgs, _, intri, poses5, bounds, render5, i_test = load_free_data(
        base, factor=1, n_out_poses=7
    )
    assert imgs.shape == (6, h, w, 3)
    assert poses5.shape == (6, 3, 5) and render5.shape == (7, 3, 5)
    assert intri.shape == (6, 3, 3)
    np.testing.assert_allclose(intri[0, 0, 0], 12.0, rtol=1e-6)
    assert (bounds[:, 1] > bounds[:, 0]).all()


def test_colmap2standard_cli(tmp_path):
    import subprocess
    import sys as _sys

    base = str(tmp_path)
    _write_opencv_colmap_model(os.path.join(base, "sparse", "0"))
    out = subprocess.run(
        [_sys.executable,
         os.path.join(os.path.dirname(__file__), "..", "tools",
                      "colmap2standard.py"),
         "--data_dir", base, "--out_mode", "cams_meta"],
        capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr
    assert os.path.exists(os.path.join(base, "cams_meta.npy"))


# ---------------------------------------------------------------------------
# COLMAP per-model intrinsic layouts + loud fisheye export failure
# ---------------------------------------------------------------------------

def test_intrinsics_from_params_radial_family():
    # RADIAL params are [f, cx, cy, k1, k2] — a PINHOLE-style parse would
    # read fy:=cx, cx:=cy, cy:=k1
    fx, fy, cx, cy = colmap.intrinsics_from_params(
        "RADIAL", [50.0, 50.0, 40.0, 0.1, 0.01]
    )
    assert (fx, fy, cx, cy) == (50.0, 50.0, 50.0, 40.0)
    fx, fy, cx, cy = colmap.intrinsics_from_params(
        "OPENCV", [50.0, 51.0, 25.0, 24.0, 0.1, 0.01, 0.001, 0.002]
    )
    assert (fx, fy, cx, cy) == (50.0, 51.0, 25.0, 24.0)


def test_camera_matrix_radial_layout(tmp_path):
    d = str(tmp_path)
    with open(os.path.join(d, "cameras.txt"), "w") as f:
        f.write("1 RADIAL 100 80 50.0 50.0 40.0 0.1 0.01\n")
    sm = colmap.SceneManager(d)
    sm.load_cameras()
    K = sm.camera_matrix(1)
    np.testing.assert_allclose(
        K, [[50, 0, 50], [0, 50, 40], [0, 0, 1]], atol=0
    )


def test_colmap_to_standard_opencv_principal_point(tmp_path):
    base = str(tmp_path)
    _write_opencv_colmap_model(os.path.join(base, "sparse", "0"), w=10, h=8)
    out = os.path.join(base, "std")
    colmap.colmap_to_standard(base, out, holdout=2)
    K = np.loadtxt(os.path.join(out, "test", "intrinsics", "00000.txt"))
    K = K.reshape(4, 4)
    # OPENCV params [fx fy cx cy k1 k2 p1 p2]: principal point is cx,cy=5,4
    # (not the tangential coefficients p1/p2)
    np.testing.assert_allclose(
        [K[0, 0], K[1, 1], K[0, 2], K[1, 2]], [12.0, 12.0, 5.0, 4.0]
    )


def test_export_cams_meta_rejects_fisheye(tmp_path):
    d = os.path.join(str(tmp_path), "sparse", "0")
    os.makedirs(d)
    with open(os.path.join(d, "cameras.txt"), "w") as f:
        f.write("1 OPENCV_FISHEYE 100 80 50 50 50 40 0.1 0.01 0.001 0.002\n")
    with open(os.path.join(d, "images.txt"), "w") as f:
        f.write("1 1 0 0 0 0 0 2 1 x.png\n\n")
    with open(os.path.join(d, "points3D.txt"), "w") as f:
        f.write("1 0.5 0.5 1.0 255 0 0 0.1 1 0\n")
    with pytest.raises(ValueError, match="FISHEYE"):
        colmap.export_cams_meta(str(tmp_path), out_mode="cams_meta")


def test_scene_manager_text_points3d(tmp_path):
    d = str(tmp_path)
    with open(os.path.join(d, "cameras.txt"), "w") as f:
        f.write("1 SIMPLE_PINHOLE 64 48 50.0 32.0 24.0\n")
    with open(os.path.join(d, "images.txt"), "w") as f:
        f.write("1 1 0 0 0 0 0 2 1 x.png\n10.0 20.0 7\n")
    with open(os.path.join(d, "points3D.txt"), "w") as f:
        f.write("# comment\n7 0.5 -0.5 1.5 255 0 0 0.25 1 0 1 3\n")
    sm = colmap.SceneManager(d).load()
    np.testing.assert_allclose(sm.points3D[0], [0.5, -0.5, 1.5])
    assert sm.point3D_ids.tolist() == [7]
    np.testing.assert_allclose(sm.point3D_errors, [0.25])
    assert sm.point3D_id_to_images[7].tolist() == [1, 1]
    pts = sm.image_points3D(1)
    np.testing.assert_allclose(pts, [[0.5, -0.5, 1.5]])
