"""Render server (tools/serve.py): load a trained checkpoint, serve /health,
/meta and /render (PNG) over HTTP — the framework's serving path (the
reference has none)."""

import dataclasses
import http.client
import importlib.util
import os
import threading

import numpy as np
import pytest


def _load_serve():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "serve_mod", os.path.join(repo, "tools", "serve.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.slow
def test_serve_render_endpoint(tmp_path):
    from unboundednerfpytorch_tpu.configs.schema import (
        DataConfig, ExpConfig, ModelRenderConfig, TrainStageConfig,
    )
    from unboundednerfpytorch_tpu.data import synthetic
    from unboundednerfpytorch_tpu.train import loop
    from unboundednerfpytorch_tpu.utils import checkpoint as ckpt

    data = synthetic.make_data_dict(n_views=4, H=16, W=16)
    cfg = ExpConfig(
        model="FourierGrid",
        data=DataConfig(white_bkgd=True),
        coarse_train=dataclasses.replace(TrainStageConfig(), N_iters=0),
        fine_train=TrainStageConfig(
            N_iters=20, N_rand=64, pervoxel_lr=False, pg_scale=(),
            skip_zero_grad_fields=("density", "k0"),
        ),
        fine_model_and_render=ModelRenderConfig(
            num_voxels_density=16**3, num_voxels_rgb=16**3,
            num_voxels_base_density=16**3, num_voxels_base_rgb=16**3,
            rgbnet_dim=4, rgbnet_width=16, rgbnet_depth=2,
            alpha_init=1e-2, fast_color_thres=1e-4, fourier_freq_num=1,
            maskout_near_cam_vox=False,
        ),
    )
    family, mcfg, params, _ = loop.run_train(cfg, data, log_fn=lambda *a: None)
    path = os.path.join(str(tmp_path), "fine_last")
    ckpt.save_model(path, family, mcfg, params)

    serve = _load_serve()
    service = serve.RenderService(path)
    from http.server import HTTPServer

    srv = HTTPServer(("127.0.0.1", 0), serve.make_handler(service))
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        conn.request("GET", "/health")
        r = conn.getresponse()
        assert r.status == 200
        import json

        health = json.loads(r.read())
        assert health["status"] == "ok" and health["family"] == "FourierGrid"

        conn.request("GET", "/render?theta=30&phi=-15&r=1.3&w=64&h=48")
        r = conn.getresponse()
        assert r.status == 200
        assert r.getheader("Content-Type") == "image/png"
        png = r.read()
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        import io

        import imageio.v2 as imageio

        img = imageio.imread(io.BytesIO(png))
        assert img.shape[:2] == (48, 64)
        # the white-background scene must not render all-black
        assert img.mean() > 40

        conn.request("GET", "/render?theta=abc")
        assert conn.getresponse().status == 400

        conn.request("GET", "/nope")
        assert conn.getresponse().status == 404
    finally:
        srv.shutdown()
        srv.server_close()
