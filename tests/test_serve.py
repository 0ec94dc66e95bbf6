"""`whmr-serve` HTTP daemon tests: protocol round trip against a frozen
bundle served in-process (ephemeral port, real http client)."""

import io
import json
import threading
import urllib.error
import urllib.request

import cv2
import numpy as np
import pytest

from whmr_tpu.utils.testing import make_example_inputs, tiny_config


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    """Tiny demo-variant bundle behind a live WHRMServer on an ephemeral
    port; yields the base url."""
    import jax
    import jax.numpy as jnp

    from whmr_tpu.data.assets import synthetic_smpl_assets
    from whmr_tpu.inference.export import export_serving, save_exported
    from whmr_tpu.inference.pipeline import DemoPipeline
    from whmr_tpu.inference.serve_cli import WHMRServer
    from whmr_tpu.models.regressor import body_consts_from_assets
    from whmr_tpu.models.whmr import WHMR
    from whmr_tpu.training.train_step import create_train_state

    cfg = tiny_config()
    assets = synthetic_smpl_assets()
    consts = body_consts_from_assets(assets)
    model = WHMR(cfg)
    inputs = make_example_inputs(cfg, 2)
    state = create_train_state(
        cfg, model, consts, jax.random.PRNGKey(0),
        {k: jnp.asarray(v) for k, v in inputs.items()},
    )
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    exp, flat = export_serving(
        cfg, model, variables, consts, 2, camcalib=False, platforms=("cpu",),
    )
    bundle = str(tmp_path_factory.mktemp("serve") / "bundle")
    save_exported(bundle, exp, flat, cfg, 2, False)

    pipe = DemoPipeline(cfg, None, assets, max_people=2, use_camcalib=False,
                        bundle=bundle)
    srv = WHMRServer(pipe, dict(pipe._served.meta))
    httpd = srv.bind("127.0.0.1", 0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{httpd.server_address[1]}"
    finally:
        httpd.shutdown()
        httpd.server_close()


def _post(url, body, timeout=300):
    req = urllib.request.Request(url, data=body, method="POST")
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, r.headers.get("Content-Type"), r.read()


class TestServe:
    def test_healthz_and_meta(self, server):
        with urllib.request.urlopen(server + "/healthz", timeout=60) as r:
            h = json.loads(r.read())
        assert h["status"] == "ok" and h["frozen"] is True
        assert h["max_people"] == 2 and h["camcalib"] is False
        with urllib.request.urlopen(server + "/meta", timeout=60) as r:
            meta = json.loads(r.read())
        assert meta["variant"] == "demo" and meta["batch_size"] == 2

    def test_infer_image_bytes_npz_response(self, server):
        img = np.random.RandomState(0).randint(0, 255, (240, 200, 3), np.uint8)
        ok, png = cv2.imencode(".png", img)
        assert ok
        status, ctype, body = _post(server + "/infer", png.tobytes())
        assert status == 200 and ctype == "application/octet-stream"
        out = np.load(io.BytesIO(body))
        assert int(out["n_people"]) >= 1
        assert out["verts"].shape[-2:] == (6890, 3)
        assert np.isfinite(out["verts"]).all()
        assert out["detections"].shape[-1] == 5

    def test_infer_npz_with_bboxes(self, server):
        """Request-supplied bboxes bypass the server detector: two boxes
        in, two people out, crops centered where the client asked."""
        img = np.random.RandomState(1).randint(0, 255, (300, 400, 3), np.uint8)
        buf = io.BytesIO()
        np.savez(buf, image=img,
                 bboxes=np.array([[100.0, 150.0, 120.0],
                                  [300.0, 150.0, 120.0]], np.float32))
        status, _, body = _post(server + "/infer", buf.getvalue())
        assert status == 200
        out = np.load(io.BytesIO(body))
        assert int(out["n_people"]) == 2
        np.testing.assert_allclose(out["detections"][:, 0], [100.0, 300.0])
        np.testing.assert_allclose(out["detections"][:, 3], 1.0)

    def test_infer_json_format(self, server):
        img = np.random.RandomState(2).randint(0, 255, (64, 64, 3), np.uint8)
        ok, jpg = cv2.imencode(".jpg", img)
        status, ctype, body = _post(server + "/infer?format=json", jpg.tobytes())
        assert status == 200 and ctype == "application/json"
        out = json.loads(body)
        assert out["n_people"] >= 1
        assert len(out["verts"][0]) == 6890

    def test_bad_requests(self, server):
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(server + "/infer", b"not an image at all")
        assert e.value.code == 400
        assert "error" in json.loads(e.value.read())

        buf = io.BytesIO()
        np.savez(buf, wrong_key=np.zeros((4, 4, 3), np.uint8))
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(server + "/infer", buf.getvalue())
        assert e.value.code == 400

        with pytest.raises(urllib.error.HTTPError) as e:
            with urllib.request.urlopen(server + "/nope", timeout=60):
                pass
        assert e.value.code == 404


class TestParseBody:
    def test_npy_single_array_rejected(self):
        from whmr_tpu.inference.serve_cli import _parse_infer_body

        buf = io.BytesIO()
        np.save(buf, np.zeros((8, 8, 3), np.uint8))
        with pytest.raises(ValueError):
            _parse_infer_body(buf.getvalue())

    def test_bad_dtype_rejected(self):
        from whmr_tpu.inference.serve_cli import _parse_infer_body

        buf = io.BytesIO()
        np.savez(buf, image=np.zeros((8, 8, 3), np.float32))
        with pytest.raises(ValueError, match="uint8"):
            _parse_infer_body(buf.getvalue())

    def test_bbox_score_parsing(self):
        from whmr_tpu.inference.serve_cli import _parse_infer_body

        buf = io.BytesIO()
        np.savez(buf, image=np.zeros((8, 8, 3), np.uint8),
                 bboxes=np.array([[4.0, 4.0, 6.0, 0.7]], np.float32))
        img, dets = _parse_infer_body(buf.getvalue())
        assert img.shape == (8, 8, 3)
        assert len(dets) == 1 and dets[0].score == pytest.approx(0.7)
