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

    from whmr_tpu.inference.serve_cli import BatchingExecutor

    pipe = DemoPipeline(cfg, None, assets, max_people=2, use_camcalib=False,
                        bundle=bundle)
    executor = BatchingExecutor(pipe, max_wait_ms=20.0)
    srv = WHMRServer(pipe, dict(pipe._served.meta), executor=executor)
    httpd = srv.bind("127.0.0.1", 0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{httpd.server_address[1]}", pipe, executor
    finally:
        executor.shutdown()
        httpd.shutdown()
        httpd.server_close()


@pytest.fixture()
def url(server):
    return server[0]


def _post(url, body, timeout=300):
    req = urllib.request.Request(url, data=body, method="POST")
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, r.headers.get("Content-Type"), r.read()


class TestServe:
    def test_healthz_and_meta(self, url):
        with urllib.request.urlopen(url + "/healthz", timeout=60) as r:
            h = json.loads(r.read())
        assert h["status"] == "ok" and h["frozen"] is True
        assert h["max_people"] == 2 and h["camcalib"] is False
        with urllib.request.urlopen(url + "/meta", timeout=60) as r:
            meta = json.loads(r.read())
        assert meta["variant"] == "demo" and meta["batch_size"] == 2

    def test_infer_image_bytes_npz_response(self, url):
        img = np.random.RandomState(0).randint(0, 255, (240, 200, 3), np.uint8)
        ok, png = cv2.imencode(".png", img)
        assert ok
        status, ctype, body = _post(url + "/infer", png.tobytes())
        assert status == 200 and ctype == "application/octet-stream"
        out = np.load(io.BytesIO(body))
        assert int(out["n_people"]) >= 1
        assert out["verts"].shape[-2:] == (6890, 3)
        assert np.isfinite(out["verts"]).all()
        assert out["detections"].shape[-1] == 5

    def test_infer_npz_with_bboxes(self, url):
        """Request-supplied bboxes bypass the server detector: two boxes
        in, two people out, crops centered where the client asked."""
        img = np.random.RandomState(1).randint(0, 255, (300, 400, 3), np.uint8)
        buf = io.BytesIO()
        np.savez(buf, image=img,
                 bboxes=np.array([[100.0, 150.0, 120.0],
                                  [300.0, 150.0, 120.0]], np.float32))
        status, _, body = _post(url + "/infer", buf.getvalue())
        assert status == 200
        out = np.load(io.BytesIO(body))
        assert int(out["n_people"]) == 2
        np.testing.assert_allclose(out["detections"][:, 0], [100.0, 300.0])
        np.testing.assert_allclose(out["detections"][:, 3], 1.0)

    def test_infer_fields_projection(self, url):
        """?fields=k1,k2 slims the response to chosen output keys (plus
        the n_people/detections scalars); unknown keys -> 400 with the
        available list."""
        img = np.random.RandomState(3).randint(0, 255, (96, 96, 3), np.uint8)
        ok, png = cv2.imencode(".png", img)
        status, _, body = _post(url + "/infer?fields=pred_cam_t", png.tobytes())
        assert status == 200
        out = np.load(io.BytesIO(body))
        assert set(out.files) == {"pred_cam_t", "n_people", "detections"}
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(url + "/infer?fields=nope", png.tobytes())
        assert e.value.code == 400
        err = json.loads(e.value.read())
        assert "nope" in err["error"] and "verts" in err["available"]

    def test_infer_json_format(self, url):
        img = np.random.RandomState(2).randint(0, 255, (64, 64, 3), np.uint8)
        ok, jpg = cv2.imencode(".jpg", img)
        status, ctype, body = _post(url + "/infer?format=json", jpg.tobytes())
        assert status == 200 and ctype == "application/json"
        out = json.loads(body)
        assert out["n_people"] >= 1
        assert len(out["verts"][0]) == 6890

    def test_bad_requests(self, url):
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(url + "/infer", b"not an image at all")
        assert e.value.code == 400
        assert "error" in json.loads(e.value.read())

        buf = io.BytesIO()
        np.savez(buf, wrong_key=np.zeros((4, 4, 3), np.uint8))
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(url + "/infer", buf.getvalue())
        assert e.value.code == 400

        with pytest.raises(urllib.error.HTTPError) as e:
            with urllib.request.urlopen(url + "/nope", timeout=60):
                pass
        assert e.value.code == 404


class TestPortableResponses:
    def test_bf16_arrays_cast_to_f32_in_npz_and_json(self):
        """A --bf16 traced graph returns ml_dtypes bfloat16 arrays; raw
        npz would carry them as void bytes a plain-numpy client cannot
        read (found driving the split bundle on the chip). The protocol
        boundary must cast to float32."""
        import io as _io

        import jax.numpy as jnp

        from whmr_tpu.inference.serve_cli import (
            _result_to_json_bytes, _result_to_npz_bytes,
        )

        result = {
            "render_rotmat": np.asarray(jnp.eye(3, dtype=jnp.bfloat16)[None]),
            "verts": np.zeros((1, 4, 3), np.float32),
            "n_people": 1,
        }
        z = np.load(_io.BytesIO(_result_to_npz_bytes(result)))
        assert z["render_rotmat"].dtype == np.float32
        np.testing.assert_allclose(z["render_rotmat"][0], np.eye(3))
        import json as _json

        j = _json.loads(_result_to_json_bytes(result))
        assert j["render_rotmat"][0][0][0] == 1.0


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


class TestCoalescing:
    def test_deterministic_group_and_equality(self, server):
        """3 queued single-crop requests at capacity 2 coalesce into a
        batch of 2 plus a batch of 1, and every request's rows match a
        per-request pipeline.run_image exactly (row independence)."""
        from whmr_tpu.inference.pipeline import Detection
        from whmr_tpu.inference.serve_cli import BatchingExecutor

        _, pipe, _ = server
        ex = BatchingExecutor(pipe, max_wait_ms=1.0, start=False)
        rng = np.random.RandomState(3)
        imgs = [rng.randint(0, 255, (200, 160, 3), np.uint8) for _ in range(3)]
        dets = [Detection(80.0, 100.0, 90.0)]

        import time

        reqs = []
        for k, img in enumerate(imgs):
            t = threading.Thread(
                target=lambda i=img: reqs.append(ex.submit(i, dets=dets))
            )
            t.start()
            # enforce deterministic queue order: wait for this submit to
            # enqueue before starting the next
            deadline = time.time() + 30
            while ex.q.qsize() < k + 1 and time.time() < deadline:
                time.sleep(0.01)
        assert ex.q.qsize() == 3

        # drain manually: the first group fills capacity 2 exactly (the
        # third request is never pulled, so it stays queued — not a carry)
        first = ex.q.get()
        group = [first]; ex._collect_group(group)
        assert len(group) == 2 and ex._carry is None
        assert ex.q.qsize() == 1
        ex._run_group(group)
        for r in group:
            r.event.set()
        group2 = [ex.q.get()]; ex._collect_group(group2)
        assert len(group2) == 1
        ex._run_group(group2)
        for r in group2:
            r.event.set()

        assert ex.stats["device_batches"] == 2
        assert ex.stats["requests"] == 3
        assert ex.stats["coalesced_requests"] == 1

        deadline = time.time() + 30
        while len(reqs) < 3 and time.time() < deadline:
            time.sleep(0.01)
        assert len(reqs) == 3
        for img, got in zip(imgs, [r.result for r in group] + [group2[0].result]):
            ref = pipe.run_image(img, dets=dets)
            assert got["n_people"] == ref["n_people"] == 1
            np.testing.assert_allclose(got["verts"], ref["verts"],
                                       rtol=1e-6, atol=1e-6)
            np.testing.assert_allclose(got["verts_world"],
                                       ref["verts_world"],
                                       rtol=1e-6, atol=1e-6)

    def test_reload_shrunk_capacity_chunks_queued_group(self, server, tmp_path):
        """A /reload that SHRINKS the device batch must not crash requests
        already queued against the old capacity (regression: pad =
        capacity - rows went negative and np.zeros raised, 500-ing every
        request in the group). _run_group now slices the group into
        chunks of the snapshot pipeline's batch size."""
        import jax
        import jax.numpy as jnp

        from whmr_tpu.data.assets import synthetic_smpl_assets
        from whmr_tpu.inference.export import export_serving, save_exported
        from whmr_tpu.inference.pipeline import DemoPipeline, Detection
        from whmr_tpu.inference.serve_cli import BatchingExecutor
        from whmr_tpu.models.regressor import body_consts_from_assets
        from whmr_tpu.models.whmr import WHMR
        from whmr_tpu.training.train_step import create_train_state

        _, pipe, _ = server
        ex = BatchingExecutor(pipe, max_wait_ms=1.0, start=False)
        rng = np.random.RandomState(7)
        img = rng.randint(0, 255, (200, 160, 3), np.uint8)
        dets = [Detection(60.0, 80.0, 70.0), Detection(100.0, 120.0, 80.0)]
        res = []
        t = threading.Thread(target=lambda: res.append(ex.submit(img, dets=dets)))
        t.start()
        import time

        deadline = time.time() + 30
        while ex.q.qsize() < 1 and time.time() < deadline:
            time.sleep(0.01)

        # emulate WHMRServer.reload swapping in a bundle traced at batch 1
        # (same weights: the fixture's deterministic PRNGKey(0) init)
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
            cfg, model, variables, consts, 1, camcalib=False,
            platforms=("cpu",),
        )
        bundle = str(tmp_path / "bundle1")
        save_exported(bundle, exp, flat, cfg, 1, False)
        small = DemoPipeline(cfg, None, assets, max_people=1,
                             use_camcalib=False, bundle=bundle)
        ex.pipeline = small
        ex.capacity = 1

        group = [ex.q.get()]
        ex._collect_group(group)
        ex._run_group(group)  # 2 rows through a batch-1 graph: two chunks
        for r in group:
            r.event.set()
        t.join(30)
        assert group[0].error is None
        got = res[0]
        assert got["n_people"] == 2
        for i, d in enumerate(dets):
            ref = small.run_image(img, dets=[d])
            np.testing.assert_allclose(got["verts"][i], ref["verts"][0],
                                       rtol=1e-5, atol=1e-5)

    def test_concurrent_http_posts_and_stats(self, server):
        """Concurrent clients all get correct responses through the
        coalescing path; /stats accounts for every request."""
        url, _, ex = server
        before = dict(ex.stats)
        # results come back to the MAIN thread for assertion: an
        # AssertionError inside a worker thread only kills that thread
        # and pytest never sees it (and RandomState is not thread-safe
        # to share, so each client gets its own)
        results = [None] * 4

        def post_one(seed):
            rng = np.random.RandomState(seed)
            img = rng.randint(0, 255, (180, 180, 3), np.uint8)
            buf = io.BytesIO()
            np.savez(buf, image=img,
                     bboxes=np.array([[90.0, 90.0, 100.0]], np.float32))
            status, _, body = _post(url + "/infer", buf.getvalue())
            results[seed] = (status, body)

        threads = [threading.Thread(target=post_one, args=(i,))
                   for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert not any(t.is_alive() for t in threads)
        for r in results:
            assert r is not None
            status, body = r
            assert status == 200
            out = np.load(io.BytesIO(body))
            assert int(out["n_people"]) == 1
            assert np.isfinite(out["verts"]).all()

        assert ex.stats["requests"] - before["requests"] == 4
        made = ex.stats["device_batches"] - before["device_batches"]
        assert 2 <= made <= 4  # capacity 2: at best 2 batches, worst 4

        with urllib.request.urlopen(url + "/stats", timeout=60) as r:
            stats = json.loads(r.read())
        assert stats["requests"] == ex.stats["requests"]

    def test_executor_rejects_camcalib(self, server):
        from whmr_tpu.inference.serve_cli import BatchingExecutor

        _, pipe, _ = server
        pipe_cc = type("P", (), {"use_camcalib": True})()
        with pytest.raises(ValueError, match="camcalib"):
            BatchingExecutor(pipe_cc)

    def test_zero_detection_request(self, server):
        """A request whose detector finds nobody returns empty arrays,
        not an error (and does not poison the shared batch)."""
        _, pipe, ex = server
        img = np.zeros((100, 100, 3), np.uint8)
        out = ex.submit(img, dets=[])
        assert out["n_people"] == 0
        assert out["verts"].shape[0] == 0
        assert out["detections"].shape == (0, 5)

    def test_carry_when_next_request_does_not_fit(self, server):
        """A pulled request that would overflow capacity becomes the carry
        and opens the next batch instead of being dropped or split."""
        import time

        from whmr_tpu.inference.pipeline import Detection
        from whmr_tpu.inference.serve_cli import BatchingExecutor

        _, pipe, _ = server
        ex = BatchingExecutor(pipe, max_wait_ms=1.0, start=False)
        img = np.random.RandomState(5).randint(0, 255, (200, 160, 3), np.uint8)
        one = [Detection(80.0, 100.0, 90.0)]
        two = [Detection(60.0, 100.0, 90.0), Detection(120.0, 100.0, 90.0)]

        done = []
        for dets in (one, two):
            threading.Thread(
                target=lambda d=dets: done.append(ex.submit(img, dets=d))
            ).start()
            deadline = time.time() + 30
            want = 1 if dets is one else 2
            while ex.q.qsize() < want and time.time() < deadline:
                time.sleep(0.01)

        first = ex.q.get()
        group = [first]; ex._collect_group(group)
        # the 2-crop request does not fit next to the 1-crop one
        assert len(group) == 1 and ex._carry is not None
        ex._run_group(group)
        for r in group:
            r.event.set()
        carry, ex._carry = ex._carry, None
        group2 = [carry]; ex._collect_group(group2)
        assert len(group2) == 1 and group2[0].n == 2
        ex._run_group(group2)
        for r in group2:
            r.event.set()

        deadline = time.time() + 30
        while len(done) < 2 and time.time() < deadline:
            time.sleep(0.01)
        assert sorted(d["n_people"] for d in done) == [1, 2]

    def test_cancelled_orphan_is_skipped(self, server):
        """A request whose submit timed out must not burn device-batch
        capacity: the worker drops it (event set, no compute)."""
        from whmr_tpu.inference.pipeline import Detection
        from whmr_tpu.inference.serve_cli import BatchingExecutor

        _, pipe, _ = server
        ex = BatchingExecutor(pipe, max_wait_ms=1.0, start=False)
        img = np.zeros((100, 100, 3), np.uint8)
        dets = [Detection(50.0, 50.0, 60.0)]

        errs = []

        def doomed():
            try:
                ex.submit(img, dets=dets, timeout=0.01)
            except TimeoutError as e:
                errs.append(e)

        t = threading.Thread(target=doomed)
        t.start()
        t.join(timeout=30)
        assert errs  # timed out (no worker running)

        # a live request behind the orphan still gets served
        live = threading.Thread(
            target=lambda: ex.submit(img, dets=dets, timeout=120)
        )
        live.start()
        import time

        deadline = time.time() + 30
        while ex.q.qsize() < 2 and time.time() < deadline:
            time.sleep(0.01)

        first = ex.q.get()
        assert first.cancelled
        # mimic the worker loop's skip
        first.event.set()
        nxt = ex.q.get()
        group = [nxt]; ex._collect_group(group)
        assert group == [nxt] and not nxt.cancelled
        ex._run_group(group)
        for r in group:
            r.event.set()
        live.join(timeout=30)
        assert not live.is_alive()
        assert ex.stats["requests"] == 1  # the orphan never hit the device


class TestCamCalibCoalescing:
    """Round-4: CamCalib runs once per unique frame through the
    standalone graph and crops coalesce with per-crop cam_rotmat —
    results must match per-request run_image (in-graph CamCalib)."""

    @pytest.fixture(scope="class")
    def cam_pipe(self):
        import jax
        import jax.numpy as jnp

        from whmr_tpu.data.assets import synthetic_smpl_assets
        from whmr_tpu.inference.pipeline import DemoPipeline
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
        return DemoPipeline(
            cfg, {"params": state.params, "batch_stats": state.batch_stats},
            assets, max_people=2, use_camcalib=True,
        )

    def test_coalesced_matches_per_request(self, cam_pipe):
        from whmr_tpu.inference.pipeline import Detection
        from whmr_tpu.inference.serve_cli import BatchingExecutor

        ex = BatchingExecutor(cam_pipe, max_wait_ms=1.0, start=False)
        rng = np.random.RandomState(5)
        imgs = [rng.randint(0, 255, (200, 160, 3), np.uint8) for _ in range(2)]
        dets = [Detection(80.0, 100.0, 90.0)]

        results = []
        threads = [
            threading.Thread(target=lambda i=img: results.append(
                (i, ex.submit(i, dets=dets))))
            for img in imgs
        ]
        for t in threads:
            t.start()
        import time

        deadline = time.time() + 60
        while ex.q.qsize() < 2 and time.time() < deadline:
            time.sleep(0.01)
        # bounded get: if a submit thread died before q.put, fail loudly
        # instead of deadlocking the suite (round-4 regression)
        group = [ex.q.get(timeout=30)]
        ex._collect_group(group)
        assert len(group) == 2  # two single-crop frames share one batch
        ex._run_group(group)
        for r in group:
            r.event.set()
        for t in threads:
            t.join(timeout=60)
        assert len(results) == 2
        assert ex.stats["camcalib_calls"] == 2  # once per unique frame

        for img, got in results:
            ref = cam_pipe.run_image(img, dets=dets)  # in-graph CamCalib
            np.testing.assert_allclose(got["verts"], ref["verts"],
                                       rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(got["verts_world"],
                                       ref["verts_world"],
                                       rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(got["cam_rotmat"], ref["cam_rotmat"],
                                       rtol=1e-5, atol=1e-6)
            # the pitch-FLIPPED overlay rotation survives the substitution
            np.testing.assert_allclose(got["render_rotmat"],
                                       ref["render_rotmat"],
                                       rtol=1e-5, atol=1e-6)

    def test_cache_hits_repeated_frame(self, cam_pipe):
        from whmr_tpu.inference.pipeline import Detection
        from whmr_tpu.inference.serve_cli import BatchingExecutor

        ex = BatchingExecutor(cam_pipe, max_wait_ms=1.0, start=True)
        rng = np.random.RandomState(6)
        img = rng.randint(0, 255, (160, 160, 3), np.uint8)
        dets = [Detection(80.0, 80.0, 90.0)]
        try:
            a = ex.submit(img, dets=dets)
            b = ex.submit(img, dets=dets)  # same frame -> cache hit
            assert ex.stats["camcalib_calls"] == 1
            assert ex.stats["camcalib_cache_hits"] == 1
            np.testing.assert_allclose(a["verts"], b["verts"],
                                       rtol=1e-6, atol=1e-6)
        finally:
            ex.shutdown()

    def test_frozen_batch_camcalib_bundle_rejected(self, cam_pipe, tmp_path):
        """A batch-mode camcalib bundle has no standalone CamCalib entry:
        the executor must refuse it with a pointer to --camcalib split."""
        from whmr_tpu.inference.serve_cli import BatchingExecutor

        class FrozenLike:
            use_camcalib = True
            _cam_fwd = None
            max_people = 2

        with pytest.raises(ValueError, match="camcalib split"):
            BatchingExecutor(FrozenLike(), start=False)

    def test_split_bundle_coalesces_and_matches_live(self, cam_pipe, tmp_path):
        """A `whmr-export --camcalib split` bundle coalesces like the live
        model: the executor accepts it, CamCalib runs once per unique
        frame through the frozen per-frame graph, and results match the
        live pipeline's in-graph-CamCalib run_image."""
        from whmr_tpu.data.assets import synthetic_smpl_assets
        from whmr_tpu.inference.export import (
            export_camcalib, export_serving, save_exported,
        )
        from whmr_tpu.inference.pipeline import DemoPipeline, Detection
        from whmr_tpu.inference.serve_cli import BatchingExecutor

        cfg = cam_pipe.cfg
        model, variables = cam_pipe.model, cam_pipe.variables
        consts = cam_pipe.consts
        exp, flat = export_serving(
            cfg, model, variables, consts, 2, camcalib="split",
            platforms=("cpu",),
        )
        cam_exp = export_camcalib(cfg, model, variables, consts,
                                  platforms=("cpu",))
        out_dir = str(tmp_path / "bundle_split")
        save_exported(out_dir, exp, flat, cfg, 2, "split", cam_exp=cam_exp)

        pipe = DemoPipeline(cfg, None, synthetic_smpl_assets(), max_people=2,
                            use_camcalib=True, bundle=out_dir)
        assert pipe._cam_fwd is not None  # split bundles can coalesce
        ex = BatchingExecutor(pipe, max_wait_ms=1.0, start=True)
        rng = np.random.RandomState(7)
        img = rng.randint(0, 255, (200, 160, 3), np.uint8)
        dets = [Detection(80.0, 100.0, 90.0)]
        try:
            got = ex.submit(img, dets=dets)
            assert ex.stats["camcalib_calls"] == 1
        finally:
            ex.shutdown()

        ref = cam_pipe.run_image(img, dets=dets)  # live, in-graph CamCalib
        np.testing.assert_allclose(got["verts"], ref["verts"],
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(got["verts_world"], ref["verts_world"],
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(got["cam_rotmat"], ref["cam_rotmat"],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(got["render_rotmat"], ref["render_rotmat"],
                                   rtol=1e-5, atol=1e-6)

        # the whole-frame demo path works off the split bundle too
        direct = pipe.run_image(img, dets=dets)
        np.testing.assert_allclose(direct["verts"], ref["verts"],
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(direct["render_rotmat"],
                                   ref["render_rotmat"],
                                   rtol=1e-5, atol=1e-6)


class TestServeGuards:
    def test_corrupt_npz_returns_400(self, url):
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(url + "/infer", b"PK\x03\x04 this is not really a zip")
        assert e.value.code == 400
        assert "npz" in json.loads(e.value.read())["error"]

    def test_main_requires_weights_source(self):
        from whmr_tpu.inference import serve_cli

        with pytest.raises(SystemExit, match="needs weights"):
            serve_cli.main(["--port", "0"])


class TestDataParallelServing:
    """`--data_parallel N`: the live pipeline shards crop batches over a
    'data' mesh. Rows are independent, so sharded results must match the
    single-device pipeline (net-new vs the single-GPU reference demo)."""

    @pytest.fixture(scope="class")
    def pipelines(self):
        import jax
        import jax.numpy as jnp

        from whmr_tpu.data.assets import synthetic_smpl_assets
        from whmr_tpu.inference.pipeline import DemoPipeline
        from whmr_tpu.models.regressor import body_consts_from_assets
        from whmr_tpu.models.whmr import WHMR
        from whmr_tpu.parallel import make_mesh
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
        mesh = make_mesh(4)
        dp = DemoPipeline(cfg, variables, assets, max_people=4,
                          use_camcalib=False, mesh=mesh)
        single = DemoPipeline(cfg, variables, assets, max_people=4,
                              use_camcalib=False)
        return dp, single

    def test_dp_matches_single_device(self, pipelines):
        from whmr_tpu.inference.pipeline import Detection

        dp, single = pipelines
        rng = np.random.RandomState(7)
        img = rng.randint(0, 255, (96, 128, 3), np.uint8)
        dets = [Detection(40.0, 48.0, 60.0), Detection(90.0, 50.0, 70.0),
                Detection(64.0, 48.0, 90.0)]
        a = dp.run_image(img, dets=dets)
        b = single.run_image(img, dets=dets)
        assert a["n_people"] == b["n_people"] == 3
        for k in ("verts", "verts_world", "pred_cam_t", "focal_length"):
            np.testing.assert_allclose(a[k], b[k], rtol=2e-5, atol=2e-5)

    def test_dp_camcalib_frame_replicated(self, pipelines):
        """CamCalib mode still works under DP: the batch-1 full frame is
        replicated while crops shard."""
        import jax

        from whmr_tpu.data.assets import synthetic_smpl_assets
        from whmr_tpu.inference.pipeline import DemoPipeline, Detection
        from whmr_tpu.parallel import make_mesh

        dp, single = pipelines
        cfg = dp.cfg
        assets = synthetic_smpl_assets()
        cal = DemoPipeline(cfg, single.variables, assets, max_people=4,
                           use_camcalib=True, mesh=make_mesh(4))
        rng = np.random.RandomState(3)
        img = rng.randint(0, 255, (96, 128, 3), np.uint8)
        out = cal.run_image(img, dets=[Detection(64.0, 48.0, 80.0)])
        assert out["n_people"] == 1
        assert np.isfinite(out["verts"]).all()

    def test_dp_executor_coalesces_across_mesh(self, pipelines):
        """The serving BatchingExecutor shards its coalesced batch."""
        from whmr_tpu.inference.pipeline import Detection
        from whmr_tpu.inference.serve_cli import BatchingExecutor

        dp, single = pipelines
        ex = BatchingExecutor(dp, max_wait_ms=20.0)
        try:
            rng = np.random.RandomState(11)
            img = rng.randint(0, 255, (80, 80, 3), np.uint8)
            dets = [Detection(40.0, 40.0, 60.0)]
            got = ex.submit(img, dets=dets, timeout=600)
            want = single.run_image(img, dets=dets)
            np.testing.assert_allclose(got["verts"], want["verts"],
                                       rtol=2e-5, atol=2e-5)
        finally:
            ex.shutdown()

    def test_dp_rejects_bundle_and_bad_divisor(self):
        from whmr_tpu.data.assets import synthetic_smpl_assets
        from whmr_tpu.inference.pipeline import DemoPipeline
        from whmr_tpu.parallel import make_mesh

        assets = synthetic_smpl_assets()
        cfg = tiny_config()
        mesh = make_mesh(4)
        with pytest.raises(ValueError, match="divisible"):
            DemoPipeline(cfg, None, assets, max_people=3,
                         use_camcalib=False, mesh=mesh)
        with pytest.raises(ValueError, match="single device"):
            DemoPipeline(cfg, None, assets, max_people=4,
                         use_camcalib=False, mesh=mesh, bundle="whatever")

    def test_tp_matches_single_device(self, pipelines):
        """--tensor_parallel: ViT block weights split over the 'model'
        axis (Megatron rules); outputs must still match single-device."""
        from whmr_tpu.data.assets import synthetic_smpl_assets
        from whmr_tpu.inference.pipeline import DemoPipeline, Detection
        from whmr_tpu.parallel import make_mesh

        dp, single = pipelines
        mesh = make_mesh(4, model_parallel=2)  # dp2 x tp2
        tp = DemoPipeline(dp.cfg, single.variables, synthetic_smpl_assets(),
                          max_people=2, use_camcalib=False, mesh=mesh)
        rng = np.random.RandomState(17)
        img = rng.randint(0, 255, (96, 128, 3), np.uint8)
        dets = [Detection(40.0, 48.0, 60.0), Detection(90.0, 50.0, 70.0)]
        a = tp.run_image(img, dets=dets)
        b = single.run_image(img, dets=dets)
        for k in ("verts", "verts_world", "pred_cam_t", "focal_length"):
            np.testing.assert_allclose(a[k], b[k], rtol=5e-5, atol=5e-5)

    def test_serving_mesh_resolution(self):
        from argparse import Namespace

        from whmr_tpu.inference.demo_cli import serving_mesh

        assert serving_mesh(Namespace()) is None
        m = serving_mesh(Namespace(data_parallel=2, tensor_parallel=2))
        assert m.shape == {"data": 2, "model": 2}
        m = serving_mesh(Namespace(data_parallel=0, tensor_parallel=2))
        assert m.shape == {"data": 1, "model": 2}
        m = serving_mesh(Namespace(data_parallel=4, tensor_parallel=0))
        assert m.shape == {"data": 4, "model": 1}


class TestWorkerResilience:
    def test_worker_survives_collect_group_crash(self, server):
        """An unexpected exception anywhere in the worker loop fails the
        affected request but must NOT kill the worker thread (a dead
        worker turns every later request into a timeout)."""
        _url, pipe, ex = server
        rng = np.random.RandomState(21)
        img = rng.randint(0, 255, (64, 64, 3), np.uint8)
        from whmr_tpu.inference.pipeline import Detection

        dets = [Detection(32.0, 32.0, 40.0)]
        orig = ex._collect_group
        calls = {"n": 0}

        def boom(group):
            calls["n"] += 1
            raise RuntimeError("injected worker crash")

        ex._collect_group = boom
        try:
            with pytest.raises(RuntimeError, match="injected"):
                ex.submit(img, dets=dets, timeout=60)
        finally:
            ex._collect_group = orig
        assert calls["n"] == 1
        assert ex._thread.is_alive()
        out = ex.submit(img, dets=dets, timeout=120)  # still serving
        assert out["n_people"] == 1


    def test_mid_collection_crash_fails_all_dequeued(self, server):
        """If _collect_group crashes AFTER dequeuing extra requests, every
        dequeued request must get the error (in-place append contract) —
        none may hang until its submit timeout."""
        _url, pipe, ex = server
        rng = np.random.RandomState(23)
        img = rng.randint(0, 255, (64, 64, 3), np.uint8)
        from whmr_tpu.inference.pipeline import Detection

        dets = [Detection(32.0, 32.0, 40.0)]
        orig = ex._collect_group

        def boom(group):
            # dequeue one more request into the group, then die
            item = ex.q.get(timeout=30)
            group.append(item)
            raise RuntimeError("mid-collection crash")

        ex._collect_group = boom
        errs = []

        def submit_one():
            try:
                ex.submit(img, dets=dets, timeout=60)
            except Exception as e:
                errs.append(e)

        try:
            t1 = threading.Thread(target=submit_one)
            t2 = threading.Thread(target=submit_one)
            t1.start(); t2.start()
            t1.join(timeout=45); t2.join(timeout=45)
            assert not t1.is_alive() and not t2.is_alive()
            assert len(errs) == 2
            assert all("mid-collection" in str(e) for e in errs)
        finally:
            ex._collect_group = orig
        assert ex._thread.is_alive()


class TestReload:
    def test_reload_swaps_weights_and_bundle_rejects(self, server):
        """POST /reload: the daemon atomically swaps to a new pipeline;
        a frozen-bundle daemon answers 409."""
        import jax
        import jax.numpy as jnp

        from whmr_tpu.data.assets import synthetic_smpl_assets
        from whmr_tpu.inference.pipeline import DemoPipeline, Detection
        from whmr_tpu.inference.serve_cli import WHMRServer
        from whmr_tpu.models.regressor import body_consts_from_assets
        from whmr_tpu.models.whmr import WHMR
        from whmr_tpu.training.train_step import create_train_state

        cfg = tiny_config()
        assets = synthetic_smpl_assets()
        consts = body_consts_from_assets(assets)
        model = WHMR(cfg)
        inputs = make_example_inputs(cfg, 2)

        def pipe_for(seed):
            state = create_train_state(
                cfg, model, consts, jax.random.PRNGKey(seed),
                {k: jnp.asarray(v) for k, v in inputs.items()},
            )
            return DemoPipeline(
                cfg,
                {"params": state.params, "batch_stats": state.batch_stats},
                assets, max_people=2, use_camcalib=False,
            )

        pipe_a, pipe_b = pipe_for(0), pipe_for(99)
        srv = WHMRServer(pipe_a, {}, executor=None,
                         reload_fn=lambda checkpoint=None, bundle=None: pipe_b)
        httpd = srv.bind("127.0.0.1", 0)
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        base = f"http://127.0.0.1:{httpd.server_address[1]}"
        try:
            rng = np.random.RandomState(9)
            img = rng.randint(0, 255, (80, 80, 3), np.uint8)
            buf = io.BytesIO()
            np.savez(buf, image=img,
                     bboxes=np.array([[40.0, 40.0, 60.0]], np.float32))
            body = buf.getvalue()

            before = np.load(io.BytesIO(_post(base + "/infer", body)[2]))
            r = json.loads(_post(base + "/reload", b"")[2])
            assert r["status"] == "reloaded" and r["reloads"] == 1
            after = np.load(io.BytesIO(_post(base + "/infer", body)[2]))
            # different weights -> different predictions
            assert not np.allclose(before["verts"], after["verts"])
            # and the post-reload daemon serves pipe_b's exact outputs
            want = pipe_b.run_image(
                img, dets=[Detection(40.0, 40.0, 60.0)])
            np.testing.assert_allclose(after["verts"], want["verts"],
                                       rtol=1e-5, atol=1e-5)
            h = json.loads(urllib.request.urlopen(base + "/healthz").read())
            assert h["reloads"] == 1
        finally:
            httpd.shutdown()
            httpd.server_close()

        # daemon without a reload_fn (module fixture): reload must 409
        url_bundle, _pipe, _ex = server
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(url_bundle + "/reload", b"")
        assert e.value.code == 409
        assert "reload unavailable" in json.loads(e.value.read())["error"]

    def test_reload_to_live_checkpoint_refreshes_meta(self):
        """A bundle→live-checkpoint reload must not keep serving the
        retired bundle's meta.json from /meta: clients key dtype/batch
        behavior off it."""
        import jax
        import jax.numpy as jnp

        from whmr_tpu.data.assets import synthetic_smpl_assets
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
        live = DemoPipeline(
            cfg, {"params": state.params, "batch_stats": state.batch_stats},
            assets, max_people=2, use_camcalib=False,
        )
        stale_meta = {"source": "bundle", "format_version": 1,
                      "batch_size": 4}
        srv = WHMRServer(live, dict(stale_meta), executor=None,
                         reload_fn=lambda checkpoint=None, bundle=None: live)
        httpd = srv.bind("127.0.0.1", 0)
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        base = f"http://127.0.0.1:{httpd.server_address[1]}"
        try:
            before = json.loads(urllib.request.urlopen(base + "/meta").read())
            assert before["format_version"] == 1
            _post(base + "/reload", b"")
            after = json.loads(urllib.request.urlopen(base + "/meta").read())
            assert after["source"] == "live checkpoint"
            assert "format_version" not in after
            assert after["crop_hw"] == list(live.cfg.crop_hw)
        finally:
            httpd.shutdown()
            httpd.server_close()

    def test_iuv_detector_rejects_frozen_pipeline(self, server):
        """build_detector('iuv') on a bundle pipeline must fail at
        CONSTRUCTION (the frozen graph has no live model for the dense-IUV
        pass) — the checkpoint-started-daemon /reload-to-bundle path would
        otherwise 500 on every detector request forever."""
        from whmr_tpu.inference.detector import build_detector

        _url, pipe, _ex = server  # module bundle fixture: pipe.model is None
        assert pipe.model is None
        with pytest.raises(ValueError, match="live model"):
            build_detector("iuv", None, pipeline=pipe)

    def test_reload_bundle_mode_swaps_artifact(self, tmp_path):
        """Bundle-mode /reload (round-4): POST {"bundle": dir} atomically
        re-deserializes and swaps the served artifact — the warm
        weight-swap story no longer requires live-checkpoint mode."""
        import jax
        import jax.numpy as jnp

        from whmr_tpu.data.assets import synthetic_smpl_assets
        from whmr_tpu.inference.export import export_serving, save_exported
        from whmr_tpu.inference.pipeline import DemoPipeline, Detection
        from whmr_tpu.inference.serve_cli import WHMRServer
        from whmr_tpu.models.regressor import body_consts_from_assets
        from whmr_tpu.models.whmr import WHMR
        from whmr_tpu.training.train_step import create_train_state

        cfg = tiny_config()
        assets = synthetic_smpl_assets()
        consts = body_consts_from_assets(assets)
        model = WHMR(cfg)
        inputs = make_example_inputs(cfg, 2)

        def bundle_for(seed):
            state = create_train_state(
                cfg, model, consts, jax.random.PRNGKey(seed),
                {k: jnp.asarray(v) for k, v in inputs.items()},
            )
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}
            exp, flat = export_serving(
                cfg, model, variables, consts, 2,
                camcalib=False, platforms=("cpu",),
            )
            path = str(tmp_path / f"bundle_{seed}")
            save_exported(path, exp, flat, cfg, 2, False)
            return path

        bundle_a, bundle_b = bundle_for(0), bundle_for(99)

        def make_pipe(checkpoint=None, bundle=None):
            return DemoPipeline(cfg, None, assets, max_people=2,
                                use_camcalib=False,
                                bundle=bundle or bundle_a)

        srv = WHMRServer(make_pipe(), {}, executor=None,
                         reload_fn=make_pipe)
        httpd = srv.bind("127.0.0.1", 0)
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        base = f"http://127.0.0.1:{httpd.server_address[1]}"
        try:
            rng = np.random.RandomState(9)
            img = rng.randint(0, 255, (80, 80, 3), np.uint8)
            buf = io.BytesIO()
            np.savez(buf, image=img,
                     bboxes=np.array([[40.0, 40.0, 60.0]], np.float32))
            body = buf.getvalue()
            before = np.load(io.BytesIO(_post(base + "/infer", body)[2]))
            r = json.loads(_post(
                base + "/reload",
                json.dumps({"bundle": bundle_b}).encode())[2])
            assert r["status"] == "reloaded" and r["source"] == bundle_b
            after = np.load(io.BytesIO(_post(base + "/infer", body)[2]))
            assert not np.allclose(before["verts"], after["verts"])
            want = make_pipe(bundle=bundle_b).run_image(
                img, dets=[Detection(40.0, 40.0, 60.0)])
            np.testing.assert_allclose(after["verts"], want["verts"],
                                       rtol=1e-5, atol=1e-5)
        finally:
            httpd.shutdown()
            httpd.server_close()

    def test_reload_bad_json_is_400(self, server):
        url_bundle, _pipe, _ex = server
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(url_bundle + "/reload", b"{not json")
        assert e.value.code == 400


class TestGracefulDrain:
    def test_server_close_waits_for_inflight_request(self, server):
        """shutdown() + server_close() must let an in-flight request
        finish (DrainingHTTPServer joins handler threads) — the SIGTERM
        drain contract of serve_cli.main."""
        import time

        from whmr_tpu.inference.serve_cli import WHMRServer

        _url, pipe, ex = server
        srv = WHMRServer(pipe, {}, executor=None)
        httpd = srv.bind("127.0.0.1", 0)
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        base = f"http://127.0.0.1:{httpd.server_address[1]}"

        orig = pipe.run_image
        release = threading.Event()

        def slow_run_image(*a, **kw):
            release.wait(30)  # hold the handler in flight
            return orig(*a, **kw)

        rng = np.random.RandomState(31)
        img = rng.randint(0, 255, (64, 64, 3), np.uint8)
        buf = io.BytesIO()
        np.savez(buf, image=img,
                 bboxes=np.array([[32.0, 32.0, 40.0]], np.float32))
        results = {}

        def client():
            results["resp"] = _post(base + "/infer", buf.getvalue())

        pipe.run_image = slow_run_image
        try:
            ct = threading.Thread(target=client)
            ct.start()
            time.sleep(0.5)  # let the request reach the handler
            httpd.shutdown()  # stop accepting
            release.set()     # unblock the in-flight handler
            t0 = time.monotonic()
            httpd.server_close()  # must JOIN the handler thread
            ct.join(timeout=30)
            assert not ct.is_alive()
            assert results["resp"][0] == 200  # request completed, not dropped
        finally:
            pipe.run_image = orig

    def test_reload_non_object_json_is_400(self, server):
        url_bundle, _pipe, _ex = server
        for body in (b"123", b"[1, 2]", b'"str"'):
            with pytest.raises(urllib.error.HTTPError) as e:
                _post(url_bundle + "/reload", body)
            assert e.value.code == 400, body
