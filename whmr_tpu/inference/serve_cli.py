"""`whmr-serve`: an HTTP serving daemon over the demo pipeline.

Net-new vs the reference, whose only deployment story is running its
demo script in-process (demo/whmr_demo.py:38-91). `whmr-serve` turns an
exported bundle (or a live checkpoint) into a network service:

    whmr-serve --bundle bundle/ --port 8080
    curl -s -X POST --data-binary @img.jpg localhost:8080/infer > out.npz

Protocol (stdlib-only on both sides — no framework needed in clients):

- `GET /healthz` — liveness + pipeline summary (json).
- `GET /meta`    — the bundle's meta.json (or live-model config summary).
- `POST /infer`  — request body is either
    (a) encoded image bytes (jpeg/png — anything cv2.imdecode reads), or
    (b) an npz with `image` ((H, W, 3) uint8; BGR like cv2.imread) and
        optionally `bboxes` ((N, 3|4) [cx, cy, size(, score)]) to skip
        the server-side detector for that request.
  Response is an npz of the pipeline result (verts, verts_world,
  pred_cam_t, focal_length, ..., n_people, detections); pass
  `?format=json` for a json body instead (lists — large!).

Concurrency: requests are decoded in parallel (ThreadingHTTPServer) but
the device section is serialized by a lock — one chip, one in-flight
batch keeps latency predictable (and respects the axon one-client rule).
"""

from __future__ import annotations

import argparse
import io
import json
import threading


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="WHMR HTTP serving daemon")
    p.add_argument("--bundle", default=None,
                   help="whmr-export bundle dir (preferred: frozen AOT "
                        "graph, no model build)")
    p.add_argument("--checkpoint", default=None,
                   help="orbax checkpoint dir (live model instead of a "
                        "bundle)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--detector", default=None,
                   choices=["full", "iuv", "contour"],
                   help="server-side detector for requests without bboxes "
                        "(same semantics as whmr-demo)")
    p.add_argument("--max_people", type=int, default=8)
    p.add_argument("--no_camcalib", action="store_true")
    p.add_argument("--data_dir", default=None, help="asset dir")
    p.add_argument("--cfg_file", default=None,
                   help="reference-style YAML config")
    p.add_argument("--misc", nargs="*", default=[],
                   help="dotted config overrides: key value [key value ...]")
    return p


def _result_to_npz_bytes(result) -> bytes:
    import numpy as np

    buf = io.BytesIO()
    np.savez(buf, **{k: np.asarray(v) for k, v in result.items()})
    return buf.getvalue()


def _result_to_json_bytes(result) -> bytes:
    import numpy as np

    payload = {
        k: np.asarray(v).tolist() if not np.isscalar(v) else v
        for k, v in result.items()
    }
    return json.dumps(payload).encode()


def _parse_infer_body(body: bytes):
    """-> (image (H, W, 3) uint8 BGR, dets or None). Raises ValueError."""
    import cv2
    import numpy as np

    from whmr_tpu.inference.pipeline import Detection

    if body[:6] == b"\x93NUMPY":
        raise ValueError(
            "bare .npy is not accepted; send an .npz container with an "
            "'image' array (and optional 'bboxes')"
        )
    if body[:4] == b"PK\x03\x04":  # npz = zip
        z = np.load(io.BytesIO(body))
        if "image" not in z:
            raise ValueError("npz request must carry an 'image' array")
        img = np.ascontiguousarray(z["image"])
        if img.ndim != 3 or img.shape[-1] != 3 or img.dtype != np.uint8:
            raise ValueError(
                f"'image' must be (H, W, 3) uint8, got "
                f"{img.shape} {img.dtype}"
            )
        dets = None
        if "bboxes" in z:
            bb = np.asarray(z["bboxes"], np.float32).reshape(-1, z["bboxes"].shape[-1])
            if bb.shape[-1] not in (3, 4):
                raise ValueError("'bboxes' must be (N, 3|4) [cx, cy, size(, score)]")
            dets = [
                Detection(float(r[0]), float(r[1]), float(r[2]),
                          float(r[3]) if len(r) > 3 else 1.0)
                for r in bb
            ]
        return img, dets
    img = cv2.imdecode(np.frombuffer(body, np.uint8), cv2.IMREAD_COLOR)
    if img is None:
        raise ValueError(
            "request body is neither a decodable image nor an npz with "
            "an 'image' array"
        )
    return img, None


class WHMRServer:
    """The pipeline + an http.server around it. `serve_forever()` blocks;
    tests drive `httpd.serve_forever` in a thread and call `shutdown()`."""

    def __init__(self, pipeline, meta: dict):
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        self.pipeline = pipeline
        self.meta = meta
        self._device_lock = threading.Lock()
        server = self

        class Handler(BaseHTTPRequestHandler):
            # quiet default request logging; errors still surface
            def log_message(self, fmt, *args):  # noqa: N802
                pass

            def _reply(self, code: int, body: bytes, ctype: str) -> None:
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _json(self, code: int, obj) -> None:
                self._reply(code, json.dumps(obj).encode(), "application/json")

            def do_GET(self):  # noqa: N802
                if self.path == "/healthz":
                    self._json(200, {
                        "status": "ok",
                        "max_people": server.pipeline.max_people,
                        "camcalib": server.pipeline.use_camcalib,
                        "frozen": server.pipeline.model is None,
                    })
                elif self.path == "/meta":
                    self._json(200, server.meta)
                else:
                    self._json(404, {"error": f"unknown path {self.path}"})

            def do_POST(self):  # noqa: N802
                if not self.path.startswith("/infer"):
                    self._json(404, {"error": f"unknown path {self.path}"})
                    return
                try:
                    length = int(self.headers.get("Content-Length", 0))
                    img, dets = _parse_infer_body(self.rfile.read(length))
                except ValueError as e:
                    self._json(400, {"error": str(e)})
                    return
                try:
                    with server._device_lock:
                        result = server.pipeline.run_image(img, dets=dets)
                except Exception as e:  # surface as 500, keep serving
                    self._json(500, {"error": f"{type(e).__name__}: {e}"})
                    return
                if "format=json" in (self.path.split("?", 1) + [""])[1]:
                    self._reply(200, _result_to_json_bytes(result),
                                "application/json")
                else:
                    self._reply(200, _result_to_npz_bytes(result),
                                "application/octet-stream")

        self.handler_cls = Handler
        self.httpd = None
        self._server_cls = ThreadingHTTPServer

    def bind(self, host: str, port: int):
        self.httpd = self._server_cls((host, port), self.handler_cls)
        return self.httpd


def main(argv=None):
    args = build_parser().parse_args(argv)

    from whmr_tpu.inference.demo_cli import build_pipeline, detector_kind
    from whmr_tpu.inference.detector import build_detector

    kind = detector_kind(args)
    pipeline = build_pipeline(args)
    pipeline.detector = build_detector(kind, None, pipeline=pipeline)

    meta = dict(getattr(getattr(pipeline, "_served", None), "meta", None)
                or {"source": "live checkpoint",
                    "crop_hw": list(pipeline.cfg.crop_hw)})
    server = WHMRServer(pipeline, meta)
    httpd = server.bind(args.host, args.port)
    print(f"[serve] WHMR listening on http://{args.host}:{httpd.server_address[1]} "
          f"(detector={kind}, max_people={args.max_people}, "
          f"frozen={pipeline.model is None})", flush=True)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.server_close()


if __name__ == "__main__":
    main()
