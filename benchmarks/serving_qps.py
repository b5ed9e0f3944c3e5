"""Serving-path benchmark: warm HTTP query latency + QPS.

Measures the full user-visible path (multipart upload -> decode -> embed ->
search -> thumbnails -> JSON) against a running engine, with concurrent
clients. Run after building an index, e.g.:

    python -m image_search_engine_tpu.indexer --data-dir /tmp/x/images \
        --artifacts-dir /tmp/x/artifacts --method dnn --dnn-model resnet-tiny \
        --index-type l2 --resize-size 96
    python benchmarks/serving_qps.py --artifacts-dir /tmp/x/artifacts \
        --image /tmp/x/images/g0_0.png --port 5057 --resize-size 96

Spawns the engine in-process (threaded HTTP server), waits for prewarm,
then drives it.
"""

from __future__ import annotations

import argparse
import concurrent.futures as cf
import json
import threading
import time
import urllib.request
from http.server import ThreadingHTTPServer
from pathlib import Path


def post_image(port: int, img_bytes: bytes) -> dict:
    boundary = "benchboundary42"
    body = (
        f"--{boundary}\r\n"
        'Content-Disposition: form-data; name="image"; filename="q.png"\r\n'
        "Content-Type: image/png\r\n\r\n"
    ).encode() + img_bytes + f"\r\n--{boundary}--\r\n".encode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/similar_images",
        data=body,
        headers={"Content-Type": f"multipart/form-data; boundary={boundary}"},
    )
    with urllib.request.urlopen(req, timeout=300) as r:
        return json.load(r)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--artifacts-dir", type=Path, required=True)
    ap.add_argument("--image", type=Path, required=True)
    ap.add_argument("--method", default="dnn")
    ap.add_argument("--dnn-model", default="resnet-tiny")
    ap.add_argument("--index-type", default="l2")
    ap.add_argument("--resize-size", type=int, default=96)
    ap.add_argument("--port", type=int, default=5057)
    ap.add_argument("--requests", type=int, default=50)
    ap.add_argument("--concurrency", type=int, default=4)
    ap.add_argument("--micro-batch", action="store_true")
    a = ap.parse_args()

    from image_search_engine_tpu.config import Config, DnnModel, IndexType, Method
    from image_search_engine_tpu.engine import QueryEngine, make_handler

    cfg = Config(
        artifacts_dir=a.artifacts_dir, method=Method(a.method),
        dnn_model=DnnModel(a.dnn_model), index_type=IndexType(a.index_type),
        resize_size=a.resize_size, micro_batch=a.micro_batch,
    )
    engine = QueryEngine(cfg)
    httpd = ThreadingHTTPServer(("127.0.0.1", a.port), make_handler(engine))
    threading.Thread(target=httpd.serve_forever, daemon=True).start()

    img_bytes = a.image.read_bytes()
    # warm (compile already done by prewarm; this warms the HTTP path)
    for _ in range(3):
        post_image(a.port, img_bytes)

    lat: list[float] = []
    lock = threading.Lock()

    def one(_i: int) -> None:
        t0 = time.perf_counter()
        js = post_image(a.port, img_bytes)
        dt = time.perf_counter() - t0
        assert "prediction" in js and js["prediction"]
        with lock:
            lat.append(dt)

    t0 = time.perf_counter()
    with cf.ThreadPoolExecutor(a.concurrency) as pool:
        list(pool.map(one, range(a.requests)))
    wall = time.perf_counter() - t0

    lat.sort()
    n = len(lat)
    print(json.dumps({
        "metric": "serving_http_qps",
        "value": round(n / wall, 2),
        "unit": "qps",
        "latency_ms_p50": round(1e3 * lat[n // 2], 1),
        "latency_ms_p90": round(1e3 * lat[int(0.9 * n)], 1),
        "concurrency": a.concurrency,
        "micro_batch": a.micro_batch,
        "thumbnail_cache": engine.thumbs is not None,
    }))
    httpd.shutdown()


if __name__ == "__main__":
    main()
