"""Serving load bench: HTTP latency/throughput vs micro-batch window.

Starts an in-process `lctvqa.serve` server over an artifact, fires
concurrent clients at POST /answer, and reports per-window throughput,
latency percentiles, and the dispatch batch sizes the micro-batcher
actually formed. The tradeoff being measured: a larger window fuses more
requests per program (higher chip efficiency — NOTES.md serving sweep)
at the cost of added queueing latency.

Usage:
  python scripts/bench_serving.py --artifact m.lctx \
      [--clients 16] [--requests 32] [--windows 0,2,5,20] [--max_batch 64]

Prints one table row per window plus a JSON line for machine parsing.
"""

from __future__ import annotations

import argparse
import base64
import json
import threading
import time
import urllib.request

import numpy as np


def _post(port: int, payload: dict) -> None:
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/answer",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req) as r:
        assert r.status == 200, r.status


def run_one(artifact: str, window_ms: float, clients: int, requests: int,
            max_batch: int) -> dict:
    from lctvqa import serve as serve_mod

    srv = serve_mod.make_server(artifact, port=0, window_ms=window_ms,
                                max_batch=max_batch)
    svc = srv.RequestHandlerClass.service
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        svc.warmup()
        port = srv.server_address[1]
        s = svc.meta["img_size"]
        rng = np.random.default_rng(0)
        # image_b64, not a nested JSON int list: at 224px the list is
        # ~150k Python ints whose encode/decode dominates a single-core
        # host and turns the bench into a JSON benchmark (measured r4:
        # 0.7 req/s with lists vs the b64 numbers in NOTES.md)
        img = rng.integers(0, 256, (s, s, 3), dtype=np.uint8)
        payload = {"image_b64": base64.b64encode(img.tobytes()).decode(),
                   "image_shape": list(img.shape),
                   "question": "what color is the ball"}

        lat: list = []
        lock = threading.Lock()

        def client(n, record=True):
            for _ in range(n):
                t0 = time.perf_counter()
                _post(port, payload)
                dt = time.perf_counter() - t0
                if record:
                    with lock:
                        lat.append(dt)

        # untimed warm-in lap: the first dispatch after server start pays
        # one-time costs (PIL import, tunnel stream drain behind the
        # unsynced warmup executions) that would otherwise put a ~10 s
        # outlier in p99 of a closed-loop run
        warm = [threading.Thread(target=client, args=(2, False))
                for _ in range(clients)]
        for t in warm:
            t.start()
        for t in warm:
            t.join()
        svc.batcher.batch_sizes.clear()

        threads = [threading.Thread(target=client, args=(requests,))
                   for _ in range(clients)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0

        lat_ms = np.sort(np.asarray(lat)) * 1e3
        sizes = np.asarray(svc.batcher.batch_sizes)
        return {
            "window_ms": window_ms,
            "req_per_sec": round(len(lat) / wall, 1),
            "p50_ms": round(float(np.percentile(lat_ms, 50)), 1),
            "p99_ms": round(float(np.percentile(lat_ms, 99)), 1),
            "mean_dispatch_batch": round(float(sizes.mean()), 1),
            "dispatches": int(sizes.size),
        }
    finally:
        srv.shutdown()


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--artifact", type=str, required=True)
    p.add_argument("--clients", type=int, default=16)
    p.add_argument("--requests", type=int, default=32,
                   help="requests per client")
    p.add_argument("--windows", type=str, default="0,2,5,20",
                   help="comma-separated micro-batch windows (ms)")
    p.add_argument("--max_batch", type=int, default=64)
    args = p.parse_args(argv)

    from lctvqa import compile_cache
    compile_cache.enable()

    print(f"{'window':>8} {'req/s':>8} {'p50 ms':>8} {'p99 ms':>8} "
          f"{'avg batch':>10} {'dispatches':>11}")
    rows = []
    for w in (float(x) for x in args.windows.split(",")):
        r = run_one(args.artifact, w, args.clients, args.requests,
                    args.max_batch)
        rows.append(r)
        print(f"{r['window_ms']:>8} {r['req_per_sec']:>8} {r['p50_ms']:>8} "
              f"{r['p99_ms']:>8} {r['mean_dispatch_batch']:>10} "
              f"{r['dispatches']:>11}")
    print(json.dumps({"serving_bench": rows}))


if __name__ == "__main__":
    main()
