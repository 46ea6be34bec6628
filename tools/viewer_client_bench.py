"""Measure END-TO-END streaming viewer fps against a live server.

The r3 HTML client keeps 2 sequence-numbered requests in flight so
frame N+1 renders while frame N encodes/ships (the reference GUI's
measured-FPS bar is `gui.py:193-220`).  This driver reproduces that
client protocol headlessly: a ThreadPoolExecutor(depth) walks a
turntable trajectory, keeping `depth` GETs in flight, and reports
wall-clock fps over --frames completed responses.

    python tools/viewer_client_bench.py --port 8641 --frames 100
"""
from __future__ import annotations

import argparse
import time
from concurrent.futures import ThreadPoolExecutor
from urllib.request import urlopen


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8600)
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--depth", type=int, default=2,
                    help="requests kept in flight (1 = sequential)")
    ap.add_argument("--mode", default="render")
    ap.add_argument("--radius", type=float, default=4.0)
    args = ap.parse_args()

    def fetch(i: int) -> int:
        theta = (i * 360.0 / args.frames) % 360.0
        url = (f"http://{args.host}:{args.port}/render?"
               f"theta={theta:.2f}&phi=25&radius={args.radius}"
               f"&mode={args.mode}")
        with urlopen(url, timeout=120) as r:
            return len(r.read())

    # warmup (server compile + socket)
    nbytes = fetch(0)
    print(f"warmup frame: {nbytes} bytes", flush=True)

    for depth in sorted({1, args.depth}):
        t0 = time.perf_counter()
        with ThreadPoolExecutor(depth) as ex:
            sizes = list(ex.map(fetch, range(args.frames)))
        dt = time.perf_counter() - t0
        fps = args.frames / dt
        print(f"depth={depth}: {args.frames} frames in {dt:.2f}s "
              f"-> {fps:.2f} fps end-to-end "
              f"({sum(sizes) / len(sizes) / 1024:.0f} KiB/frame avg)",
              flush=True)


if __name__ == "__main__":
    main()
