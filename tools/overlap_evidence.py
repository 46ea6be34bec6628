"""AOT evidence for backward/all-reduce overlap on a v5e-8 topology.

Compiles the sharded DP train step against a TPU topology description
(no hardware needed — `jax.experimental.topologies`), then reads the
optimized, scheduled HLO: every `all-reduce-start` is located in the
schedule and the device compute between it and its `all-reduce-done` is
summed.  Async start/done pairs with real compute in between ARE the
latency-hiding-scheduler overlap; a start immediately followed by its
done means the collective is serialized against the backward.

    python tools/overlap_evidence.py [--topology v5e:2x4] [--data 8]
        [--width 800] [--splats 100000] [--out /tmp/overlap_hlo.txt]

Prints one JSON summary line; use --out to dump the full HLO for
inspection.
"""
from __future__ import annotations

import argparse
import json
import os
import re
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--topology", default="v5e:2x4")
    ap.add_argument("--data", type=int, default=8)
    ap.add_argument("--tile", type=int, default=1)
    ap.add_argument("--batch", type=int, default=2,
                    help="cameras per data member (>1 enables bucketed DP)")
    ap.add_argument("--width", type=int, default=800)
    ap.add_argument("--splats", type=int, default=100_000)
    ap.add_argument("--capacity", type=int, default=131_072)
    ap.add_argument("--k", type=int, default=288)
    ap.add_argument("--m", type=int, default=20)
    ap.add_argument("--out", default=None)
    ap.add_argument("--xla", action="append", default=[],
                    help="compiler option NAME=VALUE (repeatable)")
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import jax
    import numpy as np
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    topo = topologies.get_topology_desc(
        platform="tpu", topology_name=args.topology)
    n = args.data * args.tile
    mesh = Mesh(np.array(topo.devices[:n]).reshape(args.data, args.tile),
                axis_names=("data", "tile"))
    print(f"# topology {args.topology}: {len(topo.devices)} devices, "
          f"mesh data={args.data} tile={args.tile}", file=sys.stderr,
          flush=True)

    from relightable3dgaussian_tpu.models import gaussians as G
    from relightable3dgaussian_tpu.models import render as R
    from relightable3dgaussian_tpu.ops.rasterize import RasterizeConfig
    from relightable3dgaussian_tpu.parallel import train as ptrain
    from relightable3dgaussian_tpu.scene.cameras import make_camera
    from relightable3dgaussian_tpu.training import optimizer as O
    from relightable3dgaussian_tpu.training import trainer as T

    W = H = args.width
    cfg = RasterizeConfig(
        width=W, height=H, max_tiles_per_gaussian=args.m,
        max_per_tile=args.k, chunk=args.k, track_contrib=False,
        backend="pallas",
        tile_axis="tile" if args.tile > 1 else None,
        tile_shards=args.tile)

    # abstract inputs only — nothing touches a device
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 1, (args.splats, 3)).astype(np.float32)
    state = G.create_from_points(
        pts, rng.uniform(0, 1, (args.splats, 3)).astype(np.float32),
        capacity=args.capacity,
        init_scale=np.full(args.splats, 0.01, np.float32))
    tstate, tx = T.init_train_state(state, O.OptimConfig())
    step = ptrain.make_sharded_train_step(
        tx, mesh, cfg, R.LossConfig(lambda_dssim=0.2), sh_deg=3)

    cam = make_camera(uid=0, R=np.eye(3), t=np.array([0, 0, 2.0]),
                      fovx=0.9, fovy=0.9, width=W, height=H)
    rep = NamedSharding(mesh, P())
    batch = NamedSharding(mesh, P("data"))

    def sds(x, sharding):
        x = np.asarray(x)
        return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding)

    B = args.data * args.batch
    state_sds = jax.tree.map(lambda x: sds(x, rep), tstate)
    cam_sds = {k: sds(np.stack([v] * B), batch)
               for k, v in cam.render_inputs().items()}
    gt_sds = jax.ShapeDtypeStruct((B, H, W, 3), np.float32,
                                  sharding=batch)
    bg_sds = jax.ShapeDtypeStruct((3,), np.float32, sharding=rep)

    print("# lowering + AOT compiling (TPU compiler, no chips)...",
          file=sys.stderr, flush=True)
    lowered = step.lower(state_sds, cam_sds, gt_sds, bg_sds)
    opts = dict(kv.split("=", 1) for kv in args.xla) or None
    compiled = lowered.compile(compiler_options=opts) if opts \
        else lowered.compile()
    hlo = compiled.as_text()
    if args.out:
        with open(args.out, "w") as f:
            f.write(hlo)
        print(f"# HLO -> {args.out} ({len(hlo)} bytes)", file=sys.stderr,
              flush=True)

    # --- schedule analysis: compute between each start and its done ---
    lines = hlo.splitlines()
    # entry computation body in schedule order (is_scheduled=true module)
    flops_re = re.compile(r"(f32|bf16)\[([\d,]*)\]")

    def cost(line):
        """Crude per-instruction cost proxy: output element count."""
        m = flops_re.search(line.split(" = ", 1)[-1])
        if not m or not m.group(2):
            return 0
        els = 1
        for d in m.group(2).split(","):
            els *= int(d)
        return els

    starts = {}
    pairs = []
    for i, ln in enumerate(lines):
        s = ln.strip()
        if " = " not in s:
            continue
        name = s.split(" = ")[0].strip().lstrip("%")
        if "all-reduce-start" in s:
            starts[name] = i
        elif "all-reduce-done" in s or "all-reduce-done" in s:
            m = re.search(r"all-reduce-done\((?:%)?([\w.\-]+)\)", s)
            if m and m.group(1) in starts:
                pairs.append((m.group(1), starts[m.group(1)], i))

    summary = []
    for name, i0, i1 in pairs:
        between = [ln for ln in lines[i0 + 1:i1] if " = " in ln]
        work = sum(cost(ln) for ln in between)
        big = sorted(((cost(ln), ln.strip().split(" = ")[0])
                      for ln in between), reverse=True)[:3]
        summary.append({
            "collective": name,
            "instructions_between": len(between),
            "elements_between": work,
            "largest_overlapped": [b[1] for b in big if b[0] > 0],
        })

    n_ar = len(re.findall(r"all-reduce(?:-start)?\(", hlo))
    # sync all-reduce details: reduced bytes + emitter strategy
    sync_info = []
    for ln in lines:
        st = ln.strip()
        if re.match(r"%?[\w.\-]+ = .*= all-reduce\(", st) or \
                " all-reduce(" in st:
            byt = sum(
                4 * int(np.prod([int(d) for d in dims.split(",")]))
                for dims in re.findall(r"f32\[([\d,]+)\]", st.split("=")[1])
            ) if "f32[" in st else 0
            em = re.search(r'"emitter":"(\w+)"', st)
            strat = re.search(r'"strategy":"(\w+)"', st)
            sync_info.append({
                "bytes_f32": byt,
                "emitter": em.group(1) if em else None,
                "strategy": strat.group(1) if strat else None})
    out = {
        "topology": args.topology,
        "mesh": {"data": args.data, "tile": args.tile},
        "async_all_reduce_pairs": len(pairs),
        "total_all_reduces": n_ar,
        "pairs": summary,
        "sync_all_reduces": sync_info,
        "overlapped": bool(pairs) and all(
            p["instructions_between"] > 0 for p in summary),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
