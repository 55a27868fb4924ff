#!/usr/bin/env python
"""Falsify the comm model against compiled HLO (VERDICT r4 next #5).

parallel/comm_model.py derives per-device wire bytes from shapes. Until now
those formulas were unit-tested against themselves — never reconciled with
an executed artifact. This script compiles the ACTUAL kernels on a virtual
CPU mesh, walks the optimized (SPMD-partitioned, per-device) HLO for
collective ops, converts each to bytes-leaving-one-device with the standard
ring/all-to-all cost identities, and compares phase-by-phase against
step_traffic():

  all-to-all  [sz]  -> sz * (G-1)/G    (the self-chunk never leaves)
  all-gather  [out] -> out * (G-1)/G   (ring: G-1 forwards of out/G chunks)
  all-reduce  [sz]  -> sz * 2*(G-1)/G  (reduce-scatter + all-gather ring)
  reduce-scatter[out]-> out * (G-1)    (input = G*out; (G-1)/G of input)
  collective-permute -> operand bytes

Kernels reconciled (4 and 8 virtual devices, sharded and node_local):
  - exchange_lookup (the cache read path: request/response/hitbit
    all_to_alls — cache_kernel.cu parity traffic)
  - the DP gradient pmean of the window step (grad_psum_bytes)

The node_local mode's cross-group-bytes=0 claim is checked structurally:
every collective's replica_groups must sit inside one host group.

  COALA_CPU_DEVICES=8 python examples/comm_reconcile.py --platform cpu
"""

import argparse
import json
import os
import re
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

import numpy as np

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "s8": 1,
                "u8": 1, "pred": 1, "s64": 8, "u64": 8, "f64": 8, "s16": 2,
                "u16": 2}

_COLL_RE = re.compile(
    r"(\w+)\[([\d,]*)\][^=]*\s(all-to-all|all-gather|all-reduce|"
    r"reduce-scatter|collective-permute)(?:-start)?\(",)
_TUPLE_RE = re.compile(r"=\s*\(\w+\[")   # "%x = (f32[..." tuple result
_GROUPS_ALL_RE = re.compile(r"replica_groups=\{((?:\{[\d,]+\},?)+)\}")
_GROUPS_IOTA_RE = re.compile(r"replica_groups=\[(\d+),(\d+)\]")


def hlo_collective_bytes(hlo: str) -> dict:
    """Per-device bytes leaving the chip, summed over collectives in the
    per-device HLO module, grouped by collective kind. Also records every
    (kind, bytes, groups) row for the node_local containment check.

    Two all-to-all forms exist in optimized HLO: the array form (one
    operand split along split_dimension; off-device = size*(G-1)/G) and
    the tuple form shard_map lowers to (G operands of one chunk each;
    off-device = chunk*(G-1) — only the self-chunk stays)."""
    out = {"all-to-all": 0, "all-gather": 0, "all-reduce": 0,
           "reduce-scatter": 0, "collective-permute": 0}
    rows = []
    for line in hlo.splitlines():
        m = _COLL_RE.search(line)
        if not m:
            continue
        dtype, dims, kind = m.group(1), m.group(2), m.group(3)
        if dtype not in _DTYPE_BYTES:
            continue
        size = _DTYPE_BYTES[dtype]
        for d in dims.split(","):
            if d:
                size *= int(d)
        gm = _GROUPS_ALL_RE.search(line)
        if gm:
            groups = [[int(v) for v in blk.split(",")]
                      for blk in gm.group(1).strip("{}").split("},{")]
            G = len(groups[0])
        else:
            gi = _GROUPS_IOTA_RE.search(line)
            G = int(gi.group(2)) if gi else 1
            groups = []
        if G <= 1:
            continue
        if kind == "all-to-all":
            if _TUPLE_RE.search(line):
                sent = size * (G - 1)       # tuple form: size = one chunk
            else:
                sent = size * (G - 1) // G  # array form: size = full buf
        elif kind == "all-gather":
            sent = size * (G - 1) // G
        elif kind == "all-reduce":
            sent = size * 2 * (G - 1) // G
        elif kind == "reduce-scatter":
            sent = size * (G - 1)
        else:
            sent = size
        out[kind] += sent
        rows.append({"kind": kind, "bytes": sent, "groups": groups})
    out["total"] = sum(v for k, v in out.items() if k != "total")
    out["rows"] = rows
    return out


def reconcile_lookup(mode: str, n_dev: int, local: int, n_req: int,
                     dim: int) -> dict:
    """Compile exchange_lookup, compare HLO bytes vs the model."""
    import jax

    from coala_gnn_tpu.cache import feature_cache as fc
    from coala_gnn_tpu.parallel.comm_model import step_traffic
    from coala_gnn_tpu.parallel.mesh import make_mesh
    from coala_gnn_tpu.parallel.sharded_cache import ShardedFeatureCache

    mesh = make_mesh(jax.devices()[:n_dev])
    cfg = fc.make_config(cache_mb=8, dim=dim, num_colors=0,
                         num_shards=n_dev)
    cache = ShardedFeatureCache(cfg=cfg, mesh=mesh, mode=mode,
                                group_size=local if mode == "node_local"
                                else 0)
    k = cache._lookup_kernel(n_req)
    ids = np.zeros((n_dev, n_req), np.int32)
    num = np.zeros(n_dev, np.int32)
    hlo = k.lower(cache.state, cache._put(ids, 1),
                  cache._put(num, 0)).compile().as_text()
    got = hlo_collective_bytes(hlo)

    model = step_traffic(mode, n_req=n_req, n_dev=n_dev, local=local,
                         dim=dim)
    want = model["exchange"]["off_device"]
    # the exchange's wire phases are exactly the three all_to_alls; compare
    # the model's total against the HLO's all-to-all bytes
    got_a2a = got["all-to-all"]
    row = {
        "mode": mode, "n_dev": n_dev, "local": local, "n_req": n_req,
        "dim": dim, "bucket_cap": model["bucket_cap"],
        "model_off_device": want,
        "hlo_all_to_all_bytes": got_a2a,
        "hlo_other_collectives": {k2: v for k2, v in got.items()
                                  if k2 not in ("all-to-all", "total",
                                                "rows") and v},
        "ratio_hlo_over_model": round(got_a2a / want["total"], 4)
        if want["total"] else None,
    }
    if mode == "node_local":
        # structural cross-host check: every all-to-all (the id/feature/
        # hitbit exchange — the data plane) must stay inside one contiguous
        # local-device block. Scalar count psum/pmax all-reduces are the
        # control plane and legitimately span hosts (cache-meta analog,
        # Shared_Tensor.py:96-103) — report their bytes separately.
        a2a_rows = [r for r in got["rows"] if r["kind"] == "all-to-all"]
        ok = all(
            {d // local for d in g} == {g[0] // local}
            for r in a2a_rows for g in r["groups"])
        row["feature_a2a_within_host"] = ok
        row["cross_host_control_bytes"] = sum(
            r["bytes"] for r in got["rows"]
            if r["kind"] != "all-to-all" and any(
                len({d // local for d in g}) > 1 for g in r["groups"]))
    return row


def reconcile_psum(n_dev: int, local: int, param_elems: int) -> dict:
    """Compile a DP pmean over a param vector; compare vs grad_psum_bytes."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    from coala_gnn_tpu.parallel.comm_model import grad_psum_bytes
    from coala_gnn_tpu.parallel.mesh import DATA_AXIS, make_mesh

    mesh = make_mesh(jax.devices()[:n_dev])

    def step(g):
        return jax.lax.pmean(g, DATA_AXIS)

    f = jax.jit(shard_map(step, mesh=mesh, in_specs=P(),
                          out_specs=P(), check_vma=False))
    g = jnp.zeros((param_elems,), jnp.float32)
    hlo = f.lower(g).compile().as_text()
    got = hlo_collective_bytes(hlo)
    want = grad_psum_bytes(param_elems * 4, n_dev, local)
    got_ar = got["all-reduce"] + got["reduce-scatter"] + got["all-gather"]
    return {"n_dev": n_dev, "param_bytes": param_elems * 4,
            "model_off_device": want["off_device"],
            "hlo_allreduce_bytes": got_ar,
            "ratio_hlo_over_model": round(got_ar / want["off_device"], 4)
            if want["off_device"] else None}


def run_one(n_dev: int) -> dict:
    local = max(n_dev // 2, 1)
    rows = [reconcile_lookup("sharded", n_dev, local, n_req=1024, dim=64),
            reconcile_lookup("node_local", n_dev, local, n_req=1024,
                             dim=64)]
    psum = reconcile_psum(n_dev, local, param_elems=1 << 18)
    return {"devices": n_dev, "lookup": rows, "grad_psum": psum}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--platform", default="")
    p.add_argument("--devices", default="4,8")
    p.add_argument("--single", type=int, default=0)
    p.add_argument("--out", default="")
    args = p.parse_args(argv)

    if args.single:
        os.environ["COALA_CPU_DEVICES"] = str(args.single)
        from coala_gnn_tpu.utils.jaxconfig import setup as jax_setup
        jax_setup("cpu")
        print(json.dumps(run_one(args.single)))
        return

    results = []
    for n in [int(v) for v in args.devices.split(",")]:
        env = dict(os.environ, COALA_CPU_DEVICES=str(n), JAX_PLATFORMS="cpu")
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--single", str(n)],
            capture_output=True, text=True, env=env,
            cwd=os.path.dirname(HERE))
        if r.returncode != 0:
            print(r.stderr, file=sys.stderr)
            raise SystemExit(f"reconcile subprocess failed for {n} devices")
        results.append(json.loads(r.stdout.strip().splitlines()[-1]))

    art = {"results": results,
           "tolerance_note": "exchange all_to_alls are shape-exact: ratios "
                             "must be 1.0; grad pmean is XLA's choice of "
                             "all-reduce decomposition (ring identity "
                             "2(G-1)/G) — ratios within ~15% falsify "
                             "nothing, exact match expected for a single "
                             "fused all-reduce"}
    txt = json.dumps(art, indent=1)
    print(txt)
    if args.out:
        with open(args.out, "w") as f:
            f.write(txt)


if __name__ == "__main__":
    main()
