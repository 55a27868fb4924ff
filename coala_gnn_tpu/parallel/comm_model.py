"""Per-step communication byte accounting for the cache exchange.

The exchange's wire traffic is SHAPE-DETERMINED: every all_to_all ships its
full fixed-size buckets (padding included — that is the equal-splits
contract, sharded_cache.py module docstring), so per-step bytes are exact
functions of (n_req, bucket_cap, n_dev, dim, dtype), not estimates. This
module writes those functions down once, splits them into intra-host (ICI)
vs cross-host (DCN) shares per cache mode, and projects multi-host scaling
efficiency — the evidence VERDICT r3 weak #2 asked for in place of
meaningless virtual-device wall-clock.

Reference anchor: the reference's exchange is NVSHMEM puts scoped to ONE
node (nvshmem_manager.cuh:15-28) — cross-node feature bytes are zero by
construction and only seeds + cache-meta ride MPI/gloo
(Shared_Tensor.py:96-103). mode="node_local" reproduces exactly that
traffic shape; mode="sharded" is the flat alternative whose cross-host
share this model quantifies.

All byte counts are PER DEVICE PER STEP unless noted. "off-device" counts
bytes leaving a device; every all_to_all row to a peer is counted once
(send side; receives mirror it).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

# the model's sizes ARE the kernels' sizes: one shared definition
# (parallel/sizing.py), no mirrored formulas to drift
from coala_gnn_tpu.parallel.sizing import (
    ceil_pow2, fill_bucket_cap, lookup_bucket_cap as bucket_cap)


@dataclasses.dataclass(frozen=True)
class ExchangeShape:
    """Static shapes of one exchange step (see sharded_cache.exchange_lookup).

    n_req      : request slots per device (max_sample_size parity,
                 COALA_GNN_Manager.py:79-81)
    bucket_cap : slots per (src, owner) bucket
    n_dev      : devices in the whole mesh
    group      : devices per exchange group (== n_dev for sharded,
                 local devices for node_local, 1 for isolated)
    local      : devices per host
    dim        : feature dim
    feat_bytes : bytes per feature element on the response wire
                 (4 f32, 2 bf16; int8 response = dim + 4 scale bytes total)
    int8_response : response rows ride as int8 lines + f32 scale
    """
    n_req: int
    bucket_cap: int
    n_dev: int
    group: int
    local: int
    dim: int
    feat_bytes: int = 4
    int8_response: bool = False

    @property
    def row_resp_bytes(self) -> int:
        """Bytes per response slot in the FEATURE all_to_all only. int8
        responses ship a second [G, c] f32 scale all_to_all, counted as
        its own phase in exchange_step_bytes — total dim + 4 per slot,
        matching the wire (sharded_cache.exchange_lookup: resp_q int8
        [G, c, dim] + resp_sc f32 [G, c], each sent exactly once)."""
        return self.dim if self.int8_response \
            else self.dim * self.feat_bytes


def exchange_step_bytes(s: ExchangeShape) -> dict:
    """Bytes leaving one device in one exchange_lookup, split by phase and
    by link class. Within its group of size G a device sends G-1 peer rows
    (the self-row never leaves); a peer is cross-host iff it lives on a
    different host, which only happens when the group spans hosts."""
    G = s.group
    if G <= 1:
        z = {"request": 0, "response": 0, "hitbits": 0, "total": 0}
        return {"off_device": dict(z), "cross_host": dict(z),
                "intra_host": dict(z)}
    peers = G - 1
    # peers on another host: group members are contiguous; a device shares
    # its host with (local - 1) others, so cross-host peers within the
    # group = G - local when the group spans hosts (sharded on multi-host),
    # 0 when the group fits one host (node_local).
    cross_peers = max(G - s.local, 0)
    c = s.bucket_cap

    def phase(row_bytes):
        per_peer = c * row_bytes
        return {"off": peers * per_peer, "cross": cross_peers * per_peer}

    req = phase(4)                       # int32 ids
    resp = phase(s.row_resp_bytes)       # feature rows (+scales if int8)
    if s.int8_response:
        # scales ride a second [G, c] f32 all_to_all
        resp = {k: v + phase(4)[k] for k, v in resp.items()}
    hits = phase(1)                      # bool hit bits

    def pack(key):
        d = {"request": req[key], "response": resp[key],
             "hitbits": hits[key]}
        d["total"] = sum(d.values())
        return d

    off, cross = pack("off"), pack("cross")
    intra = {k: off[k] - cross[k] for k in off}
    return {"off_device": off, "cross_host": cross, "intra_host": intra}


def fill_step_bytes(s: ExchangeShape, fill_cap: int,
                    feat_bytes: Optional[int] = None) -> dict:
    """Bytes for one miss-fill push (_fill_local): ids + rows + colors to
    owners. Only runs on steps with misses; steady-state warm steps skip
    it entirely."""
    G = s.group
    if G <= 1:
        return {"off_device": 0, "cross_host": 0}
    fb = s.dim * (feat_bytes or s.feat_bytes)
    per_peer = fill_cap * (4 + fb + 4)
    return {"off_device": (G - 1) * per_peer,
            "cross_host": max(G - s.local, 0) * per_peer}


def grad_psum_bytes(param_bytes: int, n_dev: int, local: int) -> dict:
    """Ring all-reduce cost of the DP gradient pmean: each device moves
    ~2*(D-1)/D of the parameter bytes; the cross-host share on a ring laid
    out host-major is 2*(H-1)/D rows of the pipeline — approximated here
    as the fraction of ring hops that cross hosts (H hops of D total)."""
    if n_dev <= 1:
        return {"off_device": 0, "cross_host": 0}
    hosts = max(n_dev // local, 1)
    off = int(2 * (n_dev - 1) / n_dev * param_bytes)
    cross_frac = (hosts if hosts > 1 else 0) / n_dev
    return {"off_device": off, "cross_host": int(2 * cross_frac * param_bytes)}


def meta_allgather_bytes(num_colors: int, hosts: int) -> int:
    """Cross-host cache-meta exchange per refresh (process_allgather of
    int32 [C+1] — Shared_Tensor.py:96-100 parity). PER HOST — one process
    performs it, not one device; divide by local before mixing into
    per-device totals."""
    if hosts <= 1:
        return 0
    return (num_colors + 1) * 4 * (hosts - 1)


def step_traffic(mode: str, n_req: int, n_dev: int, local: int, dim: int,
                 num_colors: int = 0, param_bytes: int = 0,
                 feat_bytes: int = 4, int8_response: bool = False,
                 refresh_counter: int = 8, slack: float = 2.0,
                 misses: int = 0) -> dict:
    """Full per-device per-step traffic picture for a cache mode.

    Returns bytes dicts for the steady (all-hit) step: exchange phases +
    grad psum + amortized cache-meta (host meta bill split across the
    host's ``local`` devices so every entry stays per-device). Fill bytes
    are reported separately and only when ``misses`` (per-device miss
    count for a representative miss step) is given — the fill kernel's
    buckets are sized from the pow2-rounded miss count, NOT from n_req
    (sharded_cache.fetch: m_cap = _ceil_pow2(m_max) ->
    sizing.fill_bucket_cap), so steady warm steps ship zero fill bytes."""
    group = {"sharded": n_dev, "node_local": min(local, n_dev),
             "isolated": 1}[mode]
    s = ExchangeShape(n_req=n_req, bucket_cap=bucket_cap(n_req, group, slack),
                      n_dev=n_dev, group=group, local=local, dim=dim,
                      feat_bytes=feat_bytes, int8_response=int8_response)
    ex = exchange_step_bytes(s)
    ps = grad_psum_bytes(param_bytes, n_dev, local)
    hosts = max(n_dev // local, 1)
    meta_host = meta_allgather_bytes(num_colors, hosts)
    meta = meta_host / max(refresh_counter, 1) / max(local, 1)
    if misses > 0:
        fill = fill_step_bytes(
            s, fill_cap=fill_bucket_cap(ceil_pow2(misses), group, slack))
    else:
        fill = {"off_device": 0, "cross_host": 0}
    return {
        "mode": mode, "group": group, "bucket_cap": s.bucket_cap,
        "exchange": ex,
        "grad_psum": ps,
        "meta_per_step": meta,       # cross-host, amortized, per device
        "meta_host_per_refresh": meta_host,
        "fill_miss_step": fill,
        "cross_host_total": ex["cross_host"]["total"] + ps["cross_host"]
                            + meta,
        "off_device_total": ex["off_device"]["total"] + ps["off_device"]
                            + meta,
    }


def step_time(step_compute_s: float, traffic: dict, dcn_gbps: float,
              ici_gbps: float) -> dict:
    """Serialized per-step time: compute + intra-host (ICI) bytes + cross-
    host (DCN) bytes at the given link speeds. No overlap credit —
    conservative (XLA does overlap all_to_alls with independent compute,
    so real steps land between this bound and pure max())."""
    intra = (traffic["exchange"]["intra_host"]["total"]
             + traffic["grad_psum"]["off_device"]
             - traffic["grad_psum"]["cross_host"])
    cross = traffic["cross_host_total"]
    t_ici = intra / (ici_gbps * 1e9)
    t_dcn = cross / (dcn_gbps * 1e9)
    return {"t_compute_s": step_compute_s, "t_ici_s": t_ici, "t_dcn_s": t_dcn,
            "t_step_s": step_compute_s + t_ici + t_dcn}


def efficiency_1_to_2_hosts(mode: str, step_compute_s: float, n_req: int,
                            local: int, dim: int, dcn_gbps: float,
                            ici_gbps: float, num_colors: int = 0,
                            param_bytes: int = 0, feat_bytes: int = 4,
                            int8_response: bool = False) -> dict:
    """The BASELINE.md >80% target, modeled: per-device throughput at
    2 hosts vs 1 host with identical per-device work (weak scaling).
    t(1 host) already pays the full ICI exchange; t(2 hosts) adds whatever
    the mode sends cross-host. efficiency = t_1host / t_2host."""
    kw = dict(n_req=n_req, local=local, dim=dim, num_colors=num_colors,
              param_bytes=param_bytes, feat_bytes=feat_bytes,
              int8_response=int8_response)
    t1 = step_time(step_compute_s,
                   step_traffic(mode, n_dev=local, **kw),
                   dcn_gbps, ici_gbps)
    t2 = step_time(step_compute_s,
                   step_traffic(mode, n_dev=2 * local, **kw),
                   dcn_gbps, ici_gbps)
    return {"t_1host": t1, "t_2hosts": t2,
            "efficiency": t1["t_step_s"] / t2["t_step_s"]}


def project_efficiency(step_compute_s: float, cross_bytes: int,
                       intra_bytes: int, dcn_gbps: float,
                       ici_gbps: float) -> dict:
    """Single-topology serialization fraction (kept for the byte table):
    efficiency here = compute share of the serialized step, NOT the 1->2
    host metric — use efficiency_1_to_2_hosts for that."""
    t_ici = intra_bytes / (ici_gbps * 1e9)
    t_dcn = cross_bytes / (dcn_gbps * 1e9)
    t = step_compute_s + t_ici + t_dcn
    return {"t_compute_s": step_compute_s, "t_ici_s": t_ici,
            "t_dcn_s": t_dcn,
            "efficiency": step_compute_s / t if t > 0 else 1.0}
