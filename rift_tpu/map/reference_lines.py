"""On-device reference-line extraction.

Replaces CarlaMap.query_reference_lines (nuplan_map_utils.py:493-621): from
the CBV's current lane, collect adjacent start lanes, traverse the successor
topology restricted to the route, trim to `max_length` meters from the
vehicle's projection, and emit fixed-shape [R, N, 3] (x, y, heading) lines
with validity masks.

Design inversion: the reference's recursive DFS with dynamic path counts
becomes a bounded unroll — one greedy route-restricted successor chain per
start lane, plus one alternate branch at the current lane's first junction
fork. R is fixed; unused slots are masked.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..geometry.polyline import project_point_to_polyline
from .tensor_map import LANE_POINTS, TensorMap

# Max lanes chained per reference line. 24 lanes x ~tens of meters covers the
# reference's 120 m horizon on all towns.
MAX_CHAIN = 16


def _first_on_route_successor(
    tmap: TensorMap, lane: jnp.ndarray, route_mask: jnp.ndarray, branch: jnp.ndarray
) -> jnp.ndarray:
    """Next lane in the chain: the `branch`-th on-route successor (falling
    back to the first on-route successor, then -1)."""
    succ = tmap.successors[lane]  # [K]
    ok = (succ >= 0) & route_mask[jnp.maximum(succ, 0)]
    # indices of on-route successors, in order
    order = jnp.argsort(~ok)  # valid first (stable)
    succ_sorted = jnp.where(jnp.sort(~ok), -1, succ[order])
    n_ok = ok.sum()
    pick = jnp.minimum(branch, jnp.maximum(n_ok - 1, 0))
    out = succ_sorted[pick]
    return jnp.where(n_ok > 0, out, -1)


def _chain_lanes(
    tmap: TensorMap, start_lane: jnp.ndarray, route_mask: jnp.ndarray, branch_at_first_fork: jnp.ndarray
) -> jnp.ndarray:
    """Greedy successor chain from `start_lane` -> [MAX_CHAIN] lane indices
    (-1 padded). `branch_at_first_fork` selects which successor to take at the
    first fork encountered (0 = primary, 1 = alternate)."""

    def body(carry, _):
        lane, used_branch = carry
        succ = tmap.successors[jnp.maximum(lane, 0)]
        ok = (succ >= 0) & route_mask[jnp.maximum(succ, 0)]
        n_ok = ok.sum()
        is_fork = n_ok > 1
        branch = jnp.where(is_fork & ~used_branch, branch_at_first_fork, 0)
        nxt = _first_on_route_successor(tmap, jnp.maximum(lane, 0), route_mask, branch)
        nxt = jnp.where(lane < 0, -1, nxt)
        new_used = used_branch | (is_fork & (lane >= 0))
        return (nxt, new_used), nxt

    (_, _), rest = jax.lax.scan(
        body, (start_lane, jnp.asarray(False)), None, length=MAX_CHAIN - 1
    )
    return jnp.concatenate([start_lane[None], rest])


def _chain_to_polyline(tmap: TensorMap, chain: jnp.ndarray):
    """Gather centerline points of a lane chain -> ([N, 2] points, [N] heading,
    [N] valid). Consecutive lanes share an endpoint; we drop each lane's first
    vertex after the first lane (nuplan_map_utils.py:535-539 dedupe)."""
    pts = tmap.centerline[jnp.maximum(chain, 0)]  # [MAX_CHAIN, P, 2]
    hdg = tmap.headings[jnp.maximum(chain, 0)]  # [MAX_CHAIN, P]
    lane_valid = chain >= 0
    # drop first vertex of lanes 1..: build mask
    keep = jnp.ones((MAX_CHAIN, LANE_POINTS), bool).at[1:, 0].set(False)
    valid = lane_valid[:, None] & keep
    n = MAX_CHAIN * LANE_POINTS
    return pts.reshape(n, 2), hdg.reshape(n), valid.reshape(n)


def _compact(points, heading, valid):
    """Stable-compact valid entries to the front (fixed shape)."""
    order = jnp.argsort(~valid)  # valid first, stable
    return points[order], heading[order], valid[order]


@partial(jax.jit, static_argnames=("num_refs", "num_points", "max_length"))
def extract_reference_lines(
    tmap: TensorMap,
    position: jnp.ndarray,  # [2] vehicle position (rear axle)
    route_mask: jnp.ndarray,  # [L] bool on-route lanes
    num_refs: int = 4,
    num_points: int = 120,
    max_length: float = 120.0,
):
    """Reference lines for one vehicle.

    Returns dict with:
      position [R, num_points, 2], vector [R, num_points, 2],
      orientation [R, num_points], valid_mask [R, num_points]
    sampled at ~1 m spacing over `max_length` meters ahead of the vehicle's
    projection, matching get_reference_line_features
    (pluto_feature_builder.py:361-402).
    """
    # prefer the nearest on-route lane; fall back to nearest lane overall
    d2 = tmap.lane_point_dist2(position)
    d2_route = jnp.where(route_mask, d2, jnp.inf)
    lane_on_route = jnp.argmin(d2_route).astype(jnp.int32)
    lane_any = jnp.argmin(d2).astype(jnp.int32)
    cur = jnp.where(jnp.isfinite(d2_route[lane_on_route]), lane_on_route, lane_any)

    # start lanes: current, left adjacent, right adjacent (same-sign check is
    # encoded in the builder's adjacency), + alternate branch of current.
    left = tmap.left_adj[cur]
    right = tmap.right_adj[cur]
    starts = jnp.stack([cur, left, right, cur])[:num_refs]
    branches = jnp.arange(num_refs) == (num_refs - 1)  # last slot = alt branch

    def one_ref(start, branch):
        ok = start >= 0
        chain = _chain_lanes(tmap, jnp.maximum(start, 0), route_mask, branch.astype(jnp.int32))
        pts, hdg, valid = _chain_to_polyline(tmap, chain)
        pts, hdg, valid = _compact(pts, hdg, valid)
        valid &= ok

        # arclength from the vehicle's projection onto the chain
        seg = jnp.linalg.norm(jnp.diff(pts, axis=0), axis=1)
        seg = jnp.where(valid[1:] & valid[:-1], seg, 0.0)
        s = jnp.concatenate([jnp.zeros(1), jnp.cumsum(seg)])
        # project position onto chain (only valid portion)
        _, _, _ = 0, 0, 0
        d2p = jnp.sum((pts - position) ** 2, axis=-1)
        d2p = jnp.where(valid, d2p, jnp.inf)
        i0 = jnp.argmin(d2p)
        s0 = s[i0]
        total = jnp.where(valid, s, 0.0).max()
        # resample at 1 m from s0 to s0+max_length
        targets = s0 + jnp.arange(num_points, dtype=jnp.float32) * (
            max_length / num_points
        )
        x = jnp.interp(targets, s, pts[:, 0])
        y = jnp.interp(targets, s, pts[:, 1])
        h = _interp_angle(targets, s, hdg)
        point_valid = (targets <= total + 1e-3) & ok
        return (
            jnp.stack([x, y], axis=-1),
            h,
            point_valid,
        )

    pos_r, ori_r, valid_r = jax.vmap(one_ref)(starts, branches)

    # dedupe: drop a line whose points all lie within 0.5 m of an earlier line
    # (nuplan_map_utils.py:552-562)
    def dup_against(i, j):
        both = valid_r[i] & valid_r[j]
        diff = jnp.abs(pos_r[i] - pos_r[j]).sum(-1)
        close = jnp.where(both, diff, 0.0)
        return (jnp.max(close) < 0.5) & both.any()

    R = num_refs
    dup = jnp.zeros(R, bool)
    for j in range(1, R):
        is_dup = jnp.zeros((), bool)
        for i in range(j):
            is_dup |= dup_against(i, j) & ~dup[i]
        dup = dup.at[j].set(is_dup)
    valid_r &= ~dup[:, None]

    vector = jnp.diff(pos_r, axis=1, append=pos_r[:, -1:])
    return {
        "position": pos_r,
        "vector": vector,
        "orientation": ori_r,
        "valid_mask": valid_r,
        "current_lane": cur,
    }


def _interp_angle(targets, s, angles):
    """Angle-aware linear interpolation over arclength."""
    c = jnp.interp(targets, s, jnp.cos(angles))
    sn = jnp.interp(targets, s, jnp.sin(angles))
    return jnp.arctan2(sn, c)
