"""Criticality metrics: RTTC, ACT, EI.

Vectorized jnp rebuild of rift/scenario/tools/metrics.py:154-401 (closed-form
vehicle-pair criticality used in the paper's tables): RTTC sweeps each
vehicle's corners along the relative velocity against the other's box edges;
ACT = shortest corner-to-corner distance / closing speed; EI = safety
in-depth / RTTC. Aggregation over neighbors: min for RTTC/ACT, max for EI
(compute_ego_critical_metrics, metrics.py:300-340). NaN = undefined (not
approaching / no neighbors), matching the reference's conventions.

All functions broadcast over leading batch dims; `pairwise_criticality`
evaluates ego-vs-N-neighbors in one call.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..geometry.obb import box_corners

D_SAFE = 0.0


def _ray_segment_t(origin, direction, seg_a, seg_b):
    """Distance (meters) from `origin` along normalized `direction` to the
    segment [a, b]; NaN if no hit. Broadcasts. Parallel rays: no hit
    (degenerate case; the reference handles collinear overlap specially but
    it is measure-zero for moving traffic)."""
    v1 = origin - seg_a
    v2 = seg_b - seg_a
    d_norm = jnp.linalg.norm(direction, axis=-1, keepdims=True)
    d = direction / jnp.maximum(d_norm, 1e-12)
    v3 = jnp.stack([-d[..., 1], d[..., 0]], axis=-1)
    dot = jnp.sum(v2 * v3, axis=-1)
    cross = v2[..., 0] * v1[..., 1] - v2[..., 1] * v1[..., 0]
    t1 = cross / jnp.where(jnp.abs(dot) < 1e-10, jnp.nan, dot)
    t2 = jnp.sum(v1 * v3, axis=-1) / jnp.where(jnp.abs(dot) < 1e-10, jnp.nan, dot)
    hit = (t2 >= 0.0) & (t2 <= 1.0)
    return jnp.where(hit, t1, jnp.nan)


def _corner_box_dtc(corners_from, direction, corners_to):
    """Min positive hit distance from 4 corners along `direction` to the 4
    edges of the other box; 0 if a corner sees hits on both sides (origin
    inside the swept volume). Returns (dtc, any_hit) with batch dims."""
    # corners_from: (..., 4, 2); corners_to: (..., 4, 2); direction (..., 2)
    a = corners_to  # (..., 4, 2)
    b = jnp.roll(corners_to, -1, axis=-2)
    t = _ray_segment_t(
        corners_from[..., :, None, :],
        direction[..., None, None, :],
        a[..., None, :, :],
        b[..., None, :, :],
    )  # (..., 4corner, 4edge)
    has_pos = jnp.nanmax(jnp.where(t > 0, 1.0, jnp.nan), axis=-1) == 1.0
    has_neg = jnp.nanmax(jnp.where(t < 0, 1.0, jnp.nan), axis=-1) == 1.0
    through = has_pos & has_neg  # per corner
    t_pos = jnp.where(t > 0, t, jnp.nan)
    dtc = jnp.nanmin(t_pos, axis=(-2, -1))
    dtc = jnp.where(through.any(-1), 0.0, dtc)
    any_hit = ~jnp.isnan(dtc)
    return dtc, any_hit


def pairwise_criticality(
    pos_a, heading_a, speed_a, shape_a,  # ego: (..., 2), (...), (...), (..., 2)
    pos_b, heading_b, speed_b, shape_b,  # other, same batch shape
):
    """RTTC / ACT / EI for vehicle pairs. shape = [width, length].

    Returns dict of (...,) arrays with NaN where undefined.
    """
    v_a = speed_a[..., None] * jnp.stack(
        [jnp.cos(heading_a), jnp.sin(heading_a)], axis=-1
    )
    v_b = speed_b[..., None] * jnp.stack(
        [jnp.cos(heading_b), jnp.sin(heading_b)], axis=-1
    )
    v_rel = v_a - v_b
    v_rel_norm = jnp.linalg.norm(v_rel, axis=-1)

    # closing speed along the center line (calculate_v_Br)
    delta = pos_b - pos_a
    delta_norm = jnp.linalg.norm(delta, axis=-1)
    unit = delta / jnp.maximum(delta_norm, 1e-12)[..., None]
    v_br = -jnp.sum(unit * (v_b - v_a), axis=-1)
    v_br = jnp.where(delta_norm > 0, v_br, 0.0)

    ca = box_corners(pos_a, heading_a, shape_a)
    cb = box_corners(pos_b, heading_b, shape_b)

    dtc_ab, hit_ab = _corner_box_dtc(ca, v_rel, cb)
    dtc_ba, hit_ba = _corner_box_dtc(cb, -v_rel, ca)
    dtc = jnp.nanmin(jnp.stack([dtc_ab, dtc_ba], axis=-1), axis=-1)
    rttc = dtc / jnp.maximum(v_rel_norm, 1e-12)
    rttc = jnp.where((v_br >= 0) & (v_rel_norm > 1e-12) & (rttc >= 0), rttc, jnp.nan)

    # --- TDM / MFD (calculate_TDM_MFD) -----------------------------------
    theta = (v_b - v_a) / jnp.maximum(
        jnp.linalg.norm(v_b - v_a, axis=-1), 1e-12
    )[..., None]
    # corners relative to centers
    aa = ca - pos_a[..., None, :]
    bb = cb - pos_b[..., None, :]
    proj = lambda c: jnp.linalg.norm(
        c - jnp.sum(c * theta[..., None, :], axis=-1, keepdims=True) * theta[..., None, :],
        axis=-1,
    )
    d_a_max = proj(aa).max(-1)
    d_b_max = proj(bb).max(-1)
    d_t1 = jnp.linalg.norm(
        delta - jnp.sum(delta * theta, axis=-1, keepdims=True) * theta, axis=-1
    )
    mfd = d_t1 - (d_a_max + d_b_max)
    in_depth = D_SAFE - mfd
    tdm = -jnp.sum(delta * theta, axis=-1) / jnp.maximum(
        jnp.linalg.norm(v_b - v_a, axis=-1), 1e-12
    )

    # shortest corner-to-corner distance
    diff = (
        bb[..., None, :, :] + delta[..., None, None, :] - aa[..., :, None, :]
    )
    dis_shortest = jnp.linalg.norm(diff, axis=-1).min((-2, -1))

    approaching = v_br > 0
    act = dis_shortest / jnp.maximum(v_br, 1e-12)
    act = jnp.where(approaching & ~jnp.isnan(rttc) & (act >= 0), act, jnp.nan)
    ei = in_depth / jnp.where(rttc == 0, jnp.nan, rttc)
    ei = jnp.where(approaching & ~jnp.isnan(rttc), ei, jnp.nan)

    return {"RTTC": rttc, "ACT": act, "EI": ei}


def ego_criticality(
    ego_pos, ego_heading, ego_speed, ego_shape,  # (S, ...) singles
    nbr_pos, nbr_heading, nbr_speed, nbr_shape,  # (S, N, ...)
    nbr_valid,  # (S, N)
):
    """Aggregate over neighbors: min RTTC/ACT, max EI (NaN if none)."""
    m = pairwise_criticality(
        ego_pos[:, None], ego_heading[:, None], ego_speed[:, None],
        ego_shape[:, None],
        nbr_pos, nbr_heading, nbr_speed, nbr_shape,
    )
    mask = nbr_valid

    def agg(x, fn):
        x = jnp.where(mask, x, jnp.nan)
        return fn(x, axis=-1)

    return {
        "RTTC": agg(m["RTTC"], jnp.nanmin),
        "ACT": agg(m["ACT"], jnp.nanmin),
        "EI": agg(m["EI"], jnp.nanmax),
    }
