"""On-device Pluto feature builder.

Replaces the reference's host-side PlutoFeatureBuilder
(rift/cbv/planning/pluto/feature_builder/pluto_feature_builder.py) +
PlutoFeature.normalize/collate (pluto_feature.py): features are built
directly in the center agent's frame from the SimState history tensors and
the TensorMap — no shapely, no per-CBV Python loops, no host round-trip.
`vmap` over (scenario, agent) gives the whole batch in one fused program.

Traffic lights are assumed GREEN for lanes, matching the reference
(pluto_feature_builder.py:316: "assume all the traffic light is Green").
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ...geometry.se2 import rotate, wrap_angle
from ...map.reference_lines import reference_lines_from_chains
from ...map.tensor_map import LANE_POINTS, TensorMap
from ...sim.state import HISTORY_STEPS, ScenarioSpec, SimState

# polygon type codes (pluto_feature_builder.py:59-63 ordering)
PT_LANE, PT_LANE_CONNECTOR, PT_CROSSWALK = 0, 1, 2
TL_GREEN, TL_UNKNOWN = 0, 3
# agent categories (pluto_feature_builder.py:47-52 ordering)
CAT_EGO, CAT_VEHICLE, CAT_PEDESTRIAN, CAT_BICYCLE = 0, 1, 2, 3


def build_features_for_agent(
    tmap: TensorMap,
    state: SimState,
    scenario: jnp.ndarray,  # scalar int
    agent: jnp.ndarray,  # scalar int: the center agent slot
    route_mask: jnp.ndarray,  # [L] ego-route lanes of this scenario
    chains_s: jnp.ndarray,  # [L, 2, MAX_CHAIN] this scenario's lane chains
    max_agents: int = 32,
    max_polygons: int = 64,
    num_refs: int = 4,
    radius: float = 120.0,
    canonical: bool = False,
):
    """Feature dict (unbatched) for one center agent, in its frame.

    With ``canonical=True`` the per-CBV history / polygon-point arrays are
    replaced by gather indices (``agent.order``, ``map.lane_idx``) plus
    current poses — the model's canonical branch reads frame-invariant
    tokens instead (see canonical_map_features / shared_history_features)."""
    pos = state.pos[scenario]  # [A, 2]
    heading = state.heading[scenario]
    alive = state.alive[scenario]
    shape = state.shape[scenario]
    hist_pos = state.hist_pos[scenario]  # [A, H, 2]
    hist_heading = state.hist_heading[scenario]
    hist_vel = state.hist_vel[scenario]
    hist_valid = state.hist_valid[scenario]

    c_pos = pos[agent]
    c_heading = heading[agent]
    c = jnp.cos(-c_heading)
    s = jnp.sin(-c_heading)

    def to_local_pts(p):
        rel = p - c_pos
        return jnp.stack(
            [rel[..., 0] * c - rel[..., 1] * s, rel[..., 0] * s + rel[..., 1] * c],
            axis=-1,
        )

    def rot_local(v):
        return jnp.stack(
            [v[..., 0] * c - v[..., 1] * s, v[..., 0] * s + v[..., 1] * c],
            axis=-1,
        )

    # ---------------------------------------------------------------- agents
    A = pos.shape[0]
    d = jnp.linalg.norm(pos - c_pos, axis=-1)
    d = jnp.where(alive & (jnp.arange(A) != agent), d, jnp.inf)
    d = jnp.where(d <= radius, d, jnp.inf)
    # nearest neighbors, then center agent at slot 0
    k = min(max_agents - 1, A)
    neg, nbr_idx = jax.lax.top_k(-d, k)
    nbr_idx = jnp.pad(nbr_idx, (0, max_agents - 1 - k))
    nbr_valid = jnp.pad(jnp.isfinite(-neg), (0, max_agents - 1 - k))
    order = jnp.concatenate([agent[None], nbr_idx])
    slot_valid = jnp.concatenate([jnp.ones(1, bool), nbr_valid])

    a_valid = hist_valid[order] & slot_valid[:, None]
    if canonical:
        a_cur_pos = to_local_pts(pos[order])  # [N, 2]
        a_cur_heading = wrap_angle(heading[order] - c_heading)
    else:
        a_pos = to_local_pts(hist_pos[order])  # [N, H, 2]
        a_heading = wrap_angle(hist_heading[order] - c_heading)
        a_vel = rot_local(hist_vel[order])
        a_shape = jnp.broadcast_to(
            shape[order][:, None, :], (max_agents, HISTORY_STEPS, 2)
        )
    # class -> pluto category: vehicle->VEHICLE, walker->PEDESTRIAN; statics
    # keep VEHICLE (the reference folds barriers into the statics encoder,
    # which we leave empty — a static box as a stopped vehicle is the
    # conservative approximation). Slot 0 is the feature-center agent (EGO).
    cls = state.agent_class[scenario][order]
    category = jnp.where(cls == 1, CAT_PEDESTRIAN, CAT_VEHICLE)
    category = jnp.where(
        jnp.arange(max_agents) == 0, CAT_EGO, category
    ).astype(jnp.int32)

    # current state channels: x, y, heading = 0 in own frame;
    # then v_lon, a_lon, steering, yaw_rate (pluto_feature_builder.py:124-138)
    cur = jnp.array(
        [0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0], jnp.float32
    )
    cur = cur.at[3].set(state.speed[scenario, agent])
    cur = cur.at[4].set(state.accel[scenario, agent])
    cur = cur.at[5].set(state.control[scenario, agent, 1] * 0.37)  # steer->angle
    cur = cur.at[6].set(state.yaw_rate[scenario, agent])

    # ---------------------------------------------------------------- map
    lane_idx, lane_in = tmap.query_proximal(c_pos, radius, max_polygons)
    li = jnp.maximum(lane_idx, 0)
    P = LANE_POINTS - 1
    mid = P // 2
    if canonical:
        # only the polygon-center pose is frame-dependent; point features
        # come from the frame-invariant shared tokens (canonical_map_features)
        seg = tmap.centerline[li, mid + 1] - tmap.centerline[li, mid]
        ori = jnp.arctan2(seg[..., 1], seg[..., 0]) - c_heading
        polygon_center = jnp.concatenate(
            [
                to_local_pts(tmap.centerline[li, mid]),
                wrap_angle(ori)[:, None],
            ],
            axis=-1,
        )
    else:
        centerline = to_local_pts(tmap.centerline[li])  # [M, P+1, 2]
        left = to_local_pts(tmap.left_edge[li])
        right = to_local_pts(tmap.right_edge[li])
        edges = jnp.stack([centerline, left, right], axis=1)  # [M, 3, P+1, 2]
        point_position = edges[:, :, :-1]  # [M, 3, P, 2]
        point_vector = edges[:, :, 1:] - edges[:, :, :-1]
        point_orientation = jnp.arctan2(
            point_vector[..., 1], point_vector[..., 0]
        )
        polygon_center = jnp.concatenate(
            [centerline[:, mid], point_orientation[:, 0, mid][:, None]], axis=-1
        )
    polygon_type = jnp.where(
        tmap.is_junction[li], PT_LANE_CONNECTOR, PT_LANE
    ).astype(jnp.int32)
    # on-route for the CENTER agent: its own chain ahead, plus the ego route
    # (the reference flags lanes on the CBV's route, nuplan_map_utils.py:589)
    cur_lane = state.lane[scenario, agent]
    own_chain = chains_s[jnp.maximum(cur_lane, 0), 0]  # [MAX_CHAIN]
    on_own_route = (li[:, None] == own_chain[None, :]).any(-1)
    polygon_on_route = (route_mask[li] | on_own_route) & lane_in
    polygon_tl = jnp.full((max_polygons,), TL_GREEN, jnp.int32)
    polygon_speed = tmap.speed_limit[li]
    polygon_has_speed = lane_in
    map_valid = lane_in[:, None] & jnp.ones(P, bool)
    if canonical:
        map_dict = {
            "lane_idx": li.astype(jnp.int32),
            "polygon_center": polygon_center,
            "polygon_type": polygon_type,
            "polygon_on_route": polygon_on_route,
            "polygon_tl_status": polygon_tl,
            "polygon_speed_limit": polygon_speed,
            "valid_mask": map_valid,
        }
    else:
        map_dict = {
            "point_position": point_position,
            "point_vector": point_vector,
            "point_orientation": point_orientation,
            "polygon_center": polygon_center,
            "polygon_type": polygon_type,
            "polygon_on_route": polygon_on_route,
            "polygon_tl_status": polygon_tl,
            "polygon_has_speed_limit": polygon_has_speed,
            "polygon_speed_limit": polygon_speed,
            "valid_mask": map_valid,
        }

    # ---------------------------------------------------------------- refs
    refs = reference_lines_from_chains(
        tmap, chains_s, cur_lane, c_pos,
        num_refs=num_refs, num_points=int(radius), max_length=radius,
    )
    r_pos = to_local_pts(refs["position"])
    r_ori = wrap_angle(refs["orientation"] - c_heading)
    r_vec = rot_local(refs["vector"])

    # ---------------------------------------------------------------- statics
    statics = {
        "position": jnp.zeros((1, 2), jnp.float32),
        "heading": jnp.zeros((1,), jnp.float32),
        "shape": jnp.zeros((1, 2), jnp.float32),
        "category": jnp.zeros((1,), jnp.int32),
        "valid_mask": jnp.zeros((1,), bool),
    }

    if canonical:
        agent_dict = {
            "order": order.astype(jnp.int32),
            "cur_pos": a_cur_pos,
            "cur_heading": a_cur_heading,
            "category": category,
            "valid_mask": a_valid,
        }
    else:
        agent_dict = {
            "position": a_pos,
            "heading": a_heading,
            "velocity": a_vel,
            "shape": a_shape,
            "category": category,
            "valid_mask": a_valid,
        }
    return {
        "agent": agent_dict,
        "map": map_dict,
        "reference_line": {
            "position": r_pos,
            "vector": r_vec,
            "orientation": r_ori,
            "valid_mask": refs["valid_mask"],
        },
        "static_objects": statics,
        "current_state": cur,
    }


# --------------------------------------------------------------------------
# Canonical (frame-invariant) token mode.
#
# The reference builds every feature in the center CBV's frame
# (pluto_feature.py:normalize), so the same lane polygon / neighbor history
# is re-encoded once per CBV per tick. On TPU that is pure waste: encoding
# is the expensive part (PointsEncoder / HistoryEncoder), while the frame
# information is *already* injected separately by the model's Fourier
# position embedding (model.py:404 embeds each token's pose in the CBV
# frame). Canonical mode therefore encodes
#   - each map lane ONCE per map, in the lane's own frame (centered on the
#     polygon center, rotated by its orientation), and
#   - each world agent's history ONCE per tick, in the agent's own current
#     frame (history *differences* are rotation-covariant, so own-frame
#     features are CBV-independent),
# and the per-CBV model forward just gathers the resulting tokens — the
# QCNet-style frame-invariant encoding, 48x fewer PointsEncoder rows and
# ~4x fewer HistoryEncoder rows at the bench config. The model branches on
# key presence (model.py AgentEncoder/MapEncoder) with an identical param
# tree, so npz checkpoints interoperate between modes.
# --------------------------------------------------------------------------


def canonical_map_features(tmap: TensorMap):
    """Per-lane polygon features in each lane's own frame.

    Returns {"feat": [L, P, 10], "type": [L], "speed": [L]} — the exact
    channel layout MapEncoder feeds PointsEncoder (model.py:122-133), with
    the CBV->polygon transform removed (it is re-supplied by pos_emb).
    Pure function of the TensorMap: shared by every CBV in the batch.
    """
    edges = jnp.stack(
        [tmap.centerline, tmap.left_edge, tmap.right_edge], axis=1
    )  # [L, 3, P+1, 2]
    point_position = edges[:, :, :-1]
    point_vector = edges[:, :, 1:] - edges[:, :, :-1]
    point_orientation = jnp.arctan2(point_vector[..., 1], point_vector[..., 0])
    P = LANE_POINTS - 1
    mid = P // 2
    center_pos = tmap.centerline[:, mid]  # [L, 2]
    center_ori = point_orientation[:, 0, mid]  # [L]
    c = jnp.cos(-center_ori)[:, None]
    s = jnp.sin(-center_ori)[:, None]

    def rot(v):  # [L, P, 2] rotated by -center_ori per lane
        return jnp.stack(
            [v[..., 0] * c - v[..., 1] * s, v[..., 0] * s + v[..., 1] * c],
            axis=-1,
        )

    rel_ori = point_orientation[:, 0] - center_ori[:, None]
    feat = jnp.concatenate(
        [
            rot(point_position[:, 0] - center_pos[:, None, :]),
            rot(point_vector[:, 0]),
            jnp.stack([jnp.cos(rel_ori), jnp.sin(rel_ori)], axis=-1),
            rot(point_position[:, 1] - point_position[:, 0]),
            rot(point_position[:, 2] - point_position[:, 0]),
        ],
        axis=-1,
    )  # [L, P, 10]
    ptype = jnp.where(tmap.is_junction, PT_LANE_CONNECTOR, PT_LANE).astype(
        jnp.int32
    )
    return {"feat": feat, "type": ptype, "speed": tmap.speed_limit}


def shared_history_features(state: SimState):
    """Per-world-agent history-difference features in each agent's OWN
    current frame: [S, A, H-1, 9], the exact channel layout AgentEncoder
    feeds HistoryEncoder (model.py:70-87). CBV-independent by construction:
    position/velocity diffs rotate covariantly, heading diffs / shape /
    masks are frame-invariant."""
    hist_pos = state.hist_pos  # [S, A, H, 2]
    hist_heading = state.hist_heading
    hist_vel = state.hist_vel
    hist_valid = state.hist_valid
    heading = state.heading  # [S, A] current
    c = jnp.cos(-heading)[..., None]
    s = jnp.sin(-heading)[..., None]
    vec_mask = hist_valid[..., :-1] & hist_valid[..., 1:]

    def to_vec(f):
        d = f[..., 1:, :] - f[..., :-1, :]
        rot = jnp.stack(
            [d[..., 0] * c - d[..., 1] * s, d[..., 0] * s + d[..., 1] * c],
            axis=-1,
        )
        return jnp.where(vec_mask[..., None], rot, 0.0)

    dh = hist_heading[..., 1:] - hist_heading[..., :-1]
    dh = jnp.where(vec_mask, dh, 0.0)
    S, A, H = hist_valid.shape
    shape_b = jnp.broadcast_to(state.shape[:, :, None, :], (S, A, H - 1, 2))
    return jnp.concatenate(
        [
            to_vec(hist_pos),
            to_vec(hist_vel),
            jnp.stack([jnp.cos(dh), jnp.sin(dh)], axis=-1),
            shape_b,
            vec_mask[..., None].astype(jnp.float32),
        ],
        axis=-1,
    )  # [S, A, H-1, 9]


@partial(
    jax.jit,
    static_argnames=(
        "max_agents", "max_polygons", "num_refs", "radius",
        "canonical", "with_sample_feats",
    ),
)
def build_cbv_features(
    tmap: TensorMap,
    state: SimState,
    cbv_slots: jnp.ndarray,  # [S, C] agent slot per CBV position (-1 pad)
    spec: ScenarioSpec,  # carries route_lane_mask + lane_chains
    max_agents: int = 32,
    max_polygons: int = 64,
    num_refs: int = 4,
    radius: float = 120.0,
    canonical: bool = False,
    with_sample_feats: bool = False,
):
    """Batched features for all CBVs of all scenarios: leading dims [S, C].

    Returns (features pytree with leading [S, C], valid [S, C]) — and, with
    ``canonical=True``, a third element: the shared frame-invariant blocks
    {"map_feat"/"map_type"/"map_speed" [L,...], "hist_feat" [S, A, H-1, 9]}
    consumed by the model's deduplicated encoder path.

    ``with_sample_feats=True`` (train mode) additionally gathers the
    per-sample canonical inputs ("agent.hist_feat", "map.canonical_feat")
    so buffered samples stay self-contained for the fit forward — the model
    computes identical tokens from either form.
    """
    S, C = cbv_slots.shape

    def one(scenario, slot):
        return build_features_for_agent(
            tmap, state, scenario, jnp.maximum(slot, 0),
            spec.route_lane_mask[scenario], spec.lane_chains[scenario],
            max_agents=max_agents, max_polygons=max_polygons,
            num_refs=num_refs, radius=radius, canonical=canonical,
        )

    scen = jnp.broadcast_to(jnp.arange(S)[:, None], (S, C))
    feats = jax.vmap(jax.vmap(one))(scen, cbv_slots)
    if not canonical:
        return feats, cbv_slots >= 0

    shared = {
        **{
            f"map_{k}": v
            for k, v in canonical_map_features(tmap).items()
        },
        "hist_feat": shared_history_features(state),
    }
    if with_sample_feats:
        order = feats["agent"]["order"]  # [S, C, A]
        feats["agent"]["hist_feat"] = jax.vmap(
            lambda h, o: h[o]
        )(shared["hist_feat"], order.reshape(S, C * order.shape[-1])).reshape(
            order.shape + shared["hist_feat"].shape[-2:]
        )
        li = feats["map"]["lane_idx"]  # [S, C, M]
        feats["map"]["canonical_feat"] = shared["map_feat"][li]
    return feats, cbv_slots >= 0, shared
