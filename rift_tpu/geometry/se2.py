"""SE(2) rigid-transform primitives.

Pure-jnp equivalents of the reference's nuPlan state/geometry helpers
(reference: nuplan_plugin/actor_state/state_representation.py,
nuplan_plugin/geometry/compute.py). Everything broadcasts over arbitrary
leading batch dims; poses are (..., 3) arrays [x, y, heading].
"""

from __future__ import annotations

import jax.numpy as jnp


def wrap_angle(theta: jnp.ndarray) -> jnp.ndarray:
    """Wrap angle(s) to (-pi, pi]. Matches atan2(sin, cos) semantics used
    throughout the reference (e.g. track_propogate.py:_heading_wrap)."""
    return jnp.arctan2(jnp.sin(theta), jnp.cos(theta))


def rotation_matrix(theta: jnp.ndarray) -> jnp.ndarray:
    """(...,) angles -> (..., 2, 2) rotation matrices R such that
    ``R @ v`` rotates column vectors by +theta."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.stack(
        [jnp.stack([c, -s], axis=-1), jnp.stack([s, c], axis=-1)], axis=-2
    )


def rotate(points: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
    """Rotate (..., 2) points by angle(s) theta (broadcasting over leading dims).

    Row-vector convention: p' = p @ R^T so that p' = R p for each point.
    """
    c, s = jnp.cos(theta), jnp.sin(theta)
    x, y = points[..., 0], points[..., 1]
    return jnp.stack([x * c - y * s, x * s + y * c], axis=-1)


def global_to_local(points: jnp.ndarray, origin: jnp.ndarray, heading: jnp.ndarray) -> jnp.ndarray:
    """Express global (..., 2) points in the frame at ``origin`` with ``heading``."""
    return rotate(points - origin, -heading)


def local_to_global(points: jnp.ndarray, origin: jnp.ndarray, heading: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`global_to_local`."""
    return rotate(points, heading) + origin


def se2_compose(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Compose two SE(2) poses (..., 3): result = a ∘ b (apply b in a's frame)."""
    xy = a[..., :2] + rotate(b[..., :2], a[..., 2])
    th = wrap_angle(a[..., 2] + b[..., 2])
    return jnp.concatenate([xy, th[..., None]], axis=-1)


def se2_inverse(a: jnp.ndarray) -> jnp.ndarray:
    """Inverse pose such that compose(a, inv(a)) = identity."""
    inv_xy = rotate(-a[..., :2], -a[..., 2])
    return jnp.concatenate([inv_xy, -a[..., 2:3]], axis=-1)
