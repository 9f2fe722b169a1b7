"""Built-in "constraints as losses" for the drag optimizer.

The reference documents four extra drag-loss terms as commented-out code
(``drag_pose.py:129-183``) — feet-on-floor, head/hips facing alignment,
head-over-hips colinearity and hips-over-feet support.  Here they are live,
tested, and pluggable: each factory returns a pure function
``ConstraintContext -> scalar`` suitable for ``DragHyper.constraints``
(weighted sum joins the objective inside the compiled ``while_loop``):

    hyper = hyper._replace(constraints=(
        (constraints.feet_floor(), 1.0),
        (constraints.head_hips_colinear(), 0.5),
    ))

All formulas keep the reference's conventions: the up axis is index 1, joint
indices default to the 22-joint DanceDB skeleton (feet 4/8, head 13, hips 0),
and world positions are ``ctx.positions + ctx.global_pos`` (FK relative to
the previous root plus that root).  Branches are data-independent
(``jnp.where`` with NaN-safe denominators) so the terms differentiate and
compile cleanly under ``vmap``/``while_loop``.
"""

from __future__ import annotations

import jax.numpy as jnp

from dragposer_tpu.ops import quat

_EPS = 1e-8


def feet_floor(feet=(4, 8), floor_level: float = 0.0, up_axis: int = 1):
    """Penalize feet leaving the floor plane (``drag_pose.py:132-134``):
    mean squared world height of the foot joints above ``floor_level``."""
    feet = tuple(feet)

    def loss(ctx):
        h = ctx.global_pos[up_axis] + (
            ctx.positions[jnp.asarray(feet), up_axis] - floor_level
        )
        return jnp.mean(h ** 2)

    return loss


def head_hips_forward(head: int = 13, hips: int = 0, up_axis: int = 1,
                      slack: float = 0.2):
    """Keep the head facing within the hips' forward cone
    (``drag_pose.py:136-154``): squared hinge on the ground-projected
    forward-vector dot product, gated off when the head looks straight up
    or down (projected norm <= 0.5, the reference's guard)."""

    def loss(ctx):
        fwd = jnp.zeros(3).at[2].set(1.0)
        fwd_head = quat.mul_vec(ctx.world_quats[head], fwd).at[up_axis].set(0.0)
        fwd_hips = quat.mul_vec(ctx.world_quats[hips], fwd).at[up_axis].set(0.0)
        n_head = jnp.linalg.norm(fwd_head)
        n_hips = jnp.linalg.norm(fwd_hips)
        cos = jnp.sum(fwd_head * fwd_hips) / jnp.maximum(n_head * n_hips, _EPS)
        term = (1.0 - jnp.minimum(1.0, cos + slack)) ** 2
        return jnp.where(n_head > 0.5, term, 0.0)

    return loss


def head_hips_colinear(head: int = 13, hips: int = 0, up_axis: int = 1):
    """Keep the head vertically over the hips (``drag_pose.py:156-162``):
    squared ground-plane distance between the two world positions."""

    def loss(ctx):
        d = (ctx.positions[head] - ctx.positions[hips]).at[up_axis].set(0.0)
        return jnp.sum(d ** 2)

    return loss


def hips_feet_colinear(hips: int = 0, feet=(4, 8), radius: float = 0.2,
                       up_axis: int = 1):
    """Keep the hips over the support polygon (``drag_pose.py:164-176``):
    hinge on the squared ground-plane hips→foot distance beyond ``radius``."""
    feet = tuple(feet)

    def loss(ctx):
        hips_g = ctx.positions[hips]
        total = 0.0
        for f in feet:
            d = (hips_g - ctx.positions[f]).at[up_axis].set(0.0)
            total = total + jnp.maximum(jnp.sum(d ** 2) - radius * radius, 0.0)
        return total

    return loss


_BY_NAME = {
    "feet_floor": feet_floor,
    "head_hips_forward": head_hips_forward,
    "head_hips_colinear": head_hips_colinear,
    "hips_feet_colinear": hips_feet_colinear,
}


def parse_spec(spec: str):
    """``'feet_floor:0.5,head_hips_colinear:0.1'`` → ``DragHyper.constraints``.

    The textual form used by config JSONs (``"constraints"`` key), the
    ``eval_drag --constraints`` flag and the diagnostics tooling.  Empty or
    whitespace-only specs parse to ``()`` (constraints off)."""
    spec = (spec or "").strip()
    if not spec:
        return ()
    out = []
    for item in spec.split(","):
        name, _, w = item.partition(":")
        name = name.strip()
        if name not in _BY_NAME:
            raise ValueError(
                f"unknown constraint {name!r}; choose from {sorted(_BY_NAME)}")
        out.append((_BY_NAME[name](), float(w) if w else 1.0))
    return tuple(out)


#: the reference's full commented-out bundle (``drag_pose.py:178-183``),
#: ready for ``DragHyper.constraints``; all weights 1 as in the reference sum
REFERENCE_BUNDLE = (
    (feet_floor(), 1.0),
    (head_hips_forward(), 1.0),
    (head_hips_colinear(), 1.0),
    (hips_feet_colinear(), 1.0),
)
