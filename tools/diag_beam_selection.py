"""Diagnose the hypothesis beam's SELECTION quality on one clip.

PARITY.json records an honest split: at the committed 3-tracker beam
defaults the selected lineage beats the reference's seed-sweep mean on
every clip, but on ``example_2`` it does NOT beat the reference's lucky
best seed — while a lucky single-seed run of ours lands at 0.173 m on
that clip.  Two distinct failure modes could produce that:

  A. the beam's lineage POOL never contains a good trajectory
     (resampling collapses diversity toward early fit-winners), or
  B. the pool contains one but the tracker-fit score picks a worse lane
     (fit <-> GT error decorrelate in the underconstrained regime).

This tool runs the beam with ``return_all=True`` and, for EVERY final
lineage, reports: cumulative fit loss (the selection key), ground-truth
MPJPE (diagnosis only — the product never sees it), and pose jitter.
It prints the fit-selected vs the GT-oracle lineage (the gap = what a
better no-GT selection rule could recover) and the Spearman rank
correlation between fit and GT across the pool.

  python tools/diag_beam_selection.py models/model_dancedb_example \
      --clip example_2 [--seed 0] [--json-out /tmp/diag.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def constraint_energies(wpos, wrot) -> dict:
    """Physical-plausibility energies of a reconstructed motion — the
    reference's commented-out constraint losses (``drag_pose.py:129-183``,
    live in ``dragposer_tpu/drag/constraints.py``) evaluated as GT-FREE
    trajectory scores: could they discriminate the wrong-body basins that
    overfit sparse trackers (round-4 VERDICT #5)?

    ``wpos`` (T, J, 3) world joint positions, ``wrot`` (T, J, 4) world
    quats (wxyz).  Same formulas/joints/up-axis as the drag-term versions:
    feet 4/8, head 13, hips 0, up = y, floor 0, support radius 0.2."""
    feet, head, hips, up = (4, 8), 13, 0, 1
    e_feet = float(np.mean(wpos[:, feet, up] ** 2))
    d = wpos[:, head] - wpos[:, hips]
    d[:, up] = 0.0
    e_colinear = float(np.mean(np.sum(d * d, axis=-1)))
    e_support = 0.0
    for f in feet:
        d = wpos[:, hips] - wpos[:, f]
        d[:, up] = 0.0
        e_support += float(np.mean(
            np.maximum(np.sum(d * d, axis=-1) - 0.04, 0.0)))
    # head-forward-in-hips-cone hinge (drag_pose.py:136-154): rotate +z
    # by the world quats, project to the ground plane
    fwd = np.zeros((1, 3)); fwd[0, 2] = 1.0                   # noqa: E702

    def rot_vec(q, v):
        w, xyz = q[..., :1], q[..., 1:]
        t = 2.0 * np.cross(xyz, v)
        return v + w * t + np.cross(xyz, t)

    fh = rot_vec(wrot[:, head], fwd); fh[:, up] = 0.0          # noqa: E702
    fp = rot_vec(wrot[:, hips], fwd); fp[:, up] = 0.0          # noqa: E702
    nh = np.linalg.norm(fh, axis=-1)
    npp = np.linalg.norm(fp, axis=-1)
    cos = np.sum(fh * fp, axis=-1) / np.maximum(nh * npp, 1e-8)
    term = (1.0 - np.minimum(1.0, cos + 0.2)) ** 2
    e_forward = float(np.mean(np.where(nh > 0.5, term, 0.0)))
    return {"e_feet": e_feet, "e_colinear": e_colinear,
            "e_support": e_support, "e_forward": e_forward,
            "e_bundle": e_feet + e_colinear + e_support + e_forward}


def parse_constraints(spec: str):
    """'feet_floor:0.5,head_hips_colinear:0.1' -> DragHyper.constraints."""
    from dragposer_tpu.drag.constraints import parse_spec

    return parse_spec(spec)


def spearman(a, b) -> float:
    ra = np.argsort(np.argsort(a)).astype(np.float64)
    rb = np.argsort(np.argsort(b)).astype(np.float64)
    ra -= ra.mean()
    rb -= rb.mean()
    den = np.sqrt((ra * ra).sum() * (rb * rb).sum())
    return float((ra * rb).sum() / den) if den else 0.0


def main():
    import jax

    from parity_matrix import CLIPS
    from dragposer_tpu import config as cfg
    from dragposer_tpu import export, metrics
    from dragposer_tpu.cli.eval_drag import build_engine, resolve_config
    from dragposer_tpu.data import encoding
    from dragposer_tpu.drag.hypotheses import run_hypotheses
    from dragposer_tpu.io.bvh import BVH
    from dragposer_tpu.ops.topology import Skeleton

    ap = argparse.ArgumentParser()
    ap.add_argument("model_dir")
    ap.add_argument("--clip", default="example_2")
    ap.add_argument("--config", default="3_trackers")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--frames", type=int, default=None)
    ap.add_argument("--restarts", type=int, default=None)
    ap.add_argument("--branch-every", type=int, default=None,
                    help="override the resampling period (>= clip length "
                         "disables resampling: R independent trajectories)")
    ap.add_argument("--sigma", type=float, default=None)
    ap.add_argument("--constraints", default=None,
                    help="run the DRAG ITSELF with constraint loss terms, "
                         "e.g. 'feet_floor:0.5,head_hips_colinear:0.1' "
                         "(names from dragposer_tpu/drag/constraints.py)")
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("DRAGPOSER_JAX_CACHE",
                                     "/tmp/dragposer_jax_cache"))

    c = cfg.BUILTIN_CONFIGS[args.config]
    R = args.restarts or c.default_restarts
    K, branch, sigma = (c.default_branch_survivors, c.default_branch_every,
                        c.default_branch_sigma)
    if args.branch_every is not None:
        branch = args.branch_every
    if args.sigma is not None:
        sigma = args.sigma

    spec = CLIPS[args.clip]
    bvh = BVH().load(spec["path"])
    lo = spec["start"]
    n = spec["frames"] if args.frames is None else args.frames
    bvh.rotations = bvh.rotations[lo:lo + n]
    bvh.positions = bvh.positions[lo:lo + n]
    rots, pos, parents, offsets, _ = encoding.info_from_bvh(bvh)
    skeleton = Skeleton.build(parents, offsets, bvh.names)
    engine, means, stds = build_engine(args.model_dir, parents,
                                       resolve_config(args.config),
                                       skeleton=skeleton)
    if args.constraints:
        from dragposer_tpu.drag.engine import DragEngine

        engine = DragEngine(
            engine.model, engine.statics, engine.skeleton,
            engine.hyper._replace(constraints=parse_constraints(
                args.constraints)),
            engine.tparam)
    motion = encoding.encode_motion(
        offsets, pos[:, 0, :], rots, skeleton,
        downsample=cfg.VAE_PARAM["downsample"],
        height_indices=cfg.HEIGHT_INDICES,
    )
    norm = encoding.normalize(motion, means, stds)
    dqs, gp, gr = norm.dqs, norm.global_pos, norm.global_rot
    initial_pose = np.tile(dqs[0][:, None], (1, cfg.VAE_PARAM["window_size"]))

    t0 = time.time()
    out, parents_log, scores, cum = run_hypotheses(
        engine, jax.random.PRNGKey(args.seed), R, dqs, gp, gr,
        motion.heights[0], initial_pose,
        branch_every=branch, sigma=sigma, survivors=K, return_all=True)
    print(f"beam R={R} K={K} branch={branch} sigma={sigma} "
          f"clip={args.clip} seed={args.seed}: {time.time() - t0:.0f}s",
          flush=True)

    rows = []
    for j in range(R):
        lane = jax.tree.map(lambda a, j=j: a[j], out)
        ob = export.result_to_bvh(lane.pose, means, stds, bvh, skeleton,
                                  global_pos=lane.global_pos,
                                  are_root_rot_incr=False)
        tmp = f"/tmp/diag_lane.bvh"
        ob.save(tmp)
        rec = BVH().load(tmp)
        mpjpe, _ = metrics.positional_error(bvh, rec)
        jit = metrics.jitter(rec)
        # GT-free candidate scores from the lane's latent trajectory
        # (FrameOutput.latent): VAE-prior energy and latent velocity —
        # could either discriminate the wrong-body basins that overfit
        # sparse trackers?
        z = np.asarray(lane.latent, np.float64)            # (T, L)
        s_prior = float(np.mean(z * z))
        s_zvel = float(np.mean(np.sum(np.diff(z, axis=0) ** 2, axis=1)))
        # constraint energies of the reconstructed trajectory (GT-free)
        from dragposer_tpu.ops import fk as fk_ops, host_device
        rrots, rpos, rparents, roffsets, _ = encoding.info_from_bvh(rec)
        with host_device():
            rsk = Skeleton.build(rparents, roffsets)
            wpos, wrot = fk_ops.fk_local(rrots, rpos[:, 0, :], rsk)
        energies = constraint_energies(np.asarray(wpos), np.asarray(wrot))
        rows.append({"lane": j, "fit": float(cum[j]),
                     "mpjpe": float(mpjpe), "jitter": float(jit),
                     "s_prior": s_prior, "s_zvel": s_zvel, **energies})

    fit = np.array([r["fit"] for r in rows])
    gt = np.array([r["mpjpe"] for r in rows])
    jt = np.array([r["jitter"] for r in rows])
    spr = np.array([r["s_prior"] for r in rows])
    szv = np.array([r["s_zvel"] for r in rows])
    cons = {k: np.array([r[k] for r in rows])
            for k in ("e_feet", "e_colinear", "e_support", "e_forward",
                      "e_bundle")}
    sel, oracle = int(np.argmin(fit)), int(np.argmin(gt))
    summary = {
        "clip": args.clip, "seed": args.seed,
        "R": R, "K": K, "branch": branch, "sigma": sigma,
        "drag_constraints": args.constraints,
        "selected": rows[sel], "oracle": rows[oracle],
        "oracle_gap": rows[sel]["mpjpe"] - rows[oracle]["mpjpe"],
        "pool_mpjpe": {"mean": float(gt.mean()), "min": float(gt.min()),
                       "max": float(gt.max()),
                       "p10": float(np.percentile(gt, 10))},
        "spearman_fit_gt": spearman(fit, gt),
        "spearman_jitter_gt": spearman(jt, gt),
        "spearman_sprior_gt": spearman(spr, gt),
        "spearman_szvel_gt": spearman(szv, gt),
        "spearman_constraints_gt": {k: spearman(v, gt)
                                    for k, v in cons.items()},
        "gt_of_argmin": {"fit": float(gt[np.argmin(fit)]),
                         "s_prior": float(gt[np.argmin(spr)]),
                         "s_zvel": float(gt[np.argmin(szv)]),
                         "jitter": float(gt[np.argmin(jt)]),
                         **{k: float(gt[np.argmin(v)])
                            for k, v in cons.items()}},
        # fit + constraint-energy combined selection (the bundle as a
        # tie-breaking prior on the normalized fit): does physical
        # plausibility rescue fit's GT-blind picks?
        "gt_of_fit_plus_bundle": {
            str(lam): float(gt[np.argmin(
                fit / max(float(fit.mean()), 1e-12)
                + lam * cons["e_bundle"]
                / max(float(cons["e_bundle"].mean()), 1e-12))])
            for lam in (0.1, 0.3, 1.0, 3.0)},
        "n_distinct_fits": int(len(np.unique(np.round(fit, 9)))),
    }
    print(json.dumps(summary, indent=1))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump({"summary": summary, "rows": rows}, f, indent=1)


if __name__ == "__main__":
    main()
