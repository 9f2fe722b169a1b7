"""Offline drag-reconstruction evaluation (reference ``eval_drag.py`` parity).

Usage::

    python -m dragposer_tpu.cli.eval_drag <model_dir> <bvh-or-dir>
        [--config 6_trackers | path/to/config.json] [--verbose]
        [--no-temporal] [--max-frames N] [--save-dir data]

Prints, per sequence: Evaluate Loss, MPJPE, MPEEPE, wall time — the
reference's de-facto acceptance test (``eval_drag.py:249-252``).  The whole
frame loop runs as one compiled TPU computation.
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import numpy as np

from dragposer_tpu import config as cfg
from dragposer_tpu import export, metrics
from dragposer_tpu.data import encoding
from dragposer_tpu.drag import constraints as constraints_mod
from dragposer_tpu.drag.engine import DragEngine, DragHyper, DragModel
from dragposer_tpu.io.bvh import BVH
from dragposer_tpu.models import loading, vae
from dragposer_tpu.ops.topology import Skeleton

# Offline optimizer budget (reference ``eval_drag.py:210-215``).
EVAL_STOP_EPS_POS = 1e-4
EVAL_STOP_EPS_ROT = 1e-2
EVAL_MAX_ITER = 100
EVAL_MIN_LOSS_INCR = 1e-5
EVAL_LR = 1e-2
EVAL_LAMBDA_ROT = 1.0


def resolve_config(name_or_path: str | None) -> cfg.TrackerConfig:
    if name_or_path is None:
        return cfg.SIX_TRACKERS
    if name_or_path in cfg.BUILTIN_CONFIGS:
        return cfg.BUILTIN_CONFIGS[name_or_path]
    return cfg.TrackerConfig.from_json(name_or_path)


def build_engine(model_dir: str, parents, tracker: cfg.TrackerConfig,
                 *, use_temporal: bool = True, skeleton: Skeleton,
                 max_iter: int = EVAL_MAX_ITER,
                 learning_rate: float = EVAL_LR,
                 constraints: str | None = None) -> tuple[DragEngine, dict, dict]:
    """Load checkpoints and compile a DragEngine for one tracker config.

    ``constraints`` is a ``drag/constraints.py:parse_spec`` string adding
    physical-plausibility loss terms to the drag objective (the reference's
    commented-out ``drag_pose.py:129-183`` terms); ``None`` falls back to
    the config's ``default_constraints``."""
    params, means, stds = loading.load_generator(model_dir, parents, cfg.VAE_PARAM)
    temporal_loaded = loading.load_temporal(model_dir, cfg.TEMPORAL_PARAM) if use_temporal else None
    if use_temporal and temporal_loaded is None:
        print(f"WARNING: no temporal checkpoint in {model_dir}; "
              "running without temporal guidance (lambda_temporal = 0)")
        use_temporal = False

    latent_dim = cfg.VAE_PARAM["latent_dim"]
    if temporal_loaded is not None:
        tpar, means_latent, stds_latent = temporal_loaded
    else:
        tpar = None
        means_latent = np.zeros(latent_dim, np.float32)
        stds_latent = np.ones(latent_dim, np.float32)

    ja = None
    if tracker.enable_joint_adjustment:
        joint, ee_slot = tracker.joint_adjustment_indices
        ee_joint = int(tracker.mask_indices[ee_slot])
        ja = (int(joint), ee_joint)

    model = DragModel(
        decoder=params["decoder"],
        encoder=params["encoder"],
        temporal=tpar,
        mean_dqs=np.asarray(means["dqs"], np.float32),
        std_dqs=np.asarray(stds["dqs"], np.float32),
        mean_disp=np.asarray(means["displacement"], np.float32),
        std_disp=np.asarray(stds["displacement"], np.float32),
        means_latent=np.asarray(means_latent, np.float32),
        stds_latent=np.asarray(stds_latent, np.float32),
        mask=tracker.mask_array(),
        weights=tracker.weights_array(),
    )
    hyper = DragHyper(
        max_iter=max_iter,
        stop_eps_pos=EVAL_STOP_EPS_POS,
        stop_eps_rot=EVAL_STOP_EPS_ROT,
        min_loss_incr=EVAL_MIN_LOSS_INCR,
        learning_rate=learning_rate,
        lambda_rot=EVAL_LAMBDA_ROT,
        lambda_temporal=tracker.lambda_temporal,
        temporal_future_window=tracker.temporal_future_window,
        sample_step=cfg.TEMPORAL_PARAM["sample_step"],
        past_frames=tuple(cfg.TEMPORAL_PARAM["past_frames"]),
        height_indices=tuple(cfg.HEIGHT_INDICES),
        use_temporal=use_temporal,
        joint_adjustment=ja,
        joint_adjustment_weight=tracker.joint_adjustment_weight,
        constraints=constraints_mod.parse_spec(
            tracker.default_constraints if constraints is None
            else constraints),
    )
    statics = vae.build_statics(parents, cfg.VAE_PARAM)
    engine = DragEngine(model, statics, skeleton, hyper, cfg.TEMPORAL_PARAM)
    return engine, means, stds


def run_restarts(engine: DragEngine, key, n_restarts: int, dqs, gp, gr,
                 heights0, initial_pose, sync_k: int = 24):
    """Multi-restart drag: reconstruct the SAME sequence from ``n_restarts``
    different latent inits concurrently (one pipelined batch) and keep the
    restart with the lowest mean tracker-fit loss (pos + rot) — no ground
    truth consulted.  The drag objective is non-convex and the
    underconstrained configs (3-tracker) land in init-dependent basins
    spanning ±30% MPJPE; the tracker-fit loss ranks those basins (measured:
    best-of-16 by loss cuts 3-tracker MPJPE ~35%).  The reference has no
    analog — its init is a single fixed seed (``drag_pose.py:47-64``)."""
    import jax

    from dragposer_tpu.drag import engine as eng

    keys = jax.random.split(key, n_restarts)
    dqs_b = np.broadcast_to(dqs, (n_restarts,) + dqs.shape)
    gp_b = np.broadcast_to(gp, (n_restarts,) + gp.shape)
    gr_b = np.broadcast_to(gr, (n_restarts,) + gr.shape)
    states = jax.vmap(
        lambda k: eng.init_state(
            engine.model, engine.statics, engine.hyper, k,
            initial_pose, gp[0], gr[0], heights0,
        )
    )(keys)
    _, out = engine.run_batch_pipelined(states, dqs_b, gp_b, gr_b,
                                        sync_k=sync_k)
    score = np.asarray(out.loss_pos).mean(axis=1) \
        + np.asarray(out.loss_rot).mean(axis=1)
    best = int(np.argmin(score))
    return jax.tree.map(lambda a: a[best], out), best, score


def evaluate_file(engine: DragEngine, means, stds, skeleton, input_path: str,
                  *, max_frames: int | None = None, save_dir: str = "data",
                  verbose: bool = False, seed: int = cfg.VAE_PARAM["seed"],
                  downsample_gt: int = 1, restarts: int = 1,
                  branch_every: int = 0, branch_sigma: float = 0.25,
                  branch_survivors: int = 8):
    filename = os.path.basename(input_path)
    bvh = BVH().load(input_path)
    rots, pos, parents, offsets, _ = encoding.info_from_bvh(bvh)
    motion = encoding.encode_motion(
        offsets, pos[:, 0, :], rots, skeleton,
        downsample=cfg.VAE_PARAM["downsample"],
        height_indices=cfg.HEIGHT_INDICES,
    )
    norm = encoding.normalize(motion, means, stds)

    n_frames = norm.dqs.shape[0] if max_frames is None else min(max_frames, norm.dqs.shape[0])
    dqs = norm.dqs[:n_frames]
    gp = norm.global_pos[:n_frames]
    gr = norm.global_rot[:n_frames]

    key = jax.random.PRNGKey(seed)
    initial_pose = np.tile(dqs[0][:, None], (1, cfg.VAE_PARAM["window_size"]))

    start = time.time()
    if restarts > 1 and branch_every > 0:
        from dragposer_tpu.drag.hypotheses import run_hypotheses

        out, parents, scores = run_hypotheses(
            engine, key, restarts, dqs, gp, gr, motion.heights[0],
            initial_pose, branch_every=branch_every, sigma=branch_sigma,
            survivors=branch_survivors,
        )
        lead_changes = int((parents[:, 0] != 0).sum())
        print(f"hypotheses: {restarts}-lane beam (top {branch_survivors} "
              f"survive), resample every {branch_every} frames "
              f"(sigma {branch_sigma}); {lead_changes} lead change(s) "
              f"across {len(parents)} chunks")
    elif restarts > 1:
        out, best, scores = run_restarts(
            engine, key, restarts, dqs, gp, gr, motion.heights[0],
            initial_pose,
        )
        print(f"restarts: kept {best} of {restarts} "
              f"(fit loss {scores[best]:.5f}; worst {scores.max():.5f})")
    else:
        state = engine.init_state(key, initial_pose, gp[0], gr[0],
                                  motion.heights[0])
        _, out = engine.run(state, dqs, gp, gr)
    poses, global_pos, iters = out.pose, out.global_pos, out.iterations
    poses = np.asarray(poses)          # blocks until done
    global_pos = np.asarray(global_pos)
    elapsed = time.time() - start

    if verbose:
        it = np.asarray(iters)
        lp = np.asarray(out.loss_pos)
        lr = np.asarray(out.loss_rot)
        # per-frame loss breakdown (reference --verbose, drag_pose.py:361-364)
        for i in range(n_frames):
            print(f"Loss sqrt(Pos): {np.sqrt(lp[i]):.5f} // "
                  f"Loss Rot: {lr[i]:.5f} // Iter: {int(it[i])}")
        print(f"iterations/frame: mean {it.mean():.1f}, max {int(it.max())}, "
              f"min {int(it.min())}")

    out_bvh = export.result_to_bvh(
        poses, means, stds, bvh, skeleton,
        global_pos=global_pos, are_root_rot_incr=False,
    )
    os.makedirs(save_dir, exist_ok=True)
    eval_path = os.path.join(save_dir, "eval_" + filename)
    out_bvh.save(eval_path)

    out_loaded = BVH().load(eval_path)
    mpjpe, mpeepe = metrics.positional_error(
        bvh, out_loaded, downsample_gt=downsample_gt
    )
    print(f"Evaluate Loss: {mpjpe + mpeepe}")
    print(f"Mean Per Joint Position Error: {mpjpe}")
    print(f"Mean End Effector Position Error: {mpeepe}")
    jit = metrics.jitter(out_loaded)
    jit_gt = metrics.jitter(bvh, downsample=downsample_gt)
    print(f"Jitter (m/s^3): {jit:.1f} (ground truth {jit_gt:.1f})")
    print(f"Time: {elapsed}")
    return mpjpe, mpeepe, elapsed, n_frames


def evaluate_batched(engine: DragEngine, means, stds, skeleton, files,
                     *, max_frames=None, save_dir: str = "data",
                     seed: int = cfg.VAE_PARAM["seed"], downsample_gt: int = 1,
                     restarts: int = 1, mesh_devices: int | None = None,
                     branch_every: int = 0, branch_sigma: float = 0.25,
                     branch_survivors: int = 8):
    """Reconstruct many sequences concurrently in one vmapped device program.

    Sequences are padded to the longest by repeating their last frame; the
    padded tail is discarded before export.  This is the TPU-native
    replacement for the reference's serial directory loop
    (``eval_drag.py:285-291``).

    ``mesh_devices`` shards the lane axis over a 1-D data mesh
    (``parallel/mesh.py``): ``None`` = all local devices (multi-chip hosts
    scale out by default), ``1`` = force single-device, ``N`` = exactly N
    devices.  Weights replicate (168k params); the pipelined loop's global
    continue-condition becomes an ICI all-reduce.  Per-lane numerics are
    unchanged (tests/test_parallel.py asserts equality vs unsharded).

    With ``restarts > 1`` and ``branch_every > 0`` the per-file sequential
    hypothesis beam runs instead (``drag/hypotheses.py``; single-device —
    ``mesh_devices`` applies to the restarts/plain paths).
    """
    import jax
    import jax.numpy as jnp

    from dragposer_tpu.drag import engine as eng

    encoded, norms, bvhs = [], [], []
    for path in files:
        bvh = BVH().load(path)
        rots, pos, parents, offsets, _ = encoding.info_from_bvh(bvh)
        motion = encoding.encode_motion(
            offsets, pos[:, 0, :], rots, skeleton,
            downsample=cfg.VAE_PARAM["downsample"],
            height_indices=cfg.HEIGHT_INDICES,
        )
        encoded.append(motion)
        norms.append(encoding.normalize(motion, means, stds))
        bvhs.append(bvh)

    lengths = [n.dqs.shape[0] if max_frames is None
               else min(max_frames, n.dqs.shape[0]) for n in norms]
    fmax = max(lengths)

    def pad(x, f):
        reps = np.repeat(x[f - 1 : f], fmax - f, axis=0)
        return np.concatenate((x[:f], reps), axis=0)

    dqs = np.stack([pad(n.dqs, f) for n, f in zip(norms, lengths)])
    gp = np.stack([pad(n.global_pos, f) for n, f in zip(norms, lengths)])
    gr = np.stack([pad(n.global_rot, f) for n, f in zip(norms, lengths)])
    h0 = np.stack([m.heights[0] for m in encoded])

    R = max(int(restarts), 1)
    if R > 1 and branch_every > 0:
        # sequential hypothesis beam, per file (drag/hypotheses.py) — the
        # directory-mode counterpart of the single-file --branch-every path
        from dragposer_tpu.drag.hypotheses import run_hypotheses_batched

        initial_poses = dqs[:, 0][:, :, None]  # (F, C, window=1)
        start = time.time()
        out, cum = run_hypotheses_batched(
            engine, jax.random.PRNGKey(seed), R, dqs, gp, gr, h0,
            initial_poses, lengths=np.asarray(lengths),
            branch_every=branch_every, sigma=branch_sigma,
            survivors=branch_survivors,
        )
        print(f"hypotheses: {R}-lane beam per file (top {branch_survivors} "
              f"survive, resample every {branch_every} frames); kept "
              f"{cum.argmin(axis=1).tolist()}")
        return _export_batched(out, time.time() - start, files, lengths,
                               bvhs, means, stds, skeleton, save_dir,
                               downsample_gt)

    # multi-restart: replicate every sequence ``restarts`` times with
    # different latent inits; per file keep the lowest tracker-fit loss
    # (see run_restarts — helps the underconstrained 3-tracker mode)
    if R > 1:
        rep = lambda a: np.repeat(a, R, axis=0)  # noqa: E731
        dqs, gp, gr, h0 = rep(dqs), rep(gp), rep(gr), rep(h0)
        lengths_b = np.repeat(np.asarray(lengths), R)
    else:
        lengths_b = np.asarray(lengths)
    lengths_sel = np.asarray(lengths_b)  # unpadded copy for best-of-R scoring
    # data-parallel lane sharding: pad the lane count to a multiple of the
    # mesh size with inert lanes (length 0 — they never activate), shard
    # every leading axis over the data axis, run, then drop the padding.
    n_lanes = dqs.shape[0]
    mesh = None
    n_dev = len(jax.devices())
    want = n_dev if mesh_devices is None else int(mesh_devices)
    if want > 1:
        assert want <= n_dev, f"--mesh {want} > {n_dev} local devices"
        from dragposer_tpu.parallel import mesh as meshlib

        mesh = meshlib.make_mesh(data=want)
        padl = (-n_lanes) % want
        if padl:
            pad1 = lambda a: np.concatenate(  # noqa: E731
                (a, np.repeat(a[:1], padl, axis=0)), axis=0)
            dqs, gp, gr, h0 = pad1(dqs), pad1(gp), pad1(gr), pad1(h0)
            lengths_b = np.concatenate(
                (lengths_b, np.zeros(padl, lengths_b.dtype)))

    keys = jax.random.split(jax.random.PRNGKey(seed), dqs.shape[0])
    states = jax.vmap(
        lambda k, d, g, r, h: eng.init_state(
            engine.model, engine.statics, engine.hyper, k,
            d[0][:, None], g[0], r[0], h,
        )
    )(keys, jnp.asarray(dqs), jnp.asarray(gp), jnp.asarray(gr), jnp.asarray(h0))
    if mesh is not None:
        from dragposer_tpu.parallel import mesh as meshlib

        states = meshlib.shard_batch(states, mesh)
        dqs, gp, gr, lengths_b = meshlib.shard_batch(
            (np.asarray(dqs), np.asarray(gp), np.asarray(gr),
             np.asarray(lengths_b)), mesh)

    start = time.time()
    # pipelined runner: lanes advance through their own frames and halt at
    # their true length — ragged directory batches don't reconstruct padding
    _, out = engine.run_batch_pipelined(states, dqs, gp, gr,
                                        lengths=lengths_b)
    if mesh is not None and out.pose.shape[0] != n_lanes:
        out = jax.tree.map(lambda a: a[:n_lanes], out)
    if R > 1:
        score = (np.asarray(out.loss_pos) + np.asarray(out.loss_rot))
        # mean over each lane's REAL frames only
        valid = np.arange(score.shape[1])[None, :] < lengths_sel[:, None]
        score = (score * valid).sum(1) / np.maximum(valid.sum(1), 1)
        best = score.reshape(len(files), R).argmin(axis=1)
        pick = np.arange(len(files)) * R + best
        out = jax.tree.map(lambda a: np.asarray(a)[pick], out)
        print(f"restarts: kept {best.tolist()} of {R} per file")
    return _export_batched(out, time.time() - start, files, lengths, bvhs,
                           means, stds, skeleton, save_dir, downsample_gt)


def _export_batched(out, elapsed, files, lengths, bvhs, means, stds,
                    skeleton, save_dir, downsample_gt):
    """Shared tail of the batched eval paths: BVH export + metrics."""
    poses = np.asarray(out.pose)
    global_pos = np.asarray(out.global_pos)

    os.makedirs(save_dir, exist_ok=True)
    results = []
    for i, (path, f) in enumerate(zip(files, lengths)):
        filename = os.path.basename(path)
        out_bvh = export.result_to_bvh(
            poses[i, :f], means, stds, bvhs[i], skeleton,
            global_pos=global_pos[i, :f], are_root_rot_incr=False,
        )
        eval_path = os.path.join(save_dir, "eval_" + filename)
        out_bvh.save(eval_path)
        mpjpe, mpeepe = metrics.positional_error(
            bvhs[i], BVH().load(eval_path), downsample_gt=downsample_gt
        )
        print(f"{filename}: Evaluate Loss: {mpjpe + mpeepe:.6f} // "
              f"MPJPE: {mpjpe:.6f} // MPEEPE: {mpeepe:.6f}")
        results.append((mpjpe, mpeepe))
    total = sum(lengths)
    print(f"Batched: {len(files)} sequences, {total} frames in "
          f"{elapsed:.2f}s ({total / elapsed:.0f} frames/s)")
    return results



def _enable_compilation_cache():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("DRAGPOSER_JAX_CACHE",
                                     "/tmp/dragposer_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main(argv=None):
    _enable_compilation_cache()
    parser = argparse.ArgumentParser(description="Evaluate DragPoser-TPU")
    parser.add_argument("model_path", type=str, help="model folder "
                        "(native .npz or reference .pt checkpoints)")
    parser.add_argument("input_path", type=str,
                        help=".bvh file or directory of .bvh files")
    parser.add_argument("--config", type=str, default=None,
                        help="builtin name (6_trackers/5_trackers/4_trackers/"
                             "3_trackers) or a config JSON path")
    parser.add_argument("--verbose", action="store_true")
    parser.add_argument("--no-temporal", action="store_true",
                        help="disable the temporal predictor (lambda_t = 0)")
    parser.add_argument("--max-frames", type=int, default=None)
    parser.add_argument("--save-dir", type=str, default="data")
    parser.add_argument("--profile", type=str, default=None, metavar="DIR",
                        help="capture a jax.profiler trace of the run into DIR")
    parser.add_argument("--batch", action="store_true",
                        help="reconstruct all files of a directory "
                             "concurrently in one vmapped device program")
    parser.add_argument("--restarts", type=int, default=None,
                        help="multi-restart drag: reconstruct from N "
                             "different latent inits concurrently and keep "
                             "the lowest tracker-fit loss (no GT used). "
                             "Default: the config's default_restarts "
                             "(16 for the underconstrained 3_trackers "
                             "builtin, else 1)")
    parser.add_argument("--branch-every", type=int, default=None,
                        metavar="N",
                        help="with restarts > 1: sequential hypothesis "
                             "branching — re-select the best lane by "
                             "tracker-fit loss and re-branch the beam "
                             "every N frames instead of once per clip "
                             "(drag/hypotheses.py). 0 disables. Default: "
                             "the config's default_branch_every (512 for "
                             "the 3_trackers builtin, else 0)")
    parser.add_argument("--branch-sigma", type=float, default=None,
                        help="re-seed latent noise scale in latent-std "
                             "units (default: config's, 0.25)")
    parser.add_argument("--survivors", type=int, default=None,
                        help="beam lineages kept at each resampling point "
                             "(default: config's, 8)")
    parser.add_argument("--mesh", type=int, default=None, metavar="N",
                        help="with --batch: shard the lane axis over a "
                             "1-D data mesh of N devices (default: all "
                             "local devices; 1 forces single-device)")
    parser.add_argument("--downsample-gt", type=int, default=1,
                        help="downsample factor for the GT in the metric "
                             "(reference eval_drag.py:246 — use 2 when the "
                             "GT is 120 fps and the eval assumes 60)")
    parser.add_argument("--constraints", type=str, default=None,
                        metavar="SPEC",
                        help="physical-plausibility loss terms added to the "
                             "drag objective, e.g. 'feet_floor:0.1,"
                             "head_hips_colinear:0.05' (names from "
                             "dragposer_tpu/drag/constraints.py; the "
                             "reference's commented-out drag_pose.py:129-183 "
                             "terms).  Default: the config's; '' forces off")
    args = parser.parse_args(argv)

    tracker = resolve_config(args.config)
    if args.restarts is None:
        args.restarts = tracker.default_restarts
    if args.branch_every is None:
        args.branch_every = tracker.default_branch_every
    if args.branch_sigma is None:
        args.branch_sigma = tracker.default_branch_sigma
    if args.survivors is None:
        args.survivors = tracker.default_branch_survivors

    if os.path.isdir(args.input_path):
        files = sorted(
            os.path.join(args.input_path, f)
            for f in os.listdir(args.input_path) if f.endswith(".bvh")
        )
    else:
        files = [args.input_path]

    first = BVH().load(files[0])
    rots, pos, parents, offsets, _ = encoding.info_from_bvh(first)
    skeleton = Skeleton.build(parents, offsets, first.names)

    engine, means, stds = build_engine(
        args.model_path, parents, tracker,
        use_temporal=not args.no_temporal, skeleton=skeleton,
        constraints=args.constraints,
    )
    if engine.hyper.constraints:
        spec = (tracker.default_constraints if args.constraints is None
                else args.constraints)
        print(f"constraints active: {spec}")
    import contextlib

    import jax

    prof = (jax.profiler.trace(args.profile) if args.profile
            else contextlib.nullcontext())
    with prof:
        if args.batch and len(files) > 1:
            evaluate_batched(engine, means, stds, skeleton, files,
                             max_frames=args.max_frames,
                             save_dir=args.save_dir,
                             downsample_gt=args.downsample_gt,
                             restarts=args.restarts,
                             mesh_devices=args.mesh,
                             branch_every=args.branch_every,
                             branch_sigma=args.branch_sigma,
                             branch_survivors=args.survivors)
        else:
            for path in files:
                print(f"Evaluate {path} ------------------------")
                evaluate_file(engine, means, stds, skeleton, path,
                              max_frames=args.max_frames,
                              save_dir=args.save_dir, verbose=args.verbose,
                              downsample_gt=args.downsample_gt,
                              restarts=args.restarts,
                              branch_every=args.branch_every,
                              branch_sigma=args.branch_sigma,
                              branch_survivors=args.survivors)
    if args.profile:
        print(f"profiler trace written to {args.profile}")


if __name__ == "__main__":
    main()
