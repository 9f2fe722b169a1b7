"""Init-seed sweep for the underconstrained 3-tracker config.

The 3-tracker drag objective is chaotic in its initial latent draw: the
reference draws it through the VAE reparameterization under a fixed seed
(``/root/reference/python/src/drag_pose.py:47-52``, seeded at
``eval_drag.py:23``).  This tool measures the full-clip MPJPE DISTRIBUTION
over that init in BOTH implementations — N reference runs with redirected
``torch.manual_seed`` (tools/run_reference.py init_seed) and N of ours in
one pipelined batch — plus ours with ``--restarts R`` (best-of-R by
tracker-fit loss, no ground truth).  Results are merged into PARITY.json
under ``seed_sweep_<config>`` so the degenerate-regime exclusion is backed
by committed data instead of prose.

Usage:
  python tools/parity_sweep.py [--frames 5052] [--seeds 8] [--restarts 16]
                               [--config 3_trackers] [--skip-reference]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
CONFIG_DIR = "/root/reference/python/config"


def merge_write(out_path: str, key: str, sweep: dict,
                clip: str = "example") -> None:
    """Checkpoint ``sweep`` into ``clip``'s artifact section WITHOUT
    clobbering concurrent edits (file lock + re-read + replace only our
    key), recomputing the pass fields (sweep evidence can change the
    pipelined criterion)."""
    from parity_matrix import artifact_lock, clip_section, recompute_pass

    with artifact_lock(out_path):
        with open(out_path) as f:
            artifact = json.load(f)
        clip_section(artifact, clip)[key] = sweep
        recompute_pass(artifact)
        tmp = out_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(artifact, f, indent=2)
        os.replace(tmp, out_path)


def reference_mpjpe(workdir: str, frames: int, config: str, seed: int,
                    clip: str = "example") -> dict:
    from parity_matrix import CLIPS

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # torch-CPU run: don't let the axon sitecustomize hook grab/block on
    # the single-lease TPU tunnel at interpreter startup
    env.pop("PALLAS_AXON_POOL_IPS", None)
    spec = CLIPS[clip]
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "run_reference.py"),
         workdir, str(frames), config, str(seed), spec["path"],
         str(spec["start"])],
        capture_output=True, text=True, env=env, timeout=14400,
    )
    assert out.returncode == 0, out.stderr[-3000:]

    def grab(label):
        m = re.search(rf"{label}: ([0-9.eE+-]+)", out.stdout)
        assert m, f"missing '{label}':\n{out.stdout[-2000:]}"
        return float(m.group(1))

    return {"mpjpe": grab("Mean Per Joint Position Error"),
            "mpeepe": grab("Mean End Effector Position Error")}


def ours_sweep(clip: str, config_name: str, seeds: list[int],
               frames: int) -> list[dict]:
    """Per-seed full-clip MPJPE for our engine: one pipelined batch whose
    lanes are the different initial-latent draws (same mechanism
    run_restarts uses, but every lane is measured instead of one kept)."""
    import jax

    from dragposer_tpu import export, metrics
    from dragposer_tpu.cli.eval_drag import build_engine, resolve_config
    from dragposer_tpu.data import encoding
    from dragposer_tpu import config as cfg
    from dragposer_tpu.drag import engine as eng
    from dragposer_tpu.io.bvh import BVH
    from dragposer_tpu.ops.topology import Skeleton

    bvh = BVH().load(clip)
    rots, pos, parents, offsets, _ = encoding.info_from_bvh(bvh)
    skeleton = Skeleton.build(parents, offsets, bvh.names)
    engine, means, stds = build_engine(
        os.path.join(REPO, "models", "model_dancedb_example"),
        parents, resolve_config(config_name), skeleton=skeleton,
    )
    motion = encoding.encode_motion(
        offsets, pos[:, 0, :], rots, skeleton,
        downsample=cfg.VAE_PARAM["downsample"],
        height_indices=cfg.HEIGHT_INDICES,
    )
    norm = encoding.normalize(motion, means, stds)
    n = min(frames, norm.dqs.shape[0])
    dqs, gp, gr = norm.dqs[:n], norm.global_pos[:n], norm.global_rot[:n]
    initial_pose = np.tile(dqs[0][:, None], (1, cfg.VAE_PARAM["window_size"]))

    R = len(seeds)
    keys = [jax.random.PRNGKey(s) for s in seeds]
    states = jax.vmap(
        lambda k: eng.init_state(
            engine.model, engine.statics, engine.hyper, k,
            initial_pose, gp[0], gr[0], motion.heights[0],
        )
    )(jax.numpy.stack(keys))
    dqs_b = np.broadcast_to(dqs, (R,) + dqs.shape)
    gp_b = np.broadcast_to(gp, (R,) + gp.shape)
    gr_b = np.broadcast_to(gr, (R,) + gr.shape)
    _, out = engine.run_batch_pipelined(states, dqs_b, gp_b, gr_b, sync_k=24)

    results = []
    with tempfile.TemporaryDirectory() as td:
        for i in range(R):
            lane = jax.tree.map(lambda a: np.asarray(a[i]), out)
            out_bvh = export.result_to_bvh(
                lane.pose, means, stds, bvh, skeleton,
                global_pos=lane.global_pos, are_root_rot_incr=False,
            )
            p = os.path.join(td, f"lane{i}.bvh")
            out_bvh.save(p)
            loaded = BVH().load(p)
            mpjpe, mpeepe = metrics.positional_error(bvh, loaded)
            fit = float(np.asarray(lane.loss_pos).mean()
                        + np.asarray(lane.loss_rot).mean())
            results.append({"seed": seeds[i], "mpjpe": float(mpjpe),
                            "mpeepe": float(mpeepe), "fit_loss": fit})
            print(f"   ours seed {seeds[i]}: MPJPE {mpjpe:.4f} "
                  f"(fit {fit:.5f})", flush=True)
    return results


def ours_anchor_sweep(clip: str, config_name: str, seeds: list[int],
                      workdir: str) -> list[dict]:
    """Per-seed full-clip MPJPE through the ANCHOR path (``engine.run``
    via ``evaluate_file`` — the numeric-parity program, not the pipelined
    production path).  Measures the anchor program's own init-seed
    distribution so a >1% matched-seed draw on a chaotic short clip can be
    adjudicated by mean-vs-mean instead of a single draw
    (parity_matrix.recompute_section route 3)."""
    from dragposer_tpu.cli.eval_drag import (build_engine, evaluate_file,
                                             resolve_config)
    from dragposer_tpu.data import encoding
    from dragposer_tpu.io.bvh import BVH
    from dragposer_tpu.ops.topology import Skeleton

    bvh = BVH().load(clip)
    _, _, parents, offsets, _ = encoding.info_from_bvh(bvh)
    skeleton = Skeleton.build(parents, offsets, bvh.names)
    engine, means, stds = build_engine(
        os.path.join(REPO, "models", "model_dancedb_example"),
        parents, resolve_config(config_name), skeleton=skeleton,
    )
    results = []
    for s in seeds:
        mpjpe, mpeepe, _, _ = evaluate_file(
            engine, means, stds, skeleton, clip,
            save_dir=os.path.join(workdir, f"anchor_{s}"), seed=s)
        results.append({"seed": s, "mpjpe": float(mpjpe),
                        "mpeepe": float(mpeepe)})
        print(f"   ours anchor seed {s}: MPJPE {mpjpe:.4f}", flush=True)
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=5052)
    ap.add_argument("--seeds", type=int, default=8)
    ap.add_argument("--restarts", type=int, default=16)
    ap.add_argument("--config", type=str, default="3_trackers")
    ap.add_argument("--clip", type=str, default="example")
    ap.add_argument("--out", type=str,
                    default=os.path.join(REPO, "PARITY.json"))
    ap.add_argument("--workroot", type=str, default="/tmp/parity_sweep")
    ap.add_argument("--skip-reference", action="store_true",
                    help="reuse reference numbers already in the artifact")
    ap.add_argument("--ref-only", action="store_true",
                    help="measure ONLY the reference seeds (torch CPU; "
                         "checkpointed per seed) — for the background "
                         "queue; our side + summary fill in on a later "
                         "full run with --skip-reference")
    ap.add_argument("--anchor", action="store_true",
                    help="additionally sweep the ANCHOR path (engine.run "
                         "per seed) and merge as 'ours_anchor' — route 3 "
                         "of the anchor criterion")
    args = ap.parse_args()

    from parity_matrix import CLIPS, clip_section, materialize_clip

    name = args.config
    if args.frames == 5052 and args.clip != "example":
        args.frames = CLIPS[args.clip]["frames"]
    workdir = os.path.join(args.workroot, args.clip, name)
    os.makedirs(workdir, exist_ok=True)
    config = os.path.join(CONFIG_DIR, f"{name}_config.json")
    if not os.path.exists(config):
        # the reference repo ships no 5-tracker JSON; synthesize it from our
        # builtin preset (same schema, as tools/parity_matrix.py does)
        sys.path.insert(0, REPO)
        from dragposer_tpu.config import BUILTIN_CONFIGS

        cfg = BUILTIN_CONFIGS[name]
        config = os.path.join(workdir, f"{name}_config.json")
        with open(config, "w") as f:
            json.dump({
                "mask": list(cfg.mask),
                "weights": [list(w) for w in cfg.weights],
                "enable_joint_adjustment": cfg.enable_joint_adjustment,
                "joint_adjustment_indices": list(cfg.joint_adjustment_indices),
                "joint_adjustment_weight": cfg.joint_adjustment_weight,
                "lambda_temporal": cfg.lambda_temporal,
                "temporal_future_window": cfg.temporal_future_window,
            }, f)
    # seed 2222 is the reference's own fixed seed (train.py:34, used by
    # eval_drag.py:23); include it so the sweep contains the exact committed
    # head-to-head run.
    seeds = [2222] + [100 + 7 * i for i in range(args.seeds - 1)]

    with open(args.out) as f:
        artifact = json.load(f)
    section = clip_section(artifact, args.clip)
    sweep = section.get(f"seed_sweep_{name}", {})

    ref = {int(k): v for k, v in sweep.get("reference", {}).items()}
    head = section.get("configs", {}).get(name)
    if 2222 not in ref and head is not None and "ref_mpjpe" in head \
            and section.get("frames") == args.frames:
        # the committed head-to-head already ran the reference at its own
        # fixed seed 2222 (train.py:34 via eval_drag.py:23) on this exact
        # clip — reuse that measurement instead of repeating the run
        ref[2222] = {"mpjpe": head["ref_mpjpe"], "mpeepe": head["ref_mpeepe"]}
    if not args.skip_reference:
        for s in seeds:
            if s in ref:
                continue
            print(f"== reference {args.clip}/{name} seed {s} "
                  f"({args.frames} frames, torch CPU)...", flush=True)
            r = reference_mpjpe(workdir, args.frames, config, s,
                                clip=args.clip)
            ref[s] = r
            print(f"   ref MPJPE {r['mpjpe']:.4f}", flush=True)
            # checkpoint after every (slow) reference run
            sweep["reference"] = {str(k): v for k, v in ref.items()}
            merge_write(args.out, f"seed_sweep_{name}", sweep,
                        clip=args.clip)
    if args.ref_only:
        print(json.dumps({"ref_seeds_done": sorted(ref)}))
        return

    clip = os.path.join(workdir, "clip.bvh")
    if not os.path.exists(clip):
        # materialize the trimmed clip without a full reference run
        materialize_clip(clip, args.clip, args.frames)

    if args.anchor:
        print(f"== ours {name}: {len(seeds)}-seed ANCHOR sweep...",
              flush=True)
        anchor_runs = ours_anchor_sweep(clip, name, seeds, workdir)
        sweep["ours_anchor"] = anchor_runs
        av = [o["mpjpe"] for o in anchor_runs]
        sweep["our_anchor_mpjpe_min"] = min(av)
        sweep["our_anchor_mpjpe_max"] = max(av)
        sweep["our_anchor_mpjpe_mean"] = float(np.mean(av))
        merge_write(args.out, f"seed_sweep_{name}", sweep, clip=args.clip)
        print(json.dumps({"our_anchor_mpjpe_mean": sweep["our_anchor_mpjpe_mean"],
                          "our_anchor_spread": [min(av), max(av)]}))
        return

    print(f"== ours {name}: {len(seeds)}-seed pipelined sweep...", flush=True)
    ours = ours_sweep(clip, name, seeds, args.frames)

    print(f"== ours {name}: --restarts {args.restarts}...", flush=True)
    from dragposer_tpu.cli.eval_drag import (build_engine, evaluate_file,
                                             resolve_config)
    from dragposer_tpu.data import encoding
    from dragposer_tpu.io.bvh import BVH
    from dragposer_tpu.ops.topology import Skeleton

    bvh = BVH().load(clip)
    _, _, parents, offsets, _ = encoding.info_from_bvh(bvh)
    skeleton = Skeleton.build(parents, offsets, bvh.names)
    engine, means, stds = build_engine(
        os.path.join(REPO, "models", "model_dancedb_example"),
        parents, resolve_config(name), skeleton=skeleton,
    )
    r_mpjpe, r_mpeepe, _, _ = evaluate_file(
        engine, means, stds, skeleton, clip,
        save_dir=os.path.join(workdir, "restarts"),
        restarts=args.restarts,
    )

    ref_vals = [ref[s]["mpjpe"] for s in sorted(ref)]
    our_vals = [o["mpjpe"] for o in ours]
    summary = {
        "frames": args.frames,
        "seeds": seeds,
        "reference": {str(k): ref[k] for k in sorted(ref)},
        "ours": ours,
        "ref_mpjpe_min": min(ref_vals), "ref_mpjpe_max": max(ref_vals),
        "ref_mpjpe_mean": float(np.mean(ref_vals)),
        "our_mpjpe_min": min(our_vals), "our_mpjpe_max": max(our_vals),
        "our_mpjpe_mean": float(np.mean(our_vals)),
        "our_restarts": {"n": args.restarts, "mpjpe": float(r_mpjpe),
                         "mpeepe": float(r_mpeepe)},
        "restarts_beats_ref_best": float(r_mpjpe) <= min(ref_vals),
        "distributions_overlap": (min(our_vals) <= max(ref_vals)
                                  and min(ref_vals) <= max(our_vals)),
    }
    merge_write(args.out, f"seed_sweep_{name}", summary, clip=args.clip)
    print(json.dumps({k: summary[k] for k in
                      ("ref_mpjpe_min", "ref_mpjpe_mean", "ref_mpjpe_max",
                       "our_mpjpe_min", "our_mpjpe_mean", "our_mpjpe_max",
                       "restarts_beats_ref_best", "distributions_overlap")}
                     | {"restarts_mpjpe": float(r_mpjpe)}, indent=1))


if __name__ == "__main__":
    sys.path.insert(0, REPO)
    main()
