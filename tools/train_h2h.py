"""From-scratch VAE training head-to-head: our trainer vs the reference's,
same data, same recipe, same epoch budget — checkpoint quality compared
through the same evaluator.

The temporal trainer already has this evidence (ROADMAP: full recipe in
63 s, from-scratch net beats the shipped one).  This tool closes the VAE
half: run ``cli/train_vae.py`` and the UNMODIFIED reference ``train.py``
(``/root/reference/python/src/train.py:50-224``; recipe constants
``train.py:16-47``, ``--fk`` as the shipped model's parameters.txt records
``lambda_fk=100``) from scratch for the SAME number of epochs on the same
``data/example`` corpus, then evaluate BOTH resulting generator checkpoints
through our ``eval_drag`` (6-tracker, no temporal — each VAE would need its
own temporal net; the raw drag objective isolates generator quality) on the
primary eval clip, and merge the two MPJPE columns into PARITY.json under
``training_vae``.

Usage:
  python tools/train_h2h.py --epochs 100            # both sides + eval
  python tools/train_h2h.py --side ref --epochs 100 # torch-CPU subprocess
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DATA = "/root/reference/python/data/example"
EVAL_CLIP = "example"  # primary clip slice for checkpoint-quality eval


def run_ref_train(workdir: str, epochs: int, seed: int = None) -> dict:
    """The unmodified reference train.py, patched only in epoch count (the
    recipe's one free knob for a budget-matched comparison) and optionally
    the init seed (for independent-draw variance evidence), executed
    in-process (call via the subprocess wrapper)."""
    import types

    sys.path.insert(0, os.path.join(REPO, "tools", "pymotion_shim"))
    sys.path.insert(0, "/root/reference/python/src")

    os.makedirs(workdir, exist_ok=True)
    os.chdir(workdir)  # the reference writes ./models/<name>/
    os.makedirs("data", exist_ok=True)  # ...and ./data/eval_*.bvh

    import train  # the reference module

    train.param["epochs"] = epochs
    if seed is not None:
        train.param["seed"] = seed  # consumed at train.py:52-54
    args = types.SimpleNamespace(data_path=DATA, name="h2h", load=False,
                                 fk=True)
    t0 = time.time()
    train.main(args)
    elapsed = time.time() - t0
    model_dir = os.path.join(workdir, "models", "model_h2h_example")
    assert os.path.exists(os.path.join(model_dir, "generator.pt")), model_dir
    return {"model_dir": model_dir, "train_seconds": elapsed}


def run_ref_subprocess(workdir: str, epochs: int, seed: int = None) -> dict:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    out_json = os.path.join(workdir, "ref_train.json")
    cmd = [sys.executable, os.path.abspath(__file__), "--side", "ref",
           "--epochs", str(epochs), "--workdir", workdir,
           "--json-out", out_json]
    if seed is not None:
        cmd += ["--train-seed", str(seed)]
    r = subprocess.run(
        cmd, capture_output=True, text=True, env=env, timeout=28800,
    )
    assert r.returncode == 0, (r.stdout[-1500:], r.stderr[-2000:])
    with open(out_json) as f:
        return json.load(f)


def run_ours_train(workdir: str, epochs: int) -> dict:
    from dragposer_tpu.cli.train_vae import main as train_main

    os.makedirs(workdir, exist_ok=True)
    t0 = time.time()
    train_main([DATA, "h2h", "--fk", "--epochs", str(epochs),
                "--models-root", os.path.join(workdir, "models")])
    elapsed = time.time() - t0
    model_dir = os.path.join(workdir, "models", "model_h2h_example")
    assert os.path.exists(model_dir), model_dir
    return {"model_dir": model_dir, "train_seconds": elapsed}


def eval_checkpoint(model_dir: str, save_dir: str) -> dict:
    """Both checkpoints go through the SAME evaluator: our eval_drag,
    6-tracker offline budget, no temporal guidance."""
    from parity_matrix import CLIPS, materialize_clip
    from dragposer_tpu.cli.eval_drag import (build_engine, evaluate_file,
                                             resolve_config)
    from dragposer_tpu.data import encoding
    from dragposer_tpu.io.bvh import BVH
    from dragposer_tpu.ops.topology import Skeleton

    clip = os.path.join(save_dir, "clip.bvh")
    os.makedirs(save_dir, exist_ok=True)
    if not os.path.exists(clip):
        materialize_clip(clip, EVAL_CLIP, CLIPS[EVAL_CLIP]["frames"])
    bvh = BVH().load(clip)
    _, _, parents, offsets, _ = encoding.info_from_bvh(bvh)
    skeleton = Skeleton.build(parents, offsets, bvh.names)
    engine, means, stds = build_engine(
        model_dir, parents, resolve_config("6_trackers"),
        use_temporal=False, skeleton=skeleton,
    )
    mpjpe, mpeepe, _, _ = evaluate_file(engine, means, stds, skeleton, clip,
                                        save_dir=save_dir)
    return {"mpjpe": float(mpjpe), "mpeepe": float(mpeepe)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--side", choices=["both", "ref", "ours"],
                    default="both")
    ap.add_argument("--epochs", type=int, required=True)
    ap.add_argument("--workdir", default="/tmp/train_h2h")
    ap.add_argument("--json-out", default=None)
    ap.add_argument("--skip-ref-train", action="store_true",
                    help="reuse an existing reference checkpoint in "
                         "<workdir>/ref")
    ap.add_argument("--train-seed", type=int, default=None,
                    help="override the trainer's init seed (reference "
                         "default 2222) — used for independent-draw runs")
    args = ap.parse_args()

    if args.side == "ref":
        res = run_ref_train(args.workdir, args.epochs, seed=args.train_seed)
        if args.train_seed is not None:
            res["seed"] = args.train_seed
        print(json.dumps(res))
        if args.json_out:
            with open(args.json_out, "w") as f:
                json.dump(res, f)
        return
    if args.side == "ours":
        res = run_ours_train(args.workdir, args.epochs)
        print(json.dumps(res))
        return

    ref_dir = os.path.join(args.workdir, "ref")
    if args.skip_ref_train:
        with open(os.path.join(ref_dir, "ref_train.json")) as f:
            ref = json.load(f)
    else:
        print(f"== reference train.py from scratch, {args.epochs} epochs "
              "(torch CPU)...", flush=True)
        ref = run_ref_subprocess(ref_dir, args.epochs)
        print(f"   {ref['train_seconds']:.0f}s", flush=True)

    print(f"== our trainer from scratch, {args.epochs} epochs...",
          flush=True)
    ours = run_ours_train(os.path.join(args.workdir, "ours"), args.epochs)
    print(f"   {ours['train_seconds']:.0f}s", flush=True)

    print("== evaluating both checkpoints (eval_drag, 6-tracker, "
          "no temporal)...", flush=True)
    ref_eval = eval_checkpoint(ref["model_dir"],
                               os.path.join(args.workdir, "eval_ref"))
    our_eval = eval_checkpoint(ours["model_dir"],
                               os.path.join(args.workdir, "eval_ours"))

    entry = {
        "what": ("from-scratch VAE training head-to-head: cli/train_vae.py "
                 "vs the unmodified reference train.py, same data "
                 "(data/example), same recipe (--fk, reference "
                 "hyperparameters), same epoch budget; both checkpoints "
                 "evaluated by OUR eval_drag (6-tracker offline budget, no "
                 "temporal) on the primary eval clip"),
        "epochs": args.epochs,
        "reference": {**ref_eval,
                      "train_seconds": ref["train_seconds"]},
        "ours": {**our_eval, "train_seconds": ours["train_seconds"]},
        "our_checkpoint_not_worse": our_eval["mpjpe"]
        <= ref_eval["mpjpe"] * 1.02,
        "speedup": ref["train_seconds"] / ours["train_seconds"],
    }
    from parity_matrix import artifact_lock

    out_path = os.path.join(REPO, "PARITY.json")
    with artifact_lock(out_path):
        with open(out_path) as f:
            artifact = json.load(f)
        artifact["training_vae"] = entry
        tmp = out_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(artifact, f, indent=2)
        os.replace(tmp, out_path)
    print(json.dumps(entry, indent=1))


if __name__ == "__main__":
    main()
