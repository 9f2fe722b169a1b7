"""Run the UNMODIFIED reference implementation for golden-trajectory parity.

Executes the reference's ``eval_drag.main`` in-process against:

* the pymotion-compatible shim in ``tools/pymotion_shim`` (the real package
  is unavailable here),
* a model dir assembled from the reference's ``generator.pt``/``data.pt``
  plus a ``temporal.pt`` exported from this framework's checkpoint,
* a trimmed copy of an example BVH.

Prints the reference's Evaluate Loss / MPJPE / MPEEPE / Time, and leaves its
output BVH in <workdir>/data/ for direct comparison.

Usage:
  python tools/run_reference.py <workdir> <frames> [config_json] [seed]
                                [clip_bvh] [start_frame]

``clip_bvh`` defaults to the primary eval clip (example.bvh) and
``start_frame`` to 2000 for it (the historical committed slice) / 0 for any
other clip — the reference's directory mode (eval_drag.py:285-291) evaluates
whole files, so the other two shipped eval clips run from frame 0.
"""

from __future__ import annotations

import os
import shutil
import sys
import types

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
REF_SRC = "/root/reference/python/src"
REF_MODEL = "/root/reference/python/models/model_dancedb"
REF_BVH = "/root/reference/python/data/example/eval/example.bvh"


def main(workdir: str, frames: int, config_json: str | None,
         init_seed: int | None = None, clip_bvh: str | None = None,
         start: int | None = None) -> None:
    sys.path.insert(0, os.path.join(REPO, "tools", "pymotion_shim"))
    sys.path.insert(0, REPO)
    sys.path.insert(0, REF_SRC)

    os.makedirs(os.path.join(workdir, "data"), exist_ok=True)
    model_dir = os.path.join(workdir, "model")
    os.makedirs(model_dir, exist_ok=True)
    for f in ("generator.pt", "data.pt"):
        shutil.copy(os.path.join(REF_MODEL, f), os.path.join(model_dir, f))
    if not os.path.exists(os.path.join(model_dir, "temporal.pt")):
        from tools.export_temporal_pt import main as export_pt

        export_pt(os.path.join(REPO, "models", "model_dancedb_example"),
                  os.path.join(model_dir, "temporal.pt"))

    # trimmed input clip (the reference runs whole files)
    from dragposer_tpu.io.bvh import BVH

    src = clip_bvh or REF_BVH
    if start is None:
        start = 2000 if os.path.abspath(src) == os.path.abspath(REF_BVH) else 0
    b = BVH().load(src)
    b.rotations = b.rotations[start : start + frames]
    b.positions = b.positions[start : start + frames]
    clip = os.path.join(workdir, "clip.bvh")
    b.save(clip)

    os.chdir(workdir)  # the reference writes ./data/eval_<name>.bvh

    import eval_drag  # the reference module, resolved from REF_SRC

    if init_seed is not None:
        # Init-seed sweep: the reference seeds torch with its fixed training
        # seed at the top of eval_drag.main (eval_drag.py:23); the only
        # stochastic consumer downstream is the VAE reparameterization that
        # draws the initial latent (drag_pose.py:47-52 via autoencoder.py:
        # 19-26).  Redirect that one seeding call so the sweep varies the
        # initial-latent draw without touching reference code.
        import torch

        real_manual_seed = torch.manual_seed
        torch.manual_seed = lambda _s: real_manual_seed(init_seed)

    args = types.SimpleNamespace(
        model_path=model_dir,
        input_path=clip,
        config=config_json,
        verbose=False,
    )
    eval_drag.main(args)


if __name__ == "__main__":
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/refrun"
    frames = int(sys.argv[2]) if len(sys.argv) > 2 else 300
    config = sys.argv[3] if len(sys.argv) > 3 else None
    seed = (int(sys.argv[4])
            if len(sys.argv) > 4 and sys.argv[4] != "none" else None)
    clip = sys.argv[5] if len(sys.argv) > 5 else None
    start = int(sys.argv[6]) if len(sys.argv) > 6 else None
    main(workdir, frames, config, init_seed=seed, clip_bvh=clip, start=start)
