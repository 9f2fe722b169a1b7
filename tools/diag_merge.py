"""Merge the beam-selection diagnosis (tools/diag_beam_selection.py runs)
into PARITY.json as ``beam_selection_diagnosis``.

The round-4 multi-clip validation recorded an honest split: the 3-tracker
hypothesis beam beats the reference's seed-sweep mean on every clip but
not its best seed on ``example_2``.  The diagnosis runs explain WHY and
belong next to that record.  The narrative is DERIVED from the merged
numbers (``_narrative`` below), not hardcoded — round-4's prose claimed
"anti-selection" while the committed data showed a weak POSITIVE
fit<->GT correlation (spearman +0.41) with the fit-selected lane better
than the pool mean; the real finding is a large ORACLE GAP (fit cannot
find the GT-best lane, which sits deep in the fit ranking).

  python tools/diag_merge.py /tmp/diag_example_free.json \
      /tmp/diag_ex2_free.json /tmp/diag_example_3_free.json \
      --beam /tmp/diag_ex2_s0.json

  # rewrite only the narrative from the numbers already in PARITY.json:
  python tools/diag_merge.py --renarrate
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
        # output jitter, and — round 5 — the reference's commented-out
        # physical-plausibility constraint energies): the GT error of
        # each score's argmin lane vs the oracle lane
        out["gt_of_argmin"] = {k: round(v, 4)
                               for k, v in s["gt_of_argmin"].items()}
    if "spearman_constraints_gt" in s:
        out["spearman_constraints_gt"] = {
            k: round(v, 3) for k, v in s["spearman_constraints_gt"].items()}
    if "gt_of_fit_plus_bundle" in s:
        out["gt_of_fit_plus_bundle"] = {
            k: round(v, 4) for k, v in s["gt_of_fit_plus_bundle"].items()}
    return out


def _narrative(per_clip):
    """Derive the summary prose from the merged per-clip numbers.

    Claims are validated against the data: a clip is called
    "anti-selecting" only if its fit<->GT spearman is negative AND the
    fit-selected lane is worse than the pool mean; otherwise the honest
    description of a hard clip is "weak correlation + oracle gap"."""
    parts = ["WHY the 3-tracker beam misses the reference's lucky best "
             "seed on some clips: per-clip fit<->GT diagnostics over "
             "INDEPENDENT full-clip trajectories "
             "(tools/diag_beam_selection.py)."]
    worst = min(per_clip.items(), key=lambda kv: kv[1]["spearman_fit_gt"])
    others = {k: v for k, v in per_clip.items() if k != worst[0]}
    name, w = worst
    rho = w["spearman_fit_gt"]
    anti = rho < 0 and w["selected_by_fit_mpjpe"] > w["pool_mpjpe_mean"]
    rho_others = ", ".join(f"{v['spearman_fit_gt']:.2f}" for v in
                           others.values())
    if anti:
        parts.append(
            f"On {name} the tracker-fit loss ANTI-selects (spearman "
            f"{rho:.2f}; selected {w['selected_by_fit_mpjpe']:.3f} m vs "
            f"pool mean {w['pool_mpjpe_mean']:.3f} m).")
    else:
        parts.append(
            f"On {name} fit correlates only WEAKLY with GT (spearman "
            f"{rho:.2f} vs {rho_others} on the clips where the beam "
            f"wins), leaving a {w['oracle_gap']:.2f} m oracle gap: the "
            f"fit-selected lane ({w['selected_by_fit_mpjpe']:.3f} m) "
            f"beats the pool mean ({w['pool_mpjpe_mean']:.3f} m) but "
            f"cannot find the GT-best lane "
            f"({w['oracle_mpjpe']:.3f} m, fit rank "
            f"{w['best_gt_lane_fit_rank']}/{w['R']}).")
    parts.append(
        "No GT-blind fit-based selection rule can close that gap there; "
        "the beam's residual value on such clips is variance reduction. "
        "On the clips where fit correlates strongly the beam wins "
        "outright.")
    return "  ".join(parts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("free_jsons", nargs="*",
                    help="diag json files (independent-lanes runs), "
                         "each with summary.clip")
    ap.add_argument("--beam", default=None,
                    help="optional beam-mode diag json (resampling on)")
    ap.add_argument("--constraint-runs", nargs="*", default=None,
                    help="diag jsons of runs where the DRAG ITSELF carried "
                         "constraint loss terms (--constraints), merged as "
                         "constraints_as_drag_terms (round-4 VERDICT #5: "
                         "reference drag_pose.py:129-183 terms measured in "
                         "the degenerate 3-tracker regime)")
    ap.add_argument("--renarrate", action="store_true",
                    help="recompute only the 'what' narrative from the "
                         "per-clip numbers already in PARITY.json")
    args = ap.parse_args()

    from parity_matrix import artifact_lock

    out_path = os.path.join(REPO, "PARITY.json")
    if args.renarrate:
        with artifact_lock(out_path):
            with open(out_path) as f:
                artifact = json.load(f)
            diag = artifact["beam_selection_diagnosis"]
            diag["what"] = _narrative(diag["per_clip_independent_lanes"])
            tmp = out_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(artifact, f, indent=2)
            os.replace(tmp, out_path)
        print(diag["what"])
        return

    per_clip = {}
    for path in args.free_jsons:
        with open(path) as f:
            d = json.load(f)
        per_clip[d["summary"]["clip"]] = _condense(d)
    beam = None
    if args.beam:
        with open(args.beam) as f:
            beam = json.load(f)

    with artifact_lock(out_path):
        with open(out_path) as f:
            artifact = json.load(f)
        artifact["beam_selection_diagnosis"] = {
            "what": _narrative(per_clip),
            "per_clip_independent_lanes": per_clip,
        }
        if args.constraint_runs:
            runs = []
            for path in args.constraint_runs:
                with open(path) as f:
                    d = json.load(f)
                c = _condense(d)
                c["drag_constraints"] = d["summary"]["drag_constraints"]
                c["clip"] = d["summary"]["clip"]
                runs.append(c)
            # the comparison baseline is the same-clip free run above
            base = per_clip.get(runs[0]["clip"]) if runs else None
            artifact["beam_selection_diagnosis"][
                "constraints_as_drag_terms"] = {
                "what": ("same independent-lane pool with the reference's "
                         "commented-out constraint losses ACTIVE as drag "
                         "terms (drag_pose.py:129-183 / "
                         "dragposer_tpu/drag/constraints.py) at small "
                         "weights — do physical-plausibility penalties "
                         "shrink the wrong-body basins (pool mean / "
                         "fit-selected / oracle) vs the unconstrained "
                         "run on the same clip+seed?"),
                "baseline_free_run": base,
                "runs": runs,
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
