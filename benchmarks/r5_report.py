"""Round-5 spread-aware decision report (VERDICT r4 items 2+4).

Assembles, from the phase-1/2 campaign artifacts (all CURRENT-code
checkpoints, 3 seeds each):
  * the baseline flagship band (best-val, CRPS, SBC KS, WSSE closure
    median) over s42/43/44;
  * min-SNR-5 vs that band on every axis, raw T=1.0 AND calibrated T
    (tempering sweeps with per-T CRPS/SBC);
  * heads=1 / heads=2 vs the band (the retirement re-check);
and emits the verdicts with spread bars. A lever's contrast counts as
SUPPORTED only when its per-seed values fall outside the baseline's
min..max range on that axis (3-seed bands are too short for z-scores;
range-exclusion is the honest test).

Writes docs/results/flagship_fullscale/r5_decisions.json and prints a
markdown table for the README.

Reference anchors: WSSE ranking ERT_Conditional_Diffusion.py:766-811,
terminal UQ deliverable :1089-1137.
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

OUT = Path(__file__).resolve().parent.parent / "docs" / "results" / \
    "flagship_fullscale"
SEEDS = (42, 43, 44)


def load(tag: str, seed: int) -> dict | None:
    p = OUT / f"{tag}_s{seed}" / "result.json"
    return json.loads(p.read_text()) if p.exists() else None


def axes(rec: dict) -> dict:
    return {
        "best_val": rec["best_val"],
        "crps": rec.get("crps_mean_normalized"),
        "sbc_ks": rec.get("sbc_ks_mean"),
        "wsse_med": float(np.median(rec["wsse_median_posterior"])),
        "acc_t1": rec["accuracy"],
    }


def temper(tag: str, seed: int) -> dict | None:
    suffix = f"_{tag}" if tag != "condunet" else ""
    p = OUT / f"tempering{suffix}_s{seed}.json"
    return json.loads(p.read_text())["temps"] if p.exists() else None


def main() -> int:
    base = {s: load("condunet", s) for s in SEEDS}
    missing = [s for s, r in base.items() if r is None]
    if missing:
        print(f"baseline seeds missing: {missing}; run r5_campaign1 first")
        return 1
    base_ax = {k: [axes(base[s])[k] for s in SEEDS]
               for k in axes(base[42])}
    report: dict = {"baseline_band": {}}
    for k, v in base_ax.items():
        vv = [x for x in v if x is not None]
        if vv:
            report["baseline_band"][k] = {
                "values": v, "min": min(vv), "max": max(vv),
                "mean": float(np.mean(vv)), "n": len(vv)}

    verdicts = {}
    for tag in ("condunet-minsnr5", "condunet-h1", "condunet-h2"):
        recs = {s: load(tag, s) for s in SEEDS}
        have = [s for s, r in recs.items() if r is not None]
        if not have:
            continue
        ax = {k: [axes(recs[s])[k] for s in have]
              for k in axes(recs[have[0]])}
        v: dict = {"seeds": have, "axes": ax, "supported": {}}
        for k, vals in ax.items():
            bvals = [x for x in base_ax[k] if x is not None]
            vals = [x for x in vals if x is not None]
            if not vals or not bvals:
                continue
            lo, hi = min(bvals), max(bvals)
            below = all(x < lo for x in vals)   # lower-better axes
            above = all(x > hi for x in vals)
            v["supported"][k] = ("below_band" if below else
                                 "above_band" if above else "inside_band")
        verdicts[tag] = v
    report["levers"] = verdicts

    # calibrated-T head-to-head: baseline vs min-SNR at each sweep T
    h2h = {}
    for tag in ("condunet", "condunet-minsnr5"):
        per_seed = {s: temper(tag, s) for s in SEEDS}
        if all(t is None for t in per_seed.values()):
            continue
        h2h[tag] = {s: t for s, t in per_seed.items() if t is not None}
    report["calibrated_head_to_head"] = h2h

    # decision rules, stated in data
    mins = verdicts.get("condunet-minsnr5", {}).get("supported", {})
    report["decisions"] = {
        "min_snr_default": {
            "rule": "flip full-scale training presets to min_snr iff "
                    "best_val/WSSE/CRPS are below the baseline band (or "
                    "inside with no axis above) at 3 seeds AND the "
                    "calibrated-T precision matches the baseline's",
            "axes": mins,
        },
        "heads_retirement": {
            "rule": "heads=1/2 stay retired iff any quality axis is "
                    "above the baseline band at 3 seeds (WSSE or CRPS)",
            "h1": verdicts.get("condunet-h1", {}).get("supported", {}),
            "h2": verdicts.get("condunet-h2", {}).get("supported", {}),
        },
    }

    (OUT / "r5_decisions.json").write_text(json.dumps(report, indent=2))

    # markdown summary
    rows = ["| run | best-val | CRPS(norm) | SBC KS | WSSE med | acc@T1 |",
            "|---|---|---|---|---|---|"]

    def fmt(vals):
        vals = [v for v in vals if v is not None]
        if not vals:
            return "—"
        if len(vals) == 1:
            return f"{vals[0]:.4g}"
        return f"{np.mean(vals):.4g} [{min(vals):.4g}, {max(vals):.4g}]"

    rows.append("| condunet (3 seeds) | " + " | ".join(
        fmt(base_ax[k]) for k in ("best_val", "crps", "sbc_ks",
                                  "wsse_med", "acc_t1")) + " |")
    for tag, v in verdicts.items():
        rows.append(f"| {tag} ({len(v['seeds'])} seeds) | " + " | ".join(
            fmt(v["axes"][k]) for k in ("best_val", "crps", "sbc_ks",
                                        "wsse_med", "acc_t1")) + " |")
    print("\n".join(rows))
    print(f"\nwrote {OUT / 'r5_decisions.json'}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
