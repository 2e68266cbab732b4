"""Merge the two adversarial bench runs (recovery arm + td arm) into the
committed round artifact with per-level summaries.

Usage: python scripts/dev_merge_adv_artifact.py NOTD.json TD.json OUT.json
"""

import json
import sys

import numpy as np


def summarize(arms):
    by_level = {}
    for a in arms:
        by_level.setdefault(a["level"], []).append(a)
    out = {}
    for lvl, rows in sorted(by_level.items()):
        ates = [r["ate_sim3_m"] for r in rows if r["ate_sim3_m"] is not None]
        out[str(lvl)] = {
            "seeds": len(rows),
            "ate_median_m": round(float(np.median(ates)), 4) if ates else None,
            "ate_max_m": round(float(np.max(ates)), 4) if ates else None,
            "poses_median": int(np.median([r["poses"] for r in rows])),
            "poses_min": int(np.min([r["poses"] for r in rows])),
            "frames": rows[0]["frames"],
            "recovery_rate_median": round(float(np.median(
                [r["poses"] / r["frames"] for r in rows])), 3),
            "recoveries_total": int(sum(r["recoveries"] for r in rows)),
        }
    return out


def main():
    notd_path, td_path, out_path = sys.argv[1:4]
    with open(notd_path) as f:
        notd = json.load(f)
    with open(td_path) as f:
        td = json.load(f)
    out = {
        "metric": "adversarial ATE degradation curve (oracle renderer, "
                  "multi-seed, rebuild-and-continue recovery ON)",
        "unit": "m",
        "duration_s": notd["duration_s"],
        "levels": {
            "0": "clean oracle renderer",
            "1": "mild: flicker/vignette/blur/AR(1) IMU/1 mover",
            "2": "moderate: + 2 ms camera-IMU offset, 2 movers",
            "3": "harsh: + 5 ms offset, 3 movers, 3.5 px blur",
            "4": "rolling shutter 20 ms + level-2 nuisances",
        },
        "recovery_arm": {
            "estimate_td": False,
            "summary": summarize(notd["arms"]),
            "arms": notd["arms"],
        },
        "td_arm": {
            "estimate_td": True,
            "summary": summarize(td["arms"]),
            "arms": td["arms"],
        },
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v["summary"] if isinstance(v, dict) and "summary"
                      in v else v for k, v in out.items() if k.endswith("arm")},
                     indent=1))
    print(f"-> {out_path}")


if __name__ == "__main__":
    main()
