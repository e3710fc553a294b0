"""Assemble the round-5 interactive-operating-point artifact (VERDICT
item 2): fps sweep + the 24-frame quality trace into ONE JSON."""

import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    sweep = json.load(open("output/interactive_sweep_r5.json"))
    lines = [json.loads(l)
             for l in open("output/interactive_quality_r5/metrics.jsonl")]
    w = lines[16:24]

    def m(side, k):
        return round(float(np.mean([t[side][k] for t in w])), 4)

    chosen = next(r for r in sweep if r["tag"] == "480x270 train 2x2^11")
    art = {
        "note": "Interactive online-NRC operating point: FULL pipeline "
                "(trace + filtered cache inference + 4096 train samples "
                "through Adam/EMA + composite) each frame on one TPU "
                "v5e chip.  Quality trace: 24 frames, per-frame "
                "Reference::Compare semantics vs the UPSTREAM scene-4 "
                "1080p golden (pooled to 270p), frames 16-23 window.",
        "operating_point": chosen,
        "sweep": sweep,
        "quality_window_16_23": {
            "nrc_mse": m("nrc", "mse"),
            "nrc_rel_bias": m("nrc", "rel_bias"),
            "nrc_cv": m("nrc", "cv"),
            "mc_mse": m("mc", "mse"),
            "mc_rel_bias": m("mc", "rel_bias"),
            "nrc_wins": int(sum(l["nrc"]["mse"] < l["mc"]["mse"]
                                for l in lines)),
            "frames": len(lines),
        },
    }
    with open("output/interactive_r5.json", "w") as f:
        json.dump(art, f, indent=1)
    print(json.dumps(art["operating_point"], indent=1))
    print(json.dumps(art["quality_window_16_23"], indent=1))


if __name__ == "__main__":
    main()
