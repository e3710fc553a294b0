"""Round-5 follow-up: re-measure the interactive operating point at the
ADOPTED 2^12 hash tables (the interactive_r5.json headline was taken at
2^14, before the operating-curve retune; at 480x270 the infer batch is
129,600 samples, where the 3.6x kernel-rate gain is worth a few ms).

Appends a ``retuned_2x12`` record to output/interactive_r5.json.
"""

import json
import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

import jax

from nrc_hpm_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

from interactive_point import run_point


def main():
    from nrc_hpm_tpu.config import AppConfig, EncodingConfig, SceneConfig

    print("device:", jax.devices()[0], file=sys.stderr, flush=True)
    enc = EncodingConfig(log2_hashmap_size=12)
    recs = []
    for tag, w, h, tb, l2t in [
        ("480x270 train 2x2^11 tables 2^12", 480, 270, 2, 11),
        ("320x180 train 2x2^11 tables 2^12", 320, 180, 2, 11),
    ]:
        cfg = AppConfig(
            scene=SceneConfig.preset(4), render_width=w, render_height=h,
            encoding=enc,
            log2_infer_batch_size=17, log2_train_batch_size=l2t,
            train_batch_count=tb)
        recs.append(run_point(tag, cfg))

    path = "output/interactive_r5.json"
    with open(path) as f:
        doc = json.load(f)
    doc["retuned_2x12"] = recs
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)


if __name__ == "__main__":
    main()
