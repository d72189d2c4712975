"""Attribute the r3->r4 mpe_f1_f32 slip (0.99373 -> 0.98594; VERDICT r4 #4).

The frozen f32 probe (bench.py `mpe_f1_f32`, eval/quality.py) is
deterministic given the code, and the only gradient-path change in r4 was
the block builder: the advanced-index GATHER contraction (r3) became a
one-hot EINSUM (commit f1e6332) whose VJP avoids XLA:TPU's serialized
scatter-add. The two builders produce bit-comparable blocks
(tests/test_packed_conv.py::test_builder_forms_identical_blocks) but their
dKernel contractions reduce in different orders, so 120-step training
trajectories may diverge benignly.

This tool runs the IDENTICAL frozen probe with each builder form across
seeds, in one session. If gather reproduces r3's number and einsum sits
consistently lower, the slip is a real (small) trajectory cost of the
einsum VJP; if the seed spread swamps the builder delta, it is benign
trajectory divergence. Findings land next to the frozen-contract note in
bench.py and docs/PERFORMANCE.md.

Run on the real chip:  python tools/attr_quality_slip.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    from timbre_trap_tpu.eval import quality_f1
    from timbre_trap_tpu.models import TimbreTrap
    from timbre_trap_tpu.ops import packed_conv
    from timbre_trap_tpu.utils import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    model = TimbreTrap(sample_rate=22050, n_octaves=9, bins_per_octave=60,
                       secs_per_block=3, latent_size=128, model_complexity=2)

    orig = packed_conv._build_blocks

    def forced(mode):
        def build(*args, **kw):
            kw["vjp_einsum"] = mode
            return orig(*args, **kw)
        return build

    results = {}
    for name, mode in (("einsum", True), ("gather", False)):
        packed_conv._build_blocks = forced(mode)
        for seed in (0, 1, 2):
            t0 = time.time()
            f1 = quality_f1(model, n_tracks=8, steps=120, lr=2e-3,
                            seed=seed, batch_size=4, conv_backend="pallas")
            results[f"{name}/seed{seed}"] = round(f1, 5)
            print(f"{name} seed={seed}: mpe_f1_f32={f1:.5f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
    packed_conv._build_blocks = orig
    print(json.dumps(results))


if __name__ == "__main__":
    main()
