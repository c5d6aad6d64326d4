"""Stacked-lever b256 train-step A/B: slab attention x fused GN+SiLU+conv3.

The slab kernel took 10.5% off the bf16 b256 step (slab_attn.json);
kernel_bench measured the fused GN+SiLU+conv3 winning its SEGMENT
1.17-1.44x at 256-wide ResBlocks (and losing at the 128-wide stem),
but its end-to-end verdict was left pending (docs/DESIGN.md §6). This
measures the 2x2 (attn_slab x pallas_conv_min_width=256) grid on the
whole b256 train step, f32 + bf16, to decide the throughput-preset
defaults with one artifact.

NOTE pallas_conv_min_width != 0 changes the flax param tree of the
>=256-wide ResBlocks (FusedGNConv vs GNSiLU+Conv pair) — checkpoints
are layout-compatible only within one setting; the config echo handles
restore (train.load_best_model adopts layout fields).

Writes docs/results/train_mfu/stack_b256.json.
Reference hot loop: ERT_Conditional_Diffusion.py:305-320.
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from benchmarks.train_slab import step_us  # noqa: E402

OUT = Path(__file__).resolve().parent.parent / "docs" / "results" / \
    "train_mfu"


def main() -> int:
    rec: dict = {}
    for dtype in ("bfloat16", "float32"):
        for slab in (True, False):
            for pcmw in (256, 0):
                key = (f"train_step_us_b256_{dtype}"
                       f"_{'slab' if slab else 'xla'}"
                       f"_{'fconv' if pcmw else 'xconv'}")
                rec[key] = step_us(256, 64, dtype, slab,
                                   pallas_conv_min_width=pcmw)
                print(json.dumps({key: rec[key]}), flush=True)
    OUT.mkdir(parents=True, exist_ok=True)
    (OUT / "stack_b256.json").write_text(json.dumps(rec, indent=2))
    print(f"wrote {OUT / 'stack_b256.json'}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
