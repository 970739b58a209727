"""GeBiD dataset generator (CdSprites+ predecessor).

Analog of multimodal_compare/data_proc/generate_dataset.py (156 LoC): simple
PIL/cv2-drawn geometric shapes with short captions.  GeBiD is the untextured
ancestor of CdSprites+, so this delegates to the CdSprites+ generator capped
at level 3 (shape + size + color, no textures/backgrounds) and writes the
same h5 contract.

    python -m multimodal_vae_comparison_tpu.data_proc.gebid --level 2 \
        --count 5000 --out_dir ./data/GeBiD
"""
from __future__ import annotations

import argparse

from multimodal_vae_comparison_tpu.data_proc.cdsprites import generate_level


def main():
    parser = argparse.ArgumentParser(description="Generate GeBiD levels")
    parser.add_argument("--level", default=1, type=int, choices=[1, 2, 3])
    parser.add_argument("--count", default=5000, type=int)
    parser.add_argument("--out_dir", default="./data/GeBiD")
    parser.add_argument("--seed", default=0, type=int)
    args = parser.parse_args()
    d = generate_level(args.level, args.count, args.out_dir, args.seed)
    print(f"GeBiD level {args.level}: {args.count} samples -> {d}")


if __name__ == "__main__":
    main()
