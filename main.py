#!/usr/bin/env python
"""Repo-root CLI shim: ``python main.py --cfg <config>.yml`` — the same
public entry point as the reference toolkit."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from multimodal_vae_comparison_tpu.main import cli

if __name__ == "__main__":
    cli(sys.argv[1:])
