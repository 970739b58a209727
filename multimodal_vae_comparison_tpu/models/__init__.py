"""Model zoo registry.

Mirrors the reference plugin registry (multimodal_compare/models/__init__.py):
mixing strategies are selected by the config's ``mixing`` string.  Third-party
models register here the same way (see contrib.py).
"""
from multimodal_vae_comparison_tpu.models.mmvae import MOE, POE, MoPOE, DMVAE
from multimodal_vae_comparison_tpu.models.contrib import POE2

MIXING_REGISTRY = {
    "moe": MOE,
    "poe": POE,
    "mopoe": MoPOE,
    "dmvae": DMVAE,
    "poe2": POE2,
}


def get_mixing(name: str):
    key = name.lower()
    if key not in MIXING_REGISTRY:
        raise KeyError(
            f"unknown mixing strategy '{name}'; available: {sorted(MIXING_REGISTRY)}")
    return MIXING_REGISTRY[key]
