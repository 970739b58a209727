"""TPU-native multimodal VAE comparison framework.

A from-scratch JAX/XLA/Pallas/pjit re-design of the capabilities of the
multimodal-vae-comparison toolkit (reference: gabinsane/multimodal-vae-comparison):
train, evaluate and compare multimodal variational autoencoders (MVAE/PoE,
MMVAE/MoE, MoPoE, DMVAE) on YAML-configured multimodal datasets.

Unlike the reference (PyTorch Lightning, single GPU, dynamic dict-of-Nones
control flow), this framework is built TPU-first:

* modality presence and subset structure are *static trace-time* properties,
  so every objective compiles to a single fused XLA program;
* distributions are pure parameter pytrees (no object graph under jit);
* the training step is jit-compiled and sharded over a ``jax.sharding.Mesh``
  (data parallel by default, wider meshes supported);
* hot fusion paths (product-of-experts, KL reductions, masked attention) have
  Pallas TPU kernels with jnp reference fallbacks.

Public API mirrors the reference: ``python main.py --cfg <config>.yml``.
"""

__version__ = "0.1.0"
