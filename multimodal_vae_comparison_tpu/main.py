"""CLI entry point: ``python main.py --cfg <config>.yml [overrides]``.

Same public API as the reference (multimodal_compare/main.py:16-67): a YAML
config selected with --cfg, CLI flags overriding matching config keys, and an
``iterseeds`` loop training N models with consecutive seeds.
"""
from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    # flag set mirrors reference main.py:16-39
    parser = argparse.ArgumentParser(description="TPU multimodal VAE training")
    parser.add_argument("--cfg", type=str, required=True,
                        help="path to the YAML config")
    parser.add_argument("--precision", type=str, default=None,
                        choices=["64", "32", "16", "bf16"],
                        help="numeric precision (bf16 recommended on TPU)")
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--lr", type=float, default=None)
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--n_latents", type=int, default=None)
    parser.add_argument("--obj", type=str, default=None)
    parser.add_argument("--mixing", type=str, default=None)
    parser.add_argument("--beta", type=float, default=None)
    parser.add_argument("--K", type=int, default=None)
    parser.add_argument("--viz_freq", type=int, default=None)
    parser.add_argument("--exp_name", type=str, default=None)
    parser.add_argument("--optimizer", type=str, default=None)
    parser.add_argument("--num_devices", type=int, default=None)
    parser.add_argument("--pre_trained", type=str, default=None,
                        help="run dir to warm-start parameters from")
    parser.add_argument("--no_viz", action="store_true")
    parser.add_argument("--profile", type=str, default=None, metavar="DIR",
                        help="capture a jax.profiler trace of epoch 1 into DIR")
    parser.add_argument("--debug_nans", action="store_true",
                        help="enable jax_debug_nans (analog of the "
                             "reference's torch.isnan scrubbing)")
    return parser


def main(config, enable_viz: bool = True, trainer=None):
    """Train one model from a parsed Config (reference main.py:41-54).

    Pass an existing ``trainer`` to reuse its compiled executables for a new
    seed (iterseeds path).
    """
    from multimodal_vae_comparison_tpu.training.trainer import Trainer

    if trainer is None:
        trainer = Trainer(config, enable_viz=enable_viz)
        trainer.init_state()
    print(f"Model: {type(trainer.model).__name__}, "
          f"params: {trainer.n_params():,}, "
          f"devices: {len(trainer.mesh.devices.flat)}")
    trainer.fit()
    stats = trainer.test()
    if stats:
        print("test:", {k: round(v, 4) if isinstance(v, float) else v
                        for k, v in stats.items()})
    return trainer


def enable_compilation_cache():
    """Persistent XLA compilation cache: repeated runs of the same config
    skip the (multi-minute on remote-compile setups) compile entirely."""
    import os

    import jax
    try:
        cache_dir = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.expanduser("~/.cache/jax_compilation"))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def cli(argv=None):
    from multimodal_vae_comparison_tpu.config import Config

    enable_compilation_cache()
    parser = build_parser()
    args = parser.parse_args(argv)
    if args.debug_nans:
        import jax
        jax.config.update("jax_debug_nans", True)
    if args.profile:
        import jax
        jax.profiler.start_trace(args.profile)
    overrides = {k: v for k, v in vars(args).items()
                 if k not in ("cfg", "no_viz", "profile", "debug_nans")}
    config = Config(args.cfg, overrides=overrides)
    # multi-seed iteration (reference main.py:56-67); the trainer (and its
    # compiled executables) is reused across seeds
    trainer = None
    base_seed = config.seed
    for it in range(int(getattr(config, "iterseeds", 1))):
        print(f"### Training model {it + 1}/{config.iterseeds} "
              f"(seed {config.seed})")
        trainer = main(config, enable_viz=not args.no_viz, trainer=trainer)
        if args.profile:
            import jax
            jax.profiler.stop_trace()
            args.profile = None
        if it + 1 < config.iterseeds:
            config.change_seed(base_seed + it + 1)
            version_dir = __import__("os").path.join(
                config.results_root, config.exp_name,
                f"version_{config.find_version()}")
            trainer.reset_for_seed(config.seed, mPath=version_dir)


if __name__ == "__main__":
    cli(sys.argv[1:])
