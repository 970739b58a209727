"""End-to-end trainer tests on the synthetic dataset (reference analog:
tests/test_trainer.py, but actually runnable without GPU)."""
import os

import numpy as np
import pytest
import yaml

from multimodal_vae_comparison_tpu.config import Config
from multimodal_vae_comparison_tpu.training.trainer import Trainer, build_model


def synthetic_cfg(tmp_path, **over):
    params = {
        "batch_size": 16, "epochs": 2, "exp_name": "t", "lr": 1e-3,
        "mixing": "moe", "n_latents": 8, "obj": "elbo", "optimizer": "adam",
        "seed": 1, "test_split": 0.25, "viz_freq": 100, "dataset_name": "synthetic",
        "labels": None,
        "modality_1": {"encoder": "FNN", "decoder": "FNN", "mod_type": "image",
                       "path": "64", "recon_loss": "bce"},
        "modality_2": {"encoder": "TxtTransformer", "decoder": "TxtTransformer",
                       "mod_type": "text", "path": "64",
                       "recon_loss": "category_ce"},
    }
    params.update(over)
    return Config(params, results_root=str(tmp_path))


def test_fit_two_epochs_loss_decreases(tmp_path):
    cfg = synthetic_cfg(tmp_path)
    trainer = Trainer(cfg, enable_viz=False)
    trainer.init_state()
    h0 = trainer.run_epoch(0)
    h1 = trainer.run_epoch(1)
    assert np.isfinite(h1["train_loss"])
    assert h1["train_loss"] < h0["train_loss"]


def test_validate_and_checkpoint_roundtrip(tmp_path):
    cfg = synthetic_cfg(tmp_path)
    trainer = Trainer(cfg, enable_viz=False)
    trainer.fit(epochs=1)
    assert os.path.exists(os.path.join(cfg.mPath, "metrics.csv"))
    assert os.path.isdir(os.path.join(cfg.mPath, "model", "last"))
    # restore into a fresh trainer via pre_trained
    params_before = trainer.state.params
    cfg2 = synthetic_cfg(tmp_path, pre_trained=cfg.mPath, exp_name="t2")
    trainer2 = Trainer(cfg2, enable_viz=False)
    trainer2.init_state()
    import jax
    for a, b in zip(jax.tree_util.tree_leaves(params_before),
                    jax.tree_util.tree_leaves(trainer2.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_unimodal_fallback(tmp_path):
    cfg = synthetic_cfg(tmp_path)
    cfg.mods = cfg.mods[:1]
    model = None
    from multimodal_vae_comparison_tpu.data.datamodule import DataModule
    dm = DataModule(cfg)
    dm.setup()
    model = build_model(cfg)
    assert type(model).__name__ == "UnimodalVAE"


def test_config_yaml_roundtrip(tmp_path):
    cfg = synthetic_cfg(tmp_path)
    dumped = os.path.join(cfg.mPath, "config.yml")
    assert os.path.exists(dumped)
    cfg2 = Config(dumped, results_root=str(tmp_path))
    assert cfg2.batch_size == cfg.batch_size
    assert len(cfg2.mods) == 2
    assert cfg2.mods[1].recon_loss == "category_ce"


def test_config_overrides(tmp_path):
    path = os.path.join(str(tmp_path), "c.yml")
    params = {
        "batch_size": 16, "epochs": 2, "exp_name": "t", "lr": 1e-3,
        "n_latents": 8, "dataset_name": "synthetic", "labels": None,
        "modality_1": {"encoder": "FNN", "decoder": "FNN",
                       "mod_type": "image", "path": "64"},
    }
    with open(path, "w") as f:
        yaml.dump(params, f)
    cfg = Config(path, overrides={"epochs": 7, "lr": 0.5, "nonexistent": 3},
                 results_root=str(tmp_path))
    assert cfg.epochs == 7
    assert cfg.lr == 0.5
    assert not hasattr(cfg, "nonexistent")


def test_mesh_divides_batch(tmp_path):
    # batch 12 on 8 virtual devices -> trainer must fall back to 6/4/...
    cfg = synthetic_cfg(tmp_path, batch_size=12)
    trainer = Trainer(cfg, enable_viz=False)
    n_dev = len(trainer.mesh.devices.flat)
    assert 12 % n_dev == 0


def test_scan_epoch_matches_loop_epoch(tmp_path):
    """The lax.scan whole-epoch fast path must produce the same training
    trajectory as the per-step loop (same batches, same rng folding).

    SGD is used for the comparison: scan and unrolled programs differ in
    float accumulation order, and adaptive optimizers (amsgrad) normalize
    near-zero gradients to +-lr, amplifying low-order-bit differences into
    sign flips.  With SGD the parameter difference stays at grad-noise level.
    """
    import jax
    import jax.numpy as jnp

    # reshuffle off: the equivalence requires identical batch order, and the
    # two paths use different shuffle sources (numpy rng vs on-device perm)
    cfg = synthetic_cfg(tmp_path, exp_name="scan", optimizer="sgd", lr=1e-4,
                        reshuffle=False)
    t1 = Trainer(cfg, enable_viz=False)
    t1.init_state()
    params0 = jax.tree_util.tree_map(jnp.array, t1.state.params)
    m_loop = t1.run_epoch(0)

    cfg2 = synthetic_cfg(tmp_path, exp_name="scan2", optimizer="sgd", lr=1e-4,
                         reshuffle=False)
    t2 = Trainer(cfg2, enable_viz=False)
    t2.init_state()
    t2.state = t2.state.replace(params=params0)
    t2.state = t2.state.replace(opt_state=t2.tx.init(params0))
    m_scan = t2.run_epoch_scan(0)

    assert abs(m_loop["train_loss"] - m_scan["train_loss"]) \
        / abs(m_loop["train_loss"]) < 1e-4
    for a, b in zip(jax.tree_util.tree_leaves(t1.state.params),
                    jax.tree_util.tree_leaves(t2.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)


def test_resume_from_own_checkpoint(tmp_path):
    """Preemption recovery: resume: true restarts from the run's own last
    checkpoint and skips completed epochs."""
    import jax

    cfg = synthetic_cfg(tmp_path, exp_name="res")
    trainer = Trainer(cfg, enable_viz=False)
    trainer.fit(epochs=2, log_fn=None)
    step_after = int(trainer.state.step)
    assert step_after > 0

    cfg2 = synthetic_cfg(tmp_path, exp_name="res2")
    cfg2.resume = True
    cfg2.mPath = cfg.mPath  # same run dir (as after a preemption restart)
    trainer2 = Trainer(cfg2, enable_viz=False)
    trainer2.init_state()
    assert int(trainer2.state.step) == step_after
    for a, b in zip(jax.tree_util.tree_leaves(trainer.state.params),
                    jax.tree_util.tree_leaves(trainer2.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # full-state recovery: optimizer moments and the best-val watermark come
    # back too, so post-resume dynamics match an uninterrupted run
    for a, b in zip(jax.tree_util.tree_leaves(trainer.state.opt_state),
                    jax.tree_util.tree_leaves(trainer2.state.opt_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert trainer2.best_val == trainer.best_val
    # fit with the same total epochs is a no-op (all epochs already done)
    trainer2.fit(epochs=2, log_fn=None)
    assert int(trainer2.state.step) == step_after


def test_all_shipped_configs_parse():
    """Every YAML under configs/ (incl. round2 experiment configs) must
    parse into a Config with modality blocks and a known mixing name."""
    import glob
    from multimodal_vae_comparison_tpu.config import Config
    from multimodal_vae_comparison_tpu.models import MIXING_REGISTRY
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    paths = (glob.glob(os.path.join(root, "configs", "*.yml"))
             + glob.glob(os.path.join(root, "configs", "round2", "*.yml")))
    assert len(paths) >= 12
    for p in paths:
        cfg = Config(p, eval_only=True)
        assert cfg.mixing.lower() in MIXING_REGISTRY, p
        assert len(cfg.mods) >= 1, p


def test_csv_logger_appends_on_resume(tmp_path):
    """Regression: a resumed run's first log must append to the existing
    metrics.csv (reusing its header), not truncate the earlier epochs."""
    from multimodal_vae_comparison_tpu.training.trainer import CSVLogger
    path = os.path.join(str(tmp_path), "metrics.csv")
    log1 = CSVLogger(path)
    log1.log(0, {"train_loss": 1.0})
    log1.log(1, {"train_loss": 0.9})
    log2 = CSVLogger(path)  # fresh instance = resumed process
    log2.log(2, {"train_loss": 0.8})
    rows = open(path).read().strip().splitlines()
    assert rows[0] == "step,train_loss"
    assert len(rows) == 4  # header + 3 data rows, nothing truncated


def test_reset_for_seed_repoints_loggers(tmp_path):
    """iterseeds path: reset_for_seed must re-point BOTH the CSV logger and
    the TensorBoard writer at the new version dir (seeds 2..N wrote TB
    events into seed 1's tb dir before)."""
    cfg = synthetic_cfg(tmp_path)
    trainer = Trainer(cfg, enable_viz=False)
    trainer.fit(epochs=1)
    first_tb = os.path.join(cfg.mPath, "tb")
    new_dir = os.path.join(os.path.dirname(cfg.mPath), "version_s2")
    os.makedirs(new_dir, exist_ok=True)
    trainer.reset_for_seed(2, mPath=new_dir)
    trainer.fit(epochs=1)
    assert os.path.isfile(os.path.join(new_dir, "metrics.csv"))
    if trainer._tb is not None:  # tensorboardX installed
        tb2 = os.path.join(new_dir, "tb")
        assert os.path.isdir(tb2) and os.listdir(tb2)
        # seed-1 tb events stop growing: new events land in the new dir
        assert os.path.isdir(first_tb)


def test_grad_accum_matches_mean_of_chunk_grads(tmp_path):
    """grad_accum=G must apply exactly the mean of the G per-microbatch
    gradients (each with its per-chunk folded sample rng) in ONE optimizer
    update — verified against a hand-computed SGD update."""
    import jax
    import jax.numpy as jnp
    import optax

    from multimodal_vae_comparison_tpu.training.trainer import (
        TrainState, make_train_step)

    cfg = synthetic_cfg(tmp_path, exp_name="ga")
    t = Trainer(cfg, enable_viz=False)
    model = t.model
    batch = next(iter(t.datamodule.batches("train", 16)))
    rng = jax.random.PRNGKey(7)
    params = model.init({"params": rng, "sample": rng}, batch,
                        method=model.objective)
    lr = 1e-2
    tx = optax.sgd(lr)
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))

    G = 4
    step = make_train_step(model, tx, jit=False, grad_accum=G)
    new_state, metrics = step(state, batch, rng)

    # hand-computed: mean of per-chunk grads with the same rng folding
    # (chunks are STRIDED, x[i::G] — the GSPMD-clean split, see trainer)
    folded = jax.random.fold_in(rng, state.step)
    def chunk_of(x, i):
        return x[i::G]
    grads_sum = None
    for i in range(G):
        chunk = jax.tree_util.tree_map(lambda x: chunk_of(x, i), batch)
        def loss_fn(p):
            return model.apply(p, chunk,
                               rngs={"sample": jax.random.fold_in(folded, i)},
                               method=model.objective)
        (_, _), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        g = jax.tree_util.tree_map(lambda a: np.asarray(a, np.float32), g)
        grads_sum = g if grads_sum is None else jax.tree_util.tree_map(
            lambda a, b: a + b, grads_sum, g)
    for p0, p1, g in zip(jax.tree_util.tree_leaves(params),
                         jax.tree_util.tree_leaves(new_state.params),
                         jax.tree_util.tree_leaves(grads_sum)):
        np.testing.assert_allclose(np.asarray(p1),
                                   np.asarray(p0) - lr * g / G,
                                   rtol=2e-3, atol=1e-6)
    assert np.isfinite(float(metrics["loss"]))


def test_trainer_grad_accum_fit(tmp_path):
    """End-to-end: a grad_accum=2 config trains and the loss is finite."""
    cfg = synthetic_cfg(tmp_path, exp_name="ga_fit", grad_accum=2, epochs=1)
    t = Trainer(cfg, enable_viz=False)
    metrics = t.fit()
    assert np.isfinite(metrics["train_loss"])
