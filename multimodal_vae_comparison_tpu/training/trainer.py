"""Training runtime: jit-compiled, mesh-sharded train loop.

Replaces the reference's PyTorch-Lightning glue
(multimodal_compare/models/trainer.py + main.py's pl.Trainer): same
responsibilities — model assembly from config (trainer.py:91-115), optimizer
selection (trainer.py:75-89), per-modality loss logging (trainer.py:121-154),
epoch-end visualization cadence (trainer.py:156-178), checkpoint/resume — but
as an explicit functional loop:

* ONE jitted ``train_step`` (value_and_grad + optax update) with donated
  state: params update in place in HBM, no host sync inside the epoch;
* batch sharded over the ``("data",)`` mesh; XLA emits the gradient psum
  over ICI from the sharding annotations (no DDP/NCCL analog needed);
* host->device prefetch overlaps H2D DMA with compute;
* Orbax checkpoints (params + opt state + step), last & best, and the
  ``pre_trained`` config key restores like the reference (trainer.py:95-97);
* dual metric sinks: CSV + TensorBoard, same as the reference's two loggers
  (main.py:47-48).
"""
from __future__ import annotations

import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from multimodal_vae_comparison_tpu.data.datamodule import (
    DataModule, prefetch_to_device)
from multimodal_vae_comparison_tpu.models import get_mixing
from multimodal_vae_comparison_tpu.models.base import build_specs
from multimodal_vae_comparison_tpu.models.mmvae import UnimodalVAE
from multimodal_vae_comparison_tpu.parallel.mesh import (
    batch_sharding, make_mesh, shard_params)
from multimodal_vae_comparison_tpu.training.optim import make_optimizer


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray


def build_model(cfg, dtype=jnp.float32):
    """Assemble the model from a parsed Config (reference trainer.py:91-115):
    one VAE per modality block; mixing class chosen by ``cfg.mixing``;
    unimodal fallback when a single modality is configured."""
    specs = build_specs(cfg)
    kwargs = dict(specs=specs, n_latents=cfg.n_latents, obj=cfg.obj,
                  beta=cfg.beta, K=cfg.K, dtype=dtype,
                  remat=bool(getattr(cfg, "remat", False)),
                  aux_endpoint=float(getattr(cfg, "aux_endpoint", 0.0) or 0.0),
                  prior_components=int(getattr(cfg, "prior_components", 1)
                                       or 1))
    if len(specs) == 1:
        return UnimodalVAE(**kwargs)
    return get_mixing(cfg.mixing)(**kwargs)


def make_train_step(model, tx, jit: bool = True, grad_accum: int = 1):
    """Build the jitted train step: value_and_grad + optax update.

    The whole multimodal objective — every encoder, every fusion, every
    subset ELBO — traces into one XLA program here.  ``jit=False`` returns
    the raw step function (for embedding in a caller's scan, e.g. bench.py's
    single-dispatch N-step timing loop).

    ``grad_accum > 1`` splits the batch into that many microbatches and
    lax.scans value_and_grad over them, accumulating fp32 gradients before
    ONE optimizer update — numerically the mean-loss gradient of the full
    batch, but the activation working set stays at the microbatch size.  On
    TPU this keeps large-batch steps out of the HBM-spill regime that bends
    the throughput curve down past the VMEM sweet spot (docs/performance.md);
    the reference has no large-batch story at all (single-GPU Lightning
    loop).  Batch size must divide evenly by ``grad_accum``.
    """

    def grads_of(params, batch, rng):
        def loss_fn(p):
            return model.apply(p, batch, rngs={"sample": rng},
                               method=model.objective)
        return jax.value_and_grad(loss_fn, has_aux=True)(params)

    def train_step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)

        if grad_accum == 1:
            (loss, metrics), grads = grads_of(state.params, batch, rng)
        else:
            def to_chunks(x):
                assert x.shape[0] % grad_accum == 0, (
                    f"batch {x.shape[0]} not divisible by "
                    f"grad_accum={grad_accum}")
                # STRIDED chunks (chunk g = x[g::G]), not contiguous blocks:
                # under a data mesh a contiguous (G, B/G) reshape puts the
                # sharded dim minor and GSPMD partially replicates the
                # per-chunk work (the round-4 decode-fold bug class); the
                # strided split keeps every chunk block-sharded exactly like
                # the full batch (tests/test_sharding.py pins per-device
                # FLOPs ~1/N).
                return x.reshape((x.shape[0] // grad_accum, grad_accum)
                                 + x.shape[1:]).swapaxes(0, 1)

            chunked = jax.tree_util.tree_map(to_chunks, batch)

            def body(carry, inp):
                g_acc, l_acc, m_acc = carry
                chunk, idx = inp
                (l, m), g = grads_of(state.params, chunk,
                                     jax.random.fold_in(rng, idx))
                g_acc = jax.tree_util.tree_map(
                    lambda a, b: a + b.astype(jnp.float32), g_acc, g)
                m_acc = jax.tree_util.tree_map(lambda a, b: a + b,
                                               m_acc, dict(m))
                return (g_acc, l_acc + l, m_acc), None

            g0 = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.params)
            # trace one chunk to get the metrics structure for the carry
            chunk0 = jax.tree_util.tree_map(lambda x: x[0], chunked)
            m0 = jax.eval_shape(lambda p, c: grads_of(p, c, rng)[0][1],
                                state.params, chunk0)
            m0 = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), dict(m0))
            (g_acc, loss, m_acc), _ = jax.lax.scan(
                body, (g0, jnp.zeros((), jnp.float32), m0),
                (chunked, jnp.arange(grad_accum)))
            inv = 1.0 / grad_accum
            grads = jax.tree_util.tree_map(
                lambda g, p: (g * inv).astype(p.dtype), g_acc, state.params)
            loss = loss * inv
            metrics = jax.tree_util.tree_map(lambda m: m * inv, m_acc)

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics)
        metrics["loss"] = loss
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + 1), metrics

    if not jit:
        return train_step
    return jax.jit(train_step, donate_argnums=(0,))


def make_epoch_runner(model, tx, reshuffle: bool = True,
                      grad_accum: int = 1):
    """Whole-epoch lax.scan runner: ONE dispatch per epoch.

    The datasets here fit in HBM (largest is a few GB), so the fastest
    schedule is to stage the epoch's batches on device once and scan the
    train step over them — no per-step host round trips, no H2D inside the
    epoch.  This is the TPU-idiomatic replacement for the reference's
    per-batch Lightning loop and is enabled automatically for resident
    datasets (cfg.scan_epochs / auto-size check in Trainer.fit).
    """

    train_step = make_train_step(model, tx, jit=False,
                                 grad_accum=grad_accum)

    def epoch_fn(state, epoch_data, rng):
        # fresh sample order every epoch: permute the staged samples on
        # device (flatten batches -> gather -> re-batch), like the
        # reference's shuffling DataLoader but without any host round trip.
        if reshuffle:
            perm_rng, rng = jax.random.split(rng)
            leaf = jax.tree_util.tree_leaves(epoch_data)[0]
            perm = jax.random.permutation(perm_rng,
                                          leaf.shape[0] * leaf.shape[1])

            def permute(x):
                flat = x.reshape((x.shape[0] * x.shape[1],) + x.shape[2:])
                return jnp.take(flat, perm, axis=0).reshape(x.shape)

            epoch_data = jax.tree_util.tree_map(permute, epoch_data)

        def body(state, batch):
            return train_step(state, batch, rng)

        state, metrics = jax.lax.scan(body, state, epoch_data)
        return state, jax.tree_util.tree_map(lambda x: jnp.mean(x, axis=0),
                                             metrics)

    return jax.jit(epoch_fn, donate_argnums=(0,))


def make_eval_step(model, jit: bool = True):
    def eval_step(params, batch, rng):
        loss, metrics = model.apply(params, batch, rngs={"sample": rng},
                                    method=model.objective)
        metrics = dict(metrics)
        metrics["loss"] = loss
        return metrics

    if not jit:
        return eval_step
    return jax.jit(eval_step)


def make_eval_runner(model):
    """Whole-val-split lax.scan evaluation (one dispatch per validation)."""
    eval_step = make_eval_step(model, jit=False)

    def eval_fn(params, staged, rng):
        def body(carry, batch):
            return carry, eval_step(params, batch, rng)

        _, metrics = jax.lax.scan(body, None, staged)
        return jax.tree_util.tree_map(lambda x: jnp.mean(x, axis=0), metrics)

    return jax.jit(eval_fn)


class CSVLogger:
    """Minimal CSV metrics sink (reference's CSVLogger analog)."""

    def __init__(self, path: str):
        self.path = path
        self._keys = None
        os.makedirs(os.path.dirname(path), exist_ok=True)

    def log(self, step: int, metrics: Dict[str, float]) -> None:
        metrics = {"step": step, **metrics}
        if self._keys is None:
            # resume-safe: append to an existing file (reusing its header
            # key order) instead of truncating the earlier epochs' rows
            existing = None
            if os.path.exists(self.path):
                with open(self.path) as f:
                    existing = f.readline().strip()
            if existing:
                self._keys = existing.split(",")
            else:
                self._keys = list(metrics.keys())
                with open(self.path, "w") as f:
                    f.write(",".join(self._keys) + "\n")
        with open(self.path, "a") as f:
            f.write(",".join(str(metrics.get(k, "")) for k in self._keys) + "\n")


class Trainer:
    def __init__(self, cfg, datamodule: Optional[DataModule] = None,
                 mesh=None, enable_viz: bool = True):
        self.cfg = cfg
        self.datamodule = datamodule or DataModule(cfg)
        self.datamodule.setup()
        if mesh is None:
            n_dev = getattr(cfg, "num_devices", None) or len(jax.devices())
            # the global batch must divide evenly over the data axis
            while cfg.batch_size % n_dev:
                n_dev -= 1
            mesh = make_mesh(n_dev)
        self.mesh = mesh
        dtype = {"bf16": jnp.bfloat16, "bfloat16": jnp.bfloat16}.get(
            str(getattr(cfg, "precision", "32")), jnp.float32)
        self.model = build_model(cfg, dtype=dtype)
        self.tx = make_optimizer(cfg.optimizer, cfg.lr)
        accum = int(getattr(cfg, "grad_accum", 1) or 1)
        self.train_step = make_train_step(self.model, self.tx,
                                          grad_accum=accum)
        self.eval_step = make_eval_step(self.model)
        self.epoch_runner = make_epoch_runner(
            self.model, self.tx,
            reshuffle=bool(getattr(cfg, "reshuffle", True)),
            grad_accum=accum)
        self.eval_runner = make_eval_runner(self.model)
        self._staged_epoch = None
        self._staged_val = None
        self.enable_viz = enable_viz
        self.state: Optional[TrainState] = None
        self.best_val = float("inf")
        self._tb = None
        if cfg.mPath:
            self.csv = CSVLogger(os.path.join(cfg.mPath, "metrics.csv"))
            try:
                from tensorboardX import SummaryWriter
                self._tb = SummaryWriter(logdir=os.path.join(cfg.mPath, "tb"))
            except Exception:
                self._tb = None
        else:
            self.csv = None

    # -- state ------------------------------------------------------------------

    def reset_for_seed(self, seed: int, mPath: Optional[str] = None) -> None:
        """Re-seed for an iterseeds run WITHOUT rebuilding the model: the
        jitted train/eval executables are reused across seeds (a fresh
        Trainer would recompile everything — minutes on remote-compile
        setups).  Reshuffles the data, clears staged device caches and
        re-initializes parameters."""
        self.cfg.change_seed(seed)
        if mPath is not None:
            self.cfg.mPath = mPath
            os.makedirs(os.path.join(mPath, "visuals"), exist_ok=True)
            self.cfg.dump_config()
            self.csv = CSVLogger(os.path.join(mPath, "metrics.csv"))
            # re-point TensorBoard too, or seeds 2..N write into seed 1's
            # tb dir with overlapping step counters
            if self._tb is not None:
                try:
                    from tensorboardX import SummaryWriter
                    self._tb.close()
                    self._tb = SummaryWriter(
                        logdir=os.path.join(mPath, "tb"))
                except Exception:
                    self._tb = None
        self.datamodule = DataModule(self.cfg)
        self.datamodule.setup()
        self._staged_epoch = None
        self._staged_val = None
        self.best_val = float("inf")
        self.init_state()

    def init_state(self) -> TrainState:
        rng = jax.random.PRNGKey(self.cfg.seed)
        batch = next(self.datamodule.batches("train"))
        params = self.model.init({"params": rng, "sample": rng}, batch,
                                 method=self.model.objective)
        # opportunistic pretrained-trunk install (ImageNet ResNet-50 for
        # Enc_CNN, like reference encoders.py:108-113); no-op without a
        # weights dir — see eval/weights.py
        try:
            from multimodal_vae_comparison_tpu.eval.weights import (
                install_pretrained)
            params, _ = install_pretrained(params)
        except Exception as e:
            print(f"[weights] install skipped: {type(e).__name__}: {e}")
        start_step = 0
        opt_state = None
        if getattr(self.cfg, "pre_trained", None):
            params = self.restore_params(self.cfg.pre_trained, params)
        elif (getattr(self.cfg, "resume", False) and self.cfg.mPath
              and os.path.isdir(self._ckpt_dir("last"))):
            # preemption recovery: restart from this run's own last checkpoint
            # with the FULL state — Adam moments and best-val included, so
            # post-resume dynamics match an uninterrupted run.
            params, opt_state, start_step, self.best_val = self.restore_state(
                self.cfg.mPath, params)
        params = shard_params(params, self.mesh)
        opt_state = shard_params(
            self.tx.init(params) if opt_state is None else opt_state, self.mesh)
        self.state = TrainState(params=params, opt_state=opt_state,
                                step=jnp.asarray(start_step, jnp.int32))
        return self.state

    def n_params(self) -> int:
        return sum(int(np.prod(p.shape)) for p in
                   jax.tree_util.tree_leaves(self.state.params))

    # -- checkpointing (Orbax) ------------------------------------------------------

    def _ckpt_dir(self, tag: str) -> str:
        d = os.path.join(os.path.abspath(self.cfg.mPath), "model", tag)
        return d

    def save_checkpoint(self, tag: str = "last") -> None:
        import orbax.checkpoint as ocp
        path = self._ckpt_dir(tag)
        ckptr = ocp.StandardCheckpointer()
        state = jax.device_get({"params": self.state.params,
                                "opt_state": self.state.opt_state,
                                "step": self.state.step,
                                "best_val": np.asarray(self.best_val,
                                                       np.float32)})
        ckptr.save(path, state, force=True)
        ckptr.wait_until_finished()

    @staticmethod
    def _resolve_ckpt(path: str) -> str:
        if os.path.isdir(os.path.join(path, "model", "last")):
            path = os.path.join(path, "model", "last")
        return os.path.abspath(path)

    def restore_params(self, path: str, abstract_params, with_step=False):
        """Params-only restore (the ``pre_trained`` weight-reuse path)."""
        import orbax.checkpoint as ocp
        path = self._resolve_ckpt(path)
        ckptr = ocp.PyTreeCheckpointer()
        raw = ckptr.restore(path)
        # rebuild with the model's own treedef (robust to dict/FrozenDict and
        # to checkpoints that carry extra top-level keys like opt_state)
        ref = jax.device_get(abstract_params)
        flat_ref, treedef = jax.tree_util.tree_flatten(ref)
        flat_raw = jax.tree_util.tree_leaves(raw["params"])
        assert len(flat_ref) == len(flat_raw), (
            f"checkpoint param count {len(flat_raw)} != model {len(flat_ref)}")
        params = jax.tree_util.tree_unflatten(
            treedef, [np.asarray(g, dtype=np.asarray(r).dtype)
                      for r, g in zip(flat_ref, flat_raw)])
        if with_step:
            return params, int(np.asarray(raw["step"]))
        return params

    def restore_state(self, path: str, abstract_params):
        """Full-state restore for preemption recovery: params, optimizer
        moments, step, and the best-val watermark.  Falls back to
        params+step for checkpoints written before opt_state was saved."""
        import orbax.checkpoint as ocp
        path = self._resolve_ckpt(path)
        host_params = jax.device_get(abstract_params)
        target = {"params": host_params,
                  "opt_state": jax.device_get(self.tx.init(host_params)),
                  "step": np.zeros((), np.int32),
                  "best_val": np.zeros((), np.float32)}
        ckptr = ocp.StandardCheckpointer()
        try:
            r = ckptr.restore(path, target)
            return (r["params"], r["opt_state"], int(r["step"]),
                    float(r["best_val"]))
        except Exception:
            params, step = self.restore_params(path, abstract_params,
                                               with_step=True)
            return params, None, step, float("inf")

    # -- loops ------------------------------------------------------------------

    def _log(self, step: int, metrics: Dict[str, float]) -> None:
        if self.csv:
            self.csv.log(step, metrics)
        if self._tb:
            for k, v in metrics.items():
                self._tb.add_scalar(k, v, step)

    # -- scan fast path ------------------------------------------------------------

    def _train_bytes(self) -> int:
        total = 0
        for mod in self.datamodule._train:
            total += mod["data"].nbytes
            if mod["masks"] is not None:
                total += mod["masks"].nbytes
        return total

    def use_scan(self) -> bool:
        flag = getattr(self.cfg, "scan_epochs", None)
        if flag is not None:
            return bool(flag)
        # auto: stage resident datasets up to ~4 GB in HBM
        return self._train_bytes() < 4 * 1024 ** 3

    def stage_epoch_data(self):
        """Stack the train split into (n_batches, bs, ...) device arrays,
        sharded so the batch axis rides the mesh's data axis."""
        if self._staged_epoch is not None:
            return self._staged_epoch
        from jax.sharding import NamedSharding, PartitionSpec as P
        sh = NamedSharding(self.mesh, P(None, "data"))
        bs = self.cfg.batch_size
        n_batches = self.datamodule.n_train // bs
        staged = {}
        for i, mod in enumerate(self.datamodule._train):
            name = f"mod_{i + 1}"
            data = mod["data"][: n_batches * bs]
            data = data.reshape(n_batches, bs, *data.shape[1:])
            entry = {"data": jax.device_put(data, sh)}
            if mod["masks"] is not None:
                masks = mod["masks"][: n_batches * bs]
                entry["masks"] = jax.device_put(
                    masks.reshape(n_batches, bs, *masks.shape[1:]), sh)
            else:
                entry["masks"] = None
            staged[name] = entry
        self._staged_epoch = staged
        return staged

    def run_epoch_scan(self, epoch: int) -> Dict[str, float]:
        rng = jax.random.PRNGKey(self.cfg.seed * 100003 + epoch)
        staged = self.stage_epoch_data()
        self.state, metrics = self.epoch_runner(self.state, staged, rng)
        metrics = jax.device_get(metrics)   # ONE host round trip, not per-key
        return {f"train_{k}": float(v) for k, v in metrics.items()}

    def stage_val_data(self):
        if self._staged_val is not None:
            return self._staged_val
        from jax.sharding import NamedSharding, PartitionSpec as P
        sh = NamedSharding(self.mesh, P(None, "data"))
        bs = self.cfg.batch_size
        n_batches = max(self.datamodule.n_val // bs, 0)
        if n_batches == 0:
            return None
        staged = {}
        for i, mod in enumerate(self.datamodule._val):
            name = f"mod_{i + 1}"
            data = mod["data"][: n_batches * bs]
            entry = {"data": jax.device_put(
                data.reshape(n_batches, bs, *data.shape[1:]), sh)}
            if mod["masks"] is not None:
                masks = mod["masks"][: n_batches * bs]
                entry["masks"] = jax.device_put(
                    masks.reshape(n_batches, bs, *masks.shape[1:]), sh)
            else:
                entry["masks"] = None
            staged[name] = entry
        self._staged_val = staged
        return staged

    def validate_scan(self, epoch: int) -> Dict[str, float]:
        staged = self.stage_val_data()
        if staged is None:
            return self.validate(epoch)
        rng = jax.random.PRNGKey(7 + epoch)
        metrics = self.eval_runner(self.state.params, staged, rng)
        metrics = jax.device_get(metrics)   # ONE host round trip, not per-key
        return {f"val_{k}": float(v) for k, v in metrics.items()}

    def run_epoch(self, epoch: int) -> Dict[str, float]:
        rng = jax.random.PRNGKey(self.cfg.seed * 100003 + epoch)
        sharding = batch_sharding(self.mesh)
        agg, count = {}, 0
        it = prefetch_to_device(
            self.datamodule.batches(
                "train", shuffle=bool(getattr(self.cfg, "reshuffle", True)),
                seed=self.cfg.seed * 100003 + epoch),
            sharding, size=getattr(self.cfg, "prefetch", 2))
        for batch in it:
            self.state, metrics = self.train_step(self.state, batch, rng)
            count += 1
            for k, v in metrics.items():
                agg[k] = agg.get(k, 0.0) + v
        # one host sync per epoch
        agg = jax.device_get(agg)
        agg = {f"train_{k}": float(v) / count for k, v in agg.items()}
        return agg

    def validate(self, epoch: int) -> Dict[str, float]:
        rng = jax.random.PRNGKey(7 + epoch)
        sharding = batch_sharding(self.mesh)
        agg, count = {}, 0
        for batch in prefetch_to_device(self.datamodule.batches("val"),
                                        sharding):
            metrics = self.eval_step(self.state.params, batch, rng)
            count += 1
            for k, v in metrics.items():
                agg[k] = agg.get(k, 0.0) + v
        if count == 0:
            return {}
        agg = jax.device_get(agg)
        return {f"val_{k}": float(v) / count for k, v in agg.items()}

    def fit(self, epochs: Optional[int] = None,
            log_fn=print) -> Dict[str, float]:
        if self.state is None:
            self.init_state()
        epochs = epochs or self.cfg.epochs
        history = {}
        scan = self.use_scan()
        ckpt_freq = int(getattr(self.cfg, "ckpt_freq", 1) or 1)
        # when resumed from a checkpoint, skip the epochs already trained
        start_epoch = int(self.state.step) // max(
            self.datamodule.steps_per_epoch(), 1)
        kernel_paths_logged = False
        for epoch in range(start_epoch, epochs):
            t0 = time.time()
            train_metrics = (self.run_epoch_scan(epoch) if scan
                             else self.run_epoch(epoch))
            val_metrics = (self.validate_scan(epoch) if scan
                           else self.validate(epoch))
            metrics = {**train_metrics, **val_metrics,
                       "epoch_time_s": time.time() - t0,
                       "samples_per_s": (self.datamodule.steps_per_epoch()
                                         * self.cfg.batch_size
                                         / max(time.time() - t0, 1e-9))}
            self._log(epoch, metrics)
            if not kernel_paths_logged:
                # record which compute paths the traced programs actually
                # contain (pallas vs jnp) next to the perf numbers
                from multimodal_vae_comparison_tpu.ops.pallas import telemetry
                paths = telemetry.summary()
                if log_fn and paths:
                    log_fn(f"[kernels] trace-time dispatch: {paths}")
                kernel_paths_logged = True
            if log_fn:
                msg = " ".join(f"{k}={v:.4g}" for k, v in metrics.items()
                               if k in ("train_loss", "val_loss",
                                        "epoch_time_s", "samples_per_s"))
                log_fn(f"epoch {epoch}: {msg}")
            if self.cfg.mPath and ((epoch + 1) % ckpt_freq == 0
                                   or epoch + 1 == epochs):
                # update the watermark BEFORE writing "last" so the
                # checkpointed best_val reflects this epoch
                val_loss = val_metrics.get("val_loss", float("inf"))
                improved = val_loss < self.best_val
                if improved:
                    self.best_val = val_loss
                self.save_checkpoint("last")
                if improved:
                    self.save_checkpoint("best")
            if (self.enable_viz and self.cfg.mPath
                    and (epoch + 1) % max(int(self.cfg.viz_freq), 1) == 0):
                try:
                    self.run_visualizations(epoch)
                except Exception as e:  # viz must never kill training
                    if log_fn:
                        log_fn(f"[viz] skipped: {type(e).__name__}: {e}")
            history = metrics
        return history

    def test(self) -> Dict[str, float]:
        """Run dataset-specific eval at training end
        (reference trainer.py:171-178)."""
        stats = self.validate(epoch=10**6)
        fn = self.datasets_eval_fn()
        if fn is not None:
            try:
                extra = fn(self)
                if isinstance(extra, dict):
                    stats.update(extra)
            except Exception as e:
                stats["eval_error"] = str(e)
        return stats

    def datasets_eval_fn(self):
        ds = self.datamodule.datasets[0]
        return ds.eval_statistics_fn()

    # -- visualization hooks --------------------------------------------------------

    def run_visualizations(self, epoch: int) -> None:
        from multimodal_vae_comparison_tpu import visualization as viz
        viz.epoch_visualizations(self, epoch)
