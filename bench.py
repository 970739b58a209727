#!/usr/bin/env python
"""Benchmark: training throughput of the flagship bimodal MVAE.

Workload = BASELINE.json config #2: MVAE (product-of-experts) image+text on
CdSprites+ L2 shapes (64x64x3 images, 45-char one-hot captions), ELBO
objective over all modality subsets — the reference's training-cost envelope
(BASELINE.md).

Prints ONE JSON line:
  {"metric": ..., "value": <samples/s/chip>, "unit": ..., "vs_baseline": ...}

Methodology (round-3 rewrite — every number here is reproducible by a
one-file probe):

* **Fetch-of-scalar timing.**  A measurement probe on this remote-tunnel
  platform showed `jax.block_until_ready` returning in 0.08 ms for a
  10-matmul chain whose execution (plus lazy remote compile) actually took
  175 s — block_until_ready does NOT reliably synchronize here, which is
  the root cause of round 2's physically impossible MFU>1 numbers.  The
  only trustworthy sync is a device-to-host transfer of the result, so
  every timing in this file dispatches a program whose output is a SCALAR
  that depends on all the work, and times until `float(out)` returns.
* **Two timings per batch size.**  `step_ms_scan` runs N train steps inside
  ONE `lax.scan` dispatch returning the final loss scalar — the device must
  execute all N sequential steps before the scalar exists; a separately
  measured null-program round trip is subtracted and the remainder divided
  by N.  This is the steady-state number the framework's scan-epoch
  trainer actually achieves.  `step_ms_fetch` fetches the loss after EVERY
  step — it additionally pays the host<->device round trip per step (what
  a per-step training loop with metric logging pays on this setup).
* **Calibrated peak.**  A bf16 matmul sweep (also scan-timed in one
  dispatch) measures the FLOP/s this chip actually sustains on its best-case
  op.  MFU is reported against both the nominal spec-sheet peak and this
  calibrated peak.
* **MFU <= 1 is asserted.**  `mfu_*_nominal > 1.0` fails the bench: it can
  only mean a measurement or FLOP-counting bug.

vs_baseline is measured against an equivalent PyTorch implementation of the
same model/objective on this host's CPU (the only PyTorch execution target
available here — the reference hardcodes .cuda() and names no GPU). The
torch model mirrors our architecture 1:1 so the ratio is an apples-to-apples
hardware+framework comparison at identical FLOPs.

`--mesh` mode (run separately; not part of the driver's single-line
contract) re-execs this script over virtual CPU meshes of 1/2/4/8 devices
and reports scan-step throughput at a fixed global batch — the multi-chip
scaling table (VERDICT round 2, item 7).
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BATCH = int(os.environ.get("BENCH_BATCH", 24))
BATCHES = [int(b) for b in
           os.environ.get("BENCH_BATCHES", f"{BATCH},256,1024,4096").split(",")]
STEPS = int(os.environ.get("BENCH_STEPS", 20))        # per-step-fetch steps
# steps inside one scan dispatch: enough that device time >> the ~33 ms
# tunnel round trip being subtracted
SCAN_STEPS = int(os.environ.get("BENCH_SCAN_STEPS", 300))
TORCH_STEPS = int(os.environ.get("BENCH_TORCH_STEPS", 8))
SEQ = 45
LATENTS = 16

# nominal dense bf16 FLOP/s per chip, by jax device_kind (public spec sheets)
PEAK_BF16 = {
    "TPU v4": 275e12,
    "TPU v5e": 197e12,
    "TPU v5 lite": 197e12,
    "TPU v5p": 459e12,
    "TPU v5": 459e12,
    "TPU v6e": 918e12,
    "TPU v6 lite": 918e12,
}


def _nominal_peak(device):
    kind = getattr(device, "device_kind", "")
    for k, v in PEAK_BF16.items():
        if kind.startswith(k):
            return v
    return None


def null_round_trip_s() -> float:
    """Median wall time of dispatch+fetch for a trivial program — the fixed
    overhead subtracted from single-dispatch scan timings."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def nul(x):
        return jnp.sum(x) * 0.0 + 1.0

    x = jnp.zeros((8,))
    float(nul(x))  # compile + warmup (fetch = real sync on this platform)
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(nul(x))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def calibrate_peak(rtt_s: float) -> dict:
    """Measured bf16 matmul FLOP/s on this chip.

    body: carry = carry @ b — each iteration depends on the previous one,
    so XLA cannot elide anything; the program returns a scalar that depends
    on the final carry and is timed to the host-side fetch (the only real
    sync on this platform), minus the measured null round trip.
    """
    import jax
    import jax.numpy as jnp

    results = {}
    iters = int(os.environ.get("BENCH_CALIB_ITERS", 200))
    sizes = [int(s) for s in
             os.environ.get("BENCH_CALIB_SIZES", "2048,4096,8192").split(",")]
    for n in sizes:
        k = jax.random.PRNGKey(0)
        a = (jax.random.normal(k, (n, n), jnp.bfloat16) / (n ** 0.5))
        b = (jax.random.normal(k, (n, n), jnp.bfloat16) / (n ** 0.5))

        @jax.jit
        def chain(a, b):
            def body(c, _):
                return jnp.dot(c, b, preferred_element_type=jnp.bfloat16), ()
            c, _ = jax.lax.scan(body, a, None, length=iters)
            return jnp.sum(c.astype(jnp.float32))

        float(chain(a, b))  # compile + warmup, fetch-synced
        t0 = time.perf_counter()
        float(chain(a, b))
        dt = max(time.perf_counter() - t0 - rtt_s, 1e-9)
        results[n] = 2.0 * n * n * n * iters / dt
    best = max(results.values())
    return {"matmul_tflops_by_size": {str(k): round(v / 1e12, 1)
                                      for k, v in results.items()},
            "calibrated_peak_flops": best}


def _compute_dtype():
    """bf16 on the MXU; fp32 on CPU (bf16 is software-emulated there, which
    would unfairly handicap the CPU-fallback comparison vs fp32 torch)."""
    import jax
    import jax.numpy as jnp
    return (jnp.bfloat16 if jax.default_backend() in ("tpu", "axon")
            else jnp.float32)


def _assemble(model, batch, grad_accum: int = 1):
    """(state, batch, rng, raw_step) for any model/batch pair, with the
    bf16-on-TPU compute path (params stay fp32)."""
    import jax
    import jax.numpy as jnp
    import optax

    from multimodal_vae_comparison_tpu.training.trainer import (
        TrainState, make_train_step)

    remat = (model.remat if os.environ.get("BENCH_REMAT") is None
             else os.environ["BENCH_REMAT"] == "1")
    model = type(model)(specs=model.specs, n_latents=model.n_latents,
                        obj=model.obj, beta=model.beta, K=model.K,
                        dtype=_compute_dtype(), remat=remat)
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng, "sample": rng}, batch,
                        method=model.objective)
    from multimodal_vae_comparison_tpu.training.optim import make_optimizer
    tx = make_optimizer("adam", 1e-4)   # trainer path (per-leaf amsgrad)
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    raw_step = make_train_step(model, tx, jit=False, grad_accum=grad_accum)
    return state, batch, rng, raw_step


def _grad_accum_for(batch_size: int) -> int:
    """Microbatch factor for large batches: past the VMEM sweet spot the
    whole program goes HBM-bound (perf_diag r4: every component −30% from
    bs256→4096), so big batches train as lax.scanned microbatches with fp32
    gradient accumulation — identical math (trainer.make_train_step), the
    per-step working set stays at BENCH_MICROBATCH (default 256)."""
    micro = int(os.environ.get("BENCH_MICROBATCH", 256))
    if micro <= 0 or batch_size <= micro or batch_size % micro:
        return 1
    return batch_size // micro


def _build(batch_size):
    import __graft_entry__ as ge
    model = ge._flagship(n_latents=LATENTS, seq_len=SEQ)
    batch = ge._batch(batch_size, seq_len=SEQ)
    return _assemble(model, batch, grad_accum=_grad_accum_for(batch_size))


def _family_workloads():
    """Model-zoo benchmark family builders (VERDICT r3 item 6): each returns
    (model, batch) at its measured suite configuration, so the perf story
    covers MOE/K>1, the MoPoE powerset, and VideoGPT video shapes — not just
    the bimodal PoE point."""
    import jax
    import jax.numpy as jnp

    from multimodal_vae_comparison_tpu.models import get_mixing
    from multimodal_vae_comparison_tpu.models.base import ModalitySpec

    def moe_dreg_k10(bs=24):
        import __graft_entry__ as ge
        m = ge._flagship(n_latents=LATENTS, seq_len=SEQ)
        model = get_mixing("moe")(specs=m.specs, n_latents=LATENTS,
                                  obj="dreg", K=10)
        return model, ge._batch(bs, seq_len=SEQ)

    def mopoe_polymnist(bs=128):
        specs = tuple(
            ModalitySpec(name=f"mod_{i+1}", encoder="PolyMNIST",
                         decoder="PolyMNIST", feature_dims=(28, 28, 3),
                         mod_type=f"m{i}", recon_loss="bce")
            for i in range(5))
        model = get_mixing("mopoe")(specs=specs, n_latents=24)
        k = jax.random.PRNGKey(0)
        batch = {f"mod_{i+1}": {"data": jax.random.uniform(
            jax.random.fold_in(k, i), (bs, 28, 28, 3)), "masks": None}
            for i in range(5)}
        return model, batch

    def videogpt_sprites(bs=16):
        specs = (
            ModalitySpec(name="mod_1", encoder="VideoGPT", decoder="VideoGPT",
                         feature_dims=(8, 64, 64, 3), mod_type="frames",
                         recon_loss="bce"),
            ModalitySpec(name="mod_2", encoder="FNN", decoder="FNN",
                         feature_dims=(9,), mod_type="actions",
                         recon_loss="bce"),
            ModalitySpec(name="mod_3", encoder="FNN", decoder="FNN",
                         feature_dims=(4, 6), mod_type="attributes",
                         recon_loss="bce"),
        )
        model = get_mixing("moe")(specs=specs, n_latents=32, obj="dreg",
                                  K=5, remat=True)
        k = jax.random.PRNGKey(0)
        ks = jax.random.split(k, 3)
        batch = {
            "mod_1": {"data": jax.random.uniform(ks[0], (bs, 8, 64, 64, 3)),
                      "masks": None},
            "mod_2": {"data": jax.random.uniform(ks[1], (bs, 9)),
                      "masks": None},
            "mod_3": {"data": jax.random.uniform(ks[2], (bs, 4, 6)),
                      "masks": None},
        }
        return model, batch

    def videogpt_sparse(bs=8):
        # the reference's VideoGPT attn_type='sparse' option (DeepSpeed
        # StridedSparsityConfig, nn_modules.py:624-882) as the Pallas
        # block-sparse kernel over 8*16*16 = 2048 flattened spacetime
        # tokens — the regime where the kernel wins the fwd+bwd A/B, so
        # this family's kernel_paths telemetry shows the Pallas path in a
        # measured end-to-end train step.
        specs = (
            ModalitySpec(name="mod_1", encoder="VideoGPTSparse",
                         decoder="VideoGPTSparse",
                         feature_dims=(8, 64, 64, 3), mod_type="frames",
                         recon_loss="bce"),
            ModalitySpec(name="mod_2", encoder="FNN", decoder="FNN",
                         feature_dims=(9,), mod_type="actions",
                         recon_loss="bce"),
        )
        model = get_mixing("moe")(specs=specs, n_latents=32, obj="dreg",
                                  K=5, remat=True)
        k = jax.random.PRNGKey(0)
        ks = jax.random.split(k, 2)
        batch = {
            "mod_1": {"data": jax.random.uniform(ks[0], (bs, 8, 64, 64, 3)),
                      "masks": None},
            "mod_2": {"data": jax.random.uniform(ks[1], (bs, 9)),
                      "masks": None},
        }
        return model, batch

    return {"moe_dreg_k10_cdsprites_bs24": moe_dreg_k10,
            "mopoe_polymnist_5mod_bs128": mopoe_polymnist,
            "videogpt_sprites_moe_dreg_k5_bs16": videogpt_sprites,
            "videogpt_sparseattn_T2048_moe_dreg_k5_bs8": videogpt_sparse}


def bench_family(name: str, builder, rtt_s: float, peaks: dict) -> dict:
    """Scan-timed throughput + MFU of one model-zoo family (same fetch-sync
    methodology as bench_jax, fewer scan steps — these are secondary
    curves, not the headline).  On RESOURCE_EXHAUSTED the family retries at
    half the batch (recorded as batch_fallback_from) instead of shipping a
    crash row — BENCH_r04's videogpt family OOM'd at bs16."""
    import inspect

    bs0 = inspect.signature(builder).parameters["bs"].default
    bs = bs0
    while True:
        try:
            row = _bench_family_at(name, builder, rtt_s, peaks, bs)
            if bs != bs0:
                row["batch_fallback_from"] = bs0
            return row
        except Exception as e:
            if "RESOURCE_EXHAUSTED" in str(e) and bs > 1:
                print(f"[bench] {name}: RESOURCE_EXHAUSTED at bs={bs}, "
                      f"retrying at bs={bs // 2}", file=sys.stderr)
                bs //= 2
                continue
            raise


def _bench_family_at(name: str, builder, rtt_s: float, peaks: dict,
                     bs_req: int) -> dict:
    import jax
    import jax.numpy as jnp

    scan_n = int(os.environ.get("BENCH_FAMILY_SCAN_STEPS", 100))
    model, batch = builder(bs=bs_req)
    state, batch, rng, raw_step = _assemble(model, batch)
    bs = next(v["data"].shape[0] for v in batch.values()
              if v.get("data") is not None)

    mxu = None
    try:
        from multimodal_vae_comparison_tpu.ops.flops import mxu_flops
        step = jax.jit(raw_step, donate_argnums=(0,))
        mxu = mxu_flops(step, state, batch, rng)["mxu_flops"]
    except Exception:
        pass

    def scan_steps_fn(state, batch, rng):
        def body(s, _):
            s, m = raw_step(s, batch, rng)
            return s, m["loss"]
        state, losses = jax.lax.scan(body, state, None, length=scan_n)
        return state, jnp.sum(losses.astype(jnp.float32))

    scan_steps = jax.jit(scan_steps_fn, donate_argnums=(0,))
    state, total = scan_steps(state, batch, rng)     # compile + warmup
    float(total)
    t0 = time.perf_counter()
    state, total = scan_steps(state, batch, rng)
    float(total)
    dt = max(time.perf_counter() - t0 - rtt_s, 1e-9)
    step_s = dt / scan_n
    n_chips = jax.device_count()
    calibrated = peaks.get("calibrated_peak_flops")
    row = {
        "family": name,
        "batch": bs,
        "samples_per_s_per_chip": round(bs / step_s / n_chips, 2),
        "step_ms_scan": round(step_s * 1e3, 3),
        "mxu_flops_per_step": mxu,
        "mfu_mxu_calibrated": (round(mxu / step_s / (calibrated * n_chips), 4)
                               if (mxu and calibrated) else None),
    }
    return row


def bench_jax(batch_size: int, peaks: dict, rtt_s: float) -> dict:
    """One measurement: per-step-fetch + scan step times, FLOPs, MFU."""
    import jax
    import jax.numpy as jnp

    state, batch, rng, raw_step = _build(batch_size)
    step = jax.jit(raw_step, donate_argnums=(0,))

    # FLOP accounting: XLA cost analysis (every HLO op) + analytic MXU-only
    flops = mxu = None
    compiled = None
    try:
        compiled = step.lower(state, batch, rng).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0)) or None
    except Exception:
        compiled = None
    try:
        from multimodal_vae_comparison_tpu.ops.flops import mxu_flops
        mxu = mxu_flops(step, state, batch, rng)["mxu_flops"]
    except Exception:
        pass

    # -- timing A: fetch the loss scalar after every step -------------------
    # reuse the AOT executable — remote compiles cost minutes per program
    # shape, and `step` would otherwise compile the identical program again
    run = compiled if compiled is not None else step
    state, metrics = run(state, batch, rng)           # (compile +) warmup
    float(metrics["loss"])                            # fetch = real sync
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, metrics = run(state, batch, rng)
        float(metrics["loss"])
    dt_fetch = time.perf_counter() - t0
    step_s_fetch = dt_fetch / STEPS

    # -- timing B: N steps inside ONE lax.scan dispatch, scalar out --------
    def scan_steps_fn(state, batch, rng):
        def body(s, _):
            s, m = raw_step(s, batch, rng)
            return s, m["loss"]
        state, losses = jax.lax.scan(body, state, None, length=SCAN_STEPS)
        # scalar that depends on every step's loss — the fetch can only
        # complete once all N steps have executed
        return state, jnp.sum(losses.astype(jnp.float32))

    scan_steps = jax.jit(scan_steps_fn, donate_argnums=(0,))
    state, total = scan_steps(state, batch, rng)      # compile + warmup
    float(total)
    t0 = time.perf_counter()
    state, total = scan_steps(state, batch, rng)
    float(total)
    dt_scan = max(time.perf_counter() - t0 - rtt_s, 1e-9)
    step_s_scan = dt_scan / SCAN_STEPS

    n_chips = jax.device_count()
    nominal = peaks.get("nominal_peak_flops")
    calibrated = peaks.get("calibrated_peak_flops")

    def _mfu(numer, denom_peak, step_s):
        if not (numer and denom_peak):
            return None
        return round(numer / step_s / (denom_peak * n_chips), 4)

    row = {
        "batch": batch_size,
        "grad_accum": _grad_accum_for(batch_size),
        "samples_per_s_per_chip": round(
            batch_size / step_s_scan / n_chips, 2),
        "samples_per_s_per_chip_fetch": round(
            batch_size / step_s_fetch / n_chips, 2),
        "step_ms_scan": round(step_s_scan * 1e3, 3),
        "step_ms_fetch": round(step_s_fetch * 1e3, 3),
        "flops_per_step": flops,
        "mxu_flops_per_step": mxu,
        "mfu_nominal": _mfu(flops, nominal, step_s_scan),
        "mfu_calibrated": _mfu(flops, calibrated, step_s_scan),
        "mfu_mxu_nominal": _mfu(mxu, nominal, step_s_scan),
        "mfu_mxu_calibrated": _mfu(mxu, calibrated, step_s_scan),
    }
    for key in ("mfu_nominal", "mfu_mxu_nominal"):
        v = row[key]
        assert v is None or v <= 1.0, (
            f"{key}={v} > 1.0 at batch={batch_size}: physically impossible — "
            "measurement or FLOP-counting bug; failing the bench.")
    return row


def bench_scan_epoch(batch_size: int = 24, n_steps: int = 400) -> dict:
    """End-to-end scan-epoch path (trainer.make_epoch_runner): staged
    HBM-resident epoch, on-device reshuffle, one dispatch per epoch."""
    import jax
    import jax.numpy as jnp
    import optax

    import __graft_entry__ as ge
    from multimodal_vae_comparison_tpu.training.trainer import (
        TrainState, make_epoch_runner)

    model = ge._flagship(n_latents=LATENTS, seq_len=SEQ)
    model = type(model)(specs=model.specs, n_latents=model.n_latents,
                        obj=model.obj, beta=model.beta, K=model.K,
                        dtype=_compute_dtype())
    big = ge._batch(batch_size * n_steps, seq_len=SEQ)
    epoch_data = jax.tree_util.tree_map(
        lambda x: (x.reshape((n_steps, batch_size) + x.shape[1:])
                   if x is not None else None), big)
    rng = jax.random.PRNGKey(0)
    small = jax.tree_util.tree_map(
        lambda x: x[0] if x is not None else None, epoch_data)
    params = model.init({"params": rng, "sample": rng}, small,
                        method=model.objective)
    from multimodal_vae_comparison_tpu.training.optim import make_optimizer
    tx = make_optimizer("adam", 1e-4)   # trainer path (per-leaf amsgrad)
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    epoch_fn = make_epoch_runner(model, tx, reshuffle=True)
    state, metrics = epoch_fn(state, epoch_data, rng)   # compile + warmup
    float(metrics["loss"])                              # fetch = real sync
    t0 = time.perf_counter()
    state, metrics = epoch_fn(state, epoch_data, rng)
    float(metrics["loss"])
    dt = time.perf_counter() - t0
    n_chips = jax.device_count()
    return {
        "batch": batch_size,
        "steps_per_epoch": n_steps,
        "epoch_s": round(dt, 4),
        "samples_per_s_per_chip": round(
            batch_size * n_steps / dt / n_chips, 2),
    }


def bench_torch() -> float:
    """Equivalent model in PyTorch on host CPU (reference's framework)."""
    import torch
    import torch.nn as tnn

    torch.manual_seed(0)

    class ImgEnc(tnn.Module):
        def __init__(self):
            super().__init__()
            self.convs = tnn.Sequential(
                tnn.Conv2d(3, 32, 4, 2, 1), tnn.SiLU(),
                tnn.Conv2d(32, 32, 4, 2, 1), tnn.SiLU(),
                tnn.Conv2d(32, 32, 4, 2, 1), tnn.SiLU(),
                tnn.Conv2d(32, 32, 4, 2, 1), tnn.SiLU())
            self.lin = tnn.Linear(32 * 16, 512)
            self.mu = tnn.Linear(512, LATENTS)
            self.lv = tnn.Linear(512, LATENTS)

        def forward(self, x):
            h = self.convs(x).flatten(1)
            h = self.lin(h)
            return self.mu(h), torch.softmax(self.lv(h), -1) + 1e-6

    class ImgDec(tnn.Module):
        def __init__(self):
            super().__init__()
            self.lin = tnn.Sequential(
                tnn.Linear(LATENTS, 512), tnn.ReLU(),
                tnn.Linear(512, 512), tnn.ReLU(),
                tnn.Linear(512, 32 * 16), tnn.ReLU())
            self.deconvs = tnn.Sequential(
                tnn.ConvTranspose2d(32, 32, 4, 2, 1), tnn.ReLU(),
                tnn.ConvTranspose2d(32, 32, 4, 2, 1), tnn.ReLU(),
                tnn.ConvTranspose2d(32, 32, 4, 2, 1), tnn.ReLU(),
                tnn.ConvTranspose2d(32, 3, 4, 2, 1))

        def forward(self, z):
            h = self.lin(z).view(-1, 32, 4, 4)
            return torch.sigmoid(self.deconvs(h)).clamp(1e-6, 1 - 1e-6)

    class TxtEnc(tnn.Module):
        def __init__(self):
            super().__init__()
            self.embed = tnn.Linear(27, 64)
            layer = tnn.TransformerEncoderLayer(64, 2, 128,
                                                batch_first=True)
            self.tr = tnn.TransformerEncoder(layer, 1)
            self.mu = tnn.Linear(64, LATENTS)
            self.lv = tnn.Linear(64, LATENTS)

        def forward(self, x):
            h = self.tr(self.embed(x)).mean(1)
            return self.mu(h), torch.softmax(self.lv(h), -1) + 1e-6

    class TxtDec(tnn.Module):
        def __init__(self):
            super().__init__()
            layer = tnn.TransformerDecoderLayer(LATENTS, 2, 128,
                                                batch_first=True)
            self.tr = tnn.TransformerDecoder(layer, 1)
            self.final = tnn.Linear(LATENTS, 27)
            self.q = tnn.Parameter(torch.zeros(SEQ, LATENTS),
                                   requires_grad=False)

        def forward(self, z):
            tgt = self.q.unsqueeze(0).expand(z.shape[0], -1, -1)
            return self.final(self.tr(tgt, z.unsqueeze(1)))

    enc1, dec1, enc2, dec2 = ImgEnc(), ImgDec(), TxtEnc(), TxtDec()
    params = (list(enc1.parameters()) + list(dec1.parameters())
              + list(enc2.parameters()) + list(dec2.parameters()))
    opt = torch.optim.Adam(params, lr=1e-4, amsgrad=True)
    img = torch.rand(BATCH, 3, 64, 64)
    txt = torch.nn.functional.one_hot(
        torch.randint(0, 27, (BATCH, SEQ)), 27).float()

    def poe(mus, svs):
        precision = 1.0 / (torch.stack(svs) ** 2 + 1e-8)
        denom = precision.sum(0) + 1.0
        return (torch.stack(mus) * precision).sum(0) / denom, (1.0 / denom).sqrt()

    def step():
        opt.zero_grad()
        m1, s1 = enc1(img)
        m2, s2 = enc2(txt)
        total = 0.0
        for experts in ([(m1, s1)], [(m2, s2)], [(m1, s1), (m2, s2)]):
            mu, sc = poe([e[0] for e in experts], [e[1] for e in experts])
            z = mu + sc * torch.randn_like(sc)
            rec_i = dec1(z)
            lp_i = (img * rec_i.log() + (1 - img) * (1 - rec_i).log()).sum()
            logits = dec2(z)
            lp_t = (txt * torch.log_softmax(logits, -1)).sum()
            kld = 0.5 * (sc ** 2 + mu ** 2 - 1 - (sc ** 2).log()).sum()
            total = total + (-(lp_i + lp_t - kld))
        total.backward()
        opt.step()

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(TORCH_STEPS):
        step()
    dt = time.perf_counter() - t0
    return BATCH * TORCH_STEPS / dt


def mesh_child(n_dev: int, global_batch: int) -> None:
    """Child process for --mesh: scan-step cost on an n-device virtual CPU
    mesh at a fixed global batch.  On this single-core host all virtual
    devices share one core, so wall-clock cannot show a speedup; the
    honest scaling signal is `flops_per_device` from XLA's cost analysis
    (the per-device program must shrink ~1/n), with wall time recorded to
    show the sharded program adds no collective overhead blow-up."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from multimodal_vae_comparison_tpu.parallel.mesh import (
        make_mesh, shard_batch)

    SCAN = 8
    state, batch, rng, raw_step = _build(global_batch)
    mesh = make_mesh(n_dev)
    batch = shard_batch(batch, mesh)

    def scan_steps_fn(state, batch, rng):
        def body(s, _):
            s, m = raw_step(s, batch, rng)
            return s, m["loss"]
        state, losses = jax.lax.scan(body, state, None, length=SCAN)
        return state, jnp.sum(losses.astype(jnp.float32))

    compiled = jax.jit(scan_steps_fn, donate_argnums=(0,)).lower(
        state, batch, rng).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    flops_dev = float(cost.get("flops", 0.0))
    state, total = compiled(state, batch, rng)
    float(total)
    t0 = time.perf_counter()
    state, total = compiled(state, batch, rng)
    float(total)
    dt = time.perf_counter() - t0
    print(json.dumps({"n_devices": n_dev, "global_batch": global_batch,
                      "step_ms": round(dt / SCAN * 1e3, 2),
                      "samples_per_s": round(global_batch * SCAN / dt, 1),
                      "flops_per_device_per_scan": flops_dev}))


def mesh_mode(global_batch: int = 128) -> None:
    rows = []
    for n in (1, 2, 4, 8):
        env = dict(os.environ)
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                            f" --xla_force_host_platform_device_count={n}")
        env["JAX_PLATFORMS"] = "cpu"
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--mesh-child", str(n), str(global_batch)],
            capture_output=True, text=True, env=env, timeout=1800)
        line = [ln for ln in out.stdout.splitlines()
                if ln.startswith("{")]
        if line:
            rows.append(json.loads(line[-1]))
        else:
            rows.append({"n_devices": n, "error": out.stderr[-500:]})
    result = {"mesh_scaling_cpu_virtual": rows,
              "note": ("single-core host: wall time is shared-core bound; "
                       "scaling evidence is flops_per_device shrinking ~1/n "
                       "at fixed global batch")}
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "MESH_SCALING.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))


def _wait_for_backend(max_wait_s: float) -> bool:
    """The remote TPU claim can be transiently unavailable (it stays wedged
    ~15 min after a killed TPU-attached process).  Probe in subprocesses so
    a failed init is never cached in this process; True once `jax.devices()`
    succeeds, False after max_wait_s."""
    deadline = time.time() + max_wait_s
    while True:
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                capture_output=True, timeout=600)
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.time() >= deadline:
            return False
        print("bench: accelerator backend unavailable, retrying...",
              file=sys.stderr)
        time.sleep(60)


def main():
    if "--mesh-child" in sys.argv:
        i = sys.argv.index("--mesh-child")
        mesh_child(int(sys.argv[i + 1]), int(sys.argv[i + 2]))
        return
    if "--mesh" in sys.argv:
        mesh_mode()
        return

    import jax
    platform_note = None
    if not _wait_for_backend(float(os.environ.get("BENCH_WAIT_S", 1500))):
        # still emit an honest JSON line rather than crashing with none
        global BATCHES, STEPS, SCAN_STEPS
        jax.config.update("jax_platforms", "cpu")
        platform_note = ("accelerator backend unavailable after wait; "
                         "measured on host CPU — NOT a TPU number")
        BATCHES = BATCHES[:1]   # the full curve takes hours on one CPU core
        STEPS = min(STEPS, 3)
        SCAN_STEPS = min(SCAN_STEPS, 10)
        os.environ.setdefault("BENCH_CALIB_ITERS", "2")
        os.environ.setdefault("BENCH_CALIB_SIZES", "512,1024")
    from multimodal_vae_comparison_tpu.main import enable_compilation_cache
    enable_compilation_cache()

    nominal = _nominal_peak(jax.devices()[0])
    rtt_s = null_round_trip_s()
    calib = calibrate_peak(rtt_s)
    calib["null_round_trip_ms"] = round(rtt_s * 1e3, 2)
    peaks = {"nominal_peak_flops": nominal,
             "calibrated_peak_flops": calib["calibrated_peak_flops"]}
    curve = [bench_jax(b, peaks, rtt_s) for b in BATCHES]
    head = curve[0]
    best = max(curve, key=lambda r: r["samples_per_s_per_chip"])
    try:
        scan_epoch = bench_scan_epoch(n_steps=10 if platform_note else 400)
    except Exception as e:
        scan_epoch = {"error": f"{type(e).__name__}: {e}"}
    families = []
    if os.environ.get("BENCH_FAMILIES", "1") != "0" and not platform_note:
        from multimodal_vae_comparison_tpu.ops.pallas import telemetry
        for name, builder in _family_workloads().items():
            telemetry.reset()
            try:
                row = bench_family(name, builder, rtt_s, peaks)
                row["kernel_paths"] = telemetry.summary()
            except Exception as e:
                row = {"family": name, "error": f"{type(e).__name__}: {e}"}
            families.append(row)
    try:
        torch_sps = bench_torch()
    except Exception:
        torch_sps = None
    sps = head["samples_per_s_per_chip"]
    out = {
        "metric": ("train samples/sec/chip, bimodal MVAE (PoE, CdSprites+ L2 "
                   "shapes, bs=%d, bf16), scan-timed (N steps in one "
                   "dispatch, fetch-synced)" % BATCHES[0]),
        "value": sps,
        "unit": "samples/s/chip",
        # torch baseline = the same model in PyTorch on 1 host CPU core (the
        # only torch target in this image; the reference hardcodes .cuda()
        # and names no GPU).  A CPU-core ratio is NOT a GPU comparison —
        # read the absolute samples/s and mfu_*_calibrated first.
        "vs_baseline": round(sps / torch_sps, 2) if torch_sps else None,
        "baseline_caveat": ("vs_baseline divides by a 1-core CPU torch "
                            "measurement; prefer value + mfu_mxu_calibrated"),
        "device_kind": getattr(jax.devices()[0], "device_kind", "unknown"),
        "step_ms_scan": head["step_ms_scan"],
        "step_ms_fetch": head["step_ms_fetch"],
        "mfu_nominal": head["mfu_nominal"],
        "mfu_mxu_nominal": head["mfu_mxu_nominal"],
        "nominal_peak_bf16_flops": nominal,
        "calibration": calib,
        "mfu_definition": (
            "mfu_nominal = XLA cost-analysis FLOPs of the whole train step "
            "(fwd+bwd+optimizer) / scan-timed step seconds / nominal chip "
            "peak bf16; mfu_mxu_nominal = analytic dot_general+conv FLOPs "
            "only (ops/flops.py) over the same denominator; *_calibrated = "
            "same numerators over the measured matmul-sweep peak "
            "(calibration field).  All timings are single-dispatch lax.scan "
            "over N sequential steps, synced by fetching a scalar that "
            "depends on every step (block_until_ready does not reliably "
            "wait on this remote platform), minus the measured null round "
            "trip.  mfu_*_nominal > 1.0 fails the bench by assertion."),
        "curve": curve,
        "best": best,
        "families": families,
        "scan_epoch": scan_epoch,
        "torch_cpu_samples_per_s": round(torch_sps, 2) if torch_sps else None,
    }
    if platform_note:
        out["platform_note"] = platform_note
    try:
        from multimodal_vae_comparison_tpu.ops.pallas import telemetry
        out["kernel_paths"] = telemetry.summary()
    except Exception:
        pass
    print(json.dumps(out))


if __name__ == "__main__":
    main()
