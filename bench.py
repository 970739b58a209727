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

* **Two timings per batch size.**  `step_ms_scan` runs N train steps inside
  ONE `lax.scan` dispatch and blocks on the result — the device must execute
  all N sequential steps before the host sees the output, so this is an
  airtight device-time measurement and the steady-state number the
  framework's scan-epoch trainer actually achieves.  `step_ms_blocked`
  blocks on the full output tree after EVERY step — it additionally pays
  the host<->device round trip per step (the latency a per-step training
  loop with metric fetches would pay).  Round 2's pipelined-dispatch loop
  (block once after N async dispatches) is gone: on this remote-tunnel
  platform it under-measured per-step cost by >2x and produced physically
  impossible MFU>1 numbers.
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
STEPS = int(os.environ.get("BENCH_STEPS", 20))        # blocked-loop steps
SCAN_STEPS = int(os.environ.get("BENCH_SCAN_STEPS", 100))  # steps in one scan
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


def calibrate_peak() -> dict:
    """Measured bf16 matmul FLOP/s on this chip (scan-timed, one dispatch).

    body: carry = carry @ b — each iteration depends on the previous one,
    so XLA cannot elide or overlap-beyond-peak anything; the final block
    covers all iterations.
    """
    import jax
    import jax.numpy as jnp

    results = {}
    iters = int(os.environ.get("BENCH_CALIB_ITERS", 30))
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
            return c

        chain(a, b).block_until_ready()  # compile + warmup
        t0 = time.perf_counter()
        out = chain(a, b)
        out.block_until_ready()
        dt = time.perf_counter() - t0
        results[n] = 2.0 * n * n * n * iters / dt
    best = max(results.values())
    return {"matmul_tflops_by_size": {str(k): round(v / 1e12, 1)
                                      for k, v in results.items()},
            "calibrated_peak_flops": best}


def _build(batch_size):
    import jax
    import jax.numpy as jnp
    import optax

    import __graft_entry__ as ge
    from multimodal_vae_comparison_tpu.training.trainer import (
        TrainState, make_train_step)

    model = ge._flagship(n_latents=LATENTS, seq_len=SEQ)
    # bf16 compute path on TPU (params stay fp32)
    model = type(model)(specs=model.specs, n_latents=model.n_latents,
                        obj=model.obj, beta=model.beta, K=model.K,
                        dtype=jnp.bfloat16)
    batch = ge._batch(batch_size, seq_len=SEQ)
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng, "sample": rng}, batch,
                        method=model.objective)
    tx = optax.amsgrad(1e-4)
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    raw_step = make_train_step(model, tx, jit=False)
    return state, batch, rng, raw_step


def bench_jax(batch_size: int, peaks: dict) -> dict:
    """One measurement: blocked + scan step times, FLOPs, MFU (both peaks)."""
    import jax

    state, batch, rng, raw_step = _build(batch_size)
    step = jax.jit(raw_step, donate_argnums=(0,))

    # FLOP accounting: XLA cost analysis (every HLO op) + analytic MXU-only
    flops = mxu = None
    try:
        compiled = step.lower(state, batch, rng).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0)) or None
    except Exception:
        pass
    try:
        from multimodal_vae_comparison_tpu.ops.flops import mxu_flops
        mxu = mxu_flops(step, state, batch, rng)["mxu_flops"]
    except Exception:
        pass

    # -- timing A: block on the FULL output tree after every step ----------
    state, metrics = step(state, batch, rng)          # compile + warmup
    jax.block_until_ready((state, metrics))
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, metrics = step(state, batch, rng)
        jax.block_until_ready((state, metrics))
    dt_blocked = time.perf_counter() - t0
    step_s_blocked = dt_blocked / STEPS

    # -- timing B: N steps inside ONE lax.scan dispatch ---------------------
    def scan_steps_fn(state, batch, rng):
        def body(s, _):
            s, m = raw_step(s, batch, rng)
            return s, m["loss"]
        return jax.lax.scan(body, state, None, length=SCAN_STEPS)

    scan_steps = jax.jit(scan_steps_fn, donate_argnums=(0,))
    state, losses = scan_steps(state, batch, rng)     # compile + warmup
    jax.block_until_ready((state, losses))
    t0 = time.perf_counter()
    state, losses = scan_steps(state, batch, rng)
    jax.block_until_ready((state, losses))
    dt_scan = time.perf_counter() - t0
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
        "samples_per_s_per_chip": round(
            batch_size / step_s_scan / n_chips, 2),
        "samples_per_s_per_chip_blocked": round(
            batch_size / step_s_blocked / n_chips, 2),
        "step_ms_scan": round(step_s_scan * 1e3, 3),
        "step_ms_blocked": round(step_s_blocked * 1e3, 3),
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
                        dtype=jnp.bfloat16)
    big = ge._batch(batch_size * n_steps, seq_len=SEQ)
    epoch_data = jax.tree_util.tree_map(
        lambda x: (x.reshape((n_steps, batch_size) + x.shape[1:])
                   if x is not None else None), big)
    rng = jax.random.PRNGKey(0)
    small = jax.tree_util.tree_map(
        lambda x: x[0] if x is not None else None, epoch_data)
    params = model.init({"params": rng, "sample": rng}, small,
                        method=model.objective)
    tx = optax.amsgrad(1e-4)
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    epoch_fn = make_epoch_runner(model, tx, reshuffle=True)
    state, metrics = epoch_fn(state, epoch_data, rng)   # compile + warmup
    jax.block_until_ready((state, metrics))
    t0 = time.perf_counter()
    state, metrics = epoch_fn(state, epoch_data, rng)
    jax.block_until_ready((state, metrics))
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
    """Child process for --mesh: scan-step throughput on an n-device
    virtual CPU mesh at a fixed global batch (weak-scaling table)."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp  # noqa: F401

    from multimodal_vae_comparison_tpu.parallel.mesh import (
        make_mesh, shard_batch)

    state, batch, rng, raw_step = _build(global_batch)
    mesh = make_mesh(n_dev)
    batch = shard_batch(batch, mesh)

    def scan_steps_fn(state, batch, rng):
        def body(s, _):
            s, m = raw_step(s, batch, rng)
            return s, m["loss"]
        return jax.lax.scan(body, state, None, length=20)

    step = jax.jit(scan_steps_fn, donate_argnums=(0,))
    state, losses = step(state, batch, rng)
    jax.block_until_ready((state, losses))
    t0 = time.perf_counter()
    state, losses = step(state, batch, rng)
    jax.block_until_ready((state, losses))
    dt = time.perf_counter() - t0
    print(json.dumps({"n_devices": n_dev, "global_batch": global_batch,
                      "step_ms": round(dt / 20 * 1e3, 2),
                      "samples_per_s": round(global_batch * 20 / dt, 1)}))


def mesh_mode(global_batch: int = 512) -> None:
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
    print(json.dumps({"mesh_scaling_cpu_virtual": rows}, indent=1))


def main():
    if "--mesh-child" in sys.argv:
        i = sys.argv.index("--mesh-child")
        mesh_child(int(sys.argv[i + 1]), int(sys.argv[i + 2]))
        return
    if "--mesh" in sys.argv:
        mesh_mode()
        return

    import jax
    from multimodal_vae_comparison_tpu.main import enable_compilation_cache
    enable_compilation_cache()

    nominal = _nominal_peak(jax.devices()[0])
    calib = calibrate_peak()
    peaks = {"nominal_peak_flops": nominal,
             "calibrated_peak_flops": calib["calibrated_peak_flops"]}
    curve = [bench_jax(b, peaks) for b in BATCHES]
    head = curve[0]
    best = max(curve, key=lambda r: r["samples_per_s_per_chip"])
    try:
        scan_epoch = bench_scan_epoch()
    except Exception as e:
        scan_epoch = {"error": f"{type(e).__name__}: {e}"}
    try:
        torch_sps = bench_torch()
    except Exception:
        torch_sps = None
    sps = head["samples_per_s_per_chip"]
    out = {
        "metric": ("train samples/sec/chip, bimodal MVAE (PoE, CdSprites+ L2 "
                   "shapes, bs=%d, bf16), scan-timed (N steps in one "
                   "dispatch, block on result) vs equivalent PyTorch on host "
                   "CPU (1 core — the only torch target in this image; the "
                   "reference hardcodes .cuda() and names no GPU)"
                   % BATCHES[0]),
        "value": sps,
        "unit": "samples/s/chip",
        "vs_baseline": round(sps / torch_sps, 2) if torch_sps else None,
        "device_kind": getattr(jax.devices()[0], "device_kind", "unknown"),
        "step_ms_scan": head["step_ms_scan"],
        "step_ms_blocked": head["step_ms_blocked"],
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
            "over N sequential steps, blocked on the result — no pipelined "
            "dispatch.  mfu_*_nominal > 1.0 fails the bench by assertion."),
        "curve": curve,
        "best": best,
        "scan_epoch": scan_epoch,
        "torch_cpu_samples_per_s": round(torch_sps, 2) if torch_sps else None,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
