#!/usr/bin/env python
"""Benchmark: training throughput of the flagship bimodal MVAE.

Workload = BASELINE.json config #2: MVAE (product-of-experts) image+text on
CdSprites+ L2 shapes (64x64x3 images, 45-char one-hot captions), batch 24,
ELBO objective over all modality subsets — the reference's training-cost
envelope (BASELINE.md).

Prints ONE JSON line:
  {"metric": ..., "value": <samples/s/chip>, "unit": ..., "vs_baseline": ...}

vs_baseline is measured against an equivalent PyTorch implementation of the
same model/objective running on this host's CPU (the only PyTorch execution
target available here — the reference hardcodes .cuda() and its GPU is
unspecified).  The torch model mirrors our architecture 1:1 so the ratio is
an apples-to-apples hardware+framework comparison at identical FLOPs.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BATCH = int(os.environ.get("BENCH_BATCH", 24))
BATCHES = [int(b) for b in
           os.environ.get("BENCH_BATCHES", f"{BATCH},256,1024,4096").split(",")]
STEPS = int(os.environ.get("BENCH_STEPS", 30))
TORCH_STEPS = int(os.environ.get("BENCH_TORCH_STEPS", 8))
SEQ = 45
LATENTS = 16

# peak dense bf16 FLOP/s per chip, by jax device_kind (public spec sheets)
PEAK_BF16 = {
    "TPU v4": 275e12,
    "TPU v5e": 197e12,
    "TPU v5 lite": 197e12,
    "TPU v5p": 459e12,
    "TPU v5": 459e12,
    "TPU v6e": 918e12,
    "TPU v6 lite": 918e12,
}


def _peak_flops(device) -> float:
    kind = getattr(device, "device_kind", "")
    for k, v in PEAK_BF16.items():
        if kind.startswith(k):
            return v
    return None


def bench_jax(batch_size: int) -> dict:
    """One measurement: samples/s/chip, step time, XLA-counted FLOPs, MFU."""
    import jax

    from multimodal_vae_comparison_tpu.main import enable_compilation_cache
    enable_compilation_cache()
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
    step = make_train_step(model, tx)
    # analytic MXU-only FLOPs (dot_general + conv) of the full step — the
    # denominator-honest utilization number (see ops/flops.py docstring)
    try:
        from multimodal_vae_comparison_tpu.ops.flops import mxu_flops
        mxu = mxu_flops(step, state, batch, rng)["mxu_flops"]
    except Exception:
        mxu = None
    # AOT-compile once; the compiled object both executes and reports the
    # XLA-counted FLOPs of the whole step (fwd+bwd+optimizer)
    flops = None
    try:
        lowered = step.lower(state, batch, rng)
        compiled = lowered.compile()
        step = compiled
        try:
            ca = compiled.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            flops = float(ca.get("flops", 0.0)) or None
        except Exception:
            flops = None
    except Exception:
        pass  # fall back to the plain jitted callable
    # warmup / compile
    state, metrics = step(state, batch, rng)
    jax.block_until_ready(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, metrics = step(state, batch, rng)
    jax.block_until_ready(metrics["loss"])
    dt = time.perf_counter() - t0
    n_chips = jax.device_count()
    step_s = dt / STEPS
    peak = _peak_flops(jax.devices()[0])
    mfu = (flops / step_s / (peak * n_chips)) if (flops and peak) else None
    mfu_mxu = (mxu / step_s / (peak * n_chips)) if (mxu and peak) else None
    return {
        "batch": batch_size,
        "samples_per_s_per_chip": round(batch_size * STEPS / dt / n_chips, 2),
        "step_ms": round(step_s * 1e3, 3),
        "flops_per_step": flops,
        "mfu": round(mfu, 4) if mfu is not None else None,
        "mxu_flops_per_step": mxu,
        "mfu_mxu": round(mfu_mxu, 4) if mfu_mxu is not None else None,
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


def main():
    import jax
    curve = [bench_jax(b) for b in BATCHES]
    head = curve[0]
    best = max(curve, key=lambda r: r["samples_per_s_per_chip"])
    try:
        torch_sps = bench_torch()
    except Exception:
        torch_sps = None
    sps = head["samples_per_s_per_chip"]
    out = {
        "metric": ("train samples/sec/chip, bimodal MVAE (PoE, CdSprites+ L2 "
                   "shapes, bs=%d, bf16) vs equivalent PyTorch on host CPU "
                   "(1 core — the only torch target in this image; the "
                   "reference hardcodes .cuda() and names no GPU)" % BATCHES[0]),
        "value": sps,
        "unit": "samples/s/chip",
        "vs_baseline": round(sps / torch_sps, 2) if torch_sps else None,
        "device_kind": getattr(jax.devices()[0], "device_kind", "unknown"),
        "mfu": head["mfu"],
        "mfu_mxu": head["mfu_mxu"],
        "step_ms": head["step_ms"],
        "flops_per_step": head["flops_per_step"],
        "mxu_flops_per_step": head["mxu_flops_per_step"],
        "peak_bf16_flops": _peak_flops(jax.devices()[0]),
        "mfu_definition": ("mfu = XLA cost-analysis FLOPs of the whole train "
                           "step (MXU matmul + VPU vector work) / step time "
                           "/ chip peak bf16 — can nominally exceed 1.0 when "
                           "VPU and MXU overlap; mfu_mxu = analytic "
                           "dot_general+conv FLOPs only (ops/flops.py) over "
                           "the same denominator — the strict MXU "
                           "utilization number"),
        "curve": curve,
        "best": best,
        "torch_cpu_samples_per_s": round(torch_sps, 2) if torch_sps else None,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
