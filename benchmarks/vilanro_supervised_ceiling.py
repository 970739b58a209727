#!/usr/bin/env python
"""Supervised ceiling for VILANRO endpoint prediction (rounds 4-5).

Question this answers: can ANY model predict the trajectory endpoint from
(image, instruction) on the collected data, or is the VAE's failure
(val aux RMSE 19.5 cm = chance vs 4 cm train) a property of the data?

Round-4 ran the ``baseline`` architecture (same Enc_CNNSpatial trunk, text
joined only AFTER global pooling) and measured ~0.15 m train AND val — and
concluded "data-bounded".  Round-5 re-examined that conclusion two ways:

* a pure-numpy alignment diagnostic (no learning): blob-centroid of the
  instructed object vs the trajectory endpoint on D1way_r4 gives median
  1.5 cm and endpoint-nearer-to-instructed-than-any-distractor 98.4% —
  the (image, instruction) -> endpoint map IS carried by the data;
* the ``film`` architecture below: the SAME data, but the instruction
  FiLM-modulates the conv trunk BEFORE spatial softmax, so the attention
  maps can select the instructed object.  The round-4 baseline could not
  represent selection spatially (text entered after pooling) and its three
  stride-2 convs reduced 3-px object blobs to sub-pixel activations at
  8x8 — an ARCHITECTURE bound, not a data bound.

    python benchmarks/vilanro_supervised_ceiling.py data/vilanro/D1way_r5
    python benchmarks/vilanro_supervised_ceiling.py data/vilanro/D1way_r4 \
        --arch baseline   # reproduce the round-4 probe

Reference protocol being bounded: vilanro_test.py:277-346 (open-loop
endpoint success at 5 cm tolerance).
"""
import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn


class EndpointNet(nn.Module):
    """Round-4 baseline: spatial-softmax image trunk + masked-mean
    instruction embedding joined after pooling (kept for comparison)."""

    hid: int = 32
    n_maps: int = 32

    @nn.compact
    def __call__(self, img, txt, mask):
        h = img
        for _ in range(3):
            h = nn.silu(nn.Conv(self.hid, (4, 4), strides=2, padding=1)(h))
        h = nn.Conv(self.n_maps, (3, 3), padding=1)(h)
        b, hh, ww, c = h.shape
        logits = h.reshape(b, hh * ww, c)
        attn = jax.nn.softmax(logits, axis=1).reshape(b, hh, ww, c)
        ys = jnp.linspace(-1, 1, hh)[None, :, None, None]
        xs = jnp.linspace(-1, 1, ww)[None, None, :, None]
        kx = jnp.sum(attn * xs, (1, 2))
        ky = jnp.sum(attn * ys, (1, 2))
        t = nn.Dense(64)(txt)                      # (B, L, 64)
        m = mask.astype(t.dtype)[..., None]
        t = (t * m).sum(1) / jnp.maximum(m.sum(1), 1.0)
        f = jnp.concatenate([kx, ky, h.mean((1, 2)), t], -1)
        f = nn.silu(nn.Dense(256)(f))
        f = nn.silu(nn.Dense(256)(f))
        return nn.Dense(3)(f)


class FiLMEndpointNet(nn.Module):
    """Round-5 probe: the instruction FiLM-modulates every conv block, so
    spatial-softmax attention can land ON the instructed object (selection
    happens in image space, where it is a trivially learnable color/shape
    match) instead of after pooling (where it needs the MLP to decode
    keypoint-slot identity)."""

    hid: int = 48
    n_maps: int = 16

    @nn.compact
    def __call__(self, img, txt, mask):
        t = nn.Dense(64)(txt)                      # (B, L, 64)
        m = mask.astype(t.dtype)[..., None]
        temb = (t * m).sum(1) / jnp.maximum(m.sum(1), 1.0)
        temb = nn.silu(nn.Dense(128)(temb))
        h = img
        for stride in (2, 2, 1):
            k = (4, 4) if stride == 2 else (3, 3)
            h = nn.Conv(self.hid, k, strides=stride, padding=1)(h)
            gam = nn.Dense(self.hid)(temb)[:, None, None, :]
            bet = nn.Dense(self.hid)(temb)[:, None, None, :]
            h = nn.silu(h * (1.0 + gam) + bet)
        h = nn.Conv(self.n_maps, (3, 3), padding=1)(h)
        b, hh, ww, c = h.shape
        temp = self.param("ss_log_temp", nn.initializers.zeros, (1,))
        logits = (h * jnp.exp(temp)).reshape(b, hh * ww, c)
        attn = jax.nn.softmax(logits, axis=1).reshape(b, hh, ww, c)
        ys = jnp.linspace(-1, 1, hh)[None, :, None, None]
        xs = jnp.linspace(-1, 1, ww)[None, None, :, None]
        kx = jnp.sum(attn * xs, (1, 2))
        ky = jnp.sum(attn * ys, (1, 2))
        presence = h.mean((1, 2))
        f = jnp.concatenate([kx, ky, presence, temb], -1)
        f = nn.silu(nn.Dense(256)(f))
        f = nn.silu(nn.Dense(256)(f))
        return nn.Dense(3)(f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("data_dir", nargs="?", default="data/vilanro/D1way_r4")
    ap.add_argument("--arch", choices=("film", "baseline"), default="film")
    ap.add_argument("--epochs", type=int,
                    default=int(os.environ.get("CEILING_EPOCHS", 200)))
    args = ap.parse_args()
    from multimodal_vae_comparison_tpu.data.datasets import VILANRO

    # images kept uint8 end-to-end (a 128px set is 2.8 GB as fp32); the
    # jitted step converts per-batch on device
    with open(os.path.join(args.data_dir, "image_final.pkl"), "rb") as f:
        imgs = np.stack(pickle.load(f)).astype(np.uint8)
    txt_ds = VILANRO(os.path.join(args.data_dir, "instructions_final.pkl"),
                     None, "language")
    act_ds = VILANRO(os.path.join(args.data_dir, "endeff_actions_final.pkl"),
                     None, "action_waypoints")
    txts, tmask = txt_ds.get_data("train")
    acts, _ = act_ds.get_data("train")
    ep = acts[:, -1, :3].astype(np.float32)          # endpoint target
    n = len(imgs)
    rng = np.random.default_rng(0)
    order = rng.permutation(n)
    n_val = max(n // 10, 1)
    vi, ti = order[:n_val], order[n_val:]
    print(f"N={n} train={len(ti)} val={len(vi)} img={imgs.shape[1:]} "
          f"arch={args.arch}; "
          f"target norm mean={np.linalg.norm(ep, axis=1).mean():.3f}",
          flush=True)
    chance = float(np.sqrt(((ep[vi] - ep[ti].mean(0)) ** 2).sum(1).mean()))
    print(f"chance (predict train-mean) val RMSE: {chance:.4f} m", flush=True)

    model = FiLMEndpointNet() if args.arch == "film" else EndpointNet()
    k = jax.random.PRNGKey(0)
    params = model.init(k, jnp.zeros((1,) + imgs.shape[1:], jnp.float32),
                        jnp.zeros((1,) + txts.shape[1:]),
                        jnp.zeros((1, txts.shape[1]), bool))
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"params: {n_params:,}", flush=True)
    tx = optax.adam(3e-4)
    opt = tx.init(params)
    bs = 128
    nb = len(ti) // bs

    xb = jnp.asarray(imgs[ti][: nb * bs].reshape(nb, bs, *imgs.shape[1:]))
    tb = jnp.asarray(txts[ti][: nb * bs].reshape(nb, bs, *txts.shape[1:]))
    mb = jnp.asarray(tmask[ti][: nb * bs].reshape(nb, bs, -1))
    yb = jnp.asarray(ep[ti][: nb * bs].reshape(nb, bs, 3))

    @jax.jit
    def epoch(params, opt, xb, tb, mb, yb):
        def body(carry, xtmy):
            params, opt = carry
            x, t, m, y = xtmy
            x = x.astype(jnp.float32) / 255.0

            def loss_fn(p):
                return jnp.mean(jnp.sum(
                    (model.apply(p, x, t, m) - y) ** 2, -1))
            loss, g = jax.value_and_grad(loss_fn)(params)
            up, opt = tx.update(g, opt)
            return (optax.apply_updates(params, up), opt), loss
        (params, opt), losses = jax.lax.scan(body, (params, opt),
                                             (xb, tb, mb, yb))
        return params, opt, losses.mean()

    xv = jnp.asarray(imgs[vi])
    tv = jnp.asarray(txts[vi])
    mv = jnp.asarray(tmask[vi])
    yv = jnp.asarray(ep[vi])

    @jax.jit
    def val_rmse(params):
        pred = model.apply(params, xv.astype(jnp.float32) / 255.0, tv, mv)
        return jnp.sqrt(jnp.mean(jnp.sum((pred - yv) ** 2, -1)))

    for e in range(args.epochs):
        params, opt, tr = epoch(params, opt, xb, tb, mb, yb)
        if e % 10 == 0 or e == args.epochs - 1:
            print(f"epoch {e}: train mse {float(tr):.5f} "
                  f"val RMSE {float(val_rmse(params)):.4f} m", flush=True)
    print(f"FINAL supervised-ceiling val RMSE: "
          f"{float(val_rmse(params)):.4f} m (chance {chance:.4f}, "
          f"arch {args.arch}, data {args.data_dir})",
          flush=True)


if __name__ == "__main__":
    main()
