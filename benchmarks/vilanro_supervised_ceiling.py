#!/usr/bin/env python
"""Supervised ceiling for VILANRO endpoint prediction (round-4 diagnostic).

Question this answers: can ANY model predict the trajectory endpoint from
(image, instruction) on the collected data, or is the VAE's failure
(val aux RMSE 19.5 cm = chance vs 4 cm train) a property of the data?

Trains a small DIRECTLY-SUPERVISED net — the same Enc_CNNSpatial conv trunk
+ instruction embedding, no VAE, no ELBO, plain MSE on the endpoint — on
the same train split the VAE sees, and reports held-out RMSE.  Outcomes:
  * val RMSE << 19.5 cm  -> the data supports it; the VAE objective/arch is
    the problem (capacity split across recon terms, posterior noise, ...)
  * val RMSE ~ 19.5 cm   -> the (image, instruction) -> endpoint map is not
    learnable from this data (rendering ambiguity / hindsight-chunk EE
    state not visible) — fix the DATA, not the model.

    python benchmarks/vilanro_supervised_ceiling.py data/vilanro/D1way_r4
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn


class EndpointNet(nn.Module):
    """Spatial-softmax image trunk + masked-mean instruction embedding."""

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


def main():
    data_dir = sys.argv[1] if len(sys.argv) > 1 else "data/vilanro/D1way_p2"
    from multimodal_vae_comparison_tpu.data.datasets import VILANRO

    img_ds = VILANRO(os.path.join(data_dir, "image_final.pkl"), None,
                     "front RGB")
    txt_ds = VILANRO(os.path.join(data_dir, "instructions_final.pkl"), None,
                     "language")
    act_ds = VILANRO(os.path.join(data_dir, "endeff_actions_final.pkl"), None,
                     "action_waypoints")
    imgs, _ = img_ds.get_data("train")
    txts, tmask = txt_ds.get_data("train")
    acts, _ = act_ds.get_data("train")
    ep = acts[:, -1, :3].astype(np.float32)          # endpoint target
    n = len(imgs)
    rng = np.random.default_rng(0)
    order = rng.permutation(n)
    n_val = max(n // 10, 1)
    vi, ti = order[:n_val], order[n_val:]
    print(f"N={n} train={len(ti)} val={len(vi)}; "
          f"target norm mean={np.linalg.norm(ep, axis=1).mean():.3f}",
          flush=True)
    chance = float(np.sqrt(((ep[vi] - ep[ti].mean(0)) ** 2).sum(1).mean()))
    print(f"chance (predict train-mean) val RMSE: {chance:.4f} m", flush=True)

    model = EndpointNet()
    k = jax.random.PRNGKey(0)
    params = model.init(k, jnp.zeros((1,) + imgs.shape[1:]),
                        jnp.zeros((1,) + txts.shape[1:]),
                        jnp.zeros((1, txts.shape[1]), bool))
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

    @jax.jit
    def val_rmse(params):
        pred = model.apply(params, xv, tv, mv)
        return jnp.sqrt(jnp.mean(jnp.sum((pred - ep[vi]) ** 2, -1)))

    epochs = int(os.environ.get("CEILING_EPOCHS", 60))
    for e in range(epochs):
        params, opt, tr = epoch(params, opt, xb, tb, mb, yb)
        if e % 5 == 0 or e == epochs - 1:
            print(f"epoch {e}: train mse {float(tr):.5f} "
                  f"val RMSE {float(val_rmse(params)):.4f} m", flush=True)
    print(f"FINAL supervised-ceiling val RMSE: "
          f"{float(val_rmse(params)):.4f} m (chance {chance:.4f})",
          flush=True)


if __name__ == "__main__":
    main()
