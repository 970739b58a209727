"""Epoch-end visualizations: recon grids, traversals, t-SNE, KL plots.

Host-side analog of the reference visualization stack
(multimodal_compare/visualization.py + trainer.py:156-239 +
utils.py:484-577): all plotting runs on fetched numpy arrays; the device only
produces latents/reconstructions.  Artifacts land under
``results/<exp>/version_N/visuals/epoch_K/`` exactly like the reference.
"""
from __future__ import annotations

import os
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_vae_comparison_tpu.models.distributions import Normal

TRAVERSAL_RANGES = (6, 4, 2, 1)   # reference trainer.py:229


def turn_text2image(strings: List[str], img_size=(64, 192, 3)) -> np.ndarray:
    """Render strings onto white tiles (reference utils.py:500-510)."""
    import cv2
    out = []
    for s in strings:
        img = np.ones(img_size, dtype=np.uint8) * 255
        for i, line in enumerate([s[j:j + 28] for j in range(0, len(s), 28)][:4]):
            cv2.putText(img, line, (2, 12 + 14 * i), cv2.FONT_HERSHEY_SIMPLEX,
                        0.3, (0, 0, 0), 1, cv2.LINE_AA)
        out.append(img)
    return np.stack(out)


def _to_tiles(dataset, decoded, img_size) -> np.ndarray:
    """Modality output -> uint8 image tiles for grid assembly."""
    if isinstance(decoded, np.ndarray) and decoded.dtype == np.uint8:
        arr = decoded
        if arr.ndim == 5:   # video: take first frame
            arr = arr[:, 0]
        if arr.shape[-1] == 1:
            arr = np.repeat(arr, 3, -1)
        return arr
    return turn_text2image([str(x) for x in decoded], img_size)


def save_video_gif(frames_batch: np.ndarray, path: str) -> None:
    """Write a batch of video reconstructions as one animated GIF, frames
    tiled horizontally per timestep (reference GIF recon writer,
    datasets.py:601-614)."""
    import imageio
    frames_batch = np.asarray(frames_batch)
    if frames_batch.dtype != np.uint8:
        frames_batch = (np.clip(frames_batch, 0, 1) * 255).astype(np.uint8)
    t = frames_batch.shape[1]
    frames = [np.hstack(list(frames_batch[:, i])) for i in range(t)]
    imageio.mimsave(path, frames, duration=0.15)


def save_grid(rows: List[np.ndarray], path: str) -> None:
    import cv2
    h = max(r.shape[1] for r in rows)
    w = max(r.shape[2] for r in rows)
    canvas = []
    for r in rows:
        padded = np.ones((r.shape[0], h, w, 3), np.uint8) * 255
        padded[:, :r.shape[1], :r.shape[2]] = r
        canvas.append(np.hstack(list(padded)))
    grid = np.vstack(canvas)
    cv2.imwrite(path, cv2.cvtColor(grid, cv2.COLOR_RGB2BGR))


def save_reconstructions(trainer, epoch_dir: str, n: int = 8) -> None:
    """Full cross-generation matrix over modality subsets
    (reference trainer.py:180-215)."""
    batch = next(trainer.datamodule.batches("val", batch_size=n,
                                            drop_remainder=False))
    model, params = trainer.model, trainer.state.params
    names = model.mod_names
    for present in [(nme,) for nme in names] + [tuple(names)]:
        out = model.apply(params, batch, rngs={"sample": jax.random.PRNGKey(0)},
                          method=lambda m, b: m.forward(b, present))
        rows = []
        for i, nm in enumerate(names):
            ds = trainer.datamodule.datasets[i]
            mo = out.mods[nm]
            if mo.decoder_dist is None:
                continue
            recon = np.asarray(mo.decoder_dist.mean[0])
            decoded = ds.decode_output(recon, batch[nm].get("masks"))
            if isinstance(decoded, np.ndarray) and decoded.ndim == 5:
                save_video_gif(decoded[:4], os.path.join(
                    epoch_dir, f"recon_video_{nm}.gif"))
            rows.append(_to_tiles(ds, decoded, ds.text2img_size))
            gt = ds.decode_output(np.asarray(batch[nm]["data"]),
                                  batch[nm].get("masks"))
            rows.append(_to_tiles(ds, gt, ds.text2img_size))
        tag = "_".join(present)
        save_grid(rows, os.path.join(epoch_dir, f"recon_from_{tag}.png"))


def save_joint_samples(trainer, epoch_dir: str, n: int = 8) -> None:
    """Prior samples + per-dimension traversals at 4 ranges
    (reference trainer.py:217-239)."""
    model, params = trainer.model, trainer.state.params
    D = model.n_latents
    z_prior = jax.random.normal(jax.random.PRNGKey(1), (1, n, D))
    variables = params
    for rng_val in TRAVERSAL_RANGES:
        rows = []
        # traversal matrix: each row varies one latent dim over the range
        grid = np.zeros((D, n, D), np.float32)
        sweep = np.linspace(-rng_val, rng_val, n)
        for d in range(D):
            grid[d, :, d] = sweep
        z = jnp.asarray(grid.reshape(1, D * n, D))
        for i, nm in enumerate(model.mod_names):
            ds = trainer.datamodule.datasets[i]
            dist = model.apply(variables, nm, z,
                               method=lambda m, name, zz: m.decode_mod(name, zz))
            recon = np.asarray(dist.mean[0])
            decoded = ds.decode_output(recon)
            tiles = _to_tiles(ds, decoded, ds.text2img_size)
            rows = [tiles[d * n:(d + 1) * n] for d in range(D)]
            save_grid(rows, os.path.join(
                epoch_dir, f"traversals_{nm}_pm{rng_val}.png"))
    # joint random samples
    for i, nm in enumerate(model.mod_names):
        ds = trainer.datamodule.datasets[i]
        dist = model.apply(variables, nm, z_prior,
                           method=lambda m, name, zz: m.decode_mod(name, zz))
        decoded = ds.decode_output(np.asarray(dist.mean[0]))
        save_grid([_to_tiles(ds, decoded, ds.text2img_size)],
                  os.path.join(epoch_dir, f"joint_samples_{nm}.png"))


def analyse_data(trainer, epoch_dir: str, max_points: int = 512) -> None:
    """Latent t-SNE + per-dimension KL boxplots
    (reference trainer.py:242-272, visualization.py:78-135)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    model, params = trainer.model, trainer.state.params
    batch = next(trainer.datamodule.batches(
        "val", batch_size=min(max_points, max(trainer.datamodule.n_val, 2)),
        drop_remainder=False))
    out = model.apply(params, batch, rngs={"sample": jax.random.PRNGKey(2)},
                      method=lambda m, b: m.forward(b, m.mod_names))
    labels = trainer.datamodule.labels_val
    for nm in model.mod_names:
        mo = out.mods[nm]
        if mo.latents is None:
            continue
        z = np.asarray(mo.latents[0])
        # t-SNE
        try:
            from sklearn.manifold import TSNE
            emb = TSNE(n_components=2, init="pca",
                       perplexity=min(30, max(2, len(z) // 4))).fit_transform(z)
            fig, ax = plt.subplots(figsize=(6, 6))
            if labels is not None:
                labs = ["|".join(l) if isinstance(l, (list, tuple)) else str(l)
                        for l in labels[: len(z)]]
                uniq = sorted(set(labs))[:20]
                for u in uniq:
                    m = [i for i, l in enumerate(labs) if l == u]
                    ax.scatter(emb[m, 0], emb[m, 1], s=8, label=u)
                ax.legend(fontsize=5, markerscale=0.6)
            else:
                ax.scatter(emb[:, 0], emb[:, 1], s=8)
            fig.savefig(os.path.join(epoch_dir, f"tsne_{nm}.png"), dpi=120)
            plt.close(fig)
        except Exception:
            pass
        # per-dimension KL boxplot vs N(0,1)
        q = mo.encoder_dist or mo.joint_dist
        if q is not None:
            kld = np.asarray(Normal(q.loc, q.scale).kl(
                Normal(jnp.zeros_like(q.loc), jnp.ones_like(q.scale))))
            fig, ax = plt.subplots(figsize=(8, 4))
            ax.boxplot([kld[:, d] for d in range(kld.shape[1])])
            ax.set_xlabel("latent dim")
            ax.set_ylabel("KL(q||p)")
            fig.savefig(os.path.join(epoch_dir, f"kl_dims_{nm}.png"), dpi=120)
            plt.close(fig)


def epoch_visualizations(trainer, epoch: int) -> None:
    epoch_dir = os.path.join(trainer.cfg.get_vis_dir(), f"epoch_{epoch}")
    os.makedirs(epoch_dir, exist_ok=True)
    save_reconstructions(trainer, epoch_dir)
    save_joint_samples(trainer, epoch_dir)
    analyse_data(trainer, epoch_dir)
