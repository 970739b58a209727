"""Cross-modal latent analysis: CCA between per-modality posteriors.

Analog of the reference's mnistsvhn_helper.py CCA analysis (226 LoC with
FastText embeddings; embeddings are gated offline).  Measures how correlated
the modality-specific latent spaces are — a proxy for shared-information
capture.
"""
from __future__ import annotations

from typing import Dict

import numpy as np


def latent_cca_correlation(exp, n: int = 1000, n_components: int = 4) -> Dict[str, float]:
    """Mean canonical correlation between each pair of modality posteriors."""
    from sklearn.cross_decomposition import CCA
    batch, _ = exp.get_test_samples(min(n, exp.datamod.n_val))
    out = exp.forward({m: batch[m] for m in exp.mod_names},
                      present=tuple(exp.mod_names))
    latents = {}
    for name in exp.mod_names:
        q = out.mods[name].encoder_dist or out.mods[name].joint_dist
        latents[name] = np.asarray(q.loc)
    results = {}
    names = list(latents)
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            a, b = latents[names[i]], latents[names[j]]
            k = min(n_components, a.shape[1], b.shape[1])
            cca = CCA(n_components=k, max_iter=1000)
            xa, xb = cca.fit_transform(a, b)
            corrs = [np.corrcoef(xa[:, c], xb[:, c])[0, 1] for c in range(k)]
            results[f"cca_{names[i]}_{names[j]}"] = float(np.mean(corrs))
    return results
