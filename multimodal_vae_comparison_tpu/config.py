"""YAML config system, schema-compatible with the reference toolkit.

The reference drives every experiment from a YAML file with top-level keys
(batch_size, epochs, exp_name, lr, mixing, n_latents, obj, optimizer, seed,
beta, K, viz_freq, test_split, dataset_name, labels, pre_trained, iterseeds)
plus per-modality blocks ``modality_1 .. modality_n`` (reference:
multimodal_compare/models/config_cls.py:8-138 and README schema).  We keep the
schema byte-compatible but validate it into typed dataclasses so that the rest
of the framework gets *static* structure at trace time (modality count, data
dims, subset lattice) instead of dynamic attribute lookups.

CLI override semantics match the reference: any flag whose name matches a
config key replaces the YAML value (config_cls.py:124-138).  Run directories
are created as ``results/<exp_name>/version_N`` with a dumped ``config.yml``
copy so that eval-time reloads work identically (config_cls.py:93-117).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, List, Optional

import yaml

# Per-modality defaults applied by the reference (config_cls.py:76-89).
_MOD_DEFAULTS = {
    "private_latents": None,
    "llik_scaling": 1,
    "prior": "normal",
    "test_datapath": None,
    "cond_on": None,
    "cond_always": False,
}

# required in every YAML; also CLI-overridable even when absent from it
_REQUIRED_KEYS = ("batch_size", "epochs", "lr", "n_latents")

_TOP_DEFAULTS = {
    "K": 1,
    "beta": 1.0,
    "seed": 1,
    "iterseeds": 1,
    "viz_freq": 1,
    "test_split": 0.1,
    "labels": None,
    "pre_trained": None,
    "optimizer": "adam",
    "obj": "elbo",
    "mixing": "moe",
    "exp_name": "experiment",
    "dataset_name": None,
    "precision": "32",
    # TPU-specific additions (absent keys are simply defaulted, so reference
    # configs run unmodified):
    "num_devices": None,          # None = all visible devices
    "prefetch": 2,                # host->device prefetch depth
    "donate_state": True,
    "log_every": 50,
    # None = auto (scan whole epochs on device when the dataset fits in HBM)
    "scan_epochs": None,
    "ckpt_freq": 1,
    "remat": False,
    # restart from this run dir's own last checkpoint if present
    "resume": False,
    # weight of the auxiliary endpoint-supervision loss (POE only): a small
    # head predicts the action-endpoint from the joint posterior of the
    # non-action modalities — direct latent grounding supervision
    "aux_endpoint": 0.0,
    # >1 = learnable mixture-of-Gaussians prior with this many components
    "prior_components": 1,
    # >1 = split each batch into this many microbatches and accumulate fp32
    # gradients before one optimizer update (same math, microbatch-sized
    # activation working set — keeps big batches out of the HBM-spill regime)
    "grad_accum": 1,
}


@dataclasses.dataclass
class ModalityConfig:
    """One ``modality_n`` block of the YAML config."""

    encoder: str
    decoder: str
    path: Optional[str] = None
    mod_type: str = "image"
    recon_loss: str = "bce"
    prior: str = "normal"
    llik_scaling: Any = 1
    private_latents: Optional[int] = None
    test_datapath: Optional[str] = None
    # decode this modality conditioned on another modality's raw data
    # (value: the other modality's mod_type or mod_n name); requires a
    # cond-aware decoder such as TransformerCond
    cond_on: Optional[str] = None
    # supply the conditioning on EVERY subset objective whenever the batch
    # carries the data (conditional-VAE semantics: the cond modality is an
    # observed variable).  Default False = only when the cond modality is
    # in the subset (leak-safe joint-VAE semantics)
    cond_always: bool = False
    # filled in by the data module from the dataset class
    feature_dims: Optional[List[int]] = None

    @property
    def name(self) -> str:
        return self._name

    def with_name(self, name: str) -> "ModalityConfig":
        self._name = name
        return self


class Config:
    """Parses a YAML path / dict / argparse namespace into a typed config.

    Mirrors the reference ``Config`` (config_cls.py): accepts a path to a YAML
    file, a path to a run dir containing ``config.yml``, or a plain dict;
    optional ``overrides`` replicate the CLI-args-override-YAML behaviour.
    """

    def __init__(self, source, overrides: Optional[Dict[str, Any]] = None,
                 eval_only: bool = False, results_root: str = "results"):
        self.eval_only = eval_only
        self.results_root = results_root
        self.params = self._load(source)
        if overrides:
            for name, value in overrides.items():
                # a known key absent from the YAML must still be overridable
                # (e.g. --K 10 on a config without a K: line) — restricting
                # to present keys silently trained with the default instead
                if value is not None and name != "cfg" and (
                        name in self.params or name in _TOP_DEFAULTS
                        or name in _REQUIRED_KEYS):
                    self.params[name] = value
        self._define_params()
        self.mPath: Optional[str] = None
        if not eval_only:
            self._setup_savedir()

    # -- parsing ------------------------------------------------------------

    @staticmethod
    def _load(source) -> Dict[str, Any]:
        if isinstance(source, dict):
            return dict(source)
        if isinstance(source, str):
            if os.path.isdir(source):
                source = os.path.join(source, "config.yml")
            if not os.path.isfile(source):
                raise ValueError(f"{source} is not a valid config path")
            with open(source) as f:
                return yaml.safe_load(f)
        raise ValueError(f"unsupported config source: {type(source)}")

    def _define_params(self) -> None:
        for key, default in _TOP_DEFAULTS.items():
            setattr(self, key, self.params.get(key, default))
        for key, value in self.params.items():
            if not key.startswith("modality_"):
                setattr(self, key, value)
        # required keys
        for key in _REQUIRED_KEYS:
            if key not in self.params:
                raise ValueError(f"config is missing required key '{key}'")
            setattr(self, key, self.params[key])
        self.lr = float(self.lr)
        self.beta = float(self.beta)
        self.K = int(self.K)
        self.n_latents = int(self.n_latents)
        self.mods: List[ModalityConfig] = []
        mod_keys = sorted(k for k in self.params if k.startswith("modality_"))
        for i, key in enumerate(mod_keys):
            block = dict(_MOD_DEFAULTS)
            block.update(self.params[key] or {})
            known = {f.name for f in dataclasses.fields(ModalityConfig)}
            extra = {k: v for k, v in block.items() if k not in known}
            block = {k: v for k, v in block.items() if k in known}
            mc = ModalityConfig(**block).with_name(f"mod_{i + 1}")
            mc.extra = extra
            self.mods.append(mc)
        if not self.mods:
            raise ValueError("config must define at least one modality_n block")
        self.num_mods = len(self.mods)

    # -- run dir ------------------------------------------------------------

    def find_version(self) -> int:
        version = 0
        base = os.path.join(self.results_root, self.exp_name)
        while os.path.exists(os.path.join(base, f"version_{version}")):
            version += 1
        return version

    def _setup_savedir(self) -> None:
        version = self.find_version()
        self.mPath = os.path.join(self.results_root, self.exp_name,
                                  f"version_{version}")
        os.makedirs(self.mPath, exist_ok=True)
        os.makedirs(os.path.join(self.mPath, "visuals"), exist_ok=True)
        self.dump_config()

    def get_vis_dir(self) -> str:
        return os.path.join(self.mPath, "visuals")

    def dump_config(self) -> None:
        with open(os.path.join(self.mPath, "config.yml"), "w") as f:
            yaml.dump(self.params, f, default_flow_style=False)

    def change_seed(self, seed: int) -> None:
        self.seed = seed
        self.params["seed"] = seed
