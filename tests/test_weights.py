"""eval/weights.py converter tests on synthetic torchvision-format state
dicts, plus the feature_loss registration/training contract (VERDICT round-1
items 1-2)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_vae_comparison_tpu.eval import weights as W
from multimodal_vae_comparison_tpu.models.nets import ResNet50, VGGFeatures


def synthetic_vgg19_sd(rng):
    """Minimal torchvision vgg19 'features.*' layout (conv indices from the
    real module definition order)."""
    cfg = [(3, 64), (64, 64), (64, 128), (128, 128),
           (128, 256), (256, 256), (256, 256), (256, 256)]
    idxs = [0, 2, 5, 7, 10, 12, 14, 16]
    sd = {}
    for idx, (cin, cout) in zip(idxs, cfg):
        sd[f"features.{idx}.weight"] = rng.normal(
            size=(cout, cin, 3, 3)).astype(np.float32)
        sd[f"features.{idx}.bias"] = rng.normal(size=(cout,)).astype(np.float32)
    # classifier entries must be ignored by the converter
    sd["classifier.0.weight"] = rng.normal(size=(8, 8)).astype(np.float32)
    return sd


def synthetic_resnet50_sd(rng):
    def conv(cout, cin, k):
        # fan-in scaled so the 50-layer synthetic net stays finite in fp32
        return (rng.normal(size=(cout, cin, k, k))
                / np.sqrt(cin * k * k)).astype(np.float32)

    def bn(c, prefix, sd):
        sd[f"{prefix}.weight"] = rng.normal(size=(c,)).astype(np.float32)
        sd[f"{prefix}.bias"] = rng.normal(size=(c,)).astype(np.float32)
        sd[f"{prefix}.running_mean"] = rng.normal(size=(c,)).astype(np.float32)
        sd[f"{prefix}.running_var"] = np.abs(
            rng.normal(size=(c,))).astype(np.float32) + 0.5

    sd = {"conv1.weight": conv(64, 3, 7),
          "fc.weight": rng.normal(size=(1000, 2048)).astype(np.float32),
          "fc.bias": rng.normal(size=(1000,)).astype(np.float32)}
    bn(64, "bn1", sd)
    stage_sizes = (3, 4, 6, 3)
    cin = 64
    for s, n_blocks in enumerate(stage_sizes):
        width = 64 * 2 ** s
        for j in range(n_blocks):
            t = f"layer{s + 1}.{j}"
            sd[f"{t}.conv1.weight"] = conv(width, cin, 1)
            bn(width, f"{t}.bn1", sd)
            sd[f"{t}.conv2.weight"] = conv(width, width, 3)
            bn(width, f"{t}.bn2", sd)
            sd[f"{t}.conv3.weight"] = conv(width * 4, width, 1)
            bn(width * 4, f"{t}.bn3", sd)
            if j == 0:
                sd[f"{t}.downsample.0.weight"] = conv(width * 4, cin, 1)
                bn(width * 4, f"{t}.downsample.1", sd)
            cin = width * 4
    return sd


def test_convert_vgg19_matches_flax_tree():
    sd = synthetic_vgg19_sd(np.random.default_rng(0))
    converted = W.convert_vgg19(sd)
    model = VGGFeatures()
    ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    ref_flat = jax.tree_util.tree_flatten(jax.device_get(ref))
    conv_flat = jax.tree_util.tree_flatten(converted)
    assert ref_flat[1] == conv_flat[1]  # identical treedef
    for a, b in zip(ref_flat[0], conv_flat[0]):
        assert np.asarray(a).shape == np.asarray(b).shape
    # OIHW -> HWIO is a transpose, not a reshape
    k0 = converted["params"]["Conv_0"]["kernel"]
    np.testing.assert_array_equal(
        k0[..., 0, 0], sd["features.0.weight"][0, 0].T.T)  # (3,3) slice
    assert k0.shape == (3, 3, 3, 64)
    # converted features actually run
    out = model.apply(converted, jnp.ones((2, 32, 32, 3)), taps="conv")
    assert len(out) == 8 and out[0].shape == (2, 32, 32, 64)


def test_convert_resnet50_matches_flax_tree_and_runs():
    sd = synthetic_resnet50_sd(np.random.default_rng(1))
    converted = W.convert_resnet50(sd)
    model = ResNet50()
    ref = jax.device_get(model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))))
    ref_flat, ref_def = jax.tree_util.tree_flatten(ref)
    conv_flat, conv_def = jax.tree_util.tree_flatten(converted)
    assert ref_def == conv_def
    for a, b in zip(ref_flat, conv_flat):
        assert np.asarray(a).shape == np.asarray(b).shape
    out = model.apply(converted, jnp.ones((2, 64, 64, 3)))
    assert out.shape == (2, 1000)
    assert np.isfinite(np.asarray(out)).all()


def test_install_pretrained_roundtrip(tmp_path, monkeypatch):
    """npz weights dropped in the weights dir land inside Enc_CNN's trunk."""
    monkeypatch.setenv("MVAE_TPU_WEIGHTS_DIR", str(tmp_path))
    sd = synthetic_resnet50_sd(np.random.default_rng(2))
    np.savez(tmp_path / "resnet50.npz", **sd)

    from multimodal_vae_comparison_tpu.models.encoders import Enc_CNN
    enc = Enc_CNN(latent_dim=4, data_dim=(64, 64, 3))
    variables = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    installed, report = W.install_pretrained(jax.device_get(variables),
                                             verbose=False)
    assert len(report) == 1
    got = installed["params"]["ResNet50_0"]["Conv_0"]["kernel"]
    np.testing.assert_allclose(
        np.asarray(got), np.transpose(sd["conv1.weight"], (2, 3, 1, 0)))
    # frozen BN stats installed too
    np.testing.assert_allclose(
        np.asarray(installed["params"]["ResNet50_0"]["FrozenBatchNorm_0"]["mean"]),
        sd["bn1.running_mean"])
    # and the encoder still runs with installed weights
    mu, scale = enc.apply(installed, jnp.ones((2, 64, 64, 3)))
    assert mu.shape == (2, 4) and np.isfinite(np.asarray(mu)).all()


def test_install_pretrained_noop_without_files(tmp_path, monkeypatch):
    monkeypatch.setenv("MVAE_TPU_WEIGHTS_DIR", str(tmp_path / "empty"))
    variables = {"params": {"Dense_0": {"kernel": np.ones((2, 2))}}}
    out, report = W.install_pretrained(variables, verbose=False)
    assert report == [] and out is variables or out == variables


def test_install_rejects_shape_mismatch(tmp_path, monkeypatch):
    monkeypatch.setenv("MVAE_TPU_WEIGHTS_DIR", str(tmp_path))
    sd = synthetic_resnet50_sd(np.random.default_rng(3))
    sd["conv1.weight"] = sd["conv1.weight"][:32]  # corrupt
    np.savez(tmp_path / "resnet50.npz", **sd)
    model = ResNet50()
    variables = jax.device_get(model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))))
    with pytest.raises(ValueError, match="shape mismatch"):
        W.install_pretrained({"params": {"ResNet50_0": variables["params"]}},
                             verbose=False)


def test_vgg19_feature_params_pickup(tmp_path, monkeypatch):
    """perceptual.extractor_params picks up an installed vgg19 checkpoint."""
    from multimodal_vae_comparison_tpu.models import perceptual
    monkeypatch.setenv("MVAE_TPU_WEIGHTS_DIR", str(tmp_path))
    perceptual.reset_extractor_cache()
    assert perceptual.extractor_source() == "fixed-random"
    sd = synthetic_vgg19_sd(np.random.default_rng(4))
    np.savez(tmp_path / "vgg19.npz", **sd)
    perceptual.reset_extractor_cache()
    assert perceptual.extractor_source() == "torchvision-vgg19"
    np.testing.assert_allclose(
        perceptual.extractor_params()["params"]["Conv_0"]["bias"],
        sd["features.0.bias"])
    perceptual.reset_extractor_cache()


def test_feature_loss_registered_and_trains(tmp_path):
    """A config with recon_loss: feature_loss builds and a few optimization
    steps decrease the loss (VERDICT item 2 'done' criterion)."""
    import optax
    from multimodal_vae_comparison_tpu.models import perceptual
    from multimodal_vae_comparison_tpu.models import objectives
    from multimodal_vae_comparison_tpu.models import get_mixing
    from multimodal_vae_comparison_tpu.models.base import ModalitySpec

    perceptual.reset_extractor_cache()
    assert "feature_loss" in objectives.RECON_LOSSES

    specs = (
        ModalitySpec(name="mod_1", encoder="FNN", decoder="FNN",
                     feature_dims=(16, 16, 3), mod_type="image",
                     recon_loss="feature_loss"),
        ModalitySpec(name="mod_2", encoder="FNN", decoder="FNN",
                     feature_dims=(16, 16, 3), mod_type="image",
                     recon_loss="mse"),
    )
    model = get_mixing("moe")(specs=specs, n_latents=4, obj="elbo")
    rng = jax.random.PRNGKey(0)
    data = jax.random.uniform(rng, (8, 16, 16, 3))
    batch = {"mod_1": {"data": data, "masks": None},
             "mod_2": {"data": 1.0 - data, "masks": None}}
    params = model.init({"params": rng, "sample": rng}, batch,
                        method=model.objective)
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, key):
        def loss_fn(p):
            loss, _ = model.apply(p, batch, rngs={"sample": key},
                                  method=model.objective)
            return loss
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, loss

    losses = []
    for i in range(6):
        params, opt, loss = step(params, opt, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def synthetic_inception_sd(rng):
    """Build a torch-layout inception_v3 state dict by mirroring the flax
    module's own tree (shapes from init), converted back to OIHW."""
    from multimodal_vae_comparison_tpu.models.inception import InceptionV3
    model = InceptionV3()
    ref = jax.device_get(model.init(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 75, 75, 3))))

    sd = {}

    def walk(node, path):
        if "kernel" in node:   # a conv leaf
            k = node["kernel"]
            sd[".".join(path) + ".weight"] = (
                rng.normal(size=np.transpose(k, (3, 2, 0, 1)).shape)
                / np.sqrt(np.prod(k.shape[:3]))).astype(np.float32)
            return
        if "scale" in node:    # a FrozenBatchNorm leaf
            c = node["scale"].shape[0]
            p = ".".join(path)
            sd[p + ".weight"] = rng.normal(size=(c,)).astype(np.float32)
            sd[p + ".bias"] = rng.normal(size=(c,)).astype(np.float32)
            sd[p + ".running_mean"] = rng.normal(size=(c,)).astype(np.float32)
            sd[p + ".running_var"] = (np.abs(rng.normal(size=(c,)))
                                      + 0.5).astype(np.float32)
            sd[p + ".num_batches_tracked"] = np.zeros((), np.int64)
            return
        for k, v in node.items():
            walk(v, path + [k])

    walk(ref["params"], [])
    # entries the converter must skip
    sd["fc.weight"] = rng.normal(size=(1000, 2048)).astype(np.float32)
    sd["fc.bias"] = rng.normal(size=(1000,)).astype(np.float32)
    return sd, ref


def test_convert_inception_matches_flax_tree_and_runs():
    from multimodal_vae_comparison_tpu.models.inception import InceptionV3
    rng = np.random.default_rng(5)
    sd, ref = synthetic_inception_sd(rng)
    converted = W.convert_inception(sd)
    ref_flat, ref_def = jax.tree_util.tree_flatten(ref)
    conv_flat, conv_def = jax.tree_util.tree_flatten(converted)
    assert ref_def == conv_def
    for a, b in zip(ref_flat, conv_flat):
        assert np.asarray(a).shape == np.asarray(b).shape
    out = InceptionV3().apply(converted, jnp.ones((2, 64, 64, 3)) * 0.5)
    assert out.shape == (2, 2048)
    assert np.isfinite(np.asarray(out)).all()


def test_fid_uses_inception_when_installed(tmp_path, monkeypatch):
    monkeypatch.setenv("MVAE_TPU_WEIGHTS_DIR", str(tmp_path))
    rng = np.random.default_rng(6)
    sd, _ = synthetic_inception_sd(rng)
    sd.pop("fc.weight"), sd.pop("fc.bias")
    np.savez(tmp_path / "inception_v3.npz",
             **{k: v for k, v in sd.items()
                if not k.endswith("num_batches_tracked")})
    from multimodal_vae_comparison_tpu.eval import fid
    fn = fid.default_feature_fn()
    feats = fn(np.random.default_rng(0).random((4, 32, 32, 3), np.float32) * 0)
    assert feats.shape == (4, 2048)


def test_convert_inception_value_golden():
    """VALUE-level golden check of the converter's kernel transpose and BN
    field mapping (VERDICT r3 item 8): shape equality alone would pass a
    wrong transpose on near-square kernels.  A deterministic ramp tensor in
    torch OIHW layout must land at kernel[h, w, i, o] == sd[o, i, h, w]."""
    O, I, H, Wd = 5, 4, 3, 2
    ramp = np.arange(O * I * H * Wd, dtype=np.float32).reshape(O, I, H, Wd)
    sd = {
        "Conv2d_1a_3x3.conv.weight": ramp,
        "Conv2d_1a_3x3.bn.weight": np.arange(O, dtype=np.float32),
        "Conv2d_1a_3x3.bn.bias": np.arange(O, dtype=np.float32) + 100,
        "Conv2d_1a_3x3.bn.running_mean": np.arange(O, dtype=np.float32) + 200,
        "Conv2d_1a_3x3.bn.running_var": np.arange(O, dtype=np.float32) + 300,
        "Conv2d_1a_3x3.bn.num_batches_tracked": np.zeros((), np.int64),
        "fc.weight": np.zeros((7, 3), np.float32),   # must be dropped
    }
    conv = W.convert_inception(sd)["params"]["Conv2d_1a_3x3"]
    kern = conv["conv"]["kernel"]
    assert kern.shape == (H, Wd, I, O)
    for o in range(O):
        for i in range(I):
            for h in range(H):
                for w in range(Wd):
                    assert kern[h, w, i, o] == ramp[o, i, h, w]
    np.testing.assert_array_equal(conv["bn"]["scale"], sd["Conv2d_1a_3x3.bn.weight"])
    np.testing.assert_array_equal(conv["bn"]["bias"], sd["Conv2d_1a_3x3.bn.bias"])
    np.testing.assert_array_equal(conv["bn"]["mean"], sd["Conv2d_1a_3x3.bn.running_mean"])
    np.testing.assert_array_equal(conv["bn"]["var"], sd["Conv2d_1a_3x3.bn.running_var"])
    assert "fc" not in W.convert_inception(sd)["params"]


def test_active_feature_net_labels(tmp_path, monkeypatch):
    """Every FID number must be attributable to the feature net that
    produced it; the label must flip to inception_v3 exactly when an
    inception checkpoint is installed."""
    from multimodal_vae_comparison_tpu.eval import fid
    monkeypatch.setenv("MVAE_TPU_WEIGHTS_DIR", str(tmp_path))
    assert fid.active_feature_net() == "vgg19_fixed_random"
    rng = np.random.default_rng(7)
    sd, _ = synthetic_inception_sd(rng)
    sd.pop("fc.weight"), sd.pop("fc.bias")
    np.savez(tmp_path / "inception_v3.npz",
             **{k: v for k, v in sd.items()
                if not k.endswith("num_batches_tracked")})
    assert fid.active_feature_net() == "inception_v3"
