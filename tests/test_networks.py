"""Shape-contract tests for every encoder/decoder in the zoo
(reference test analog: multimodal_compare/tests/test_encoder.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_vae_comparison_tpu.models.decoders import DECODERS, get_decoder
from multimodal_vae_comparison_tpu.models.encoders import ENCODERS, get_encoder

LATENT = 6
B = 2

# encoder name -> (data shape without batch, needs mask)
ENC_CASES = {
    "CNN2": ((64, 64, 3), False),
    "CNNCoord": ((64, 64, 3), False),
    "MNIST": ((28, 28, 1), False),
    "MNISTMoE": ((28, 28, 1), False),
    "RESCNN": ((64, 64, 3), False),
    "PolyMNIST": ((28, 28, 3), False),
    "SVHN": ((32, 32, 3), False),
    "SVHN2": ((32, 32, 3), False),
    "FNN": ((10,), False),
    "Transformer": ((10, 4, 1), True),
    "TxtTransformer": ((8, 27), True),
    "ConvTxt": ((8, 27), False),
    "TxtRNN": ((8, 27), False),
    "TransformerIMG": ((3, 64, 64, 3), True),
    "VideoGPT": ((4, 64, 64, 3), False),
    # sparse attn over flattened spacetime tokens (2*8*8 = 128 = 1 block)
    "VideoGPTSparse": ((2, 32, 32, 3), False),
}

DEC_CASES = {
    "CNN": (64, 64, 3),
    "SVHN": (32, 32, 3),
    "SVHN2": (32, 32, 3),
    "MNIST": (28, 28, 1),
    "MNIST2": (28, 28, 1),
    "PolyMNIST": (28, 28, 3),
    "RESCNN": (64, 64, 3),
    "FNN": (10,),
    "Transformer": (10, 4, 1),
    "TxtTransformer": (8, 27),
    "ConvTxt": (8, 27),
    "TransformerIMG": (3, 64, 64, 3),
    "VideoGPT": (4, 64, 64, 3),
    "VideoGPTSparse": (2, 32, 32, 3),
}


@pytest.mark.parametrize("name", sorted(ENC_CASES))
def test_encoder_shapes(name):
    shape, needs_mask = ENC_CASES[name]
    enc = get_encoder(name)(latent_dim=LATENT, data_dim=shape)
    data = jnp.zeros((B,) + shape)
    mask = jnp.ones((B, shape[0]), dtype=bool) if needs_mask else None
    params = enc.init(jax.random.PRNGKey(0), data, mask)
    mu, scale = enc.apply(params, data, mask)
    assert mu.shape == (B, LATENT)
    assert scale.shape == (B, LATENT)
    assert np.all(np.asarray(scale) > 0)


@pytest.mark.parametrize("name", ["FNN", "TxtTransformer", "SVHN"])
def test_encoder_private_latents_widen_output(name):
    shape, needs_mask = ENC_CASES[name]
    enc = get_encoder(name)(latent_dim=LATENT, data_dim=shape, latent_private=3)
    data = jnp.zeros((B,) + shape)
    mask = jnp.ones((B, shape[0]), dtype=bool) if needs_mask else None
    params = enc.init(jax.random.PRNGKey(0), data, mask)
    mu, scale = enc.apply(params, data, mask)
    assert mu.shape == (B, LATENT + 3)


@pytest.mark.parametrize("name", sorted(DEC_CASES))
def test_decoder_shapes(name):
    shape = DEC_CASES[name]
    dec = get_decoder(name)(latent_dim=LATENT, data_dim=shape)
    z = jnp.zeros((B, LATENT))
    mask = None
    if name in ("Transformer", "TxtTransformer", "TransformerIMG"):
        mask = jnp.ones((B, shape[0]), dtype=bool)
    params = dec.init(jax.random.PRNGKey(0), z, mask)
    out = dec.apply(params, z, mask)
    # image decoders additionally return eta-clipped logits (squash_dist)
    mean, scale = out[0], out[1]
    assert mean.shape == (B,) + shape, f"{name}: {mean.shape} != {(B,) + shape}"
    assert float(scale) == pytest.approx(0.75)
    if len(out) > 2:
        np.testing.assert_allclose(np.asarray(jax.nn.sigmoid(out[2])),
                                   np.asarray(mean), atol=1e-6)


def test_decoder_masks_zero_padding():
    dec = get_decoder("TxtTransformer")(latent_dim=LATENT, data_dim=(8, 27))
    z = jax.random.normal(jax.random.PRNGKey(1), (B, LATENT))
    mask = jnp.array([[True] * 4 + [False] * 4] * B)
    params = dec.init(jax.random.PRNGKey(0), z, mask)
    mean, _ = dec.apply(params, z, mask)
    np.testing.assert_array_equal(np.asarray(mean[:, 4:]), 0.0)
    assert np.any(np.asarray(mean[:, :4]) != 0.0)


def test_registry_errors():
    with pytest.raises(KeyError):
        get_encoder("NoSuchEncoder")
    with pytest.raises(KeyError):
        get_decoder("NoSuchDecoder")
    assert set(ENC_CASES) <= set(ENCODERS)
    assert set(DEC_CASES) <= set(DECODERS)


def test_txtrnn_truly_bidirectional_and_mask_aware():
    """Regression: the backward GRU summary must depend on the FIRST token
    (full right-to-left pass, not one step on the last token), and padded
    steps must not affect the encoding."""
    import jax
    import jax.numpy as jnp
    from multimodal_vae_comparison_tpu.models.encoders import Enc_TxtRNN

    enc = Enc_TxtRNN(latent_dim=4, data_dim=(6, 5), hidden_size=16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 6, 5)).astype(np.float32))
    mask = jnp.array([[True] * 6, [True] * 3 + [False] * 3])
    params = enc.init(jax.random.PRNGKey(0), x, mask)
    mu, _ = enc.apply(params, x, mask)
    # first-token perturbation must change the encoding (bidirectionality)
    x_first = x.at[:, 0].add(1.0)
    mu2, _ = enc.apply(params, x_first, mask)
    assert np.abs(np.asarray(mu2) - np.asarray(mu)).max() > 1e-6
    # padding perturbation must NOT change row 1's encoding
    x_pad = x.at[1, 5].add(1.0)
    mu3, _ = enc.apply(params, x_pad, mask)
    np.testing.assert_allclose(np.asarray(mu3[1]), np.asarray(mu[1]),
                               atol=1e-6)
