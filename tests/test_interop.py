"""Functional parity of the torch-weight importer against the REFERENCE model.

The reference package itself is imported (read-only, from /root/reference)
with its unavailable dependencies stubbed out; its Encoder/Decoder are run
on random input and compared against our flax model with imported weights.
This is the strongest offline check that tt-orig.pt-style checkpoints will
reproduce bit-compatible behavior (SURVEY.md §7 step 2).
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from timbre_trap_tpu.interop import (export_torch_state_dict,
                                     import_torch_state_dict)
from timbre_trap_tpu.models import TimbreTrapNet

REFERENCE_PATH = "/root/reference"


@pytest.fixture(scope="module")
def reference_modules():
    """Import reference Encoder/Decoder with missing deps stubbed."""
    sys.path.insert(0, REFERENCE_PATH)
    # Stub packages the reference imports at module scope but which are
    # irrelevant for Encoder/Decoder math.
    for name in ("cqt_pytorch", "librosa", "torchaudio",
                 "torchaudio.transforms"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.modules["cqt_pytorch"].CQT = object
    sys.modules["torchaudio.transforms"].AmplitudeToDB = object
    sys.modules["torchaudio"].transforms = sys.modules["torchaudio.transforms"]
    sys.modules["librosa"].hz_to_midi = lambda f: 69 + 12 * np.log2(np.asarray(f) / 440)
    sys.modules["librosa"].midi_to_hz = lambda m: 440 * 2 ** ((np.asarray(m) - 69) / 12)
    try:
        from timbre_trap.framework.modules import Decoder, Encoder
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference import failed: {e}")
    yield Encoder, Decoder
    sys.path.remove(REFERENCE_PATH)


@pytest.mark.parametrize("feature_size,latent,complexity", [(60, 16, 1),
                                                            (124, 32, 2)])
def test_encoder_decoder_parity(reference_modules, feature_size, latent,
                                complexity, rng):
    RefEncoder, RefDecoder = reference_modules
    T = 6

    ref_enc = RefEncoder(feature_size=feature_size, latent_size=latent,
                         model_complexity=complexity).eval()
    ref_dec = RefDecoder(feature_size=feature_size, latent_size=latent,
                         model_complexity=complexity).eval()

    # Collect torch weights under the full-model naming scheme.
    state_dict = {}
    for prefix, module in (("encoder", ref_enc), ("decoder", ref_dec)):
        for key, val in module.state_dict().items():
            state_dict[f"{prefix}.{key}"] = val

    net = TimbreTrapNet(feature_size=feature_size, latent_size=latent,
                        model_complexity=complexity)
    x_nhwc = rng.standard_normal((2, feature_size, T, 2)).astype(np.float32)
    init_params = net.init(jax.random.PRNGKey(0), jnp.asarray(x_nhwc))["params"]
    params = import_torch_state_dict(state_dict, init_params)

    # --- encoder parity ------------------------------------------------
    with torch.no_grad():
        ref_lat, ref_embs, _ = ref_enc(
            torch.from_numpy(np.moveaxis(x_nhwc, -1, 1)))
    latents, embeddings, _ = net.apply({"params": params}, jnp.asarray(x_nhwc),
                                       method="encode")
    got_lat = np.moveaxis(np.asarray(latents), -1, 1)  # (B,T,D)->(B,D,T)
    np.testing.assert_allclose(got_lat, ref_lat.numpy(), atol=2e-4)
    for ref_e, got_e in zip(ref_embs, embeddings):
        np.testing.assert_allclose(np.moveaxis(np.asarray(got_e), -1, 1),
                                   ref_e.numpy(), atol=2e-4)

    # --- decoder parity (with the indicator channel appended) ----------
    with torch.no_grad():
        lat_plus = torch.cat([ref_lat, torch.ones_like(ref_lat[:, :1])], dim=1)
        ref_out = ref_dec(lat_plus)
    got_out = net.apply({"params": params}, latents, None, False,
                        method="decode")
    np.testing.assert_allclose(np.moveaxis(np.asarray(got_out), -1, 1),
                               ref_out.numpy(), atol=2e-4)


def test_export_import_round_trip():
    """export_torch_state_dict is the exact inverse of the importer."""
    net = TimbreTrapNet(feature_size=60, latent_size=16, model_complexity=1)
    x = jnp.zeros((1, 60, 4, 2))
    params = jax.tree.map(np.asarray,
                          net.init(jax.random.PRNGKey(3), x)["params"])
    rebuilt = import_torch_state_dict(export_torch_state_dict(params), params)
    for key, want in sorted(_flatten_tree(params).items()):
        np.testing.assert_array_equal(_flatten_tree(rebuilt)[key], want)


def _flatten_tree(tree, prefix=()):
    out = {}
    for key, value in tree.items():
        if isinstance(value, dict):
            out.update(_flatten_tree(value, prefix + (key,)))
        else:
            out[prefix + (key,)] = value
    return out


def test_export_loads_into_reference(reference_modules, rng):
    """Weights trained here load into the REFERENCE torch modules verbatim
    (the reverse migration path: reference users can consume our
    checkpoints). Encoder outputs must agree after the round trip."""
    RefEncoder, _ = reference_modules
    feature_size, latent = 60, 16
    ref_enc = RefEncoder(feature_size=feature_size, latent_size=latent,
                         model_complexity=1).eval()

    net = TimbreTrapNet(feature_size=feature_size, latent_size=latent,
                        model_complexity=1)
    x_nhwc = rng.standard_normal((2, feature_size, 5, 2)).astype(np.float32)
    params = net.init(jax.random.PRNGKey(1), jnp.asarray(x_nhwc))["params"]

    enc_keys = [f"encoder.{k}" for k in ref_enc.state_dict()]
    exported = export_torch_state_dict({"encoder": params["encoder"]},
                                       like=enc_keys)
    ref_enc.load_state_dict({k[len("encoder."):]: torch.from_numpy(
        np.ascontiguousarray(v)) for k, v in exported.items()})

    with torch.no_grad():
        ref_lat, _, _ = ref_enc(torch.from_numpy(np.moveaxis(x_nhwc, -1, 1)))
    latents, _, _ = net.apply({"params": params}, jnp.asarray(x_nhwc),
                              method="encode")
    np.testing.assert_allclose(np.moveaxis(np.asarray(latents), -1, 1),
                               ref_lat.numpy(), atol=2e-4)


def test_importer_rejects_shape_mismatch(rng):
    net = TimbreTrapNet(feature_size=60, latent_size=16)
    x = jnp.zeros((1, 60, 4, 2))
    params = net.init(jax.random.PRNGKey(0), x)["params"]
    bad = {"encoder.convin.0.weight": rng.standard_normal((3, 2, 3, 3)),
           "encoder.convin.0.bias": rng.standard_normal(3)}
    with pytest.raises(ValueError):
        import_torch_state_dict(bad, params)


def test_film_variant_import(reference_modules, rng):
    """FiLM gamma/beta Linear weights import with the right transpose."""
    sys.path.insert(0, REFERENCE_PATH)
    try:
        from timbre_trap.framework.modules import FiLM as RefFiLM
    finally:
        sys.path.remove(REFERENCE_PATH)

    D = 16
    ref = RefFiLM(embedding_size=D, n_conditions=2).eval()
    state_dict = {f"film_layer.{k}": v for k, v in ref.state_dict().items()}

    net = TimbreTrapNet(feature_size=60, latent_size=D, variant="film")
    x = jnp.asarray(rng.standard_normal((1, 60, 4, 2)), jnp.float32)
    init_params = net.init(jax.random.PRNGKey(0), x)["params"]
    # merge: import film params into the (randomly initialized) tree
    film_params = import_torch_state_dict(state_dict)
    merged = dict(init_params)
    merged["film_layer"] = film_params["film_layer"]

    lat = rng.standard_normal((1, 3, D)).astype(np.float32)  # (B, T, D)
    with torch.no_grad():
        cond = torch.tensor([1.0, 0.0])
        ref_out = ref(torch.from_numpy(np.swapaxes(lat, 1, 2)), cond)
    got = net.apply({"params": merged}, jnp.asarray(lat),
                    jnp.asarray([1.0, 0.0]), method=lambda m, a, c:
                    m.film_layer(a, c))
    np.testing.assert_allclose(np.swapaxes(np.asarray(got), 1, 2),
                               ref_out.numpy(), atol=1e-5)
