"""Tests for the autoencoder model family (geometry, switch, inference)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from timbre_trap_tpu.models import TimbreTrapNet
from timbre_trap_tpu.models.modules import embedding_sizes, default_latent_size


@pytest.fixture(scope="module")
def tiny_model():
    """Small feature size so tests run fast; F=60 -> E chain 29,13,5,1."""
    from timbre_trap_tpu.models import TimbreTrap

    return TimbreTrap(sample_rate=8000, n_octaves=5, bins_per_octave=12,
                      secs_per_block=0.5, latent_size=32, model_complexity=1)


def test_embedding_size_chain():
    sizes, paddings = embedding_sizes(540)
    assert sizes == [269, 133, 65, 31]
    assert paddings == [1, 1, 1, 0]
    sizes60, _ = embedding_sizes(60)
    assert sizes60 == [29, 13, 5, 1]


def test_default_latent():
    assert default_latent_size(1) == 32
    assert default_latent_size(2) == 64


def test_net_shapes_and_switch(rng):
    F, T, D = 60, 16, 32
    net = TimbreTrapNet(feature_size=F, latent_size=D, model_complexity=1)
    x = jnp.asarray(rng.standard_normal((2, F, T, 2)), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x)["params"]

    rec, latents, trn, trn_rec, trn_scr, losses = net.apply({"params": params}, x, True)
    assert rec.shape == (2, F, T, 2)
    assert trn.shape == (2, F, T, 2)
    assert latents.shape == (2, T, D)
    assert trn_rec.shape == (2, F, T, 2)
    assert trn_scr.shape == (2, F, T, 2)
    assert losses == {}
    # The decoder switch must actually change the output.
    assert not np.allclose(np.asarray(rec), np.asarray(trn))


def test_net_no_consistency(rng):
    F, T = 60, 8
    net = TimbreTrapNet(feature_size=F, latent_size=16)
    x = jnp.asarray(rng.standard_normal((1, F, T, 2)), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x)["params"]
    rec, latents, trn, trn_rec, trn_scr, _ = net.apply({"params": params}, x, False)
    assert trn_rec is None and trn_scr is None


@pytest.mark.parametrize("variant,channels", [("base", 2), ("film", 2),
                                              ("mag", 1), ("magdb", 1)])
def test_variants_shapes(variant, channels, rng):
    F, T = 60, 8
    net = TimbreTrapNet(feature_size=F, latent_size=16, variant=variant)
    assert net.in_channels == channels
    x = jnp.asarray(rng.standard_normal((1, F, T, channels)), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x)["params"]
    rec, _, trn, _, _, _ = net.apply({"params": params}, x, False)
    assert rec.shape == (1, F, T, channels)
    if variant == "mag":
        assert float(np.asarray(rec).min()) >= 0.0  # ReLU output
    if variant == "magdb":
        r = np.asarray(rec)
        assert r.min() >= 0.0 and r.max() <= 1.0  # sigmoid output


def test_skip_connections(rng):
    F, T = 60, 8
    net = TimbreTrapNet(feature_size=F, latent_size=16, skip_connections=True)
    x = jnp.asarray(rng.standard_normal((1, F, T, 2)), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x)
    assert variables["params"]["skip_weights"].shape == (5,)
    out = net.apply(variables, x, False)
    assert out[0].shape == (1, F, T, 2)


def test_conv_transpose_matches_torch(rng):
    """ConvTranspose2dTorch must reproduce torch.nn.ConvTranspose2d exactly
    (needed for the tt-orig.pt weight importer, SURVEY.md §7 step 2)."""
    torch = pytest.importorskip("torch")
    from timbre_trap_tpu.ops.conv import ConvTranspose2dTorch

    B, Cin, Cout, H, W = 2, 3, 5, 7, 4
    for stride, op, k in [(2, 1, 4), (2, 0, 4), (1, 0, 3)]:
        x = rng.standard_normal((B, H, W, Cin)).astype(np.float32)
        mod = ConvTranspose2dTorch(Cout, (k, 1), strides=(stride, 1),
                                   output_padding=(op, 0))
        params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
        y = np.asarray(mod.apply({"params": params}, jnp.asarray(x)))

        tmod = torch.nn.ConvTranspose2d(Cin, Cout, (k, 1), stride=(stride, 1),
                                        output_padding=(op, 0))
        with torch.no_grad():
            # torch weight layout (in, out, kh, kw) <- flax (kh, kw, in, out)
            w = np.transpose(np.asarray(params["kernel"]), (2, 3, 0, 1))
            tmod.weight.copy_(torch.from_numpy(w))
            tmod.bias.copy_(torch.from_numpy(np.asarray(params["bias"])))
            ty = tmod(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
        ty = np.transpose(ty.numpy(), (0, 2, 3, 1))
        assert y.shape == ty.shape
        assert np.allclose(y, ty, atol=1e-4), f"stride={stride} op={op} k={k}"


def test_model_forward_and_inference(tiny_model, rng):
    m = tiny_model
    L = m.sliCQ.block_length
    audio = rng.standard_normal((1, 1, L)).astype(np.float32)

    rec, latents, trn, trn_rec, trn_scr, losses = m.forward(audio, consistency=True)
    M = m.sliCQ.max_window_length
    assert rec.shape == (1, 2, m.sliCQ.n_bins, M)
    assert latents.shape == (1, 32, M)
    assert trn_rec.shape == rec.shape

    out = m.inference(audio, transcribe=True)
    assert out.shape == (1, 2, m.sliCQ.n_bins, M)

    acts = m.to_activations(out)
    a = np.asarray(acts)
    assert a.shape == (1, m.sliCQ.n_bins, M)
    assert a.min() >= 0.0 and a.max() <= 1.0


def test_chunked_inference_matches_frames(tiny_model, rng):
    m = tiny_model
    L = m.sliCQ.block_length
    n = int(2.5 * L)
    audio = rng.standard_normal((1, 1, n)).astype(np.float32)
    out = m.chunked_inference(audio, transcribe=True)
    expected_frames = m.sliCQ.get_expected_frames(3 * L)  # padded to 3 blocks
    assert out.shape == (1, 2, m.sliCQ.n_bins, expected_frames)
    assert np.isfinite(np.asarray(out)).all()


def test_transcribe_reconstruct(tiny_model, rng):
    m = tiny_model
    L = m.sliCQ.block_length
    audio = (0.5 * np.sin(2 * np.pi * 440 * np.arange(L) / m.sliCQ.sample_rate))
    audio = audio[None, None, :].astype(np.float32)
    acts = np.asarray(m.transcribe(audio))
    assert acts.shape[1] == m.sliCQ.n_bins
    assert acts.min() >= 0.0 and acts.max() <= 1.0
    recon = np.asarray(m.reconstruct(audio))
    assert recon.shape == (1, 1, L)
    assert np.isfinite(recon).all()


def test_encode_decode_roundtrip_api(tiny_model, rng):
    m = tiny_model
    L = m.sliCQ.block_length
    audio = rng.standard_normal((2, 1, L)).astype(np.float32)
    latents, embeddings, losses = m.encode(audio)
    assert latents.shape[0:2] == (2, 32)
    coeffs = m.decode(latents, None, transcribe=False)
    assert coeffs.shape == (2, 2, m.sliCQ.n_bins, m.sliCQ.max_window_length)


def test_model_save_load(tiny_model, tmp_path, rng):
    m = tiny_model
    path = m.save(str(tmp_path / "ckpt"))
    from timbre_trap_tpu.models import TimbreTrap

    m2 = TimbreTrap.load(path)
    assert m2.hparams == m.hparams
    L = m.sliCQ.block_length
    audio = rng.standard_normal((1, 1, L)).astype(np.float32)
    a1 = np.asarray(m.inference(audio, True))
    a2 = np.asarray(m2.inference(audio, True))
    np.testing.assert_array_equal(a1, a2)


def test_load_model_rebuilds_every_variant(tmp_path, rng):
    """models.load_model reconstructs the RIGHT class from a model.save
    directory for all four families — configuration travels as
    hparams.json (the capability the reference gets from whole-module
    torch.save, train.py:506-511)."""
    from timbre_trap_tpu.models import (TimbreTrap, TimbreTrapFiLM,
                                        TimbreTrapMag, TimbreTrapMagDB,
                                        load_model)

    hp = dict(sample_rate=8000, n_octaves=5, bins_per_octave=12,
              secs_per_block=0.5, latent_size=32, model_complexity=1)
    for cls in (TimbreTrap, TimbreTrapFiLM, TimbreTrapMag, TimbreTrapMagDB):
        m = cls(**hp)
        path = m.save(str(tmp_path / cls.__name__))
        m2 = load_model(path)
        assert type(m2) is cls
        assert m2.hparams == m.hparams
        chex = jax.tree_util.tree_structure(m.params)
        assert jax.tree_util.tree_structure(m2.params) == chex


def test_remat_matches_plain(rng):
    """remat=True must be numerically identical to remat=False."""
    F, T = 60, 16
    net_a = TimbreTrapNet(feature_size=F, latent_size=16)
    net_b = TimbreTrapNet(feature_size=F, latent_size=16, remat=True)
    x = jnp.asarray(rng.standard_normal((2, F, T, 2)), jnp.float32)
    params = net_a.init(jax.random.PRNGKey(0), x)["params"]
    out_a = net_a.apply({"params": params}, x, True)
    out_b = net_b.apply({"params": params}, x, True)  # same param tree!
    for a, b in zip(out_a[:5], out_b[:5]):
        if a is None:
            assert b is None
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
    # gradients must flow and match closely
    def loss(net):
        def f(p):
            rec, *_ = net.apply({"params": p}, x, False)
            return jnp.sum(rec ** 2)
        return jax.grad(f)(params)
    ga, gb = loss(net_a), loss(net_b)
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_remat_with_skips(rng):
    F, T = 60, 8
    net = TimbreTrapNet(feature_size=F, latent_size=16, remat=True,
                        skip_connections=True)
    x = jnp.asarray(rng.standard_normal((1, F, T, 2)), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x)["params"]
    out = net.apply({"params": params}, x, False)
    assert out[0].shape == (1, F, T, 2)


def test_streaming_transcribe_matches_single_program():
    """Piece-pipelined transcribe == the one-program path, frame-exact."""
    import jax.numpy as jnp
    from timbre_trap_tpu.models import TimbreTrap

    m = TimbreTrap(sample_rate=8000, n_octaves=5, bins_per_octave=12,
                   secs_per_block=0.5, latent_size=16, model_complexity=1)
    m.piece_blocks = 3  # force streaming on a short clip
    rng = np.random.default_rng(0)
    audio = (0.3 * rng.standard_normal((1, 1, int(7.3 * 8000)))
             ).astype(np.float32)
    ref = np.asarray(m._transcribe_jit(m.params, jnp.asarray(audio)))
    got = np.asarray(m.transcribe(audio))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_transcribe_accepts_int16_audio():
    """PCM16 input == float input dequantized (device-side 1/32768 scale)."""
    import jax.numpy as jnp
    from timbre_trap_tpu.models import TimbreTrap

    m = TimbreTrap(sample_rate=8000, n_octaves=5, bins_per_octave=12,
                   secs_per_block=0.5, latent_size=16, model_complexity=1)
    rng = np.random.default_rng(1)
    pcm = (rng.standard_normal((1, 1, 6000)) * 8000).astype(np.int16)
    ref = np.asarray(m.transcribe(pcm.astype(np.float32) / 32768.0))
    got = np.asarray(m.transcribe(pcm))
    np.testing.assert_allclose(got, ref, atol=1e-6)
    # Piece route: int16/f16 segments dequantize in a tiny per-dtype
    # program so every ingestion dtype shares the ONE piece program.
    m.pad_short_to_piece = True
    got_piece = np.asarray(m.transcribe(pcm))
    got_f16 = np.asarray(m.transcribe(
        (pcm.astype(np.float32) / 32768.0).astype(np.float16)))
    np.testing.assert_allclose(got_piece, ref, atol=2e-5)
    np.testing.assert_allclose(got_f16, ref, atol=5e-3)


def test_short_clip_piece_pad_matches_single_program():
    """pad_short_to_piece: a host clip SHORTER than the streaming threshold
    rides the one-piece program (zero-pad + trim) with frame-exact parity
    vs its own-length program — the shape-stability contract that keeps
    fused-TPU corpus evaluation at ONE compile for all clip lengths
    (models/timbre_trap.py:transcribe)."""
    import jax.numpy as jnp
    from timbre_trap_tpu.models import TimbreTrap

    m = TimbreTrap(sample_rate=8000, n_octaves=5, bins_per_octave=12,
                   secs_per_block=0.5, latent_size=16, model_complexity=1)
    m.pad_short_to_piece = True  # auto only triggers on the fused TPU path
    rng = np.random.default_rng(2)
    # 1.2 s = 3 blocks < 2 * piece_blocks: the pre-change route would have
    # compiled a dedicated 3-block program.
    audio = (0.3 * rng.standard_normal((1, 1, int(1.2 * 8000)))
             ).astype(np.float32)
    ref = np.asarray(m._transcribe_jit(m.params, jnp.asarray(audio)))
    got = np.asarray(m.transcribe(audio))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_streaming_reconstruct_matches_single_program():
    """Piece-wise reconstruct (per-block sliCQ synthesis + deferred global
    infinity-norm) == the one-program path, sample-exact, for both a long
    (streamed) and a short (pad_short_to_piece) host clip."""
    import jax.numpy as jnp
    from timbre_trap_tpu.models import TimbreTrap

    m = TimbreTrap(sample_rate=8000, n_octaves=5, bins_per_octave=12,
                   secs_per_block=0.5, latent_size=16, model_complexity=1)
    m.piece_blocks = 3
    m.pad_short_to_piece = True
    rng = np.random.default_rng(3)
    for secs in (7.3, 1.2):  # 15 blocks (5 pieces) and 3 blocks (1 piece)
        audio = (0.3 * rng.standard_normal((1, 1, int(secs * 8000)))
                 ).astype(np.float32)
        ref = np.asarray(m._reconstruct_jit(m.params, jnp.asarray(audio)))
        got = np.asarray(m.reconstruct(audio))
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=2e-5)
