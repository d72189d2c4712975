"""Fused Pallas level kernels & full fused forward vs the flax modules.

Runs in Pallas interpret mode on the CPU test backend; the same code path
compiles on TPU (tools/_tpu_fused_trial.py benchmarks it there).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from timbre_trap_tpu.models.modules import (DecoderBlock, EncoderBlock,
                                            TimbreTrapNet)
from timbre_trap_tpu.models.fused import fused_forward, fused_supported
from timbre_trap_tpu.ops.packed_conv import pack_nhwc, unpack_to_nhwc
from timbre_trap_tpu.ops.fused_level import (decoder_level_spec,
                                             encoder_level_spec,
                                             fused_level_apply)

B, T = 2, 40


def _rand(rng, *shape):
    return jnp.asarray(rng.standard_normal(shape), jnp.float32)


@pytest.mark.parametrize("c,f", [(4, 540), (16, 133)])
def test_fused_encoder_level_matches_flax(c, f):
    rng = np.random.default_rng(c)
    x = _rand(rng, B, f, T, c)
    mod = EncoderBlock(out_channels=2 * c)
    params = mod.init(jax.random.PRNGKey(1), x)["params"]
    ref = mod.apply({"params": params}, x)
    spec = encoder_level_spec(params, f)
    got = fused_level_apply(pack_nhwc(x), spec, tile_t=128, interpret=True)
    got = unpack_to_nhwc(got, 2 * c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-5, rtol=1e-4)


@pytest.mark.parametrize("c,f,p", [(64, 31, 0), (8, 269, 1)])
def test_fused_decoder_level_matches_flax(c, f, p):
    rng = np.random.default_rng(c + p)
    x = _rand(rng, B, f, T, c)
    mod = DecoderBlock(out_channels=c // 2, padding=p)
    params = mod.init(jax.random.PRNGKey(1), x)["params"]
    ref = mod.apply({"params": params}, x)
    spec = decoder_level_spec(params, f, output_padding=p)
    got = fused_level_apply(pack_nhwc(x), spec, tile_t=128, interpret=True)
    got = unpack_to_nhwc(got, c // 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-5, rtol=1e-4)


def test_fused_level_convin_fusion():
    """convin folded into encoder level 1 (C_in=2 -> C0)."""
    import flax.linen as nn

    rng = np.random.default_rng(0)
    f = 540
    x = _rand(rng, B, f, T, 2)

    class Convin(nn.Module):
        @nn.compact
        def __call__(self, x):
            y = nn.elu(nn.Conv(4, (3, 3), padding="SAME", name="convin")(x))
            return EncoderBlock(out_channels=8, name="block")(y)

    mod = Convin()
    params = mod.init(jax.random.PRNGKey(1), x)["params"]
    ref = mod.apply({"params": params}, x)
    spec = encoder_level_spec(params["block"], f,
                              convin_params=params["convin"])
    got = fused_level_apply(pack_nhwc(x), spec, tile_t=128, interpret=True)
    got = unpack_to_nhwc(got, 8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-5, rtol=1e-4)


def test_fused_mega_spec_matches_per_level():
    """fuse_level_specs: one whole-encoder kernel == the 4-level chain.

    The fused spec is the r5 inference path (models/fused.py routes
    backend=="pallas" through it); parity is vs applying the same specs
    level by level, both in interpret mode, both dtypes.
    """
    from timbre_trap_tpu.ops.fused_level import (fuse_level_specs,
                                                 spec_time_reach, HALO)

    rng = np.random.default_rng(7)
    f = 540
    net = TimbreTrapNet(feature_size=f, latent_size=32, model_complexity=1)
    x = _rand(rng, 1, f, 24, net.in_channels)
    params = net.init(jax.random.PRNGKey(0), x)["params"]
    enc = params["encoder"]
    from timbre_trap_tpu.models.modules import embedding_sizes
    sizes, _ = embedding_sizes(f)
    specs, fi = [], f
    for i in range(4):
        specs.append(encoder_level_spec(
            enc[f"block{i + 1}"], fi,
            convin_params=enc["convin"] if i == 0 else None))
        fi = sizes[i]
    mega = fuse_level_specs(specs)
    assert spec_time_reach(mega) <= HALO
    for dtype in (jnp.float32, jnp.bfloat16):
        xp = pack_nhwc(x)
        ref = xp
        for s in specs:
            ref = fused_level_apply(ref, s, dtype=dtype, tile_t=128,
                                    interpret=True)
        got = fused_level_apply(xp, mega, dtype=dtype, tile_t=128,
                                interpret=True)
        tol = dict(atol=5e-6, rtol=1e-5) if dtype == jnp.float32 \
            else dict(atol=5e-2, rtol=5e-2)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref, np.float32), **tol)


@pytest.mark.parametrize("variant,transcribe", [
    ("base", True), ("base", False), ("film", True), ("magdb", True)])
def test_fused_forward_matches_net(variant, transcribe):
    """Whole fused forward == TimbreTrapNet decode path, all variants."""
    rng = np.random.default_rng(3)
    f_size = 540
    net = TimbreTrapNet(feature_size=f_size, latent_size=32,
                        model_complexity=1, variant=variant)
    x = _rand(rng, 1, f_size, 24, net.in_channels)
    params = net.init(jax.random.PRNGKey(0), x)["params"]
    assert fused_supported(net)

    latents, _, _ = net.apply({"params": params}, x, method="encode")
    ref = net.apply({"params": params}, latents, None, transcribe,
                    method="decode")
    ref_nchw = jnp.moveaxis(ref, -1, 1)

    got = fused_forward(params, net, x, transcribe, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref_nchw),
                               atol=1e-4, rtol=1e-3)


def test_fused_level_train_shard_map_parity():
    """The shard_map wrapping used for mesh training (models/fused.py:
    _apply_level) reproduces the unsharded fused level exactly: outputs,
    dX, and the psum'd parameter gradients."""
    from timbre_trap_tpu.ops.fused_level import make_fused_level_train
    from timbre_trap_tpu.parallel import make_mesh
    from jax.sharding import PartitionSpec as P

    assert jax.device_count() >= 8
    rng = np.random.default_rng(3)
    F, C, Tl = 40, 4, 24
    x0 = _rand(rng, 8, F, Tl, C)
    mod = EncoderBlock(out_channels=2 * C)
    params = mod.init(jax.random.PRNGKey(1), x0)["params"]
    xp = pack_nhwc(x0)
    spec0 = encoder_level_spec(params, F, with_adjoints=True)
    w_ref = _rand(rng, 8, spec0.r_out, Tl)
    mesh = make_mesh(8)

    def loss(params, xp, sharded):
        spec = encoder_level_spec(params, F, with_adjoints=True)
        fn = make_fused_level_train(spec, tile_t=128, interpret=True)
        arrays = (spec.weight_arrays(jnp.float32)
                  + spec.adjoint_arrays(jnp.float32))
        if sharded:
            fn = jax.shard_map(fn, mesh=mesh,
                               in_specs=(P("data"),) + (P(),) * len(arrays),
                               out_specs=P("data"), check_vma=False)
        return jnp.sum(fn(xp, *arrays) * w_ref)

    v1, g1 = jax.value_and_grad(loss, argnums=(0, 1))(params, xp, False)
    v8, g8 = jax.value_and_grad(loss, argnums=(0, 1))(params, xp, True)
    # f32 scalar: sharded psum reduces in a different order than the
    # single-device sum, so allow a few ULPs of slack.
    assert float(v1) == pytest.approx(float(v8), rel=5e-6)
    np.testing.assert_allclose(np.asarray(g8[1]), np.asarray(g1[1]),
                               atol=1e-5, rtol=1e-5)
    flat1 = dict(jax.tree_util.tree_leaves_with_path(g1[0]))
    for path, l8 in jax.tree_util.tree_leaves_with_path(g8[0]):
        np.testing.assert_allclose(np.asarray(l8), np.asarray(flat1[path]),
                                   atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("transcribe", [False, True])
def test_fused_forward_skip_connections_matches_net(transcribe):
    """Skip-connection mode on the packed/pallas path: convin/convout run
    as standalone one-conv levels and the scaled encoder embeddings are
    added at level boundaries — must reproduce the flax decode exactly
    (reference modules.py:61-66, 196-207)."""
    rng = np.random.default_rng(5)
    f_size = 540
    net = TimbreTrapNet(feature_size=f_size, latent_size=32,
                        model_complexity=1, skip_connections=True)
    x = _rand(rng, 1, f_size, 24, net.in_channels)
    params = dict(net.init(jax.random.PRNGKey(0), x)["params"])
    assert fused_supported(net)
    # non-trivial weights so the per-level scaling is actually exercised
    params["skip_weights"] = jnp.asarray([0.5, 1.5, -0.7, 2.0, 0.9],
                                         jnp.float32)

    latents, embeddings, _ = net.apply({"params": params}, x,
                                       method="encode")
    embeddings = net.apply({"params": params}, embeddings,
                           method="apply_skip_connections")
    ref = net.apply({"params": params}, latents, embeddings, transcribe,
                    method="decode")
    ref_nchw = jnp.moveaxis(ref, -1, 1)

    got = fused_forward(params, net, x, transcribe, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref_nchw),
                               atol=1e-4, rtol=1e-3)


def test_fused_level_train_vjp_matches_xla_autodiff():
    """Custom-VJP fused level (Pallas fwd + adjoint-banded bwd) gradients ==
    XLA autodiff of the banded reference, for x AND the flax parameters."""
    from timbre_trap_tpu.ops.fused_level import (make_fused_level_train,
                                                 packed_level_apply_xla)

    rng = np.random.default_rng(0)
    B, T, C, F = 1, 24, 4, 40
    x0 = _rand(rng, B, F, T, C)
    mod = EncoderBlock(out_channels=2 * C)
    params = mod.init(jax.random.PRNGKey(1), x0)["params"]
    xp = pack_nhwc(x0)
    spec0 = encoder_level_spec(params, F, with_adjoints=True)
    w_ref = _rand(rng, B, spec0.r_out, T)

    def loss_fused(params, xp):
        spec = encoder_level_spec(params, F, with_adjoints=True)
        fn = make_fused_level_train(spec, tile_t=128, interpret=True)
        arrays = (spec.weight_arrays(jnp.float32)
                  + spec.adjoint_arrays(jnp.float32))
        return jnp.sum(fn(xp, *arrays) * w_ref)

    def loss_xla(params, xp):
        spec = encoder_level_spec(params, F, with_adjoints=True)
        return jnp.sum(packed_level_apply_xla(xp, spec) * w_ref)

    v1, g1 = jax.value_and_grad(loss_xla, argnums=(0, 1))(params, xp)
    v2, g2 = jax.value_and_grad(loss_fused, argnums=(0, 1))(params, xp)
    assert float(v1) == pytest.approx(float(v2), rel=1e-5)
    np.testing.assert_allclose(np.asarray(g2[1]), np.asarray(g1[1]),
                               atol=1e-4, rtol=1e-4)
    flat1 = dict(jax.tree_util.tree_leaves_with_path(g1[0]))
    for path, l2 in jax.tree_util.tree_leaves_with_path(g2[0]):
        np.testing.assert_allclose(np.asarray(l2), np.asarray(flat1[path]),
                                   atol=1e-4, rtol=1e-3)


@pytest.mark.parametrize("convout", [False, True])
def test_fused_decoder_level_train_vjp_matches_xla_autodiff(convout):
    """Decoder-level custom VJP == XLA autodiff for BOTH terminal shapes
    the backward special-cases: a terminal residual block (no convout —
    skip mode / inner decoder levels) and a terminal linear head (convout
    fused, act=False). The encoder test covers the terminal activated
    conv (sconv); together the three terminal item kinds are all hit."""
    from timbre_trap_tpu.ops.fused_level import (make_fused_level_train,
                                                 packed_level_apply_xla)

    rng = np.random.default_rng(7)
    Bt, Tt, c, f, p = 1, 24, 8, 40, 1
    x0 = _rand(rng, Bt, f, Tt, c)
    mod = DecoderBlock(out_channels=c // 2, padding=p)
    params = dict(mod.init(jax.random.PRNGKey(2), x0)["params"])
    if convout:
        params["convout"] = {
            "kernel": _rand(rng, 3, 3, c // 2, 2) * 0.2,
            "bias": _rand(rng, 2) * 0.1}
    xp = pack_nhwc(x0)

    def build(params):
        return decoder_level_spec(
            {k: v for k, v in params.items() if k != "convout"}, f,
            output_padding=p,
            convout_params=params.get("convout"), with_adjoints=True)

    spec0 = build(params)
    w_ref = _rand(rng, Bt, spec0.r_out, Tt)

    def loss_fused(params, xp):
        spec = build(params)
        fn = make_fused_level_train(spec, tile_t=128, interpret=True)
        arrays = (spec.weight_arrays(jnp.float32)
                  + spec.adjoint_arrays(jnp.float32))
        return jnp.sum(fn(xp, *arrays) * w_ref)

    def loss_xla(params, xp):
        return jnp.sum(packed_level_apply_xla(xp, build(params)) * w_ref)

    v1, g1 = jax.value_and_grad(loss_xla, argnums=(0, 1))(params, xp)
    v2, g2 = jax.value_and_grad(loss_fused, argnums=(0, 1))(params, xp)
    assert float(v1) == pytest.approx(float(v2), rel=1e-5)
    np.testing.assert_allclose(np.asarray(g2[1]), np.asarray(g1[1]),
                               atol=1e-4, rtol=1e-4)
    flat1 = dict(jax.tree_util.tree_leaves_with_path(g1[0]))
    for path, l2 in jax.tree_util.tree_leaves_with_path(g2[0]):
        np.testing.assert_allclose(np.asarray(l2), np.asarray(flat1[path]),
                                   atol=1e-4, rtol=1e-3, err_msg=str(path))


def test_fused_level_train_bf16_close_to_f32():
    """The mixed-precision (bf16 storage, f32 accumulate) fused training
    level tracks the f32 XLA autodiff values and gradients to bf16
    tolerance — gradients keep full-precision (f32) leaves."""
    from timbre_trap_tpu.ops.fused_level import (make_fused_level_train,
                                                 packed_level_apply_xla)

    rng = np.random.default_rng(0)
    B, T, C, F = 1, 24, 4, 40
    x0 = _rand(rng, B, F, T, C)
    mod = EncoderBlock(out_channels=2 * C)
    params = mod.init(jax.random.PRNGKey(1), x0)["params"]
    xp = pack_nhwc(x0)
    spec0 = encoder_level_spec(params, F, with_adjoints=True)
    w_ref = _rand(rng, B, spec0.r_out, T)

    def loss_bf16(params, xp):
        spec = encoder_level_spec(params, F, with_adjoints=True)
        fn = make_fused_level_train(spec, tile_t=128, interpret=True,
                                    dtype=jnp.bfloat16)
        arrays = (spec.weight_arrays(jnp.float32)
                  + spec.adjoint_arrays(jnp.float32))
        return jnp.sum(fn(xp, *arrays) * w_ref)

    def loss_xla(params, xp):
        spec = encoder_level_spec(params, F, with_adjoints=True)
        return jnp.sum(packed_level_apply_xla(xp, spec) * w_ref)

    v1, g1 = jax.value_and_grad(loss_xla, argnums=(0, 1))(params, xp)
    v2, g2 = jax.value_and_grad(loss_bf16, argnums=(0, 1))(params, xp)
    assert float(v1) == pytest.approx(float(v2), rel=2e-2)
    assert g2[1].dtype == jnp.float32
    # direction agreement: bf16 rounding bounds elementwise mismatch
    np.testing.assert_allclose(np.asarray(g2[1]), np.asarray(g1[1]),
                               atol=5e-2 * float(jnp.max(jnp.abs(g1[1]))))
    flat1 = dict(jax.tree_util.tree_leaves_with_path(g1[0]))
    for path, l2 in jax.tree_util.tree_leaves_with_path(g2[0]):
        ref = np.asarray(flat1[path])
        assert l2.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(l2), ref,
                                   atol=5e-2 * max(1e-3, np.abs(ref).max()),
                                   err_msg=str(path))


@pytest.mark.parametrize("variant,skip", [("base", False), ("base", True),
                                          ("film", False)])
def test_packed_train_forward_batched_pairs_parity(variant, skip):
    """The 2B stacked decoder sweeps (batch_pairs=True) reproduce the four
    separate decode_packed calls exactly — outputs AND gradients — for the
    indicator, FiLM, and skip-connection configurations. Every decoder
    level is batch-independent, so stacking [recon|transcription] on the
    batch axis is pure re-batching (reference modules.py:338-393)."""
    from timbre_trap_tpu.models.fused import packed_train_forward

    rng = np.random.default_rng(7)
    f_size = 540
    net = TimbreTrapNet(feature_size=f_size, latent_size=16,
                        model_complexity=1, variant=variant,
                        skip_connections=skip)
    x = _rand(rng, 2, f_size, 16, net.in_channels)
    params = net.init(jax.random.PRNGKey(2), x)["params"]
    w = [_rand(rng, 2, f_size * net.in_channels, 16) for _ in range(4)]

    def loss(params, batch_pairs):
        outs = packed_train_forward(params, net, x, consistency=True,
                                    backend="xla", remat=False,
                                    batch_pairs=batch_pairs)
        rec, _, trn, trn_rec, trn_scr = outs
        return sum(jnp.sum(o * wi) for o, wi
                   in zip((rec, trn, trn_rec, trn_scr), w))

    v_sep, g_sep = jax.value_and_grad(loss)(params, False)
    v_bat, g_bat = jax.value_and_grad(loss)(params, True)
    assert float(v_sep) == pytest.approx(float(v_bat), rel=1e-6)
    flat = dict(jax.tree_util.tree_leaves_with_path(g_sep))
    for path, lb in jax.tree_util.tree_leaves_with_path(g_bat):
        ref = np.asarray(flat[path])
        # The 2B-batch dW contraction reduces in a different order than two
        # separate B-batch ones — identical math, f32 rounding only.
        np.testing.assert_allclose(np.asarray(lb), ref, rtol=1e-3,
                                   atol=1e-5 * max(1.0, np.abs(ref).max()),
                                   err_msg=str(path))
