"""Banded packed-layout conv formulation vs the flax/XLA reference ops."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from timbre_trap_tpu.ops.packed_conv import (
    build_conv2d_blocks, build_dense_blocks, build_sconv_blocks,
    build_tconv_blocks, pack_nhwc, unpack_to_nhwc, packed_conv_reference)

# The five flagship level geometries (C, F) plus the convin/convout cases.
LEVELS = [(4, 540), (8, 269), (16, 133), (32, 65), (64, 31)]


def _rand(rng, *shape):
    return jnp.asarray(rng.standard_normal(shape), jnp.float32)


def _conv_nhwc(x, w, b, dilation=1):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b


@pytest.mark.parametrize("c,f", LEVELS)
@pytest.mark.parametrize("dilation", [1, 2, 3])
def test_conv3x3_banded_matches_xla(c, f, dilation):
    rng = np.random.default_rng(c * 100 + dilation)
    B, T = 2, 64
    x = _rand(rng, B, f, T, c)
    w = _rand(rng, 3, 3, c, c) * 0.2
    b = _rand(rng, c) * 0.1

    ref = _conv_nhwc(x, w, b, dilation)
    cb = build_conv2d_blocks(w, b, f, dilation)
    got = unpack_to_nhwc(packed_conv_reference(pack_nhwc(x), cb), c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("c,f", LEVELS)
def test_conv1x1_banded_matches_xla(c, f):
    rng = np.random.default_rng(c)
    B, T = 2, 64
    x = _rand(rng, B, f, T, c)
    w = _rand(rng, 1, 1, c, c) * 0.2
    b = _rand(rng, c) * 0.1
    ref = _conv_nhwc(x, w, b)
    cb = build_conv2d_blocks(w, b, f)
    got = unpack_to_nhwc(packed_conv_reference(pack_nhwc(x), cb), c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("cin,cout,f", [(2, 4, 540), (4, 2, 540),
                                        (2, 8, 540), (1, 4, 540)])
def test_convin_convout_banded(cin, cout, f):
    """3x3 SAME conv with C_in != C_out (convin/convout, modules.py:430,543)."""
    rng = np.random.default_rng(cin * 7 + cout)
    B, T = 2, 64
    x = _rand(rng, B, f, T, cin)
    w = _rand(rng, 3, 3, cin, cout) * 0.2
    b = _rand(rng, cout) * 0.1
    ref = _conv_nhwc(x, w, b)
    cb = build_conv2d_blocks(w, b, f)
    got = unpack_to_nhwc(packed_conv_reference(pack_nhwc(x), cb), cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("cin,f", LEVELS[:-1])
def test_sconv_banded_matches_xla(cin, f):
    """Down-sampling conv kernel (4,1) stride (2,1) VALID (modules.py:597)."""
    rng = np.random.default_rng(cin)
    B, T, cout = 2, 64, 2 * cin
    x = _rand(rng, B, f, T, cin)
    w = _rand(rng, 4, 1, cin, cout) * 0.2
    b = _rand(rng, cout) * 0.1
    ref = jax.lax.conv_general_dilated(
        x, w, (2, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    cb = build_sconv_blocks(w, b, f, stride=2)
    assert cb.f_out == ref.shape[1]
    got = unpack_to_nhwc(packed_conv_reference(pack_nhwc(x), cb), cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("cin,f,pad", [(64, 31, 0), (32, 65, 1), (16, 133, 0),
                                       (8, 269, 1), (64, 31, 1)])
def test_tconv_banded_matches_torch_semantics(cin, f, pad):
    """Transposed conv kernel (4,1) stride (2,1) + output_padding parity."""
    from timbre_trap_tpu.ops.conv import ConvTranspose2dTorch

    rng = np.random.default_rng(cin + pad)
    B, T, cout = 2, 64, cin // 2
    x = _rand(rng, B, f, T, cin)
    mod = ConvTranspose2dTorch(cout, (4, 1), strides=(2, 1),
                               output_padding=(pad, 0))
    params = mod.init(jax.random.PRNGKey(0), x)
    ref = mod.apply(params, x)
    w = params["params"]["kernel"]
    b = params["params"]["bias"]
    cb = build_tconv_blocks(w, b, f, stride=2, output_padding=pad)
    assert cb.f_out == ref.shape[1] == (f - 1) * 2 + 4 + pad
    got = unpack_to_nhwc(packed_conv_reference(pack_nhwc(x), cb), cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_pack_round_trip():
    rng = np.random.default_rng(0)
    x = _rand(rng, 2, 13, 9, 4)
    np.testing.assert_array_equal(
        np.asarray(unpack_to_nhwc(pack_nhwc(x), 4)), np.asarray(x))


def test_builder_forms_identical_blocks():
    """The gather (inference) and one-hot-einsum (training VJP) block
    builders produce bit-comparable banded blocks for every conv family
    (packed_conv._build_blocks vjp_einsum; the r5 device_rtf bisect gave
    each execution path the form measured fastest there)."""
    rng = np.random.default_rng(11)
    cases = []
    for c, f in [(4, 540), (32, 65)]:
        k3 = _rand(rng, 3, 3, c, c)
        b = _rand(rng, c)
        cases.append(lambda e, k3=k3, b=b, f=f, c=c:
                     build_conv2d_blocks(k3, b, f, 2, vjp_einsum=e))
        ks = _rand(rng, 4, 1, c, 2 * c)
        bs = _rand(rng, 2 * c)
        cases.append(lambda e, ks=ks, bs=bs, f=f:
                     build_sconv_blocks(ks, bs, f, 2, vjp_einsum=e))
        kt = _rand(rng, 4, 1, c, c // 2 if c > 2 else c)
        bt = _rand(rng, kt.shape[-1])
        cases.append(lambda e, kt=kt, bt=bt, f=f:
                     build_tconv_blocks(kt, bt, f, 2, output_padding=1,
                                        vjp_einsum=e))
    for make in cases:
        g, s = make(False), make(True)
        assert (g.dts, g.col_adv, g.margin, g.k) == \
               (s.dts, s.col_adv, s.margin, s.k)
        np.testing.assert_allclose(np.asarray(g.blocks),
                                   np.asarray(s.blocks), atol=1e-7)
        np.testing.assert_allclose(np.asarray(g.bias), np.asarray(s.bias))


def test_dense_blocks_match_matmul():
    """build_dense_blocks (the latent-bridge per-block form that folds the
    inference matmuls into the fused kernel, models/fused.py) executes as
    exactly y = W @ x + b under packed_conv_reference, for shapes on and
    off the 16/128 alignment boundaries."""
    rng = np.random.default_rng(7)
    for r_out, r_in in [(128, 128), (270, 129), (64, 16), (133, 37)]:
        w = _rand(rng, r_out, r_in)
        b = _rand(rng, r_out)
        x = _rand(rng, 2, r_in, 11)  # packed (B, R_in, T)
        cb = build_dense_blocks(w, b)
        assert cb.per_block and cb.r_in == r_in and cb.r_out == r_out
        got = np.asarray(packed_conv_reference(jnp.asarray(x), cb))
        ref = np.einsum("oi,bit->bot", w, x) + b[None, :, None]
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)
