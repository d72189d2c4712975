"""Fused Pallas TPU kernels for whole encoder/decoder levels.

Motivation (docs/ROADMAP.md, VERDICT r1): every XLA conv in the model costs
a flat ~325 us on v5e regardless of FLOPs — the stack is per-op memory-tax
bound (small-channel NHWC activations round-trip HBM with heavy layout
padding between each of the ~50 ops of a forward pass). These kernels run
each level — [convin] -> 3 residual blocks -> sconv (encoder), or
tconv -> 3 residual blocks -> [convout] (decoder, reference
``modules.py:597-718``) — as ONE Pallas program: the level input is DMA'd
to VMEM once per (batch, time-tile) grid step, all ~7 convs + ELUs +
residual adds happen on-chip in the packed f-major layout
(``ops/packed_conv.py``), and only the level output is written back.

Each conv is the repeating banded-block matmul built by ``packed_conv``:
``y_block_j = sum_dt B_dt @ x_shift_dt[j*col_adv - margin : ... + K]`` with
static row windows (the j-loop is unrolled), so everything lowers to MXU
dots. Accumulation is always float32; ``dtype=bfloat16`` stores activations
and weights in bf16 between stages (2x memory, higher MXU rate) — the
f32/bf16 policy is chosen by the caller per entry point.
"""

import math
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .packed_conv import (BLOCK_ROWS, ConvBlocks, build_conv2d_blocks,
                          build_sconv_blocks, build_tconv_blocks)

__all__ = ["LevelSpec", "encoder_level_spec", "decoder_level_spec",
           "fused_level_apply", "packed_level_apply_xla"]


def packed_level_apply_xla(x, spec):
    """Execute a LevelSpec with plain XLA banded einsums (differentiable).

    Same math as the Pallas kernel but each stage is a
    ``packed_conv_reference`` call on exact (B, R, T) tensors — no VMEM
    management, no lane-padded transients, autodiff for free. This is the
    training backend (models/fused.py).
    """
    from .packed_conv import packed_conv_reference

    def elu(v):
        return jax.nn.elu(v)

    cur = x
    for it in spec.items:
        if it[0] == "conv":
            y = packed_conv_reference(cur, it[1])
            cur = elu(y) if it[2] else y
        else:
            h = elu(packed_conv_reference(cur, it[1]))
            cur = elu(packed_conv_reference(h, it[2])) + cur
    return cur

# Time halo per side. Must cover the cumulative conv time taps of a level
# (<= 7) AND make the DMA window tile_t + 2*HALO a multiple of the 128-lane
# tile (Mosaic alignment requirement for the lane-dim slice).
HALO = 64


def default_tile_t(dtype):
    """Largest tile that keeps the level working set inside ~16 MB VMEM."""
    return 384 if jnp.dtype(dtype) == jnp.bfloat16 else 128


def _cdiv(a, b):
    return -(-a // b)


class LevelSpec:
    """Static description of one fused level.

    ``items``: sequence of ("conv", cb, act_bool) or ("rb", cb3x3, cb1x1);
    an "rb" is conv3x3+ELU -> conv1x1+ELU -> add(stage input)
    (reference ``modules.py:721-777``).
    """

    def __init__(self, items, r_in):
        self.items = items
        self.r_in = int(r_in)
        r = self.r_in
        for it in items:
            cb = it[1]
            assert cb.r_in == r, (cb.r_in, r)
            r = cb.r_out if it[0] == "conv" else r
        self.r_out = r
        last_cb = items[-1][1]
        self.rb_out = _cdiv(self.r_out, BLOCK_ROWS) * BLOCK_ROWS

    def weight_arrays(self, dtype):
        """Flat list of (blocks, bias) arrays in kernel-argument order."""
        out = []
        for it in self.items:
            for cb in it[1:]:
                if not isinstance(cb, ConvBlocks):
                    continue
                out.append(jnp.asarray(cb.blocks, dtype))
                # (128, 1): Mosaic vectors must stay >= 2D (no 1D concats)
                out.append(jnp.asarray(cb.bias, jnp.float32)[:, None])
        return out


def _slab_geometry(cb: ConvBlocks):
    """(top, bottom) zero-margin rows a conv stage needs around its input."""
    nb = cb.n_out_blocks
    top = cb.margin
    bottom = max(0, (nb - 1) * cb.col_adv - cb.margin + cb.k - cb.r_in)
    return top, bottom


def encoder_level_spec(block_params, f_in, convin_params=None):
    """LevelSpec for an EncoderBlock (+ optionally the preceding convin).

    ``block_params``: flax param dict with block1..block3 (each conv1,
    conv2) and sconv; reference geometry ``modules.py:597-655``.
    """
    items = []
    if convin_params is not None:
        cb = build_conv2d_blocks(convin_params["kernel"],
                                 convin_params["bias"], f_in, 1)
        items.append(("conv", cb, True))
    for i, d in enumerate((1, 2, 3)):
        rb = block_params[f"block{i + 1}"]
        cb1 = build_conv2d_blocks(rb["conv1"]["kernel"], rb["conv1"]["bias"],
                                  f_in, d)
        cb2 = build_conv2d_blocks(rb["conv2"]["kernel"], rb["conv2"]["bias"],
                                  f_in, 1)
        items.append(("rb", cb1, cb2))
    sc = block_params["sconv"]
    items.append(("conv", build_sconv_blocks(sc["kernel"], sc["bias"], f_in,
                                             stride=2), True))
    r_in = items[0][1].r_in
    return LevelSpec(items, r_in)


def decoder_level_spec(block_params, f_in, output_padding=0,
                       convout_params=None):
    """LevelSpec for a DecoderBlock (+ optionally the trailing convout).

    Reference geometry ``modules.py:658-718``; convout ``modules.py:543``.
    """
    tc = block_params["tconv"]
    cb_t = build_tconv_blocks(tc["kernel"], tc["bias"], f_in, stride=2,
                              output_padding=output_padding)
    items = [("conv", cb_t, True)]
    f_mid = cb_t.f_out
    for i, d in enumerate((1, 2, 3)):
        rb = block_params[f"block{i + 1}"]
        cb1 = build_conv2d_blocks(rb["conv1"]["kernel"], rb["conv1"]["bias"],
                                  f_mid, d)
        cb2 = build_conv2d_blocks(rb["conv2"]["kernel"], rb["conv2"]["bias"],
                                  f_mid, 1)
        items.append(("rb", cb1, cb2))
    if convout_params is not None:
        cb = build_conv2d_blocks(convout_params["kernel"],
                                 convout_params["bias"], f_mid, 1)
        items.append(("conv", cb, False))
    return LevelSpec(items, cb_t.r_in)


# --------------------------------------------------------------------- #
# Kernel body (values-based: static unrolled loops -> MXU dots)         #
# --------------------------------------------------------------------- #

def _elu(x):
    # jax.nn.elu lowers via expm1, which Mosaic lacks; exp-1 is identical to
    # float tolerance here (inputs are not denormal-scale).
    return jnp.where(x > 0, x, jnp.exp(jnp.minimum(x, 0.0)) - 1.0)


def _shift_t(x, dt):
    """x[:, t] -> x[:, t + dt] with zero fill (correlation semantics)."""
    if dt == 0:
        return x
    w = x.shape[1]
    zeros = jnp.zeros((x.shape[0], abs(dt)), x.dtype)
    if dt > 0:
        return jnp.concatenate([x[:, dt:], zeros], axis=1)
    return jnp.concatenate([zeros, x[:, :w + dt]], axis=1)


def _conv_stage(slab, cb, blocks_ref, bias_ref, acc_dtype=jnp.float32):
    """Banded conv on a zero-margined slab value -> (rb*128, W) f32 value."""
    nb = cb.n_out_blocks
    outs = []
    bias = bias_ref[:]  # (128, 1), broadcasts over the time axis
    # f32 storage means the caller wants true fp32 math: force full-precision
    # MXU passes (TPU "default" precision multiplies in bf16).
    precision = (jax.lax.Precision.HIGHEST
                 if slab.dtype == jnp.float32 else jax.lax.Precision.DEFAULT)
    for j in range(nb):
        start = j * cb.col_adv  # slab already starts margin rows above row 0
        acc = bias
        for di, dt in enumerate(cb.dts):
            # Shift per block slice (K, W): smaller live temps than three
            # full shifted slabs (VMEM is the binding constraint).
            xsl = _shift_t(slab[start:start + cb.k, :], dt)
            term = jax.lax.dot_general(
                blocks_ref[di], xsl, (((1,), (0,)), ((), ())),
                precision=precision, preferred_element_type=acc_dtype)
            acc = acc + term
        outs.append(acc)
    return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]


def _make_slab(y, cb_next_top, cb_next_bottom, r_valid, dtype):
    """Re-slab a (rb, W) value: keep r_valid rows, zero-pad margins."""
    y = y[:r_valid]
    return jnp.pad(y.astype(dtype), ((cb_next_top, cb_next_bottom), (0, 0)))


def _level_kernel(spec: LevelSpec, dtype, tile_t, t_total, x_hbm, *args):
    # args layout: [w0, b0, w1, b1, ...], o_ref, xv scratch, sem
    n_w = sum(2 for it in spec.items
              for cb in it[1:] if isinstance(cb, ConvBlocks))
    weights = args[:n_w]
    o_ref, xv, sem = args[n_w], args[n_w + 1], args[n_w + 2]

    b = pl.program_id(0)
    j = pl.program_id(1)
    # 128-aligned window (Mosaic requires lane-dim DMA slices in units of
    # 128): tile_t useful columns + a 64-column halo on each side.
    w_t = tile_t + 2 * HALO
    copy = pltpu.make_async_copy(
        x_hbm.at[b, :, pl.ds(j * tile_t, w_t)], xv, sem)
    copy.start()
    copy.wait()

    # Columns outside the real [0, t_total) range (global edge halos and the
    # tile-multiple tail) must stay zero between stages: a conv writes
    # "virtual" values (bias + partial taps) there, but chained SAME convs
    # semantically read zeros outside the array.
    local = jax.lax.broadcasted_iota(jnp.int32, (1, w_t), 1)
    col_global = j * tile_t + local - HALO
    col_ok = ((col_global >= 0) & (col_global < t_total))

    slab = xv[:, :]
    wi = 0
    r_cur = spec.r_in
    for idx, it in enumerate(spec.items):
        if it[0] == "conv":
            cb, act = it[1], it[2]
            y = _conv_stage(slab, cb, weights[wi], weights[wi + 1])
            wi += 2
            if act:
                y = _elu(y)
            r_cur = cb.r_out
        else:
            cb1, cb2 = it[1], it[2]
            h = _elu(_conv_stage(slab, cb1, weights[wi],
                                       weights[wi + 1]))
            wi += 2
            # 1x1 conv: aligned 128-row blocks, margin 0 -> slab is h itself
            h = h.astype(dtype)
            y = _elu(_conv_stage(h, cb2, weights[wi], weights[wi + 1]))
            wi += 2
            top = cb1.margin
            y = y[:r_cur] + slab[top:top + r_cur].astype(jnp.float32)
        if idx + 1 < len(spec.items):
            y = jnp.where(col_ok, y, 0.0)
            nxt = spec.items[idx + 1][1]
            t_next, b_next = _slab_geometry(nxt)
            slab = _make_slab(y, t_next, b_next, r_cur, dtype)
        else:
            out = jnp.pad(y[:r_cur], ((0, spec.rb_out - r_cur), (0, 0)))
            o_ref[0, :, :] = out[:, HALO:HALO + tile_t].astype(o_ref.dtype)


def fused_level_apply(x, spec: LevelSpec, dtype=jnp.float32,
                      tile_t=None, interpret=False):
    """Run one fused level on packed input (B, R_in, T) -> (B, R_out, T).

    ``dtype`` is the inter-stage activation/weight storage type (f32 or
    bf16); accumulation is always f32. Works in interpret mode on CPU for
    tests; compiled Pallas on TPU.
    """
    if tile_t is None:
        tile_t = default_tile_t(dtype)
    b, r_in, t = x.shape
    assert r_in == spec.r_in, (r_in, spec.r_in)
    assert tile_t % BLOCK_ROWS == 0, "tile_t must be lane-tile aligned"
    first_cb = spec.items[0][1]
    top, bottom = _slab_geometry(first_cb)
    # Row extent padded to the sublane tile so the DMA slice is aligned.
    r_slab = top + r_in + bottom
    bottom += -r_slab % 32
    r_slab = top + r_in + bottom

    n_t = _cdiv(t, tile_t)
    pad_t = n_t * tile_t - t
    xp = jnp.pad(x.astype(dtype),
                 ((0, 0), (top, bottom), (HALO, HALO + pad_t)))
    w_t = tile_t + 2 * HALO

    weights = spec.weight_arrays(dtype)
    # biases stay f32: weight_arrays interleaves (blocks dtype, bias f32)
    kernel = partial(_level_kernel, spec, dtype, tile_t, t)

    out = pl.pallas_call(
        kernel,
        grid=(b, n_t),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] +
                 [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(weights),
        out_specs=pl.BlockSpec((1, spec.rb_out, tile_t),
                               lambda bi, ji: (bi, 0, ji),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, spec.rb_out, n_t * tile_t), dtype),
        scratch_shapes=[pltpu.VMEM((r_slab, w_t), dtype),
                        pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, *weights)
    return out[:, :spec.r_out, :t]
