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
           "fuse_level_specs", "fused_level_apply", "packed_level_apply_xla",
           "make_fused_level_train", "default_tile_t",
           "default_train_tile_t"]


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
    """Measured-fastest INFERENCE tiles on v5e (bf16 swept 384/512/640 on
    the full transcribe pipeline: 1016x/1052x/918x RT — 512 wins; f32 is
    bounded by VMEM at HIGHEST precision)."""
    return 512 if jnp.dtype(dtype) == jnp.bfloat16 else 128


def default_train_tile_t(dtype):
    """Measured-fastest SAFE training tiles on v5e (reference recipe,
    batch 8 x 9-s crops, r3 sweep). The training kernels run
    default-precision matmuls, so — unlike HIGHEST-precision f32
    inference — wide f32 tiles fit VMEM: f32 128/256/384/512 ->
    766/617/574/551 ms/step; bf16 256/384/512/640 -> 568/520/506/506
    ms/step. f32 512 is NOT the default despite winning the sweep: its
    backward kernel sits 0.05% under the 100 MB scoped-VMEM limit at the
    recipe shapes and goes 48 KB OVER on others (T=1024 single-block
    crops) — 384 keeps ~25% headroom at 96% of the speed. bf16 halves the
    slab bytes, so 512 is safe (verified at both shapes); 640 (f32) and
    768 (both) exhaust backward-kernel VMEM outright.

    Re-swept in r4 after the reconstruction backward landed (it extends
    each stashed slab's live range by one item): bf16 640/768 and f32 512
    now OOM the backward stack at the recipe shape, so the r3 defaults
    remain the widest safe tiles."""
    return 512 if jnp.dtype(dtype) == jnp.bfloat16 else 384


def _cdiv(a, b):
    return -(-a // b)


import collections

# Hashable, array-free twins of ConvBlocks / LevelSpec: the kernels only
# consume static geometry (arrays arrive as separate pallas operands), and
# custom_vjp nondiff arguments must not carry traced values.
ConvGeom = collections.namedtuple(
    "ConvGeom", "dts col_adv margin k r_in r_out n_out_blocks per_block")
LevelGeom = collections.namedtuple("LevelGeom", "items r_in r_out rb_out")


def conv_geom(cb):
    return ConvGeom(cb.dts, cb.col_adv, cb.margin, cb.k, cb.r_in, cb.r_out,
                    cb.n_out_blocks, getattr(cb, "per_block", False))


class LevelSpec:
    """Static description of one fused level.

    ``items``: sequence of ("conv", cb, act_bool) or ("rb", cb3x3, cb1x1);
    an "rb" is conv3x3+ELU -> conv1x1+ELU -> add(stage input)
    (reference ``modules.py:721-777``). Each ConvBlocks may carry an
    ``adjoint`` ConvBlocks (transpose of the conv as another repeating
    banded conv) when the spec was built ``with_adjoints``.
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
        self.rb_out = _cdiv(self.r_out, BLOCK_ROWS) * BLOCK_ROWS

    def _convs(self):
        for it in self.items:
            for cb in it[1:]:
                if isinstance(cb, ConvBlocks):
                    yield cb

    def geom(self):
        items = tuple(
            (it[0],) + tuple(conv_geom(cb) if isinstance(cb, ConvBlocks)
                             else cb for cb in it[1:])
            for it in self.items)
        return LevelGeom(items, self.r_in, self.r_out, self.rb_out)

    def adjoint_geom(self):
        items = tuple(
            (it[0],) + tuple(conv_geom(cb.adjoint)
                             if isinstance(cb, ConvBlocks) else cb
                             for cb in it[1:])
            for it in self.items)
        return LevelGeom(items, self.r_in, self.r_out, self.rb_out)

    def weight_arrays(self, dtype):
        """Flat list of (blocks, bias) arrays in kernel-argument order."""
        out = []
        for cb in self._convs():
            out.append(jnp.asarray(cb.blocks, dtype))
            # (128, 1): Mosaic vectors must stay >= 2D (no 1D concats)
            out.append(jnp.asarray(cb.bias, jnp.float32)[:, None])
        return out

    def adjoint_arrays(self, dtype):
        """Flat list of adjoint block arrays (one per conv, no biases)."""
        return [jnp.asarray(cb.adjoint.blocks, dtype) for cb in self._convs()]


def _slab_geometry(cb: ConvBlocks):
    """(top, bottom) zero-margin rows a conv stage needs around its input."""
    nb = cb.n_out_blocks
    top = cb.margin
    bottom = max(0, (nb - 1) * cb.col_adv - cb.margin + cb.k - cb.r_in)
    return top, bottom


def _zeros_bias(kernel, swapped=True):
    c = kernel.shape[2] if swapped else kernel.shape[3]
    return jnp.zeros((c,), jnp.float32)


def _attach_conv2d_adjoint(cb, kernel, f_in, dilation):
    """dX of a SAME 2D conv = SAME conv with flipped taps, channels swapped."""
    adj_k = jnp.flip(jnp.asarray(kernel, jnp.float32), (0, 1)
                     ).transpose(0, 1, 3, 2)
    cb.adjoint = build_conv2d_blocks(adj_k, _zeros_bias(kernel), f_in,
                                     dilation, vjp_einsum=True)
    return cb


def _attach_sconv_adjoint(cb, kernel, f_in, stride=2):
    """dX of the strided VALID conv = transposed conv with the same kernel,
    channels swapped, output_padding chosen so f_out == the fwd f_in."""
    kh = kernel.shape[0]
    pad = f_in - ((cb.f_out - 1) * stride + kh)
    adj_k = jnp.asarray(kernel, jnp.float32).transpose(0, 1, 3, 2)
    cb.adjoint = build_tconv_blocks(adj_k, _zeros_bias(kernel), cb.f_out,
                                    stride=stride, output_padding=pad,
                                    vjp_einsum=True)
    assert cb.adjoint.r_out == cb.r_in
    return cb


def _attach_tconv_adjoint(cb, kernel, stride=2):
    """dX of the transposed conv = strided VALID conv, channels swapped."""
    adj_k = jnp.asarray(kernel, jnp.float32).transpose(0, 1, 3, 2)
    cb.adjoint = build_sconv_blocks(adj_k, _zeros_bias(kernel), cb.f_out,
                                    stride=stride, vjp_einsum=True)
    assert cb.adjoint.r_out == cb.r_in, (cb.adjoint.r_out, cb.r_in)
    return cb


def encoder_level_spec(block_params, f_in, convin_params=None,
                       with_adjoints=False):
    """LevelSpec for an EncoderBlock (+ optionally the preceding convin).

    ``block_params``: flax param dict with block1..block3 (each conv1,
    conv2) and sconv; reference geometry ``modules.py:597-655``.
    """
    items = []
    if convin_params is not None:
        cb = build_conv2d_blocks(convin_params["kernel"],
                                 convin_params["bias"], f_in, 1,
                                 vjp_einsum=with_adjoints)
        if with_adjoints:
            _attach_conv2d_adjoint(cb, convin_params["kernel"], f_in, 1)
        items.append(("conv", cb, True))
    for i, d in enumerate((1, 2, 3)):
        rb = block_params[f"block{i + 1}"]
        cb1 = build_conv2d_blocks(rb["conv1"]["kernel"], rb["conv1"]["bias"],
                                  f_in, d, vjp_einsum=with_adjoints)
        cb2 = build_conv2d_blocks(rb["conv2"]["kernel"], rb["conv2"]["bias"],
                                  f_in, 1, vjp_einsum=with_adjoints)
        if with_adjoints:
            _attach_conv2d_adjoint(cb1, rb["conv1"]["kernel"], f_in, d)
            _attach_conv2d_adjoint(cb2, rb["conv2"]["kernel"], f_in, 1)
        items.append(("rb", cb1, cb2))
    sc = block_params["sconv"]
    cbs = build_sconv_blocks(sc["kernel"], sc["bias"], f_in, stride=2,
                             vjp_einsum=with_adjoints)
    if with_adjoints:
        _attach_sconv_adjoint(cbs, sc["kernel"], f_in, stride=2)
    items.append(("conv", cbs, True))
    r_in = items[0][1].r_in
    return LevelSpec(items, r_in)


def decoder_level_spec(block_params, f_in, output_padding=0,
                       convout_params=None, with_adjoints=False):
    """LevelSpec for a DecoderBlock (+ optionally the trailing convout).

    Reference geometry ``modules.py:658-718``; convout ``modules.py:543``.
    """
    tc = block_params["tconv"]
    cb_t = build_tconv_blocks(tc["kernel"], tc["bias"], f_in, stride=2,
                              output_padding=output_padding,
                              vjp_einsum=with_adjoints)
    if with_adjoints:
        _attach_tconv_adjoint(cb_t, tc["kernel"], stride=2)
    items = [("conv", cb_t, True)]
    f_mid = cb_t.f_out
    for i, d in enumerate((1, 2, 3)):
        rb = block_params[f"block{i + 1}"]
        cb1 = build_conv2d_blocks(rb["conv1"]["kernel"], rb["conv1"]["bias"],
                                  f_mid, d, vjp_einsum=with_adjoints)
        cb2 = build_conv2d_blocks(rb["conv2"]["kernel"], rb["conv2"]["bias"],
                                  f_mid, 1, vjp_einsum=with_adjoints)
        if with_adjoints:
            _attach_conv2d_adjoint(cb1, rb["conv1"]["kernel"], f_mid, d)
            _attach_conv2d_adjoint(cb2, rb["conv2"]["kernel"], f_mid, 1)
        items.append(("rb", cb1, cb2))
    if convout_params is not None:
        cb = build_conv2d_blocks(convout_params["kernel"],
                                 convout_params["bias"], f_mid, 1,
                                 vjp_einsum=with_adjoints)
        if with_adjoints:
            _attach_conv2d_adjoint(cb, convout_params["kernel"], f_mid, 1)
        items.append(("conv", cb, False))
    return LevelSpec(items, cb_t.r_in)


def spec_time_reach(spec: "LevelSpec"):
    """Worst-case columns/side a spec's chained stages read beyond a tile.

    Chained SAME convs compound their time taps: stage i's output at column
    c depends on its input at columns c±max|dt|, so the total halo a spec
    needs is the SUM of each conv's max tap magnitude (rb items chain two
    convs). The per-level specs reach <= 7; the flagship whole-encoder /
    whole-decoder fused specs reach 25 each (measured at construction).
    """
    return sum(max(abs(d) for d in cb.dts)
               for it in spec.items for cb in it[1:]
               if isinstance(cb, (ConvBlocks, ConvGeom)))


def fuse_level_specs(specs):
    """Concatenate adjacent LevelSpecs into ONE fused kernel spec.

    All levels share the time axis (the model only ever downsamples
    frequency — reference ``modules.py:597-718`` strides the F axis), so a
    sequence of levels is itself a valid item chain: the kernel body
    (``_level_kernel``) is generic over items and re-slabs between stages
    in VMEM. Fusing the 4 encoder (or decoder) levels into one
    ``pallas_call`` removes the HBM write+read of every intermediate level
    boundary (~2.1k packed rows x T each) and 3/4 of the level kernel
    dispatches — the per-op boundary tax that motivated fused levels in
    the first place (module docstring).

    Valid only while the chained specs' cumulative time reach fits the DMA
    halo; asserted here (the flagship geometry reaches 25 of the 64-column
    HALO per side). Row chaining (r_out == next r_in) is asserted by the
    LevelSpec constructor.
    """
    items = []
    for s in specs:
        items.extend(s.items)
    fused = LevelSpec(items, specs[0].r_in)
    reach = spec_time_reach(fused)
    assert reach <= HALO, (
        f"fused spec time reach {reach} exceeds the {HALO}-column DMA halo; "
        f"fuse fewer levels")
    return fused


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


def _conv_stage(slab, cb, blocks_ref, bias_ref, precision=None,
                acc_dtype=jnp.float32):
    """Banded conv on a zero-margined slab value -> (rb*128, W) f32 value.

    ``cb.per_block``: blocks are (1, nb*128, K) DENSE per-block slices
    (the latent-boundary matmuls, packed_conv.build_dense_blocks) — every
    block reads the same window (col_adv 0) with its own weights/bias.
    """
    nb = cb.n_out_blocks
    per_block = getattr(cb, "per_block", False)
    outs = []
    bias = None if (bias_ref is None or per_block) else bias_ref[:]
    if precision is None:
        # f32 storage means the caller wants true fp32 math: force
        # full-precision MXU passes (the TPU default multiplies in bf16).
        precision = ("highest" if slab.dtype == jnp.float32 else "default")
    for j in range(nb):
        start = 0 if per_block else j * cb.col_adv
        if per_block and bias_ref is not None:
            bias = bias_ref[j * BLOCK_ROWS:(j + 1) * BLOCK_ROWS, :]
        acc = bias
        for di, dt in enumerate(cb.dts):
            # Shift per block slice (K, W): smaller live temps than three
            # full shifted slabs (VMEM is the binding constraint).
            xsl = _shift_t(slab[start:start + cb.k, :], dt)
            w = (blocks_ref[di, j * BLOCK_ROWS:(j + 1) * BLOCK_ROWS, :]
                 if per_block else blocks_ref[di])
            term = jax.lax.dot_general(
                w, xsl, (((1,), (0,)), ((), ())),
                precision=precision, preferred_element_type=acc_dtype)
            acc = term if acc is None else acc + term
        outs.append(acc)
    return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]


def _adjoint_apply(dz, g_adj, blocks_ref, precision):
    """Backprop a conv: cotangent (>= r_in rows, W) -> (r_out rows, W).

    The cotangent slab is stored at the adjoint blocks' dtype (bf16 in the
    mixed-precision training mode) and the dot accumulates f32.
    """
    top, bottom = _slab_geometry(g_adj)
    slab = _make_slab(dz, top, bottom, g_adj.r_in, blocks_ref.dtype)
    y = _conv_stage(slab, g_adj, blocks_ref, None, precision)
    return y[:g_adj.r_out]


def _make_slab(y, cb_next_top, cb_next_bottom, r_valid, dtype):
    """Re-slab a (rb, W) value: keep r_valid rows, zero-pad margins."""
    y = y[:r_valid]
    return jnp.pad(y.astype(dtype), ((cb_next_top, cb_next_bottom), (0, 0)))


def _dbuf(dtype):
    """Whether the TRAINING kernels' input DMAs run double-buffered.

    The blocked outputs are pipelined by pallas itself; only the ANY-space
    inputs are copied manually, and serial start()+wait() stalls compute on
    every tile. bf16 training has the VMEM headroom for a second buffer;
    f32 does not (the f32 train backward sits within ~1% of the 100 MB
    scoped limit at its widest safe tile).

    INFERENCE always runs serial: the r5 on-chip bisect
    (tools/bisect_device_rtf.py, docs/PERFORMANCE.md "device_rtf bisect")
    measured double-buffering ~45 RTF (≈4%) SLOWER on bf16 device-resident
    transcribe — at inference tile widths the extra buffer halves the slab
    VMEM left for the level's live temps and the DMAs were already short
    relative to compute — so ``fused_level_apply`` pins dbuf off.
    """
    return jnp.dtype(dtype) == jnp.bfloat16


def _input_dma(hbm, scratch, sem, tile_t, w_t, dbuf):
    """Stream THIS grid step's (b, :, j·tile_t : +w_t) window into VMEM.

    Returns ``(window_ref, wait)`` — call ``wait()`` before reading the
    ref; keeping start and wait separate lets a kernel with several
    inputs overlap their copies even in serial mode.

    ``dbuf=False``: scratch is (rows, w_t); plain copy for this tile.
    ``dbuf=True``: scratch is (2, rows, w_t), sem is DMA((2,)); revolving
    buffers pipelined ACROSS grid steps (TPU grids run sequentially and
    scratch persists, exactly like the cross-step dW accumulators): tile
    k's copy was started during tile k−1's step, and tile k starts k+1's
    copy BEFORE waiting on its own, so the next window streams in behind
    this tile's compute. Slot (k+1)%2 is free by then — its last user was
    tile k−1, whose compute finished with its grid step.
    """
    b = pl.program_id(0)
    j = pl.program_id(1)
    if not dbuf:
        copy = pltpu.make_async_copy(
            hbm.at[b, :, pl.ds(j * tile_t, w_t)], scratch, sem)
        copy.start()
        return scratch, copy.wait
    n_j = pl.num_programs(1)
    flat = b * n_j + j
    total = pl.num_programs(0) * n_j

    def dma(k, slot):
        return pltpu.make_async_copy(
            hbm.at[k // n_j, :, pl.ds((k % n_j) * tile_t, w_t)],
            scratch.at[slot], sem.at[slot])

    @pl.when(flat == 0)
    def _():
        dma(flat, 0).start()

    @pl.when(flat + 1 < total)
    def _():
        dma(flat + 1, (flat + 1) % 2).start()

    return scratch.at[flat % 2], dma(flat, flat % 2).wait


def _level_kernel(spec, dtype, tile_t, t_total, precision, dbuf, x_hbm,
                  *args):
    # args layout: [w0, b0, w1, b1, ...], o_ref, xv scratch, sem
    # ``spec`` is a LevelSpec or its array-free LevelGeom twin.
    n_w = 2 * _n_convs(spec)
    weights = args[:n_w]
    o_ref, xv, sem = args[n_w], args[n_w + 1], args[n_w + 2]

    j = pl.program_id(1)
    # 128-aligned window (Mosaic requires lane-dim DMA slices in units of
    # 128): tile_t useful columns + a 64-column halo on each side.
    w_t = tile_t + 2 * HALO
    xv, wait_x = _input_dma(x_hbm, xv, sem, tile_t, w_t, dbuf)
    wait_x()

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
            y = _conv_stage(slab, cb, weights[wi], weights[wi + 1],
                            precision)
            wi += 2
            if act:
                y = _elu(y)
            r_cur = cb.r_out
        else:
            cb1, cb2 = it[1], it[2]
            h = _elu(_conv_stage(slab, cb1, weights[wi], weights[wi + 1],
                                 precision))
            wi += 2
            # 1x1 conv: aligned 128-row blocks, margin 0 -> slab is h itself
            h = h.astype(dtype)
            y = _elu(_conv_stage(h, cb2, weights[wi], weights[wi + 1],
                                 precision))
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


# --------------------------------------------------------------------- #
# Training: custom-VJP fused level (Pallas forward + Pallas backward)    #
# --------------------------------------------------------------------- #

def _n_convs(geom):
    return sum(1 if it[0] == "conv" else 2 for it in geom.items)


def _elu_grad(z):
    return jnp.where(z > 0, 1.0, jnp.exp(jnp.minimum(z, 0.0)))


def _elu_grad_from_out(y):
    """ELU'(z) recovered from y = ELU(z): 1 where y > 0, else e^z = y + 1.

    Lets the backward reconstruct activation gradients from stage OUTPUTS
    (already stashed as the next item's input slab) instead of re-running
    the stage's conv to re-derive the pre-activation. Exact in real math;
    in floats the only divergence from ``_elu_grad(z)`` is the rounding of
    y at the storage dtype — ~1 ULP(f32) / bf16-eps relative, the same
    grade as the storage rounding the mixed-precision mode already accepts.
    (ELU' is continuous at 0 — both branches give 1 — so a rounding-flipped
    sign near y=0 costs nothing.)
    """
    y = y.astype(jnp.float32)
    return jnp.where(y > 0, 1.0, y + 1.0)


def _item_fwd(slab, it, ws, dtype, precision, return_inners=False):
    """One item's forward on a margined slab value.

    Returns (y (r rows, W), r, inners) where inners holds the
    pre-activations needed for the item's backward when requested.
    Virtual-column zeroing (col_ok masking) is the CALLER's job, applied
    between items.
    """
    if it[0] == "conv":
        g, act = it[1], it[2]
        z = _conv_stage(slab, g, ws[0], ws[1], precision)[:g.r_out]
        y = _elu(z) if act else z
        return y, g.r_out, (z,)
    g1, g2 = it[1], it[2]
    r = g1.r_out
    h1 = _conv_stage(slab, g1, ws[0], ws[1], precision)[:r]
    a1 = _elu(h1)
    top2, bot2 = _slab_geometry(g2)
    a1s = _make_slab(a1, top2, bot2, r, dtype)
    h2 = _conv_stage(a1s, g2, ws[2], ws[3], precision)[:r]
    top = it[1].margin
    y = _elu(h2) + slab[top:top + r].astype(jnp.float32)
    if return_inners:
        return y, r, (h1, a1s, h2)
    return y, r, ()


def _forward_slabs(xv, geom, weights, col_ok, dtype, precision):
    """ONE forward sweep returning every item's margined input slab.

    Two-pass backward (VERDICT r2 #4): the old per-item ``_replay_to``
    recomputed the forward prefix from the x tile for each item — O(n²)
    stage evaluations per level backward. Stashing the n input slabs as
    live VMEM values instead costs sum(r_slab · w_t) ≈ a few MB at the
    flagship tile (well under the 100 MB VMEM budget) and runs the forward
    exactly once. The last item's output is never needed here: the
    backward reconstructs what it needs from the slabs (non-terminal
    items) or replays the terminal item once (see ``_level_bwd_kernel``).

    Item 0's slab is stashed as ``None``: it is just ``xv[:, :]`` and the
    scratch is never overwritten, so the backward re-reads the ref at its
    (last-in-reverse-order) use instead of keeping a full value copy of
    the widest slab live across the entire backward — the copy's live
    range was what pushed the f32 recipe shape 204 KB over the 100 MB
    scoped-vmem stack.
    """
    slabs = []
    slab = xv[:, :]
    wi = 0
    n_items = len(geom.items)
    for i2, it in enumerate(geom.items):
        slabs.append(None if i2 == 0 else slab)
        n_w = 2 if it[0] == "conv" else 4
        if i2 + 1 < n_items:
            y, r, _ = _item_fwd(slab, it, weights[wi:wi + n_w], dtype,
                                precision)
            y = jnp.where(col_ok, y, 0.0)
            nxt = geom.items[i2 + 1][1]
            t_next, b_next = _slab_geometry(nxt)
            slab = _make_slab(y, t_next, b_next, r, dtype)
        wi += n_w
    return slabs


def _accum_dw(dw_ref, db_ref, dz_masked, in_slab, g, first, precision):
    """dBlocks += sum_j dZ_j @ shift_dt(x_window_j)^T; dBias += row sums."""
    @pl.when(first)
    def _():
        dw_ref[...] = jnp.zeros(dw_ref.shape, dw_ref.dtype)
        db_ref[...] = jnp.zeros(db_ref.shape, db_ref.dtype)

    # Pad the cotangent to whole 128-row blocks (zero rows contribute 0).
    pad_rows = g.n_out_blocks * BLOCK_ROWS - dz_masked.shape[0]
    if pad_rows:
        dz_masked = jnp.pad(dz_masked, ((0, pad_rows), (0, 0)))
    # dW dots run with STORAGE-dtype operands (bf16 in mixed-precision
    # mode — the standard AMP backward, matching the adjoint convs and the
    # reference's autocast training) while accumulating f32. dBias keeps
    # the full-f32 cotangent: it is a plain reduction, no MXU to win.
    dz_ops = dz_masked.astype(in_slab.dtype)
    db = None
    for di, dt in enumerate(g.dts):
        acc = None
        for j in range(g.n_out_blocks):
            dzj = dz_ops[j * BLOCK_ROWS:(j + 1) * BLOCK_ROWS, :]
            xsl = _shift_t(
                in_slab[j * g.col_adv:j * g.col_adv + g.k, :], dt)
            term = jax.lax.dot_general(
                dzj, xsl, (((1,), (1,)), ((), ())),
                precision=precision, preferred_element_type=jnp.float32)
            acc = term if acc is None else acc + term
            if di == 0:
                s = jnp.sum(dz_masked[j * BLOCK_ROWS:(j + 1) * BLOCK_ROWS,
                                      :], axis=1, keepdims=True)
                db = s if db is None else db + s
        dw_ref[di] = dw_ref[di] + acc
    db_ref[...] = db_ref[...] + db


def _level_bwd_kernel(geom, adj_geom, dtype, tile_t, t_total, precision,
                      x_hbm, dy_hbm, *args):
    n_conv = _n_convs(geom)
    weights = args[:2 * n_conv]
    adjs = args[2 * n_conv:3 * n_conv]
    rest = args[3 * n_conv:]
    dx_ref = rest[0]
    dw_refs = rest[1:1 + 2 * n_conv:2]
    db_refs = rest[2:2 + 2 * n_conv:2]
    xv, dyv, semx, semy = rest[1 + 2 * n_conv:]

    b = pl.program_id(0)
    j = pl.program_id(1)
    first = (b == 0) & (j == 0)
    w_t = tile_t + 2 * HALO
    dbuf = _dbuf(dtype)
    xv, wait_x = _input_dma(x_hbm, xv, semx, tile_t, w_t, dbuf)
    dyv, wait_dy = _input_dma(dy_hbm, dyv, semy, tile_t, w_t, dbuf)
    wait_x()
    wait_dy()

    local = jax.lax.broadcasted_iota(jnp.int32, (1, w_t), 1)
    col_global = j * tile_t + local - HALO
    col_ok = ((col_global >= 0) & (col_global < t_total))
    # dW must count every real column exactly once: only this tile's center.
    dw_mask = col_ok & (local >= HALO) & (local < HALO + tile_t)

    n_items = len(geom.items)
    w_offsets = []
    wi = 0
    for it in geom.items:
        w_offsets.append(wi)
        wi += 2 if it[0] == "conv" else 4
    conv_idx = []
    ci = 0
    for it in geom.items:
        conv_idx.append(ci)
        ci += 1 if it[0] == "conv" else 2

    # Backward recompute policy (r4, train-step phase economics,
    # docs/PERFORMANCE.md): a NON-terminal item's output is already
    # stashed as the center rows of the next item's input slab, so its
    # ELU gradient reconstructs for free (``_elu_grad_from_out``) and a
    # residual block's inner output recovers as y - residual — only
    # conv1 must be replayed (its activation a1s is conv2's dW input).
    # Terminal items replay once as before (stashing their output would
    # grow the live-VMEM watermark, which binds at f32 recipe shapes:
    # the full-stash variant OOM'd the 100 MB scoped-vmem stack by
    # 8.25 MB). A terminal LINEAR head (the fused convout) needs no
    # forward at all: dZ = dY. Net: encoder level replays 4/8 stages
    # instead of 8/8; decoder+convout replays 3/8.
    slabs = _forward_slabs(xv, geom, weights, col_ok, dtype, precision)
    dY = dyv[:, :][:geom.r_out].astype(jnp.float32)
    for idx in reversed(range(n_items)):
        # slabs[0] is a deferred read of the (never-mutated) xv scratch —
        # see _forward_slabs' stack-liveness note.
        slab_in = xv[:, :] if slabs[idx] is None else slabs[idx]
        it = geom.items[idx]
        ad = adj_geom.items[idx]
        wi = w_offsets[idx]
        ci = conv_idx[idx]
        last = idx + 1 == n_items
        if it[0] == "conv":
            g, act = it[1], it[2]
            if not act:
                dZ = dY  # linear head: no forward needed
            elif last:
                z = _conv_stage(slab_in, g, weights[wi], weights[wi + 1],
                                precision)[:g.r_out]
                dZ = dY * _elu_grad(z)
            else:
                nxt_top = _slab_geometry(geom.items[idx + 1][1])[0]
                y = slabs[idx + 1][nxt_top:nxt_top + g.r_out]
                dZ = dY * _elu_grad_from_out(y)
            dZm = jnp.where(dw_mask, dZ, 0.0)
            _accum_dw(dw_refs[ci], db_refs[ci], dZm, slab_in, g, first,
                      precision)
            dY = _adjoint_apply(dZ, ad[1], adjs[ci], precision)
        else:
            g1, g2 = it[1], it[2]
            r = g1.r_out
            if last:
                _, _, (h1, a1s, h2) = _item_fwd(
                    slab_in, it, weights[wi:wi + 4], dtype, precision,
                    return_inners=True)
                dH2 = dY * _elu_grad(h2)
            else:
                # eh2 = y - residual, both already stashed as slab centers
                nxt_top = _slab_geometry(geom.items[idx + 1][1])[0]
                y = slabs[idx + 1][nxt_top:nxt_top + r].astype(jnp.float32)
                top = g1.margin
                eh2 = y - slab_in[top:top + r].astype(jnp.float32)
                dH2 = dY * _elu_grad_from_out(eh2)
                h1 = _conv_stage(slab_in, g1, weights[wi], weights[wi + 1],
                                 precision)[:r]
                top2, bot2 = _slab_geometry(g2)
                a1s = _make_slab(_elu(h1), top2, bot2, r, dtype)
            dH2m = jnp.where(dw_mask, dH2, 0.0)
            _accum_dw(dw_refs[ci + 1], db_refs[ci + 1], dH2m, a1s, g2,
                      first, precision)
            dA1 = _adjoint_apply(dH2, ad[2], adjs[ci + 1], precision)
            dH1 = dA1 * _elu_grad(h1)
            dH1m = jnp.where(dw_mask, dH1, 0.0)
            _accum_dw(dw_refs[ci], db_refs[ci], dH1m, slab_in, g1, first,
                      precision)
            dY = _adjoint_apply(dH1, ad[1], adjs[ci], precision) + dY
        dY = jnp.where(col_ok, dY, 0.0)

    rb_in = _cdiv(geom.r_in, BLOCK_ROWS) * BLOCK_ROWS
    out = jnp.pad(dY, ((0, rb_in - geom.r_in), (0, 0)))
    dx_ref[0, :, :] = out[:, HALO:HALO + tile_t].astype(dx_ref.dtype)


def fused_level_apply(x, spec: LevelSpec, dtype=jnp.float32,
                      tile_t=None, interpret=False):
    """Run one fused level on packed input (B, R_in, T) -> (B, R_out, T).

    ``dtype`` is the inter-stage activation/weight storage type (f32 or
    bf16); accumulation is always f32. Works in interpret mode on CPU for
    tests; compiled Pallas on TPU.
    """
    if tile_t is None:
        tile_t = default_tile_t(dtype)
    weights = spec.weight_arrays(dtype)
    return _pallas_fwd_call(spec.geom(), x, weights, dtype, tile_t,
                            interpret, None, dbuf=False)


def _pad_slab_rows(geom_first_conv, r_in):
    top, bottom = _slab_geometry(geom_first_conv)
    r_slab = top + r_in + bottom
    bottom += -r_slab % 32
    return top, bottom, top + r_in + bottom


def _pallas_fwd_call(geom, x, weights, dtype, tile_t, interpret, precision,
                     dbuf=None):
    b, r_in, t = x.shape
    assert r_in == geom.r_in, (r_in, geom.r_in)
    assert tile_t % BLOCK_ROWS == 0, "tile_t must be lane-tile aligned"
    top, bottom, r_slab = _pad_slab_rows(geom.items[0][1], r_in)

    n_t = _cdiv(t, tile_t)
    pad_t = n_t * tile_t - t
    xp = jnp.pad(x.astype(dtype),
                 ((0, 0), (top, bottom), (HALO, HALO + pad_t)))
    w_t = tile_t + 2 * HALO

    if dbuf is None:
        dbuf = _dbuf(dtype)
    # biases stay f32: weight_arrays interleaves (blocks dtype, bias f32)
    kernel = partial(_level_kernel, geom, dtype, tile_t, t, precision, dbuf)

    out = pl.pallas_call(
        kernel,
        grid=(b, n_t),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] +
                 [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(weights),
        out_specs=pl.BlockSpec((1, geom.rb_out, tile_t),
                               lambda bi, ji: (bi, 0, ji),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, geom.rb_out, n_t * tile_t), dtype),
        scratch_shapes=[pltpu.VMEM((2, r_slab, w_t) if dbuf
                                   else (r_slab, w_t), dtype),
                        pltpu.SemaphoreType.DMA((2,)) if dbuf
                        else pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, *weights)
    return out[:, :geom.r_out, :t]


def _pallas_bwd_call(geom, adj_geom, x, dy, weights, adjs, dtype, tile_t,
                     interpret, precision):
    b, r_in, t = x.shape
    top, bottom, r_slab = _pad_slab_rows(geom.items[0][1], r_in)
    n_t = _cdiv(t, tile_t)
    pad_t = n_t * tile_t - t
    xp = jnp.pad(x.astype(dtype),
                 ((0, 0), (top, bottom), (HALO, HALO + pad_t)))
    dy_rows = geom.rb_out + (-geom.rb_out % 32)
    # dy travels at its NATIVE dtype (bf16 cotangents in mixed-precision
    # mode — the level outputs are bf16, so their cotangents already are;
    # upcasting here only doubled the HBM->VMEM DMA bytes). The kernel
    # widens to f32 right after the load.
    dyp = jnp.pad(dy, ((0, 0), (0, dy_rows - geom.r_out),
                       (HALO, HALO + pad_t)))
    w_t = tile_t + 2 * HALO
    rb_in = _cdiv(geom.r_in, BLOCK_ROWS) * BLOCK_ROWS

    kernel = partial(_level_bwd_kernel, geom, adj_geom, dtype, tile_t, t,
                     precision)
    n_conv = _n_convs(geom)
    dw_shapes = []
    for i in range(n_conv):
        dw_shapes.append(jax.ShapeDtypeStruct(weights[2 * i].shape,
                                              jnp.float32))
        dw_shapes.append(jax.ShapeDtypeStruct(weights[2 * i + 1].shape,
                                              jnp.float32))
    const_spec = pl.BlockSpec(memory_space=pltpu.VMEM)

    def _zero_map(ndim):
        return lambda bi, ji: (0,) * ndim

    reduce_specs = [
        pl.BlockSpec(w.shape, _zero_map(len(w.shape)),
                     memory_space=pltpu.VMEM)
        for w in dw_shapes]

    outs = pl.pallas_call(
        kernel,
        grid=(b, n_t),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY)] +
                 [const_spec] * (3 * n_conv),
        out_specs=[pl.BlockSpec((1, rb_in, tile_t),
                                lambda bi, ji: (bi, 0, ji),
                                memory_space=pltpu.VMEM)] + reduce_specs,
        out_shape=[jax.ShapeDtypeStruct((b, rb_in, n_t * tile_t),
                                        jnp.float32)] + dw_shapes,
        scratch_shapes=[pltpu.VMEM((2, r_slab, w_t) if _dbuf(dtype)
                                   else (r_slab, w_t), dtype),
                        pltpu.VMEM((2, dy_rows, w_t) if _dbuf(dtype)
                                   else (dy_rows, w_t), dy.dtype),
                        pltpu.SemaphoreType.DMA((2,)) if _dbuf(dtype)
                        else pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA((2,)) if _dbuf(dtype)
                        else pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, dyp, *weights, *adjs)
    dx = outs[0][:, :r_in, :t]
    return dx, outs[1:]


def make_fused_level_train(spec: LevelSpec, tile_t=None, interpret=False,
                           precision="default", dtype=jnp.float32):
    """Differentiable fused level: Pallas forward AND Pallas backward.

    Returns ``fn(x, *arrays)`` where ``arrays = spec.weight_arrays(f32) +
    spec.adjoint_arrays(f32)``; the VJP computes dX with the adjoint banded
    blocks and d(blocks)/d(bias) with per-block outer-product matmuls, so
    jax's autodiff of the (gather-built) blocks scatters gradients back to
    the flax kernels. The adjoint arrays receive zero cotangent (they are
    rearrangements of the same parameters; their gradient flows through the
    forward blocks). ``precision="default"`` matches the training-path
    numerics of the XLA backends.

    ``dtype=bfloat16`` is the mixed-precision training mode: level
    activations/slabs are STORED bf16 and the forward, adjoint AND dW
    matmuls run with bf16 operands, while every accumulation — conv
    outputs, dX, dW, dBias — stays float32 (the standard
    bf16-compute/f32-accumulate recipe, the same precision the
    reference's autocast backward uses). The differentiable weight
    arrays remain f32 (they are cast once per step outside the kernels),
    so parameter gradients and the optimizer see full-precision leaves.
    """
    geom = spec.geom()
    adj_geom = spec.adjoint_geom()
    n_conv = _n_convs(geom)
    tt = tile_t or default_train_tile_t(dtype)
    cast = (lambda w: w.astype(dtype)) if jnp.dtype(dtype) != jnp.float32 \
        else (lambda w: w)

    def _mats(arrays):
        # blocks at storage dtype, biases f32 (they add into f32 accum)
        ws = list(arrays[:2 * n_conv])
        return [cast(w) if i % 2 == 0 else w for i, w in enumerate(ws)]

    def primal(x, *arrays):
        return _pallas_fwd_call(geom, x, _mats(arrays), dtype,
                                tt, interpret, precision)

    @jax.custom_vjp
    def f(x, *arrays):
        return primal(x, *arrays)

    def f_fwd(x, *arrays):
        return primal(x, *arrays), (x,) + tuple(arrays)

    def f_bwd(res, gy):
        x = res[0]
        weights = _mats(res[1:1 + 2 * n_conv])
        adjs = [cast(a) for a in res[1 + 2 * n_conv:]]
        dx, dws = _pallas_bwd_call(geom, adj_geom, x, gy, weights, adjs,
                                   dtype, tt, interpret, precision)
        # dX accumulates f32 in the kernel but must be returned at the
        # primal input's dtype: in the mixed-precision mode a level OUTPUT
        # (bf16) can have several cotangent contributions — the next
        # level's dX plus a skip-embedding branch — and jax asserts when
        # accumulating cotangents of mismatched dtypes.
        dadj = tuple(jnp.zeros_like(a, jnp.float32)
                     for a in res[1 + 2 * n_conv:])
        return (dx.astype(x.dtype),) + tuple(dws) + dadj

    f.defvjp(f_fwd, f_bwd)
    return f
