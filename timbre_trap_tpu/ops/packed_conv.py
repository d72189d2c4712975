"""Packed f-major banded-matmul formulation of the model's convolutions.

The Timbre-Trap conv stack (reference ``modules.py:396-777``) has tiny
channel counts (2..64) but the *product* F·C is ~2048-2160 at every level.
NHWC conv activations therefore pay a large lane-padding tax on TPU and
every op round-trips HBM. This module re-expresses every conv of the model
on a **packed layout** ``(B, R, T)`` with ``R = F·C`` (f-major: row index
``r = f*C + c``), where a frequency-axis convolution with channel mixing is
a *block-banded matrix multiply* whose 128-row band block is IDENTICAL for
every block (all channel widths divide 128), so a single ``(128, K)``
weight block per time-tap drives the whole level:

    y[j*128:(j+1)*128, t] = sum_dt  B_dt @ x_dt[j*col_adv - margin : ..., t]

with ``x_dt`` the input shifted by ``dt*dilation`` time frames and
``col_adv = 128 * C_in / C_out * stride_factor`` (always an integer here).

Covers: 3x3 dilated SAME conv (ResidualConv2dBlock, reference
``modules.py:721-777``), 1x1 conv, the frequency-strided down-sampling conv
(kernel ``(2s,1)``, stride ``(s,1)``, VALID — ``modules.py:597-655``), the
torch-semantics transposed conv (``modules.py:658-718``), and the 3x3
convin/convout with C_in != C_out (``modules.py:430-433,543``).

``packed_*_reference`` run the banded form with plain XLA ops — used to
validate the math and as the fallback; ``ops/fused_level.py`` executes the
same blocks inside fused Pallas kernels.
"""

import math

import numpy as np
import jax.numpy as jnp

__all__ = [
    "pack_nhwc", "unpack_to_nhwc", "pack_nchw", "unpack_to_nchw",
    "ConvBlocks", "build_conv2d_blocks", "build_sconv_blocks",
    "build_tconv_blocks", "packed_conv_reference",
]

BLOCK_ROWS = 128


def pack_nhwc(x):
    """(B, F, T, C) -> (B, F*C, T) f-major packed."""
    b, f, t, c = x.shape
    return jnp.transpose(x, (0, 1, 3, 2)).reshape(b, f * c, t)


def unpack_to_nhwc(x, channels):
    """(B, F*C, T) -> (B, F, T, C)."""
    b, r, t = x.shape
    return jnp.transpose(x.reshape(b, r // channels, channels, t),
                         (0, 1, 3, 2))


def pack_nchw(x):
    """(B, C, F, T) -> (B, F*C, T) f-major packed."""
    b, c, f, t = x.shape
    return jnp.transpose(x, (0, 2, 1, 3)).reshape(b, f * c, t)


def unpack_to_nchw(x, channels):
    """(B, F*C, T) -> (B, C, F, T)."""
    b, r, t = x.shape
    return jnp.transpose(x.reshape(b, r // channels, channels, t),
                         (0, 2, 1, 3))


class ConvBlocks:
    """A conv expressed as repeating banded blocks on the packed layout.

    Attributes:
      blocks:   (n_dt, 128, K) float32 — banded weight block per time tap.
      dts:      length-n_dt tuple of time-frame shifts (input frame offset).
      bias:     (128,) float32 — per-row bias pattern (tiles every 128 rows).
      col_adv:  input-row advance per 128 output rows.
      margin:   rows of zero padding required ABOVE the input (col_0 of the
                block reads input row ``j*col_adv - margin``).
      k:        block K extent (input rows read per output block).
      f_in/f_out, c_in/c_out: geometry (f_out*c_out = R_out).
    """

    def __init__(self, blocks, dts, bias, col_adv, margin, f_in, f_out,
                 c_in, c_out, per_block=False):
        self.blocks = blocks
        self.dts = tuple(int(d) for d in dts)
        self.bias = bias
        self.col_adv = int(col_adv)
        self.margin = int(margin)
        self.k = int(blocks.shape[-1])
        self.f_in, self.f_out = int(f_in), int(f_out)
        self.c_in, self.c_out = int(c_in), int(c_out)
        # per_block=True: blocks are (n_dt, n_out_blocks*128, K) with a
        # DIFFERENT weight slice per output block (dense, non-repeating
        # maps — the latent-boundary matmuls); bias is the full (R_out-pad,)
        # vector instead of a repeating 128-row pattern.
        self.per_block = bool(per_block)

    @property
    def r_in(self):
        return self.f_in * self.c_in

    @property
    def r_out(self):
        return self.f_out * self.c_out

    @property
    def n_out_blocks(self):
        return math.ceil(self.r_out / BLOCK_ROWS)


def _build_blocks(kernel_fc, bias, f_in, f_out, c_in, c_out, f_taps, dts,
                  vjp_einsum=False):
    """Shared builder.

    ``kernel_fc[df, dt, ci, co]`` are the weights; ``f_taps(f_loc, df)``
    maps an output frequency (local to a block) and frequency-tap index to
    the absolute input frequency offset (relative to ``f_loc=0``'s window
    start) — returns None when the tap does not apply to this output row.

    ``vjp_einsum`` selects HOW the banded blocks are contracted from the
    kernel (identical values either way — tested in test_packed_conv):
    False (inference) uses a static advanced-index gather, True (training)
    a one-hot einsum. The r5 on-chip bisect (tools/bisect_device_rtf.py,
    docs/PERFORMANCE.md "device_rtf bisect") measured the einsum form
    ~30 RTF (≈3%) slower on device-resident transcribe — blocks rebuild
    under jit on every call — while its autodiff TRANSPOSE is what makes
    it the right TRAINING form (see the comment below); so each path gets
    the form that wins there.
    """
    n_f_per_block = BLOCK_ROWS // c_out
    assert BLOCK_ROWS % c_out == 0
    n_df = kernel_fc.shape[0]

    def window(block):
        offs = [f_taps(block * n_f_per_block + fl, df)
                for fl in range(n_f_per_block) for df in range(n_df)]
        return [o for o in offs if o is not None]

    # Input f-window of block 0; the advance to block 1's window gives the
    # per-block column stride (the banded pattern repeats — every channel
    # width divides 128 and strides divide the block's f extent).
    w0, w1 = window(0), window(1)
    lo, hi = min(w0), max(w0)
    margin_rows = -lo * c_in  # input rows of zero padding above row 0
    col_adv = (min(w1) - lo) * c_in
    assert (max(w1) - min(w1)) == (hi - lo), "band pattern must repeat"
    # Round the margin up to the 8-row sublane tile (col_adv is always a
    # multiple of 8 here) so every kernel row-window slice is sublane-aligned
    # — unaligned slices cost a sublane rotate per MXU pass on TPU.
    shift = (-margin_rows) % 8
    margin_rows += shift
    k = (hi - lo + 1) * c_in + shift

    n_dt = len(dts)
    if vjp_einsum:
        # Static tap map (geometry only, no weight values): M[df, fl, g]=1
        # where a block-local output frequency fl reads window offset g via
        # frequency tap df (injective — no two taps hit the same (fl, g),
        # so the contraction reproduces the banded gather exactly).
        # Building blocks as a ONE-HOT EINSUM of the kernel keeps the
        # formulation on-device-under-jit and differentiable like the
        # advanced-index gather — but its autodiff TRANSPOSE is another
        # tiny einsum (dKernel = M · dBlocks) instead of a scatter-add
        # whose indices repeat n_f_per_block-fold, which XLA:TPU
        # serializes (the recipe step runs ~150 such block-builder VJPs;
        # the scatter form accounted for a large share of the backward's
        # non-kernel time).
        n_g = hi - lo + 1
        m = np.zeros((n_df, n_f_per_block, n_g), np.float32)
        for fl in range(n_f_per_block):
            for df in range(n_df):
                off = f_taps(fl, df)
                if off is not None:
                    m[df, fl, off - lo] = 1.0

        kern = jnp.asarray(kernel_fc)  # (n_df, n_dt, c_in, c_out)
        b5 = jnp.einsum("afg,adic->dfcgi", jnp.asarray(m), kern,
                        precision="highest",
                        preferred_element_type=jnp.float32)
        core = b5.reshape(n_dt, BLOCK_ROWS, n_g * c_in)
        blocks = jnp.pad(core, ((0, 0), (0, 0), (shift, 0)))
    else:
        # Inference form: gather the kernel at a static index map.
        idx = np.zeros((4, n_dt, BLOCK_ROWS, k), np.int32)
        valid = np.zeros((n_dt, BLOCK_ROWS, k), bool)
        for di in range(n_dt):
            for fl in range(n_f_per_block):
                for co in range(c_out):
                    r = fl * c_out + co
                    for df in range(n_df):
                        off = f_taps(fl, df)
                        if off is None:
                            continue
                        base = (off - lo) * c_in + shift
                        for ci in range(c_in):
                            idx[:, di, r, base + ci] = (df, di, ci, co)
                            valid[di, r, base + ci] = True
        kern = jnp.asarray(kernel_fc)
        blocks = jnp.where(jnp.asarray(valid),
                           kern[tuple(jnp.asarray(idx))], 0.0)

    bias = jnp.asarray(bias)
    bias_pat = jnp.tile(bias, n_f_per_block)
    return ConvBlocks(blocks, dts, bias_pat,
                      col_adv, margin_rows, f_in, f_out, c_in, c_out)


def build_conv2d_blocks(kernel, bias, f_in, dilation=1, vjp_einsum=False):
    """SAME 2D conv, kernel (kh, kw, C_in, C_out) HWIO, dilation on both axes.

    Covers the residual-block 3x3/1x1 convs and convin/convout
    (reference ``modules.py:721-777,430-433,543``). f_out == f_in.
    """
    kh, kw, c_in, c_out = kernel.shape
    d = int(dilation)
    half_h = (kh - 1) // 2
    dts = tuple((i - (kw - 1) // 2) * d for i in range(kw))

    def f_taps(f_loc, df):
        return f_loc + (df - half_h) * d

    kernel_fc = jnp.asarray(kernel, jnp.float32)
    return _build_blocks(kernel_fc, jnp.asarray(bias, jnp.float32),
                         f_in, f_in, c_in, c_out, f_taps, dts,
                         vjp_einsum=vjp_einsum)


def build_sconv_blocks(kernel, bias, f_in, stride=2, vjp_einsum=False):
    """Frequency-strided VALID down-sampling conv, kernel (2s, 1, C_in, C_out).

    Reference ``modules.py:597-655``: ``f_out = (f_in - 2s) // s + 1``.
    """
    kh, kw, c_in, c_out = kernel.shape
    assert kw == 1
    s = int(stride)
    f_out = (f_in - kh) // s + 1

    def f_taps(f_loc, df):
        return f_loc * s + df

    kernel_fc = jnp.asarray(kernel, jnp.float32)
    return _build_blocks(kernel_fc, jnp.asarray(bias, jnp.float32),
                         f_in, f_out, c_in, c_out, f_taps, (0,),
                         vjp_einsum=vjp_einsum)


def build_tconv_blocks(kernel, bias, f_in, stride=2, output_padding=0,
                       vjp_einsum=False):
    """Torch-semantics transposed conv along frequency, kernel (kh, 1, Ci, Co).

    ``f_out = (f_in - 1)*stride + kh + output_padding`` (ops/conv.py,
    reference ``modules.py:658-718``): ``y[fo] += x[fi] W[k]`` wherever
    ``fo = fi*stride + k``.
    """
    kh, kw, c_in, c_out = kernel.shape
    assert kw == 1
    s = int(stride)
    f_out = (f_in - 1) * s + kh + int(output_padding)

    # For output f: contributing taps k with (f - k) % s == 0 and
    # fi = (f - k) / s in range. Express via f_taps with df = k index.
    def f_taps(f_loc, df):
        if (f_loc - df) % s != 0:
            return None
        return (f_loc - df) // s

    kernel_fc = jnp.asarray(kernel, jnp.float32)
    blocks = _build_blocks(kernel_fc, jnp.asarray(bias, jnp.float32),
                           f_in, f_out, c_in, c_out, f_taps, (0,),
                           vjp_einsum=vjp_einsum)
    return blocks


def build_dense_blocks(w, bias):
    """A DENSE row map y = W @ x + b as a one-tap per-block ConvBlocks.

    ``w``: (R_out, R_in) — every output row reads every input row, so the
    banded/repeating structure degenerates to per-block weight slices
    (``per_block=True``). Used to fold the latent-boundary matmuls —
    convlat (reference ``modules.py:440-446``) and the decoder convin
    expansion (``modules.py:533-536``), with the decoder-switch
    conditioning folded into ``bias`` — INTO the fused inference kernel
    (models/fused.py ``fused_forward``), so the latent bottleneck never
    touches HBM. ``w``/``bias`` may be traced values (they are computed
    from params at trace time and ride along as kernel operands).

    R_in is zero-padded up to a 16-row multiple (sublane alignment for
    both f32 and bf16 operands); R_out up to whole 128-row blocks.
    """
    r_out, r_in = int(w.shape[0]), int(w.shape[1])
    k = r_in + (-r_in % 16)
    nb = math.ceil(r_out / BLOCK_ROWS)
    blocks = jnp.pad(jnp.asarray(w, jnp.float32),
                     ((0, nb * BLOCK_ROWS - r_out), (0, k - r_in)))[None]
    bias_full = jnp.pad(jnp.asarray(bias, jnp.float32),
                        (0, nb * BLOCK_ROWS - r_out))
    return ConvBlocks(blocks, (0,), bias_full, 0, 0, r_in, r_out, 1, 1,
                      per_block=True)


def packed_conv_reference(x, cb: ConvBlocks):
    """Reference execution of a ConvBlocks conv on packed (B, R_in, T) input.

    Plain XLA ops; used to validate the banded math and as the non-Pallas
    training backend. Returns (B, R_out, T).

    The banded structure is executed as ONE einsum per time tap: block j's
    window ``[j*col_adv, j*col_adv + k)`` is decomposed into ``nw =
    ceil(k/col_adv)`` col_adv-row chunks, so chunk o of every window is the
    (j+o)-th slice of the same chunked view of x — a batched
    (128, col_adv) x (col_adv, T) matmul over (block, chunk). A per-block
    Python loop here (the original formulation) emits hundreds of small
    dots at the flagship F=540 (34-68 blocks/conv x ~100 convs after remat),
    which blew up XLA:CPU compile time to ~20 minutes and fragmented the
    TPU schedule.
    """
    b, r_in, t = x.shape
    assert r_in == cb.r_in, (r_in, cb.r_in)
    if cb.per_block:
        y = jnp.einsum("rk,bkt->brt", cb.blocks[0][:, :r_in], x,
                       preferred_element_type=jnp.float32)
        return (y + cb.bias[None, :, None])[:, :cb.r_out]
    n_blocks = cb.n_out_blocks
    A = cb.col_adv
    nw = -(-cb.k // A)  # window chunks per block
    n_ch = n_blocks - 1 + nw
    # Zero-pad rows: margin above; below to complete the chunk grid.
    top = cb.margin
    bottom = n_ch * A - top - r_in
    assert bottom >= 0
    xp = jnp.pad(x, ((0, 0), (top, bottom), (0, 0)))

    max_dt = max((abs(d) for d in cb.dts), default=0)
    if max_dt:
        xp = jnp.pad(xp, ((0, 0), (0, 0), (max_dt, max_dt)))
    xch = xp.reshape(b, n_ch, A, xp.shape[-1])

    # (n_dt, 128, k) -> (n_dt, nw, 128, A) chunked blocks (zero-pad k up).
    blocks = jnp.pad(cb.blocks, ((0, 0), (0, 0), (0, nw * A - cb.k)))
    blocks = blocks.reshape(len(cb.dts), BLOCK_ROWS, nw, A)

    acc = None
    for di, dt in enumerate(cb.dts):
        # Correlation semantics (jax.lax conv): y[t] += B_dt @ x[t + dt].
        xs = (xch[..., max_dt + dt:max_dt + dt + t] if max_dt else xch)
        # Chunk o of every block window, batched over blocks: (B,nw,nb,A,T).
        xw = jnp.stack([xs[:, o:o + n_blocks] for o in range(nw)], axis=1)
        term = jnp.einsum("rok,bojkt->bjrt", blocks[di], xw,
                          preferred_element_type=jnp.float32)
        acc = term if acc is None else acc + term
    y = acc.reshape(b, n_blocks * BLOCK_ROWS, t)[:, :cb.r_out]
    bias_full = jnp.tile(cb.bias, n_blocks)[:cb.r_out]
    return y + bias_full[None, :, None]
