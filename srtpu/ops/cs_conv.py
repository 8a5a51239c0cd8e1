"""CS-layout ("channel-sublane") 3x3 convolutions: the round-2 TPU kernel.

Why: XLA's NHWC conv at C=64 puts c_out on the MXU's 128 lanes, idling half
of them (measured 36% MFU on v5e at EDSR-baseline shapes). This kernel
transposes the problem: SPATIAL positions go on the lanes and channels ride
the sublane/M dims, so the matmul is

    P[(dy, c_out), s] = W2[(dy, c_out), (dx, c_in)] @ X3[(dx, c_in), s]

with X3 three lane-rolled (dx-shifted) copies of the activation and a
cheap epilogue summing the three dy partial rows after a lane roll of
+/- one image row. Shapes at C=64: (192, 192) @ (192, S~4096) — K util
75%, N util ~100%, M=192 streams well. Measured head-to-head on the chip:
9.2us vs XLA's 16.9us per batch-16 conv (66% vs 36% MFU), exact parity.

Layout: batch B is split into G groups of k images packed side-by-side on
the lane axis:  x_cs[g, c, y*W*k + j*W + w] = x[g*k + j, y, w, c].
All shifts become lane rolls (dy: roll by W*k, dx: roll by 1) with
validity masks at image seams — zero padding == masked roll. Works for
any W; k targets S = H*W*k ~ 4096 lanes.

The fused resblock runs conv1+bias+ReLU+conv2+bias+res_scale+skip in one
VMEM residency and emits the post-ReLU h1 for a recompute-free Pallas
backward (dx via transposed-kernel convs in the same layout; dW via
lane-contraction matmuls (c, S) @ (S, 3C) at K=S full tiles).

Reference parity: EDSR resblock semantics, reference models/common.py:74-109
and models/edsr.py:26-29; this file is a TPU-native re-design, not a port.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# ---------------------------------------------------------------------------
# layout helpers
# ---------------------------------------------------------------------------

S_TARGET = 4096          # lanes per group the kernels are tuned for
S_MAX = 8320             # VMEM ceiling for the fused resblock at C=64

# Trace-time record of which compute path each CS module took, keyed by
# (module class, input shape) -> 'cs' | 'cs-padded' | 'xla'. Filled when
# a module's gate decides (i.e. at jit trace, not per step). Lets tools
# and tests assert "the kernels actually engaged for this config"
# instead of inferring it from throughput (VERDICT r4 #8: no silent
# fallback cells in the zoo x scale table).
PATH_LOG: dict = {}


def log_path(module: str, shape, path: str) -> None:
    PATH_LOG[(module, tuple(int(d) for d in shape))] = path


def cs_plan(shape: tuple[int, ...]) -> tuple[int, int] | None:
    """(k, G) packing for (B, H, W, C), or None when unsupported.

    k = images per lane-row, G = B // k kernel groups. Requires B % k == 0
    and the per-group working set to fit VMEM (S = H*W*k <= S_MAX).
    """
    return cs_plan_s(shape, S_TARGET, S_MAX)


def _cs_backend_ok() -> bool:
    """CS kernels run only on TPU — or in interpret mode when
    SRTPU_CS_OFF_TPU=1 (the test-suite opt-in); elsewhere plans are None
    and callers fall back to XLA convs (correct and fast on CPU, unlike
    interpret-mode kernels). Shared by cs_plan_s / cs_plan_pad so the
    gate can't drift between them."""
    import os
    return (jax.default_backend() == 'tpu'
            or os.environ.get('SRTPU_CS_OFF_TPU') == '1')


def _select_k(b: int, h: int, w: int, s_target: int) -> int:
    """Images per lane-row: the largest divisor of B with H*W*k near
    s_target (shared k-selection for plain and padded plans)."""
    k = max(1, s_target // (h * w))
    k = min(k, b)
    while k > 1 and b % k:
        k -= 1
    return k


def cs_plan_s(shape, s_target, s_max):
    """cs_plan with explicit lane budget (RDN's wide dense layers use a
    smaller S so the (3*c_in, S) im2col stacks fit VMEM)."""
    if not _cs_backend_ok():
        return None
    b, h, w, c = shape
    if c % 16 or h < 2 or w < 2:
        return None
    k = _select_k(b, h, w, s_target)
    if b % k or h * w * k > s_max:
        return None
    if h * w * k % 128:
        # the lane dim must be tile-aligned: at unaligned S Mosaic pads
        # each roll/mask piece to a different lane offset and rejects the
        # kernels' concats ("offset mismatch on non-concat dimension") —
        # found on real TPU at scale 3 (42x42 LR -> S=3528); interpret
        # mode does not model layouts and can't catch it. Try larger
        # aligned packings first, else fall back to XLA.
        for cand in range(min(b, s_max // (h * w)), 0, -1):
            if b % cand == 0 and h * w * cand % 128 == 0:
                return cand, b // cand
        return None
    return k, b // k


def cs_plan_pad(shape: tuple[int, ...]) -> tuple[int, int, int] | None:
    """(k, G, s_pad) packing with DEAD-LANE padding for shapes whose
    S = H*W*k is never a 128 multiple (e.g. scale-3 42x42 LR: H*W has
    only two factors of 2, so no k <= S_MAX/HW aligns).

    The lane axis is zero-padded from S to s_pad, the next 128 multiple
    at least one image row (W*k lanes) past S. One dead row guarantees
    the dy = +1 reads of the last valid row land on zeros (== SAME
    padding) instead of wrapping to row 0; kernels re-zero the pad tail
    on every output write (``s_valid`` kwarg) so garbage never enters
    valid lanes across chained kernels. 42x42 k=2: 3528 -> 3712 lanes,
    5.2% dead compute — vs a full XLA fallback. Returns None when
    cs_plan already gives an aligned (pad-free) plan, or nothing fits.
    """
    if cs_plan(shape) is not None:
        return None
    if not _cs_backend_ok():
        return None
    b, h, w, c = shape
    if c % 16 or h < 2 or w < 2:
        return None
    k = _select_k(b, h, w, S_TARGET)
    if b % k:
        return None
    s_real = h * w * k
    s_pad = -(-(s_real + w * k) // 128) * 128   # >= one dead row, aligned
    if s_pad > S_MAX:
        return None
    return k, b // k, s_pad


def nhwc_to_cs(x: jax.Array, k: int, s_pad: int | None = None) -> jax.Array:
    """(B, H, W, C) -> (G, C, H*W*k) with k images per lane-row.
    s_pad zero-pads the lane axis (dead lanes; see cs_plan_pad)."""
    b, h, w, c = x.shape
    g = b // k
    out = x.reshape(g, k, h, w, c).transpose(0, 4, 2, 1, 3) \
        .reshape(g, c, h * k * w)
    if s_pad is not None and s_pad > h * k * w:
        out = jnp.pad(out, ((0, 0), (0, 0), (0, s_pad - h * k * w)))
    return out


def cs_to_nhwc(x_cs: jax.Array, k: int, h: int, w: int) -> jax.Array:
    """(G, C, H*W*k [+pad]) -> (B, H, W, C); dead-lane tails are dropped."""
    g, c, s = x_cs.shape
    if s > h * k * w:
        x_cs = x_cs[:, :, :h * k * w]
    return x_cs.reshape(g, c, h, k, w).transpose(0, 3, 2, 4, 1) \
        .reshape(g * k, h, w, c)


def w_cs(w: jax.Array) -> jax.Array:
    """HWIO (kk, kk, C, C') -> (kk*C', kk*C): rows (dy, c_out), cols
    (dx, c_in). Any odd square kernel size."""
    kk, _, c_in, c_out = w.shape
    return jnp.transpose(w, (0, 3, 1, 2)).reshape(kk * c_out, kk * c_in)


def w_cs_T(w: jax.Array) -> jax.Array:
    """CS arrangement of the VJP (transposed) kernel: flip taps, swap IO."""
    return w_cs(jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2)))


def dw_from_cs(dwt: jax.Array) -> jax.Array:
    """(kk, C_out, kk*C_in) [dy, c_out, (dx, c_in)] -> HWIO
    (kk, kk, C_in, C_out)."""
    kk, c_out, kc = dwt.shape
    c_in = kc // kk
    return dwt.reshape(kk, c_out, kk, c_in).transpose(0, 2, 3, 1)


# ---------------------------------------------------------------------------
# in-kernel building blocks
# ---------------------------------------------------------------------------


def _seam_masks(s: int, w: int):
    """Lane-validity masks for dx = +1 / -1 rolls (image seams + array ends)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1)
    return lane % w != w - 1, lane % w != 0    # m_xp (reads w+1), m_xm


def _row_masks(s: int, wk: int):
    """Masks for dy = +1 / -1 rolls (first/last image row)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1)
    return lane < s - wk, lane >= wk           # m_yp (reads y+1), m_ym


def _zpad(v, s_valid):
    """Zero the dead-lane pad tail (no-op when s_valid is None/full).

    Every kernel output write goes through this when the lane axis is
    padded (cs_plan_pad): the invariant "pad lanes of every CS array are
    zero" makes all boundary reads exact SAME-padding semantics (the
    _build_x3 seam masks already zero dx reads at the pad boundary, and
    dy reads of the last valid row land on the zeroed dead row), and
    kills every cross term in the dW/db lane contractions (one factor —
    activation or cotangent — is always zero on pad lanes).
    """
    s = v.shape[-1]
    if s_valid is None or s_valid >= s:
        return v
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1)
    return jnp.where(lane < s_valid, v, 0)


def _roll32(x, shift, s):
    """Lane-roll that satisfies Mosaic's 32-bit dynamic_rotate constraint.

    bf16 data is BITCAST to i32 (sublane PAIRS pack into one register
    element; the lane axis is untouched), rolled at half the row count
    with no casts, and bitcast back — lane semantics are identical for
    any shift, including the odd dx = +/-1. Other dtypes roll via f32.
    """
    if x.dtype == jnp.bfloat16 and x.shape[0] % 2 == 0:
        xp = pltpu.bitcast(x, jnp.int32)
        return pltpu.bitcast(pltpu.roll(xp, shift % s, 1), jnp.bfloat16)
    return pltpu.roll(x.astype(jnp.float32), shift % s, 1).astype(x.dtype)


def _build_x3(x, x3_ref, s, w, kk=3):
    """Write kk dx-shifted masked copies into x3_ref.

    Row block j holds the input for fine tap dx = j - kk//2 (i.e. the data
    lane-rolled by +(kk//2 - j), image seams zero-masked) — kk=3 gives the
    classic [roll(+1) | x | roll(-1)] stack; kk=5/9 serve the wide coarse
    kernels of the phase-dense tail (9x9 fine conv over an r=2 layout).
    """
    c = x.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1)
    for j in range(kk):
        m = kk // 2 - j                # roll amount; tap reads x - m
        if m == 0:
            x3_ref[j * c:(j + 1) * c] = x
        elif m > 0:
            x3_ref[j * c:(j + 1) * c] = \
                jnp.where(lane % w >= m, _roll32(x, m, s), 0)
        else:
            x3_ref[j * c:(j + 1) * c] = \
                jnp.where(lane % w < w + m, _roll32(x, s + m, s), 0)


def _dy_reduce(p, s, wk, kk=3):
    """Sum the kk dy partial-row blocks of P [(dy, c_out), s] -> (c, s).

    Block j covers dy tap j - kk//2: rolled into place by (kk//2 - j)*wk
    with out-of-image rows zeroed. (A zero-fill concat "fast path" for the
    tile-aligned wk=128 case was tried and does NOT lower: Mosaic rejects
    lane-dim concats of offset slices — "offset mismatch on non-concat
    dimension". pltpu.roll it is.)
    """
    c = p.shape[0] // kk
    h = kk // 2
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1)
    out = p[h * c:(h + 1) * c]
    for j in range(kk):
        d = j - h
        if d == 0:
            continue
        blk = p[j * c:(j + 1) * c]
        if d < 0:
            out = out + jnp.where(lane >= -d * wk,
                                  pltpu.roll(blk, -d * wk, 1), 0)
        else:
            out = out + jnp.where(lane < s - d * wk,
                                  pltpu.roll(blk, s - d * wk, 1), 0)
    return out


def _gs_roll(gf, dy, s, wk, kk=3):
    """g rolled so that position s' holds g[s' - (dy - kk//2)*wk], zero masked.

    Used by the dW lane-contraction: dW[dy] = sum_s shifted(act) * g, which
    equals act @ roll(g, +(dy - kk//2)*wk) with the out-of-image rows zeroed.
    """
    d = dy - kk // 2
    if d == 0:
        return gf
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1)
    if d > 0:
        return jnp.where(lane >= d * wk, _roll32(gf, d * wk, s), 0)
    return jnp.where(lane < s + d * wk, _roll32(gf, s + d * wk, s), 0)


# ---------------------------------------------------------------------------
# REFLECT-boundary variants (SRGAN's generator: ReflectionPad2d + valid
# convs, reference models/srgan.py:20-27). Zero-pad (SAME) boundaries
# fall out of the CS layout for free: rolls are masked to zero at image
# seams. Reflect boundaries are equally native: the mirrored neighbor IS
# the opposite-direction roll, which a 3x3 kernel computes anyway — so
# reflect costs a handful of masked selects/adds on the VPU and zero
# extra MXU work. kk=3 only; requires exact plans (no dead-lane pad).
# ---------------------------------------------------------------------------


def _rolls_pm(x, s):
    """(roll(+1), roll(-1)): lane p holds x[p-1] / x[p+1]."""
    return _roll32(x, 1, s), _roll32(x, s - 1, s)


def _build_x3_reflect(x, x3_ref, s, w):
    """_build_x3 with REFLECT column boundaries: at each image seam the
    out-of-image read x[p -/+ 1] becomes the mirrored in-image neighbor
    x[p +/- 1] (torch ReflectionPad2d semantics)."""
    c = x.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1)
    col = lane % w
    rp, rm = _rolls_pm(x, s)
    x3_ref[0:c] = jnp.where(col >= 1, rp, rm)          # tap dx=-1
    x3_ref[c:2 * c] = x
    x3_ref[2 * c:3 * c] = jnp.where(col < w - 1, rm, rp)   # tap dx=+1


def _dy_reduce_reflect(p, s, wk):
    """_dy_reduce with REFLECT row boundaries: the first/last image rows
    read the mirrored row instead of zeros."""
    c = p.shape[0] // 3
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1)
    out = p[c:2 * c]
    b0, b2 = p[0:c], p[2 * c:3 * c]
    # tap dy=-1 (b0): interior reads row p-1; row 0 mirrors to row 1
    out = out + jnp.where(lane >= wk, pltpu.roll(b0, wk, 1),
                          pltpu.roll(b0, s - wk, 1))
    # tap dy=+1 (b2): interior reads row p+1; row h-1 mirrors to row h-2
    out = out + jnp.where(lane < s - wk, pltpu.roll(b2, s - wk, 1),
                          pltpu.roll(b2, wk, 1))
    return out


def _gs_roll_reflect(gf, dy, s, wk):
    """_gs_roll plus the mirrored-row term for REFLECT dW contractions:
    dW[dy] = act3 @ gs — boundary outputs that read a mirrored activation
    row deposit their cotangent at the mirrored source row instead."""
    d = dy - 1
    if d == 0:
        return gf
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1)
    if d > 0:   # tap dy=+1: last-row outputs read row h-2
        main = jnp.where(lane >= wk, _roll32(gf, wk, s), 0)
        extra = jnp.where((lane >= s - 2 * wk) & (lane < s - wk),
                          _roll32(gf, s - wk, s), 0)
    else:       # tap dy=-1: row-0 outputs read row 1
        main = jnp.where(lane < s - wk, _roll32(gf, s - wk, s), 0)
        extra = jnp.where((lane >= wk) & (lane < 2 * wk),
                          _roll32(gf, wk, s), 0)
    return main + extra


def _build_g3_reflect_T(g, g3_ref, s, w):
    """Transposed-conv input stack under REFLECT columns.

    The adjoint of a mirrored read is an ADD at the mirrored source:
    block j (paired with tap w[-(j-1)]^T via w_cs_T) holds g[p + (j-1)]
    plus the seam column's cotangent one column inside each edge."""
    c = g.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1)
    col = lane % w
    rp, rm = _rolls_pm(g, s)
    # block 0 pairs w_{+1}^T: reads g[p-1]; col w-2 also collects the
    # last column's mirrored forward read
    g3_ref[0:c] = jnp.where(col >= 1, rp, 0) + \
        jnp.where(col == w - 2, rm, 0)
    g3_ref[c:2 * c] = g
    # block 2 pairs w_{-1}^T: reads g[p+1]; col 1 collects column 0's
    g3_ref[2 * c:3 * c] = jnp.where(col < w - 1, rm, 0) + \
        jnp.where(col == 1, rp, 0)


def _dy_reduce_reflect_T(p, s, wk):
    """Transposed-conv row reduce under REFLECT rows: the standard
    zero-masked reduce plus the mirrored cotangent one row inside each
    image edge."""
    c = p.shape[0] // 3
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1)
    out = p[c:2 * c]
    b0, b2 = p[0:c], p[2 * c:3 * c]
    # block 0 (pairs w_{+1}^T, reads g[p-wk]); row h-2 also collects the
    # last row's mirrored forward read
    out = out + jnp.where(lane >= wk, pltpu.roll(b0, wk, 1), 0) \
        + jnp.where((lane >= s - 2 * wk) & (lane < s - wk),
                    pltpu.roll(b0, s - wk, 1), 0)
    # block 2 (pairs w_{-1}^T, reads g[p+wk]); row 1 collects row 0's
    out = out + jnp.where(lane < s - wk, pltpu.roll(b2, s - wk, 1), 0) \
        + jnp.where((lane >= wk) & (lane < 2 * wk),
                    pltpu.roll(b2, wk, 1), 0)
    return out


def conv3x3_reflect_reference(x, w, b):
    """XLA oracle: ReflectionPad2d(1) + VALID 3x3 conv, NHWC/HWIO."""
    xp = jnp.pad(x.astype(jnp.float32),
                 ((0, 0), (1, 1), (1, 1), (0, 0)), mode='reflect')
    dn = ('NHWC', 'HWIO', 'NHWC')
    out = jax.lax.conv_general_dilated(
        xp, w.astype(jnp.float32), (1, 1), 'VALID',
        dimension_numbers=dn) + b.astype(jnp.float32)
    return out.astype(x.dtype)


# ---------------------------------------------------------------------------
# single 3x3 conv (trunk-close conv and friends)
# ---------------------------------------------------------------------------


def _conv_fwd_kernel(x_ref, w_ref, b_ref, out_ref, x3_ref, *, w_img, wk,
                     stk=False, relu=False, co_chunk=0, kk=3,
                     s_valid=None):
    x = x_ref[0]
    c, s = x.shape
    _build_x3(x, x3_ref, s, w_img, kk)
    w = w_ref[0] if stk else w_ref[...]
    b = b_ref[0] if stk else b_ref[...]
    if co_chunk:
        # wide c_out (phase-major upscale conv): the full (kk*C_out, S)
        # f32 partial would blow VMEM — chunk the output channels
        # (w rows are (dy, c_out)-ordered, so a chunk is kk row slices)
        co = out_ref.shape[1]
        for j in range(co // co_chunk):
            wj = jnp.concatenate(
                [w[dy * co + j * co_chunk:dy * co + (j + 1) * co_chunk]
                 for dy in range(kk)], axis=0)
            p = jnp.dot(wj, x3_ref[...], preferred_element_type=jnp.float32)
            outj = _dy_reduce(p, s, wk, kk) \
                + b[j * co_chunk:(j + 1) * co_chunk]
            if relu:
                outj = jnp.maximum(outj, 0.0)
            out_ref[0, j * co_chunk:(j + 1) * co_chunk] = \
                _zpad(outj, s_valid).astype(out_ref.dtype)
        return
    p = jnp.dot(w, x3_ref[...], preferred_element_type=jnp.float32)
    out = _dy_reduce(p, s, wk, kk) + b
    if relu:
        out = jnp.maximum(out, 0.0)
    out_ref[0] = _zpad(out, s_valid).astype(out_ref.dtype)


def _conv_bwd_kernel(x_ref, g_ref, wt_ref, dx_ref, dwt_ref, db_ref,
                     x3_ref, g3_ref, *, w_img, wk, stk=False, kk=3,
                     s_valid=None):
    gid = pl.program_id(0)
    x = x_ref[0]
    g = g_ref[0]
    c, s = x.shape
    wt = wt_ref[0] if stk else wt_ref[...]

    # dx = convT(g). For wide c_in (RDN dense layers) the (kk*c_in, S) f32
    # partial-sum array would blow VMEM — chunk c_in into 64-row groups
    # (wt rows are (dy, c_in)-ordered, so a chunk is kk row slices).
    _build_x3(g, g3_ref, s, w_img, kk)
    g3 = g3_ref[...]
    if c <= 128:
        p = jnp.dot(wt, g3, preferred_element_type=jnp.float32)
        dx_ref[0] = _zpad(_dy_reduce(p, s, wk, kk),
                          s_valid).astype(dx_ref.dtype)
    else:
        assert c % 64 == 0
        for j in range(c // 64):
            wt_j = jnp.concatenate(
                [wt[dy * c + j * 64:dy * c + (j + 1) * 64]
                 for dy in range(kk)], axis=0)
            p = jnp.dot(wt_j, g3, preferred_element_type=jnp.float32)
            dx_ref[0, j * 64:(j + 1) * 64] = \
                _zpad(_dy_reduce(p, s, wk, kk), s_valid).astype(dx_ref.dtype)

    # dW[dy, c_out, (dx, c_in)] = roll(g, dy) @ X3^T   (K = S, full lanes)
    gf = g.astype(jnp.float32)

    @pl.when(gid == 0)
    def _():
        dwt_ref[...] = jnp.zeros_like(dwt_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    grs = [_gs_roll(gf.astype(x.dtype), dy, s, wk, kk) for dy in range(kk)]
    c_out = g.shape[0]
    # small c_out (3-channel final conv, padded to 16): kk M=c_out dW
    # dots run the MXU at c_out/128 utilisation — stack the dy-rolled g
    # blocks into ONE M=kk*c_out dot and slice the result rows instead
    stack_dy = kk * c_out <= 128
    if stack_dy:
        grs = [jnp.concatenate(grs, axis=0)]
    if c <= 128:
        _build_x3(x, x3_ref, s, w_img, kk)
        x3 = x3_ref[...]
        for di, gr in enumerate(grs):
            dw = jax.lax.dot_general(
                gr, x3, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if stack_dy:
                for dy in range(kk):
                    dwt_ref[dy] += dw[dy * c_out:(dy + 1) * c_out]
            else:
                dwt_ref[di] += dw
    else:
        # wide c_in: per-64-channel chunks, small (kk*64, S) im2col scratch
        # (the x3_ref scratch is allocated at chunk size in this mode)
        for j in range(c // 64):
            _build_x3(x[j * 64:(j + 1) * 64], x3_ref, s, w_img, kk)
            x3j = x3_ref[...]
            for di, gr in enumerate(grs):
                dw = jax.lax.dot_general(
                    gr, x3j, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (M, kk*64)
                for dy in (range(kk) if stack_dy else [di]):
                    dwj = dw[dy * c_out:(dy + 1) * c_out] if stack_dy else dw
                    for dxx in range(kk):
                        dwt_ref[dy, :,
                                dxx * c + j * 64:dxx * c + (j + 1) * 64] \
                            += dwj[:, dxx * 64:(dxx + 1) * 64]
    db_ref[...] += jnp.sum(gf, axis=1, keepdims=True)


def _specs(g, c, s, extra_full=2):
    blk = pl.BlockSpec((1, c, s), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    return blk, [blk] + [full] * extra_full


def _interpret(flag):
    return jax.default_backend() != 'tpu' if flag is None else flag


def conv3x3_cs_fwd(x_cs, w2, b, w_img, k, interpret=None, kk=3,
                   s_valid=None):
    """x_cs (G, C, S) bf16/f32; w2 (kk*C', kk*C) CS-arranged; b (C', 1)."""
    if s_valid is not None and kk != 3:
        # cs_plan_pad pads exactly ONE dead row (W*k lanes) past S, which
        # covers only the dy = +/-1 taps of a 3x3 conv; a kk>=5 conv's
        # dy = +/-2 reads would wrap valid data into valid lanes whenever
        # s_pad - s_valid < (kk//2)*W*k. No planner produces this today —
        # fail loudly rather than silently corrupt.
        raise ValueError(f'dead-lane padding (s_valid) supports kk=3 '
                         f'only, got kk={kk}')
    g, c, s = x_cs.shape
    c_out = w2.shape[0] // kk
    # chunk wide c_out so the (kk*C_out, S) f32 partial fits VMEM
    co_chunk = 0
    if kk * c_out * s * 4 > 8 * 1024 * 1024:
        co_chunk = 128 if c_out % 128 == 0 else \
            64 if c_out % 64 == 0 else 0
    cp = None
    if kk * c_out * s * 4 > 8 * 1024 * 1024 \
            or kk * c * s * 2 > 8 * 1024 * 1024:
        cp = pltpu.CompilerParams(vmem_limit_bytes=40 * 1024 * 1024)
    blk = pl.BlockSpec((1, c, s), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    oblk = pl.BlockSpec((1, c_out, s), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_conv_fwd_kernel, w_img=w_img, wk=w_img * k,
                co_chunk=co_chunk, kk=kk, s_valid=s_valid),
        grid=(g,),
        compiler_params=cp,
        in_specs=[blk, full, full],
        out_specs=oblk,
        out_shape=jax.ShapeDtypeStruct((g, c_out, s), x_cs.dtype),
        scratch_shapes=[pltpu.VMEM((kk * c, s), x_cs.dtype)],
        interpret=_interpret(interpret),
        cost_estimate=pl.CostEstimate(
            flops=2 * kk * c_out * kk * c * s * g,
            bytes_accessed=(c + c_out) * s * g * 2, transcendentals=0),
    )(x_cs, w2, b)


def conv3x3_cs_bwd(x_cs, g_cs, wt, w_img, k, interpret=None, kk=3,
                   s_valid=None):
    """Backward of the CS conv; supports c_out != c_in (rectangular).
    g_cs (G, C_out, S); wt (kk*C_in, kk*C_out) transposed-kernel CS."""
    if s_valid is not None and kk != 3:
        # see conv3x3_cs_fwd: one-dead-row padding is sound for kk=3 only
        raise ValueError(f'dead-lane padding (s_valid) supports kk=3 '
                         f'only, got kk={kk}')
    g, c, s = x_cs.shape
    c_out = g_cs.shape[1]
    blk = pl.BlockSpec((1, c, s), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    gblk = pl.BlockSpec((1, c_out, s), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    acc_w = pl.BlockSpec((kk, c_out, kk * c), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    acc_b = pl.BlockSpec((c_out, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    # wide c_out (phase-major upscale conv backward): rolled-g copies and
    # the (kk*C_out, S) g3 stack outgrow the default scoped-VMEM budget
    cp = None
    if kk * max(c, c_out) * s * 2 > 4 * 1024 * 1024:
        cp = pltpu.CompilerParams(vmem_limit_bytes=40 * 1024 * 1024)
    return pl.pallas_call(
        partial(_conv_bwd_kernel, w_img=w_img, wk=w_img * k, kk=kk,
                s_valid=s_valid),
        grid=(g,),
        compiler_params=cp,
        in_specs=[blk, gblk, full],
        out_specs=(blk, acc_w, acc_b),
        out_shape=(jax.ShapeDtypeStruct(x_cs.shape, x_cs.dtype),
                   jax.ShapeDtypeStruct((kk, c_out, kk * c), jnp.float32),
                   jax.ShapeDtypeStruct((c_out, 1), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((kk * min(c, 64 if c > 128 else c), s),
                                   x_cs.dtype),
                        pltpu.VMEM((kk * c_out, s), x_cs.dtype)],
        interpret=_interpret(interpret),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * kk * kk * c * c_out * s * g,
            bytes_accessed=kk * c * s * g * 2, transcendentals=0),
    )(x_cs, g_cs, wt)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def conv3x3_cs(x_cs, w, b, w_img, k, s_valid=None):
    """Differentiable CS-layout kxk SAME conv (k odd, inferred from w).
    w: HWIO (kk,kk,C,C'); b: (C',). s_valid marks the dead-lane pad
    boundary for padded packings (cs_plan_pad)."""
    out = conv3x3_cs_fwd(x_cs, w_cs(w).astype(x_cs.dtype),
                         b.astype(jnp.float32)[:, None], w_img, k,
                         kk=w.shape[0], s_valid=s_valid)
    return out


def _conv_cs_vjp_fwd(x_cs, w, b, w_img, k, s_valid=None):
    return conv3x3_cs(x_cs, w, b, w_img, k, s_valid), (x_cs, w)


def _conv_cs_vjp_bwd(w_img, k, s_valid, res, g):
    x_cs, w = res
    wt = w_cs_T(w).astype(x_cs.dtype)
    dx, dwt, db = conv3x3_cs_bwd(x_cs, g, wt, w_img, k, kk=w.shape[0],
                                 s_valid=s_valid)
    return dx, dw_from_cs(dwt).astype(w.dtype), db[:, 0]


conv3x3_cs.defvjp(_conv_cs_vjp_fwd, _conv_cs_vjp_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def conv3x3_cs_pre(x_cs, w_csd, b, w_img, k, s_valid=None):
    """Differentiable CS conv taking the CS-ARRANGED weight (3C',3C)
    directly (the canonical stored-param layout); grads come back
    in-layout."""
    return conv3x3_cs_fwd(x_cs, w_csd.astype(x_cs.dtype),
                          b.astype(jnp.float32)[:, None], w_img, k,
                          s_valid=s_valid)


def _conv_cs_pre_vjp_fwd(x_cs, w_csd, b, w_img, k, s_valid=None):
    return conv3x3_cs_pre(x_cs, w_csd, b, w_img, k, s_valid), (x_cs, w_csd)


def _conv_cs_pre_vjp_bwd(w_img, k, s_valid, res, g):
    x_cs, w_csd = res
    c_out, c_in = w_csd.shape[0] // 3, w_csd.shape[1] // 3
    wt = w_cs_T_from_cs(w_csd[None].astype(x_cs.dtype), c_in, c_out)[0]
    dx, dwt, db = conv3x3_cs_bwd(x_cs, g, wt, w_img, k, s_valid=s_valid)
    return dx, dwt.reshape(3 * c_out, 3 * c_in), db[:, 0]


conv3x3_cs_pre.defvjp(_conv_cs_pre_vjp_fwd, _conv_cs_pre_vjp_bwd)


# ---------------------------------------------------------------------------
# fused resblock: conv1 + b1 + ReLU + conv2 + b2, * res_scale + skip
# ---------------------------------------------------------------------------


def _rb_fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, scale_ref,
                   out_ref, h1_ref, x3_ref, *, w_img, wk):
    x = x_ref[0]
    c, s = x.shape
    _build_x3(x, x3_ref, s, w_img)
    p = jnp.dot(w1_ref[...], x3_ref[...], preferred_element_type=jnp.float32)
    h1 = jnp.maximum(_dy_reduce(p, s, wk) + b1_ref[...], 0.0).astype(x.dtype)
    h1_ref[0] = h1
    _build_x3(h1, x3_ref, s, w_img)
    p = jnp.dot(w2_ref[...], x3_ref[...], preferred_element_type=jnp.float32)
    h2 = _dy_reduce(p, s, wk) + b2_ref[...]
    out_ref[0] = (h2 * scale_ref[0, 0] + x.astype(jnp.float32)) \
        .astype(out_ref.dtype)


def _rb_bwd_kernel(x_ref, h1_ref, g_ref, w1t_ref, w2t_ref, scale_ref,
                   dx_ref, dw1t_ref, db1_ref, dw2t_ref, db2_ref,
                   s3_ref, *, w_img, wk):
    gid = pl.program_id(0)
    x = x_ref[0]
    h1 = h1_ref[0]
    g = g_ref[0]
    c, s = x.shape
    gs = (g.astype(jnp.float32) * scale_ref[0, 0]).astype(x.dtype)

    @pl.when(gid == 0)
    def _():
        dw1t_ref[...] = jnp.zeros_like(dw1t_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2t_ref[...] = jnp.zeros_like(dw2t_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    # dh1 = convT(gs, w2) * relu'(h1)
    _build_x3(gs, s3_ref, s, w_img)
    p = jnp.dot(w2t_ref[...], s3_ref[...], preferred_element_type=jnp.float32)
    # bf16 compares are unsupported on some targets — mask in f32
    dh1 = jnp.where(h1.astype(jnp.float32) > 0,
                    _dy_reduce(p, s, wk), 0.0).astype(x.dtype)

    # dx = convT(dh1, w1) + g   (skip branch)
    _build_x3(dh1, s3_ref, s, w_img)
    p = jnp.dot(w1t_ref[...], s3_ref[...], preferred_element_type=jnp.float32)
    dx_ref[0] = (_dy_reduce(p, s, wk)
                 + g.astype(jnp.float32)).astype(dx_ref.dtype)

    # dW2[dy] = roll(gs, dy) @ H3^T ;  db2 = sum gs
    _build_x3(h1, s3_ref, s, w_img)
    h3 = s3_ref[...]
    gsf = gs.astype(jnp.float32)
    for dy in range(3):
        gr = _gs_roll(gsf.astype(x.dtype), dy, s, wk)
        dw2t_ref[dy] += jax.lax.dot_general(
            gr, h3, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    db2_ref[...] += jnp.sum(gsf, axis=1, keepdims=True)

    # dW1[dy] = roll(dh1, dy) @ X3^T ;  db1 = sum dh1
    _build_x3(x, s3_ref, s, w_img)
    x3 = s3_ref[...]
    dh1f = dh1.astype(jnp.float32)
    for dy in range(3):
        dr = _gs_roll(dh1f.astype(x.dtype), dy, s, wk)
        dw1t_ref[dy] += jax.lax.dot_general(
            dr, x3, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    db1_ref[...] += jnp.sum(dh1f, axis=1, keepdims=True)


def resblock_cs_fwd_h1(x_cs, w1, b1, w2, b2, res_scale, w_img, k,
                       interpret=None):
    g, c, s = x_cs.shape
    blk, _ = _specs(g, c, s)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    scale = jnp.asarray([[res_scale]], jnp.float32)
    return pl.pallas_call(
        partial(_rb_fwd_kernel, w_img=w_img, wk=w_img * k),
        grid=(g,),
        in_specs=[blk, full, full, full, full,
                  pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)],
        out_specs=(blk, blk),
        out_shape=(jax.ShapeDtypeStruct(x_cs.shape, x_cs.dtype),
                   jax.ShapeDtypeStruct(x_cs.shape, x_cs.dtype)),
        scratch_shapes=[pltpu.VMEM((3 * c, s), x_cs.dtype)],
        interpret=_interpret(interpret),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * 9 * c * c * s * g,
            bytes_accessed=3 * c * s * g * 2, transcendentals=0),
    )(x_cs, w1, b1, w2, b2, scale)


def resblock_cs_bwd(x_cs, h1_cs, g_cs, w1t, w2t, res_scale, w_img, k,
                    interpret=None):
    g, c, s = x_cs.shape
    blk, _ = _specs(g, c, s)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    acc_w = pl.BlockSpec((3, c, 3 * c), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    acc_b = pl.BlockSpec((c, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    scale = jnp.asarray([[res_scale]], jnp.float32)
    return pl.pallas_call(
        partial(_rb_bwd_kernel, w_img=w_img, wk=w_img * k),
        grid=(g,),
        in_specs=[blk, blk, blk, full, full,
                  pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)],
        out_specs=(blk, acc_w, acc_b, acc_w, acc_b),
        out_shape=(jax.ShapeDtypeStruct(x_cs.shape, x_cs.dtype),
                   jax.ShapeDtypeStruct((3, c, 3 * c), jnp.float32),
                   jax.ShapeDtypeStruct((c, 1), jnp.float32),
                   jax.ShapeDtypeStruct((3, c, 3 * c), jnp.float32),
                   jax.ShapeDtypeStruct((c, 1), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((3 * c, s), x_cs.dtype)],
        interpret=_interpret(interpret),
        cost_estimate=pl.CostEstimate(
            flops=2 * 4 * 9 * c * c * s * g,
            bytes_accessed=5 * c * s * g * 2, transcendentals=0),
    )(x_cs, h1_cs, g_cs, w1t, w2t, scale)


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def resblock_cs(x_cs, w1, b1, w2, b2, res_scale, w_img, k):
    """Fused CS-layout EDSR resblock; w1/w2 HWIO (3,3,C,C), b f32 (C,)."""
    out, _ = resblock_cs_fwd_h1(
        x_cs, w_cs(w1).astype(x_cs.dtype), b1.astype(jnp.float32)[:, None],
        w_cs(w2).astype(x_cs.dtype), b2.astype(jnp.float32)[:, None],
        res_scale, w_img, k)
    return out


def _rb_cs_vjp_fwd(x_cs, w1, b1, w2, b2, res_scale, w_img, k):
    out, h1 = resblock_cs_fwd_h1(
        x_cs, w_cs(w1).astype(x_cs.dtype), b1.astype(jnp.float32)[:, None],
        w_cs(w2).astype(x_cs.dtype), b2.astype(jnp.float32)[:, None],
        res_scale, w_img, k)
    return out, (x_cs, h1, w1, w2)


def _rb_cs_vjp_bwd(res_scale, w_img, k, res, g):
    x_cs, h1, w1, w2 = res
    dx, dw1t, db1, dw2t, db2 = resblock_cs_bwd(
        x_cs, h1, g, w_cs_T(w1).astype(x_cs.dtype),
        w_cs_T(w2).astype(x_cs.dtype), res_scale, w_img, k)
    return (dx, dw_from_cs(dw1t).astype(w1.dtype), db1[:, 0],
            dw_from_cs(dw2t).astype(w2.dtype), db2[:, 0])


resblock_cs.defvjp(_rb_cs_vjp_fwd, _rb_cs_vjp_bwd)


# ---------------------------------------------------------------------------
# CS-layout sub-pixel upsampler: conv(C -> r^2*C) + pixel shuffle fused
# ---------------------------------------------------------------------------
#
# The NHWC tail's pixel-shuffle reshape/transposes cost ~0.7 ms/step in
# layout copies at EDSR-baseline (profiled round 2). In CS layout the
# shuffle is a per-row lane interleave, expressible as a tiny selection
# matmul: fine_row(r*y+a) = [v_(a,0)_row | ... | v_(a,r-1)_row] @ EE,
# where EE[(b*Wk + w), (r*w + b)] = 1. The conv's output channels are
# stored phase-major ((a*r+b)*C + c') so each phase is a contiguous row
# block; the backward de-interleaves with EE^T and runs the transposed
# conv + dW lane-contractions in the same layout. Replaces
# UpscaleBlock(conv+pixel_shuffle) for the CS path — reference
# models/common.py:112-139 semantics (torch PixelShuffle channel order
# c'*r^2 + a*r + b, absorbed into the weight arrangement).


def w_ps_cs(w: jax.Array, r: int) -> jax.Array:
    """HWIO (3,3,C,r*r*C) [torch ps order c'*r^2+a*r+b] ->
    (r*r, 3C, 3C) phase-major CS arrangement."""
    c = w.shape[2]
    # (3,3,C, C', r, r) -> phase (a,r,b) major rows
    v = w.reshape(3, 3, c, c, r, r)
    v = jnp.transpose(v, (4, 5, 0, 3, 1, 2))     # a, b, dy, c', dx, cin
    return v.reshape(r * r, 3 * c, 3 * c)


def _ps_select(wk: int, r: int, dtype):
    """(r*Wk, r*Wk) interleave matrix: row b*Wk+w -> column r*w+b."""
    n = r * wk
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    b, w = rows // wk, rows % wk
    return (cols == r * w + b).astype(dtype)


def _ups_fwd_kernel(x_ref, w_ref, b_ref, ee_ref, out_ref, x3_ref, p_ref,
                    *, w_img, wk, r, h_img):
    x = x_ref[0]
    c, s = x.shape
    _build_x3(x, x3_ref, s, w_img)
    x3 = x3_ref[...]
    for ab in range(r * r):
        p = jnp.dot(w_ref[ab], x3, preferred_element_type=jnp.float32)
        p_ref[ab * c:(ab + 1) * c] = \
            (_dy_reduce(p, s, wk) + b_ref[ab]).astype(x.dtype)
    # interleave: fine row r*y+a <- phases (a, 0..r-1) of coarse row y.
    # YB coarse rows are sublane-stacked into ONE selection matmul — the
    # per-row variant was M=64 per dot (pipeline-drain bound) and made
    # the unrolled loop 4x longer to compile.
    ee = ee_ref[...]
    yb = 4 if h_img % 4 == 0 else 1
    for y0 in range(0, h_img, yb):
        pieces = []
        for y in range(y0, y0 + yb):
            for a in range(r):
                pieces.append(jnp.concatenate(
                    [p_ref[(a * r + b) * c:(a * r + b + 1) * c,
                           y * wk:(y + 1) * wk] for b in range(r)],
                    axis=1))
        fine = jnp.dot(jnp.concatenate(pieces, axis=0), ee,
                       preferred_element_type=jnp.float32)
        for i in range(yb * r):
            start = (r * y0 + i) * r * wk
            out_ref[0, :, start:start + r * wk] \
                = fine[i * c:(i + 1) * c].astype(out_ref.dtype)


def _ups_deint_kernel(g_ref, ee_ref, dc_ref, *, wk, r, h_img, c):
    """Fine cotangent -> phase-major coarse dconv (selection matmuls,
    YB fine-row batches sublane-stacked like the forward)."""
    ee = ee_ref[...]
    yb = 4 if h_img % 4 == 0 else 1
    for y0 in range(0, h_img, yb):
        fine = jnp.concatenate(
            [g_ref[0, :, (r * y0 + i) * r * wk:(r * y0 + i + 1) * r * wk]
             for i in range(yb * r)], axis=0)
        v = jax.lax.dot_general(
            fine.astype(jnp.float32), ee, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dc_ref.dtype)
        for i in range(yb * r):
            y, a = y0 + i // r, i % r
            for b in range(r):
                dc_ref[0, (a * r + b) * c:(a * r + b + 1) * c,
                       y * wk:(y + 1) * wk] = \
                    v[i * c:(i + 1) * c, b * wk:(b + 1) * wk]


def _ups_conv_bwd_kernel(x_ref, dc_ref, wt_ref, dx_ref, dwt_ref, db_ref,
                         s3_ref, *, w_img, wk, r):
    gid = pl.program_id(0)
    x = x_ref[0]
    c, s = x.shape

    @pl.when(gid == 0)
    def _():
        dwt_ref[...] = jnp.zeros_like(dwt_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    _build_x3(x, s3_ref, s, w_img)
    x3 = s3_ref[...]
    for ab in range(r * r):
        gf = dc_ref[0, ab * c:(ab + 1) * c].astype(jnp.float32)
        # ONE stacked M=3C dW dot per phase instead of three M=C dots
        # (small-M dots leave the MXU mostly idle)
        gr = jnp.concatenate(
            [_gs_roll(gf.astype(x.dtype), dy, s, wk) for dy in range(3)],
            axis=0)
        dw = jax.lax.dot_general(
            gr, x3, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        for dy in range(3):
            dwt_ref[ab, dy] += dw[dy * c:(dy + 1) * c]
        db_ref[ab] += jnp.sum(gf, axis=1, keepdims=True)
    acc = jnp.zeros((c, s), jnp.float32)
    for ab in range(r * r):
        _build_x3(dc_ref[0, ab * c:(ab + 1) * c], s3_ref, s, w_img)
        p = jnp.dot(wt_ref[ab], s3_ref[...],
                    preferred_element_type=jnp.float32)
        acc = acc + _dy_reduce(p, s, wk)
    dx_ref[0] = acc.astype(dx_ref.dtype)


def upsample_cs_fwd(x_cs, w_ps, b_ps, ee, w_img, k, h_img, r,
                    interpret=None):
    g, c, s = x_cs.shape
    blk, _ = _specs(g, c, s)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    oblk = pl.BlockSpec((1, c, r * r * s), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_ups_fwd_kernel, w_img=w_img, wk=w_img * k, r=r,
                h_img=h_img),
        grid=(g,),
        in_specs=[blk, full, full, full],
        out_specs=oblk,
        out_shape=jax.ShapeDtypeStruct((g, c, r * r * s), x_cs.dtype),
        scratch_shapes=[pltpu.VMEM((3 * c, s), x_cs.dtype),
                        pltpu.VMEM((r * r * c, s), x_cs.dtype)],
        interpret=_interpret(interpret),
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * c * c * r * r * s * g,
            bytes_accessed=(1 + r * r) * c * s * g * 2, transcendentals=0),
    )(x_cs, w_ps, b_ps, ee)


def upsample_cs_bwd(x_cs, g_cs, wt_ps, ee, w_img, k, h_img, r,
                    interpret=None):
    """Two kernels (de-interleave, then conv bwd): the fused variant sat
    at the 16 MB scoped-VMEM edge at S=4096 and failed to compile in some
    surrounding-layout configurations."""
    g, c, s = x_cs.shape
    blk, _ = _specs(g, c, s)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    gblk = pl.BlockSpec((1, c, r * r * s), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    dcblk = pl.BlockSpec((1, r * r * c, s), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    acc_w = pl.BlockSpec((r * r, 3, c, 3 * c), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    acc_b = pl.BlockSpec((r * r, c, 1), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    interp = _interpret(interpret)
    dconv = pl.pallas_call(
        partial(_ups_deint_kernel, wk=w_img * k, r=r, h_img=h_img, c=c),
        grid=(g,),
        in_specs=[gblk, full],
        out_specs=dcblk,
        out_shape=jax.ShapeDtypeStruct((g, r * r * c, s), x_cs.dtype),
        interpret=interp,
        cost_estimate=pl.CostEstimate(
            flops=2 * c * (r * r * s) * (r * w_img * k) * g,
            bytes_accessed=2 * r * r * c * s * g * 2, transcendentals=0),
    )(g_cs, ee)
    return pl.pallas_call(
        partial(_ups_conv_bwd_kernel, w_img=w_img, wk=w_img * k, r=r),
        grid=(g,),
        in_specs=[blk, dcblk, full],
        out_specs=(blk, acc_w, acc_b),
        out_shape=(jax.ShapeDtypeStruct(x_cs.shape, x_cs.dtype),
                   jax.ShapeDtypeStruct((r * r, 3, c, 3 * c), jnp.float32),
                   jax.ShapeDtypeStruct((r * r, c, 1), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((3 * c, s), x_cs.dtype)],
        interpret=interp,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * 9 * c * c * r * r * s * g,
            bytes_accessed=2 * (1 + r * r) * c * s * g * 2,
            transcendentals=0),
    )(x_cs, dconv, wt_ps)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def upsample_cs(x_cs, w_ps, b_ps, w_img, k, h_img, r):
    """Fused conv + pixel-shuffle, CS layout. w_ps: (r*r, 3C, 3C)
    phase-major CS arrangement (w_ps_cs of the HWIO upsampler conv);
    b_ps: (r*r, C) phase-major bias. Output is fine-resolution CS with
    the SAME k (image width becomes r*W)."""
    ee = _ps_select(w_img * k, r, x_cs.dtype)
    return upsample_cs_fwd(x_cs, w_ps.astype(x_cs.dtype),
                           b_ps.astype(jnp.float32)[..., None], ee,
                           w_img, k, h_img, r)


def _ups_vjp_fwd(x_cs, w_ps, b_ps, w_img, k, h_img, r):
    return upsample_cs(x_cs, w_ps, b_ps, w_img, k, h_img, r), (x_cs, w_ps)


def _ups_vjp_bwd(w_img, k, h_img, r, res, g):
    x_cs, w_ps = res
    c = w_ps.shape[1] // 3
    wt = w_cs_T_from_cs(w_ps, c, c).astype(x_cs.dtype)   # per-phase convT
    ee = _ps_select(w_img * k, r, x_cs.dtype)
    dx, dwt, db = upsample_cs_bwd(x_cs, g, wt, ee, w_img, k, h_img, r)
    return dx, dwt.reshape(r * r, 3 * c, 3 * c), db[..., 0]


upsample_cs.defvjp(_ups_vjp_fwd, _ups_vjp_bwd)


# --- phase-major last stage: pixel shuffle absorbed into weights --------
#
# The last upscale stage's lane interleave (selection matmuls against EE)
# costs ~17 GFLOP of small-matmul work fwd + the same in the bwd
# de-interleave at EDSR-x4 shapes. Keeping the LAST stage's output
# phase-major ((a*r+b)*C + c' channel blocks at coarse resolution) makes
# the final 3x3 conv a phase-dense COARSE conv (c_in = r^2*C,
# c_out = r^2*ch): a fine 3x3 tap at offset (u-1, v-1) relative to fine
# position (r*y+a, r*x+b) lands on input phase ((a+u-1)%r, (b+v-1)%r) at
# coarse offset (floor((a+u-1)/r), floor((b+v-1)/r)) in {-1,0,1} — a
# plain 3x3 conv with scattered weights. The interleave never happens;
# only the 3-channel phase-major result transposes to NHWC (cheap).


def w_pm_cs(w_arr: jax.Array, c: int, r: int) -> jax.Array:
    """(r*r, 3C', 3C) per-phase CS stacks -> ONE (3*r*r*C', 3C) CS weight
    whose output channels are phase-major ((a*r+b)*C' + c'): the last
    upscale stage as a plain wide conv, no interleave."""
    v = w_arr.reshape(r * r, 3, c, 3 * c)
    return jnp.transpose(v, (1, 0, 2, 3)).reshape(3 * r * r * c, 3 * c)


def w_pm_hwio(w_arr: jax.Array, c: int, r: int) -> jax.Array:
    """(r*r, 3C', 3C) per-phase CS stacks -> HWIO (3, 3, C, r*r*C') with
    PHASE-MAJOR output channels ((a*r+b)*C' + c')."""
    v = w_arr.reshape(r, r, 3, c, 3, c)          # a, b, dy, c', dx, cin
    return jnp.transpose(v, (2, 4, 5, 0, 1, 3)).reshape(3, 3, c, r * r * c)


def phase_dense_ck(fk: int, r: int) -> int:
    """Coarse tap span of ``w_phase_dense`` for a fine fk x fk conv over
    r x r phases (3 for fk=3; 5 for a 9x9 fine conv at r=2). The single
    source of truth — CSUpscaleTail's dead-lane-padded gate keys on this
    value, so it must never drift from w_phase_dense's layout math."""
    hw = fk // 2
    lo = -(hw // r) - (1 if hw % r else 0)       # floor(-hw / r)
    return (r - 1 + hw) // r - lo + 1


def w_phase_dense(w_hwio: jax.Array, r: int) -> jax.Array:
    """Fine fkxfk conv HWIO (fk, fk, Cin, ch) -> phase-dense coarse conv
    HWIO (ck, ck, r*r*Cin, CO) consuming/producing phase-major channel
    blocks; ck is the coarse tap span (3 for fk=3; 5 for a 9x9 fine conv
    over r=2 phases — the SRResNet output conv). CO pads r*r*ch up to a
    multiple of 16 (zero rows) so the kernel's sublane slices stay
    tile-aligned."""
    fk, _, cin, ch = w_hwio.shape
    hw = fk // 2
    lo = -(hw // r) - (1 if hw % r else 0)       # floor(-hw / r)
    ck = phase_dense_ck(fk, r)
    co = -(-r * r * ch // 16) * 16
    wpd = jnp.zeros((ck, ck, r, r, cin, co), w_hwio.dtype)
    for a in range(r):
        for b in range(r):
            for u in range(fk):
                for v in range(fk):
                    fy, fx = a + u - hw, b + v - hw
                    dy, ap = fy // r - lo, fy % r
                    dx, bp = fx // r - lo, fx % r
                    oc = (a * r + b) * ch
                    wpd = wpd.at[dy, dx, ap, bp, :, oc:oc + ch].set(
                        w_hwio[u, v])
    return wpd.reshape(ck, ck, r * r * cin, co)


def pm_to_nhwc(y_pm: jax.Array, r: int, ch: int, k: int, h: int,
               w: int) -> jax.Array:
    """Phase-major coarse CS (G, >=r*r*ch, h*k*w [+pad]) -> fine NHWC
    (G*k, h*r, w*r, ch); channels beyond r*r*ch are alignment padding and
    dead-lane tails (cs_plan_pad) are dropped — the VJP then zero-fills
    the cotangent's pad lanes, keeping the pad-lanes-are-zero invariant
    through the backward."""
    g = y_pm.shape[0]
    if y_pm.shape[2] > h * k * w:
        y_pm = y_pm[:, :, :h * k * w]
    y = y_pm[:, :r * r * ch, :].reshape(g, r, r, ch, h, k, w)
    return jnp.transpose(y, (0, 5, 4, 1, 6, 2, 3)) \
        .reshape(g * k, h * r, w * r, ch)


def cs_regroup(x_cs, k_old, k_new, h, w):
    """Change images-per-lane-row packing (between upsample stages).

    Splitting groups (k_old = m*k_new) is ONE transpose moving the
    image-split axis past c — the via-NHWC route costs two c-moving
    transposes (2x the measured copy time on TPU)."""
    if k_old == k_new:
        return x_cs
    g, c, _ = x_cs.shape
    if k_old % k_new == 0:
        m = k_old // k_new
        y = x_cs.reshape(g, c, h, m, k_new * w)
        y = jnp.transpose(y, (0, 3, 1, 2, 4))
        return y.reshape(g * m, c, h * k_new * w)
    return nhwc_to_cs(cs_to_nhwc(x_cs, k_old, h, w), k_new)


def w_ps_hwio(w_arr: jax.Array, c: int, r: int) -> jax.Array:
    """Inverse of w_ps_cs: (r*r, 3C, 3C) -> HWIO (3, 3, C, r*r*C)."""
    v = w_arr.reshape(r, r, 3, c, 3, c)          # a, b, dy, c', dx, cin
    return jnp.transpose(v, (2, 4, 5, 3, 0, 1)).reshape(3, 3, c, c * r * r)


# ---------------------------------------------------------------------------
# whole-trunk custom VJP (stacked block weights)
# ---------------------------------------------------------------------------
#
# Profiling the per-block custom-VJP trunk showed ~0.77 ms/step of small
# XLA copies: every resblock re-ran w_cs / w_cs_T / dw_from_cs on its own
# (3,3,C,C) weights (~6 transposes x 16 blocks x fwd+bwd). The trunk-level
# VJP below arranges ALL block weights in a handful of batched ops per
# step and lets each Pallas call DMA its (3C,3C) slice straight from the
# stacked array via a BlockSpec index_map — no per-block XLA slice/copy
# ops at all. dW comes back for free: the backward kernel's (3,C,3C)
# [(dy),(c_out),(dx,c_in)] accumulator reshapes to exactly the (3C,3C)
# CS arrangement.


def w_cs_batch(w: jax.Array) -> jax.Array:
    """(L, 3, 3, C, C') HWIO stack -> (L, 3C', 3C) CS arrangement."""
    l, _, _, c_in, c_out = w.shape
    return jnp.transpose(w, (0, 1, 4, 2, 3)).reshape(l, 3 * c_out, 3 * c_in)


def w_hwio_from_cs(w_csd: jax.Array, c_in: int, c_out: int,
                   kk: int = 3) -> jax.Array:
    """(L, kk*C', kk*C) CS arrangement -> (L, kk, kk, C, C') HWIO stack."""
    l = w_csd.shape[0]
    return jnp.transpose(w_csd.reshape(l, kk, c_out, kk, c_in),
                         (0, 1, 3, 4, 2))


def w_cs_T_from_cs(w_csd: jax.Array, c_in: int, c_out: int) -> jax.Array:
    """(L, 3C', 3C) CS -> CS arrangement of the VJP (transposed) kernel."""
    l = w_csd.shape[0]
    v = w_csd.reshape(l, 3, c_out, 3, c_in)[:, ::-1, :, ::-1, :]
    return jnp.transpose(v, (0, 1, 4, 3, 2)).reshape(l, 3 * c_in, 3 * c_out)


def _stk(l: int, shape3):
    """BlockSpec selecting block ``l`` of a stacked (L, *shape3) array."""
    return pl.BlockSpec((1, *shape3), lambda g, _l=l: (_l,) + (0,) * len(shape3),
                        memory_space=pltpu.VMEM)


def _cp():
    """Optional scoped-VMEM override for the resblock kernels
    (SRTPU_VMEM_LIMIT_MB env var; experiments only)."""
    import os
    v = os.environ.get('SRTPU_VMEM_LIMIT_MB')
    if not v:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=int(v) * 1024 * 1024)


def _rb_fwd_kernel_stk(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, scale_ref,
                       out_ref, h1_ref, x3_ref, *, w_img, wk, skip=True,
                       s_valid=None):
    x = x_ref[0]
    c, s = x.shape
    _build_x3(x, x3_ref, s, w_img)
    p = jnp.dot(w1_ref[0], x3_ref[...], preferred_element_type=jnp.float32)
    h1 = _zpad(jnp.maximum(_dy_reduce(p, s, wk) + b1_ref[0], 0.0),
               s_valid).astype(x.dtype)
    h1_ref[0] = h1
    _build_x3(h1, x3_ref, s, w_img)
    p = jnp.dot(w2_ref[0], x3_ref[...], preferred_element_type=jnp.float32)
    h2 = _dy_reduce(p, s, wk) + b2_ref[0]
    if skip:
        h2 = h2 * scale_ref[0, 0] + x.astype(jnp.float32)
    out_ref[0] = _zpad(h2, s_valid).astype(out_ref.dtype)


def _rb_bwd_kernel_stk(x_ref, h1_ref, g_ref, w1t_ref, w2t_ref, scale_ref,
                       dx_ref, dw1t_ref, db1_ref, dw2t_ref, db2_ref,
                       s3_ref, *, w_img, wk, skip=True, s_valid=None):
    gid = pl.program_id(0)
    x = x_ref[0]
    h1 = h1_ref[0]
    g = g_ref[0]
    c, s = x.shape
    gs = (g.astype(jnp.float32) * scale_ref[0, 0]).astype(x.dtype)

    @pl.when(gid == 0)
    def _():
        dw1t_ref[...] = jnp.zeros_like(dw1t_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2t_ref[...] = jnp.zeros_like(dw2t_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    _build_x3(gs, s3_ref, s, w_img)
    p = jnp.dot(w2t_ref[0], s3_ref[...], preferred_element_type=jnp.float32)
    dh1 = jnp.where(h1.astype(jnp.float32) > 0,
                    _dy_reduce(p, s, wk), 0.0).astype(x.dtype)

    _build_x3(dh1, s3_ref, s, w_img)
    p = jnp.dot(w1t_ref[0], s3_ref[...], preferred_element_type=jnp.float32)
    dx = _dy_reduce(p, s, wk)
    if skip:
        dx = dx + g.astype(jnp.float32)
    dx_ref[0] = _zpad(dx, s_valid).astype(dx_ref.dtype)

    _build_x3(h1, s3_ref, s, w_img)
    h3 = s3_ref[...]
    gsf = gs.astype(jnp.float32)
    for dy in range(3):
        gr = _gs_roll(gsf.astype(x.dtype), dy, s, wk)
        dw2t_ref[dy] += jax.lax.dot_general(
            gr, h3, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    db2_ref[...] += jnp.sum(gsf, axis=1, keepdims=True)

    _build_x3(x, s3_ref, s, w_img)
    x3 = s3_ref[...]
    dh1f = dh1.astype(jnp.float32)
    for dy in range(3):
        dr = _gs_roll(dh1f.astype(x.dtype), dy, s, wk)
        dw1t_ref[dy] += jax.lax.dot_general(
            dr, x3, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    db1_ref[...] += jnp.sum(dh1f, axis=1, keepdims=True)


def _rb_fwd_call_stk(x_cs, w1s, b1s, w2s, b2s, scale, w_img, k,
                     interpret=None, skip=True, s_valid=None):
    """w1s/b1s/w2s/b2s are (1, ...) XLA-level slices of the stacked
    weights: every block invocation is a byte-identical Mosaic kernel,
    so one compile serves the whole trunk (see rdb_fused_fwd)."""
    g, c, s = x_cs.shape
    blk, _ = _specs(g, c, s)
    return pl.pallas_call(
        partial(_rb_fwd_kernel_stk, w_img=w_img, wk=w_img * k, skip=skip,
                s_valid=s_valid),
        grid=(g,),
        compiler_params=_cp(),
        in_specs=[blk, _stk(0, (3 * c, 3 * c)), _stk(0, (c, 1)),
                  _stk(0, (3 * c, 3 * c)), _stk(0, (c, 1)),
                  pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)],
        out_specs=(blk, blk),
        out_shape=(jax.ShapeDtypeStruct(x_cs.shape, x_cs.dtype),
                   jax.ShapeDtypeStruct(x_cs.shape, x_cs.dtype)),
        scratch_shapes=[pltpu.VMEM((3 * c, s), x_cs.dtype)],
        interpret=_interpret(interpret),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * 9 * c * c * s * g,
            bytes_accessed=3 * c * s * g * 2, transcendentals=0),
    )(x_cs, w1s, b1s, w2s, b2s, scale)


def _rb_bwd_call_stk(x_cs, h1_cs, g_cs, w1ts, w2ts, scale, w_img, k,
                     interpret=None, skip=True, s_valid=None):
    g, c, s = x_cs.shape
    blk, _ = _specs(g, c, s)
    acc_w = pl.BlockSpec((3, c, 3 * c), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    acc_b = pl.BlockSpec((c, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_rb_bwd_kernel_stk, w_img=w_img, wk=w_img * k, skip=skip,
                s_valid=s_valid),
        grid=(g,),
        compiler_params=_cp(),
        in_specs=[blk, blk, blk, _stk(0, (3 * c, 3 * c)),
                  _stk(0, (3 * c, 3 * c)),
                  pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)],
        out_specs=(blk, acc_w, acc_b, acc_w, acc_b),
        out_shape=(jax.ShapeDtypeStruct(x_cs.shape, x_cs.dtype),
                   jax.ShapeDtypeStruct((3, c, 3 * c), jnp.float32),
                   jax.ShapeDtypeStruct((c, 1), jnp.float32),
                   jax.ShapeDtypeStruct((3, c, 3 * c), jnp.float32),
                   jax.ShapeDtypeStruct((c, 1), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((3 * c, s), x_cs.dtype)],
        interpret=_interpret(interpret),
        cost_estimate=pl.CostEstimate(
            flops=2 * 4 * 9 * c * c * s * g,
            bytes_accessed=5 * c * s * g * 2, transcendentals=0),
    )(x_cs, h1_cs, g_cs, w1ts, w2ts, scale)


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def trunk_cs(x_cs, w1, b1, w2, b2, res_scale, w_img, k, s_valid=None):
    """L fused CS resblocks. w1/w2 are the CS-ARRANGED stacks (L,3C,3C)
    (the canonical trunk param layout — see CSTrunk), b (L,C).

    Storing params pre-arranged makes the forward transform-free and the
    weight grads come back in-layout (the backward accumulator's (3,C,3C)
    reshape IS the CS arrangement); the only remaining per-step transform
    is the transposed-kernel arrangement for the backward, done once,
    batched, in bf16. (The per-block/HWIO variants cost 0.5-0.8 ms/step
    in transposes — profiled, PERF.md round 2.)
    """
    out, *_ = _trunk_fwd(x_cs, w1, b1, w2, b2, res_scale, w_img, k,
                         s_valid)
    return out


def _trunk_fwd(x_cs, w1, b1, w2, b2, res_scale, w_img, k, s_valid=None):
    dt = x_cs.dtype
    w1s = w1.astype(dt)
    w2s = w2.astype(dt)
    b1s = b1.astype(jnp.float32)[..., None]
    b2s = b2.astype(jnp.float32)[..., None]
    scale = jnp.asarray([[res_scale]], jnp.float32)
    xs, h1s = [], []
    x = x_cs
    for l in range(w1.shape[0]):
        xs.append(x)
        x, h1 = _rb_fwd_call_stk(x, w1s[l:l + 1], b1s[l:l + 1],
                                 w2s[l:l + 1], b2s[l:l + 1], scale,
                                 w_img, k, s_valid=s_valid)
        h1s.append(h1)
    return x, xs, h1s, w1s, w2s


def _trunk_vjp_fwd(x_cs, w1, b1, w2, b2, res_scale, w_img, k,
                   s_valid=None):
    out, xs, h1s, w1s, w2s = _trunk_fwd(x_cs, w1, b1, w2, b2,
                                        res_scale, w_img, k, s_valid)
    return out, (tuple(xs), tuple(h1s), w1s, w2s)


def _trunk_vjp_bwd(res_scale, w_img, k, s_valid, res, g):
    xs, h1s, w1s, w2s = res
    l_blocks = len(xs)
    c = w1s.shape[1] // 3
    w1ts = w_cs_T_from_cs(w1s, c, c)  # bf16 in, bf16 out
    w2ts = w_cs_T_from_cs(w2s, c, c)
    scale = jnp.asarray([[res_scale]], jnp.float32)
    dw1, db1, dw2, db2 = [None] * l_blocks, [None] * l_blocks, \
        [None] * l_blocks, [None] * l_blocks
    for l in reversed(range(l_blocks)):
        g, dw1t, db1t, dw2t, db2t = _rb_bwd_call_stk(
            xs[l], h1s[l], g, w1ts[l:l + 1], w2ts[l:l + 1], scale,
            w_img, k, s_valid=s_valid)
        # (3, C, 3C) [(dy),(c_out),(dx,c_in)] reshapes to the (3C, 3C)
        # CS arrangement exactly — free
        dw1[l], db1[l] = dw1t.reshape(3 * c, 3 * c), db1t[:, 0]
        dw2[l], db2[l] = dw2t.reshape(3 * c, 3 * c), db2t[:, 0]
    return (g, jnp.stack(dw1), jnp.stack(db1),
            jnp.stack(dw2), jnp.stack(db2))


trunk_cs.defvjp(_trunk_vjp_fwd, _trunk_vjp_bwd)


# ---------------------------------------------------------------------------
# mega-trunk: the WHOLE resblock chain as one pallas_call per direction
# ---------------------------------------------------------------------------
#
# grid = (G, L) with the block index innermost: the running activation
# lives in a constant-index output block, so for each group the chain
# value stays VMEM-resident across all L blocks — the 15 inter-block HBM
# round trips and ~30 kernel launches of the per-block trunk disappear.
# Weights stream in per step via index maps (one Mosaic compile, no
# XLA-level w[l:l+1] slices); weight grads accumulate into full-resident
# VMEM blocks with a dynamic leading index.


def _trunk_fwd_kernel_mega(x_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                           scale_ref, out_ref, xs_ref, h1_ref, x3_ref,
                           *, w_img, wk, s_valid=None):
    l = pl.program_id(1)

    @pl.when(l == 0)
    def _():
        out_ref[0] = x_ref[0]

    x = out_ref[0]
    c, s = x.shape
    xs_ref[0, 0] = x
    _build_x3(x, x3_ref, s, w_img)
    p = jnp.dot(w1_ref[0], x3_ref[...], preferred_element_type=jnp.float32)
    h1 = _zpad(jnp.maximum(_dy_reduce(p, s, wk) + b1_ref[0], 0.0),
               s_valid).astype(x.dtype)
    h1_ref[0, 0] = h1
    _build_x3(h1, x3_ref, s, w_img)
    p = jnp.dot(w2_ref[0], x3_ref[...], preferred_element_type=jnp.float32)
    h2 = _dy_reduce(p, s, wk) + b2_ref[0]
    out_ref[0] = _zpad(h2 * scale_ref[0, 0]
                       + x.astype(jnp.float32), s_valid).astype(out_ref.dtype)


def _trunk_bwd_kernel_mega(xs_ref, h1_ref, g_ref, w1t_ref, w2t_ref,
                           scale_ref, dx_ref, dw1_ref, db1_ref, dw2_ref,
                           db2_ref, s3_ref, gr_ref, *, w_img, wk, l_blocks,
                           s_valid=None):
    gid = pl.program_id(0)
    l = pl.program_id(1)
    lr = l_blocks - 1 - l    # blocks processed in reverse

    @pl.when(jnp.logical_and(gid == 0, l == 0))
    def _():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    @pl.when(l == 0)
    def _():
        dx_ref[0] = g_ref[0]

    g = dx_ref[0]
    x = xs_ref[0, 0]
    h1 = h1_ref[0, 0]
    c, s = x.shape
    gs = (g.astype(jnp.float32) * scale_ref[0, 0]).astype(x.dtype)

    _build_x3(gs, s3_ref, s, w_img)
    p = jnp.dot(w2t_ref[0], s3_ref[...], preferred_element_type=jnp.float32)
    dh1 = jnp.where(h1.astype(jnp.float32) > 0,
                    _dy_reduce(p, s, wk), 0.0).astype(x.dtype)

    _build_x3(dh1, s3_ref, s, w_img)
    p = jnp.dot(w1t_ref[0], s3_ref[...], preferred_element_type=jnp.float32)
    dx_new = _zpad(_dy_reduce(p, s, wk)
                   + g.astype(jnp.float32), s_valid).astype(x.dtype)

    # dW as ONE stacked dot per conv: GR [(dy, c_out), s] @ X3^T gives
    # the (3C, 3C) CS arrangement directly with M=192 (full output
    # tiles; three M=64 dots half-idle the MXU output rows)
    gsf = gs.astype(jnp.float32)
    for dy in range(3):
        gr_ref[dy * c:(dy + 1) * c] = \
            _gs_roll(gsf.astype(x.dtype), dy, s, wk)
    _build_x3(h1, s3_ref, s, w_img)
    dw2_ref[lr] += jax.lax.dot_general(
        gr_ref[...], s3_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    db2_ref[lr] += jnp.sum(gsf, axis=1, keepdims=True)

    dh1f = dh1.astype(jnp.float32)
    for dy in range(3):
        gr_ref[dy * c:(dy + 1) * c] = \
            _gs_roll(dh1f.astype(x.dtype), dy, s, wk)
    _build_x3(x, s3_ref, s, w_img)
    dw1_ref[lr] += jax.lax.dot_general(
        gr_ref[...], s3_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    db1_ref[lr] += jnp.sum(dh1f, axis=1, keepdims=True)

    dx_ref[0] = dx_new


def _mega_cp():
    """The mega kernels' resident dW accumulators + streamed blocks want
    more than the 16 MB default scoped-VMEM budget at L=16."""
    return pltpu.CompilerParams(vmem_limit_bytes=40 * 1024 * 1024)


def trunk_fwd_mega(x_cs, w1s, b1s, w2s, b2s, scale, w_img, k,
                   interpret=None, s_valid=None):
    g, c, s = x_cs.shape
    l_blocks = w1s.shape[0]
    blk_g = pl.BlockSpec((1, c, s), lambda gi, li: (gi, 0, 0),
                         memory_space=pltpu.VMEM)
    blk_w = pl.BlockSpec((1, 3 * c, 3 * c), lambda gi, li: (li, 0, 0),
                         memory_space=pltpu.VMEM)
    blk_b = pl.BlockSpec((1, c, 1), lambda gi, li: (li, 0, 0),
                         memory_space=pltpu.VMEM)
    blk_lg = pl.BlockSpec((1, 1, c, s), lambda gi, li: (li, gi, 0, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_trunk_fwd_kernel_mega, w_img=w_img, wk=w_img * k,
                s_valid=s_valid),
        grid=(g, l_blocks),
        compiler_params=_mega_cp(),
        in_specs=[blk_g, blk_w, blk_b, blk_w, blk_b,
                  pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)],
        out_specs=(blk_g, blk_lg, blk_lg),
        out_shape=(jax.ShapeDtypeStruct(x_cs.shape, x_cs.dtype),
                   jax.ShapeDtypeStruct((l_blocks, g, c, s), x_cs.dtype),
                   jax.ShapeDtypeStruct((l_blocks, g, c, s), x_cs.dtype)),
        scratch_shapes=[pltpu.VMEM((3 * c, s), x_cs.dtype)],
        interpret=_interpret(interpret),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * 9 * c * c * s * g * l_blocks,
            bytes_accessed=3 * c * s * g * l_blocks * 2, transcendentals=0),
    )(x_cs, w1s, b1s, w2s, b2s, scale)


def trunk_bwd_mega(xs, h1s, g_cs, w1ts, w2ts, scale, w_img, k,
                   interpret=None, s_valid=None):
    l_blocks, g, c, s = xs.shape
    blk_g = pl.BlockSpec((1, c, s), lambda gi, li: (gi, 0, 0),
                         memory_space=pltpu.VMEM)
    blk_lg = pl.BlockSpec((1, 1, c, s),
                          lambda gi, li, _l=l_blocks: (_l - 1 - li, gi, 0, 0),
                          memory_space=pltpu.VMEM)
    blk_w = pl.BlockSpec((1, 3 * c, 3 * c),
                         lambda gi, li, _l=l_blocks: (_l - 1 - li, 0, 0),
                         memory_space=pltpu.VMEM)
    acc_w = pl.BlockSpec((l_blocks, 3 * c, 3 * c),
                         lambda gi, li: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    acc_b = pl.BlockSpec((l_blocks, c, 1), lambda gi, li: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_trunk_bwd_kernel_mega, w_img=w_img, wk=w_img * k,
                l_blocks=l_blocks, s_valid=s_valid),
        grid=(g, l_blocks),
        compiler_params=_mega_cp(),
        in_specs=[blk_lg, blk_lg, blk_g, blk_w, blk_w,
                  pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)],
        out_specs=(blk_g, acc_w, acc_b, acc_w, acc_b),
        out_shape=(jax.ShapeDtypeStruct((g, c, s), g_cs.dtype),
                   jax.ShapeDtypeStruct((l_blocks, 3 * c, 3 * c),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((l_blocks, c, 1), jnp.float32),
                   jax.ShapeDtypeStruct((l_blocks, 3 * c, 3 * c),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((l_blocks, c, 1), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((3 * c, s), g_cs.dtype),
                        pltpu.VMEM((3 * c, s), g_cs.dtype)],
        interpret=_interpret(interpret),
        cost_estimate=pl.CostEstimate(
            flops=2 * 4 * 9 * c * c * s * g * l_blocks,
            bytes_accessed=5 * c * s * g * l_blocks * 2, transcendentals=0),
    )(xs, h1s, g_cs, w1ts, w2ts, scale)


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def trunk_cs_mega(x_cs, w1, b1, w2, b2, res_scale, w_img, k, s_valid=None):
    """trunk_cs with the whole chain in one pallas_call per direction."""
    out, *_ = _trunk_fwd_mega_parts(x_cs, w1, b1, w2, b2, res_scale,
                                    w_img, k, s_valid)
    return out


def _trunk_fwd_mega_parts(x_cs, w1, b1, w2, b2, res_scale, w_img, k,
                          s_valid=None):
    dt = x_cs.dtype
    w1s = w1.astype(dt)
    w2s = w2.astype(dt)
    scale = jnp.asarray([[res_scale]], jnp.float32)
    out, xs, h1s = trunk_fwd_mega(
        x_cs, w1s, b1.astype(jnp.float32)[..., None],
        w2s, b2.astype(jnp.float32)[..., None], scale, w_img, k,
        s_valid=s_valid)
    return out, xs, h1s, w1s, w2s


def _trunk_mega_vjp_fwd(x_cs, w1, b1, w2, b2, res_scale, w_img, k,
                        s_valid=None):
    out, xs, h1s, w1s, w2s = _trunk_fwd_mega_parts(
        x_cs, w1, b1, w2, b2, res_scale, w_img, k, s_valid)
    return out, (xs, h1s, w1s, w2s)


def _trunk_mega_vjp_bwd(res_scale, w_img, k, s_valid, res, g):
    xs, h1s, w1s, w2s = res
    c = w1s.shape[1] // 3
    w1ts = w_cs_T_from_cs(w1s, c, c)
    w2ts = w_cs_T_from_cs(w2s, c, c)
    scale = jnp.asarray([[res_scale]], jnp.float32)
    dx, dw1, db1, dw2, db2 = trunk_bwd_mega(
        xs, h1s, g, w1ts, w2ts, scale, w_img, k, s_valid=s_valid)
    # the stacked-GR dot emits the (3C, 3C) CS arrangement directly
    return dx, dw1, db1[..., 0], dw2, db2[..., 0]


trunk_cs_mega.defvjp(_trunk_mega_vjp_fwd, _trunk_mega_vjp_bwd)


# ---------------------------------------------------------------------------
# RDN residual dense blocks in CS layout
# ---------------------------------------------------------------------------
#
# RDN-B's dense layers are convs (64*(i+1) -> 64): N=64 half-idles XLA's
# lanes while K grows to 1536 — ideal for the transposed layout (K util
# 90-100%). The trunk-level custom VJP below runs every dense conv as a
# CS kernel with per-layer-index weight stacks (uniform shapes across the
# D blocks, DMA-sliced via BlockSpec index maps); concats, ReLU masks and
# the 1x1 local fusions stay XLA (they are matmuls/copies, lane-friendly).
# Reference: models/rdn.py:27-45.


def conv3x3_cs_fwd_stk(x_cs, ws, bs, l, w_img, k, relu=False,
                       interpret=None):
    """Single CS conv with stacked weights: ws (D, 3C_out, 3C_in),
    bs (D, C_out, 1); block ``l`` is DMA'd via the index map."""
    g, c, s = x_cs.shape
    c_out = ws.shape[1] // 3
    blk = pl.BlockSpec((1, c, s), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    oblk = pl.BlockSpec((1, c_out, s), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_conv_fwd_kernel, w_img=w_img, wk=w_img * k, stk=True,
                relu=relu),
        grid=(g,),
        in_specs=[blk, _stk(l, ws.shape[1:]), _stk(l, bs.shape[1:])],
        out_specs=oblk,
        out_shape=jax.ShapeDtypeStruct((g, c_out, s), x_cs.dtype),
        scratch_shapes=[pltpu.VMEM((3 * c, s), x_cs.dtype)],
        interpret=_interpret(interpret),
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * c * c_out * s * g,
            bytes_accessed=(c + c_out) * s * g * 2, transcendentals=0),
    )(x_cs, ws, bs)


def conv3x3_cs_bwd_stk(x_cs, g_cs, wts, l, w_img, k, interpret=None):
    """Backward of the stacked CS conv: wts (D, 3C_in, 3C_out)."""
    g, c, s = x_cs.shape
    c_out = g_cs.shape[1]
    blk = pl.BlockSpec((1, c, s), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    gblk = pl.BlockSpec((1, c_out, s), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    acc_w = pl.BlockSpec((3, c_out, 3 * c), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    acc_b = pl.BlockSpec((c_out, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_conv_bwd_kernel, w_img=w_img, wk=w_img * k, stk=True),
        grid=(g,),
        in_specs=[blk, gblk, _stk(l, wts.shape[1:])],
        out_specs=(blk, acc_w, acc_b),
        out_shape=(jax.ShapeDtypeStruct(x_cs.shape, x_cs.dtype),
                   jax.ShapeDtypeStruct((3, c_out, 3 * c), jnp.float32),
                   jax.ShapeDtypeStruct((c_out, 1), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((3 * min(c, 64 if c > 128 else c), s),
                                   x_cs.dtype),
                        pltpu.VMEM((3 * c_out, s), x_cs.dtype)],
        interpret=_interpret(interpret),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * 9 * c * c_out * s * g,
            bytes_accessed=3 * c * s * g * 2, transcendentals=0),
    )(x_cs, g_cs, wts)



@partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def rdn_trunk_cs(x_cs, ws, bs, wfs, bfs, w_img, k):
    """D residual dense blocks, CS layout. ws: tuple of C arrays, ws[i]
    shape (D, 3G, 3*(G0+i*G)) CS-arranged; bs: tuple of C (D, G); wfs
    (D, G0, G0+C*G) 1x1 local-fusion weights; bfs (D, G0).
    Returns the tuple of D block outputs (for the global fusion)."""
    outs, *_ = _rdn_fwd(x_cs, ws, bs, wfs, bfs, w_img, k)
    return outs


def _rdn_fwd(x_cs, ws, bs, wfs, bfs, w_img, k):
    dt = x_cs.dtype
    d_blocks = ws[0].shape[0]
    wsd = [w.astype(dt) for w in ws]
    bsd = [b.astype(jnp.float32)[..., None] for b in bs]
    wfd = wfs.astype(dt)
    outs, bufs = [], []
    x = x_cs
    for l in range(d_blocks):
        buf = x
        for i in range(len(ws)):
            o = conv3x3_cs_fwd_stk(buf, wsd[i], bsd[i], l, w_img, k,
                                   relu=True)
            buf = jnp.concatenate([buf, o], axis=1)
        fused = jnp.einsum('oc,gcs->gos', wfd[l], buf) \
            + bfs[l].astype(jnp.float32)[:, None].astype(dt)
        x = fused + x
        bufs.append(buf)
        outs.append(x)
    return tuple(outs), tuple(bufs), wsd, wfd


def _rdn_vjp_fwd(x_cs, ws, bs, wfs, bfs, w_img, k):
    outs, bufs, wsd, wfd = _rdn_fwd(x_cs, ws, bs, wfs, bfs, w_img, k)
    return outs, (bufs, wsd, wfd)


def _rdn_vjp_bwd(w_img, k, res, cts):
    bufs, wsd, wfd = res
    dt = bufs[0].dtype
    d_blocks = len(bufs)
    n_layers = len(wsd)
    g0 = wfd.shape[1]
    # transposed kernels, one batched arrangement per layer index (XLA
    # CSE dedups these across nothing here — computed once)
    wts = [w_cs_T_from_cs(w, (w.shape[2] // 3), w.shape[1] // 3)
           for w in wsd]
    dW = [[None] * d_blocks for _ in range(n_layers)]
    dB = [[None] * d_blocks for _ in range(n_layers)]
    dWF = [None] * d_blocks
    dBF = [None] * d_blocks
    g = jnp.zeros_like(bufs[0][:, :g0])
    for l in reversed(range(d_blocks)):
        g = (g + cts[l]).astype(dt)     # chain + direct (global fusion)
        buf = bufs[l]
        gf = g.astype(jnp.float32)
        buff = buf.astype(jnp.float32)
        dWF[l] = jnp.einsum('gos,gcs->oc', gf, buff)
        dBF[l] = jnp.sum(gf, axis=(0, 2))
        dbuf = jnp.einsum('oc,gos->gcs', wfd[l], g)
        for i in reversed(range(n_layers)):
            lo, hi = g0 * (i + 1), g0 * (i + 2)
            do = jnp.where(buff[:, lo:hi] > 0, dbuf[:, lo:hi], 0) \
                .astype(dt)
            dxp, dwt, db = conv3x3_cs_bwd_stk(
                buf[:, :lo].astype(dt), do, wts[i], l, w_img, k)
            dbuf = dbuf.at[:, :lo].add(dxp)
            dW[i][l] = dwt.reshape(3 * g0, 3 * (i + 1) * g0)
            dB[i][l] = db[:, 0]
        # dx of the block: dense-chain into rows [0:g0] plus the RDB skip
        g = dbuf[:, :g0] + g
    dws = tuple(jnp.stack(dW[i]) for i in range(n_layers))
    dbs = tuple(jnp.stack(dB[i]) for i in range(n_layers))
    return (g, dws, dbs, jnp.stack(dWF), jnp.stack(dBF))


rdn_trunk_cs.defvjp(_rdn_vjp_fwd, _rdn_vjp_bwd)


# ---------------------------------------------------------------------------
# RDN: fused whole-RDB kernels (round-3 trunk)
# ---------------------------------------------------------------------------
#
# The per-layer trunk above matches XLA but no better: the dense-concat
# buffer is re-materialized between every kernel call (~4 ms/step of
# copies at the flagship config, PERF.md round 2). Here each RDB runs as
# ONE forward kernel with the growing (c_tot, S) buffer RESIDENT IN VMEM
# across all C layers (written once, as the residual for the backward),
# and the backward as two kernels per block: a chain kernel (dbuf resident
# in VMEM, dout per layer + dx + fusion grads) and pair-chunked dW
# kernels. Weights are pre-arranged chunk-major so every (layer, chunk)
# matmul slice is contiguous. Data traffic per block is the information-
# theoretic minimum: read x + weights, write buf + out (fwd); read buf,
# dout + weights, write grads (bwd). Reference: models/rdn.py:24-40.


def w_rdn_chunk_major(ws):
    """Per-layer CS stacks ws[i] (D, 3G, 3*(i+1)*G) [cols (dx, c_in)] ->
    one (D, 3G, n_pairs*3G) array, cols (chunk, dx, c_local)."""
    d, rows, _ = ws[0].shape
    g0 = rows // 3
    cm = []
    for i, w in enumerate(ws):
        n = i + 1
        v = w.reshape(d, rows, 3, n, g0).transpose(0, 1, 3, 2, 4)
        cm.append(v.reshape(d, rows, n * 3 * g0))
    return jnp.concatenate(cm, axis=2)


def w_rdn_chunks_T(ws):
    """Chunk-wise transposed kernels for the backward: (D, n_pairs*3G, 3G);
    row-block p = w_cs_T arrangement of pair p's (G -> G) sub-kernel."""
    out = []
    for w in ws:
        d, rows, cols = w.shape
        g0 = rows // 3
        n = cols // (3 * g0)
        v = w.reshape(d, 3, g0, 3, n, g0)      # dy, c_out, dx, chunk, c_l
        vt = v[:, ::-1, :, ::-1]               # flip taps
        vt = vt.transpose(0, 4, 1, 5, 3, 2)    # chunk, dy, c_l, dx, c_out
        out.append(vt.reshape(d, n * 3 * g0, 3 * g0))
    return jnp.concatenate(out, axis=1)


def _dw_pairs_to_layers(dwt, n_layers, g0):
    """(n_pairs, 3, G, 3G) pair grads -> tuple of per-layer (3G, 3cin)
    grads in the stored CS arrangement."""
    outs = []
    off = 0
    for i in range(n_layers):
        n = i + 1
        v = dwt[off:off + n]                   # chunk, dy, c_out, (dx, c_l)
        v = v.reshape(n, 3, g0, 3, g0).transpose(1, 2, 3, 0, 4)
        outs.append(v.reshape(3 * g0, 3 * n * g0))
        off += n
    return outs


def _rdb_fwd_kernel(x_ref, w_ref, b_ref, wf_ref, bf_ref,
                    out_ref, buf_ref, x3_ref, acc_ref, *, w_img, wk,
                    n_layers):
    s = x_ref.shape[2]
    g0 = x_ref.shape[1]
    x = x_ref[0]
    buf_ref[0, 0:g0] = x
    pair = 0
    for i in range(n_layers):
        lo = g0 * (i + 1)
        for j in range(i + 1):
            _build_x3(buf_ref[0, g0 * j:g0 * (j + 1)], x3_ref, s, w_img)
            p = jnp.dot(w_ref[0][:, pair * 3 * g0:(pair + 1) * 3 * g0],
                        x3_ref[...], preferred_element_type=jnp.float32)
            if j == 0:
                acc_ref[...] = p
            else:
                acc_ref[...] += p
            pair += 1
        h = jnp.maximum(_dy_reduce(acc_ref[...], s, wk) + b_ref[0, i], 0.0)
        buf_ref[0, lo:lo + g0] = h.astype(buf_ref.dtype)
    fused = jnp.dot(wf_ref[0], buf_ref[0],
                    preferred_element_type=jnp.float32) + bf_ref[0]
    out_ref[0] = (x.astype(jnp.float32) + fused).astype(out_ref.dtype)


def rdb_fused_fwd(x_cs, wcm, b, wf, bf, w_img, k, interpret=None):
    """One residual dense block, fully fused. Returns (out, buf).

    Weights arrive as (1, ...) XLA-level slices of the stacked arrays so
    every block invocation lowers to a byte-identical Mosaic kernel —
    the compile cache then builds ONE kernel for all D blocks instead of
    D (the round-2 per-block index maps compiled D distinct kernels and
    dominated RDN's 466 s compile)."""
    g, g0, s = x_cs.shape
    n_layers = b.shape[1]
    c_tot = wf.shape[2]
    blk = pl.BlockSpec((1, g0, s), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    bufblk = pl.BlockSpec((1, c_tot, s), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    n_pairs = wcm.shape[2] // (3 * g0)
    return pl.pallas_call(
        partial(_rdb_fwd_kernel, w_img=w_img, wk=w_img * k,
                n_layers=n_layers),
        grid=(g,),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        in_specs=[blk, _stk(0, wcm.shape[1:]), _stk(0, b.shape[1:]),
                  _stk(0, wf.shape[1:]), _stk(0, bf.shape[1:])],
        out_specs=(blk, bufblk),
        out_shape=(jax.ShapeDtypeStruct((g, g0, s), x_cs.dtype),
                   jax.ShapeDtypeStruct((g, c_tot, s), x_cs.dtype)),
        scratch_shapes=[pltpu.VMEM((3 * g0, s), x_cs.dtype),
                        pltpu.VMEM((3 * g0, s), jnp.float32)],
        interpret=_interpret(interpret),
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * g0 * g0 * s * g * (n_pairs + n_layers),
            bytes_accessed=(g0 + 2 * c_tot) * s * g * 2,
            transcendentals=0),
    )(x_cs, wcm, b, wf, bf)


def _rdb_bwd_chain_kernel(buf_ref, g_ref, wt_ref, wft_ref,
                          dx_ref, dout_ref, dwf_ref, dbf_ref, db_ref,
                          dbuf_ref, g3_ref, *, w_img, wk, n_layers):
    gid = pl.program_id(0)
    s = g_ref.shape[2]
    g0 = g_ref.shape[1]
    gf = g_ref[0].astype(jnp.float32)
    buf = buf_ref[0]

    @pl.when(gid == 0)
    def _():
        dwf_ref[...] = jnp.zeros_like(dwf_ref)
        dbf_ref[...] = jnp.zeros_like(dbf_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    # local-fusion backward: out = x + wf @ buf + bf
    dwf_ref[...] += jax.lax.dot_general(
        g_ref[0], buf, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbf_ref[...] += jnp.sum(gf, axis=1, keepdims=True)
    dbuf_ref[...] = jnp.dot(wft_ref[0], g_ref[0],
                            preferred_element_type=jnp.float32)

    pair_end = n_layers * (n_layers + 1) // 2
    for i in reversed(range(n_layers)):
        lo = g0 * (i + 1)
        h = buf[lo:lo + g0].astype(jnp.float32)
        dout = jnp.where(h > 0, dbuf_ref[lo:lo + g0], 0.0)
        db_ref[i] += jnp.sum(dout, axis=1, keepdims=True)
        doutb = dout.astype(buf.dtype)
        dout_ref[0, g0 * i:g0 * (i + 1)] = doutb
        _build_x3(doutb, g3_ref, s, w_img)
        pair_end -= i + 1
        for j in range(i + 1):
            p_idx = pair_end + j
            wt_j = wt_ref[0][p_idx * 3 * g0:(p_idx + 1) * 3 * g0]
            p = jnp.dot(wt_j, g3_ref[...],
                        preferred_element_type=jnp.float32)
            dbuf_ref[g0 * j:g0 * (j + 1)] += _dy_reduce(p, s, wk)
    dx_ref[0] = (dbuf_ref[0:g0] + gf).astype(dx_ref.dtype)


def rdb_bwd_chain(buf, g_cs, wtcm, wft, w_img, k, n_layers,
                  interpret=None):
    """Backward chain of one RDB: (dx, dout_stack, dwf, dbf, db).
    wtcm/wft are (1, ...) slices — see rdb_fused_fwd on kernel dedupe."""
    g, c_tot, s = buf.shape
    g0 = g_cs.shape[1]
    blk = pl.BlockSpec((1, g0, s), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    bufblk = pl.BlockSpec((1, c_tot, s), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    doutblk = pl.BlockSpec((1, n_layers * g0, s), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    acc_wf = pl.BlockSpec((g0, c_tot), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    acc_bf = pl.BlockSpec((g0, 1), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    acc_b = pl.BlockSpec((n_layers, g0, 1), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_rdb_bwd_chain_kernel, w_img=w_img, wk=w_img * k,
                n_layers=n_layers),
        grid=(g,),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        in_specs=[bufblk, blk, _stk(0, wtcm.shape[1:]),
                  _stk(0, wft.shape[1:])],
        out_specs=(blk, doutblk, acc_wf, acc_bf, acc_b),
        out_shape=(jax.ShapeDtypeStruct((g, g0, s), buf.dtype),
                   jax.ShapeDtypeStruct((g, n_layers * g0, s), buf.dtype),
                   jax.ShapeDtypeStruct((g0, c_tot), jnp.float32),
                   jax.ShapeDtypeStruct((g0, 1), jnp.float32),
                   jax.ShapeDtypeStruct((n_layers, g0, 1), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((c_tot, s), jnp.float32),
                        pltpu.VMEM((3 * g0, s), buf.dtype)],
        interpret=_interpret(interpret),
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * g0 * g0 * s * g
            * (n_layers * (n_layers + 1) // 2 + n_layers),
            bytes_accessed=3 * c_tot * s * g * 2, transcendentals=0),
    )(buf, g_cs, wtcm, wft)


def _rdb_bwd_dw_kernel(buf_ref, dout_ref, dwt_ref, x3_ref, *, w_img, wk,
                       pairs):
    gid = pl.program_id(0)
    s = buf_ref.shape[2]
    g0 = dwt_ref.shape[2]

    @pl.when(gid == 0)
    def _():
        dwt_ref[...] = jnp.zeros_like(dwt_ref)

    by_i: dict = {}
    for idx, (i, j) in enumerate(pairs):
        by_i.setdefault(i, []).append((idx, j))
    for i, items in by_i.items():
        doutf = dout_ref[0, g0 * i:g0 * (i + 1)].astype(jnp.float32)
        grs = [_gs_roll(doutf.astype(buf_ref.dtype), dy, s, wk)
               for dy in range(3)]
        for idx, j in items:
            _build_x3(buf_ref[0, g0 * j:g0 * (j + 1)], x3_ref, s, w_img)
            x3 = x3_ref[...]
            for dy in range(3):
                dwt_ref[idx, dy] += jax.lax.dot_general(
                    grs[dy], x3, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)


def rdb_bwd_dw(buf, dout, pairs, w_img, k, g0, interpret=None):
    """dW accumulation for a list of (layer, chunk) pairs:
    returns (n_pairs, 3, G, 3G) f32 [(dy), (c_out), (dx, c_local)]."""
    g, c_tot, s = buf.shape
    n_layers = dout.shape[1] // g0
    bufblk = pl.BlockSpec((1, c_tot, s), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    doutblk = pl.BlockSpec((1, n_layers * g0, s), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    acc = pl.BlockSpec((len(pairs), 3, g0, 3 * g0),
                       lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_rdb_bwd_dw_kernel, w_img=w_img, wk=w_img * k,
                pairs=tuple(pairs)),
        grid=(g,),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        in_specs=[bufblk, doutblk],
        out_specs=acc,
        out_shape=jax.ShapeDtypeStruct((len(pairs), 3, g0, 3 * g0),
                                       jnp.float32),
        scratch_shapes=[pltpu.VMEM((3 * g0, s), buf.dtype)],
        interpret=_interpret(interpret),
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * g0 * g0 * s * g * len(pairs),
            bytes_accessed=(c_tot + n_layers * g0) * s * g * 2,
            transcendentals=0),
    )(buf, dout)


@partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def rdn_trunk_cs2(x_cs, ws, bs, wfs, bfs, w_img, k):
    """D fused residual dense blocks (whole-RDB kernels). Same signature
    and stored param layout as rdn_trunk_cs; returns the D block outputs."""
    outs, *_ = _rdn2_fwd(x_cs, ws, bs, wfs, bfs, w_img, k)
    return outs


def _rdn2_fwd(x_cs, ws, bs, wfs, bfs, w_img, k):
    dt = x_cs.dtype
    d = wfs.shape[0]
    wsd = [w.astype(dt) for w in ws]
    wcm = w_rdn_chunk_major(wsd)
    b = jnp.stack([b_.astype(jnp.float32) for b_ in bs], axis=1)[..., None]
    wfd = wfs.astype(dt)
    bfd = bfs.astype(jnp.float32)[..., None]
    outs, bufs = [], []
    x = x_cs
    for l in range(d):
        x, buf = rdb_fused_fwd(x, wcm[l:l + 1], b[l:l + 1], wfd[l:l + 1],
                               bfd[l:l + 1], w_img, k)
        outs.append(x)
        bufs.append(buf)
    return tuple(outs), tuple(bufs), wsd, wfd


def _rdn2_vjp_fwd(x_cs, ws, bs, wfs, bfs, w_img, k):
    outs, bufs, wsd, wfd = _rdn2_fwd(x_cs, ws, bs, wfs, bfs, w_img, k)
    return outs, (bufs, wsd, wfd)


# dW accumulator VMEM budget: pairs are split so one call's (p, 3, G, 3G)
# f32 block stays well under the scoped limit next to buf + dout blocks.
# Read at TRACE time — tools/ab_rdn_dw.py A/Bs values in one process.
_DW_PAIRS_PER_CALL = 18
# dW layout conversion: 'per-block' (default, measured best) converts
# each block's pair-major grads separately — the many small copies
# overlap the kernel stream; 'batched' (one transpose per layer across
# all D blocks) measured 5.5% SLOWER (23.68 vs 22.37 ms, one-process
# A/B tools/ab_rdn_dw.py, PERF.md r5 RDN close-out) because the big
# transposes depend on every block's dW and serialize at the graph tail.
_RDN_DW_LAYOUT = 'per-block'


def _rdn2_vjp_bwd(w_img, k, res, cts):
    bufs, wsd, wfd = res
    dt = bufs[0].dtype
    d = len(bufs)
    n_layers = len(wsd)
    g0 = wfd.shape[1]
    wtcm = w_rdn_chunks_T(wsd)
    wft = jnp.transpose(wfd, (0, 2, 1))
    pairs = [(i, j) for i in range(n_layers) for j in range(i + 1)]
    halves = [pairs[o:o + _DW_PAIRS_PER_CALL]
              for o in range(0, len(pairs), _DW_PAIRS_PER_CALL)]

    dwts = [None] * d
    dwf = [None] * d
    dbf = [None] * d
    db = [None] * d
    g = jnp.zeros_like(bufs[0][:, :g0])
    for l in reversed(range(d)):
        gl = (g.astype(jnp.float32) + cts[l].astype(jnp.float32)).astype(dt)
        g, dout, dwf[l], dbf_l, db_l = rdb_bwd_chain(
            bufs[l], gl, wtcm[l:l + 1], wft[l:l + 1], w_img, k, n_layers)
        dbf[l] = dbf_l[:, 0]
        db[l] = db_l[..., 0]
        dwts[l] = jnp.concatenate(
            [rdb_bwd_dw(bufs[l], dout, h, w_img, k, g0) for h in halves],
            axis=0)

    if _RDN_DW_LAYOUT == 'per-block':   # legacy A/B control
        dws_layers = [_dw_pairs_to_layers(dwts[l], n_layers, g0)
                      for l in range(d)]
        dws = tuple(jnp.stack([dws_layers[l][i] for l in range(d)])
                    for i in range(n_layers))
        dbs = tuple(jnp.stack([db[l][i] for l in range(d)])
                    for i in range(n_layers))
        return (g, dws, dbs, jnp.stack(dwf), jnp.stack(dbf))
    # pair-major -> stored per-layer CS arrangement, batched over all D
    # blocks (one transpose per LAYER, not per (block, layer): the
    # round-5 RDN profile showed the per-block conversion contributing
    # to 750+ async copy ops per step around 78%-busy kernels)
    dwts_all = jnp.stack(dwts)            # (D, n_pairs, 3, G, 3G)
    db_all = jnp.stack(db)                # (D, n_layers, G)
    dws, off = [], 0
    for i in range(n_layers):
        n = i + 1
        v = dwts_all[:, off:off + n].reshape(d, n, 3, g0, 3, g0)
        dws.append(v.transpose(0, 2, 3, 4, 1, 5)
                   .reshape(d, 3 * g0, 3 * n * g0))
        off += n
    dbs = tuple(db_all[:, i] for i in range(n_layers))
    return (g, tuple(dws), dbs, jnp.stack(dwf), jnp.stack(dbf))


rdn_trunk_cs2.defvjp(_rdn2_vjp_fwd, _rdn2_vjp_bwd)


# ---------------------------------------------------------------------------
# RDN: grid-over-blocks trunk (round-5 candidate)
# ---------------------------------------------------------------------------
#
# The rdn_trunk_cs2 forward issues D pallas_calls fed by XLA-level
# w[l:l+1] slices; the round-5 profile charged 750+ async copy/slice ops
# per step to those slices plus the per-block buf arrays, with ~4.8 ms
# of the 22.3 ms step unoverlapped (PERF.md RDN close-out). Here the
# WHOLE trunk forward is ONE pallas_call with grid (G, D): the running
# activation lives in a VMEM scratch across the D inner grid steps, each
# step's weights are DMA'd by BlockSpec index maps straight from the
# stacked arrays (one compiled kernel — the grid index selects the
# block, nothing is baked into the body), and the D block outputs are
# written directly in the GFF concat layout (G, D*G0, S) so the XLA
# concatenate disappears too. The backward keeps the measured-best
# per-block structure (batched variants measured negative, PERF.md) but
# reads the (D, G, c_tot, S) buf stack via SCALAR-PREFETCH index maps —
# the block index is a runtime operand, so one compiled kernel serves
# all D blocks with no XLA slice copies.


def _rdn_all_fwd_kernel(x_ref, w_ref, b_ref, wf_ref, bf_ref,
                        cat_ref, buf_ref, x3_ref, acc_ref, xrun_ref,
                        *, w_img, wk, n_layers):
    d_id = pl.program_id(1)
    s = x_ref.shape[2]
    g0 = x_ref.shape[1]

    @pl.when(d_id == 0)
    def _():
        xrun_ref[...] = x_ref[0]

    x = xrun_ref[...]
    buf_ref[0, 0, 0:g0] = x
    pair = 0
    for i in range(n_layers):
        lo = g0 * (i + 1)
        for j in range(i + 1):
            _build_x3(buf_ref[0, 0, g0 * j:g0 * (j + 1)], x3_ref, s, w_img)
            p = jnp.dot(w_ref[0][:, pair * 3 * g0:(pair + 1) * 3 * g0],
                        x3_ref[...], preferred_element_type=jnp.float32)
            if j == 0:
                acc_ref[...] = p
            else:
                acc_ref[...] += p
            pair += 1
        h = jnp.maximum(_dy_reduce(acc_ref[...], s, wk) + b_ref[0, i], 0.0)
        buf_ref[0, 0, lo:lo + g0] = h.astype(buf_ref.dtype)
    fused = jnp.dot(wf_ref[0], buf_ref[0, 0],
                    preferred_element_type=jnp.float32) + bf_ref[0]
    out = (x.astype(jnp.float32) + fused).astype(xrun_ref.dtype)
    cat_ref[0] = out
    xrun_ref[...] = out


def rdn_all_fwd(x_cs, wcm, b, wf, bf, w_img, k, interpret=None):
    """All D residual dense blocks in one pallas_call (grid (G, D)).
    Returns (cat (G, D*G0, S) — the block outputs already in GFF concat
    layout — and buf_all (D, G, c_tot, S) for the backward)."""
    g, g0, s = x_cs.shape
    d = wf.shape[0]
    n_layers = b.shape[1]
    c_tot = wf.shape[2]
    n_pairs = wcm.shape[2] // (3 * g0)
    return pl.pallas_call(
        partial(_rdn_all_fwd_kernel, w_img=w_img, wk=w_img * k,
                n_layers=n_layers),
        grid=(g, d),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        in_specs=[
            pl.BlockSpec((1, g0, s), lambda i, l: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + wcm.shape[1:], lambda i, l: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + b.shape[1:], lambda i, l: (l, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + wf.shape[1:], lambda i, l: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + bf.shape[1:], lambda i, l: (l, 0, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((1, g0, s), lambda i, l: (i, l, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c_tot, s), lambda i, l: (l, i, 0, 0),
                         memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((g, d * g0, s), x_cs.dtype),
                   jax.ShapeDtypeStruct((d, g, c_tot, s), x_cs.dtype)),
        scratch_shapes=[pltpu.VMEM((3 * g0, s), x_cs.dtype),
                        pltpu.VMEM((3 * g0, s), jnp.float32),
                        pltpu.VMEM((g0, s), x_cs.dtype)],
        interpret=_interpret(interpret),
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * g0 * g0 * s * g * d * (n_pairs + n_layers),
            bytes_accessed=(g0 + 2 * c_tot) * s * g * d * 2,
            transcendentals=0),
    )(x_cs, wcm, b, wf, bf)


def _rdb_bwd_chain_kernel_sp(l_ref, buf_ref, g_ref, ct_ref, wt_ref,
                             wft_ref, dx_ref, dout_ref, dwf_ref, dbf_ref,
                             db_ref, dbuf_ref, g3_ref, *, w_img, wk,
                             n_layers):
    """Scalar-prefetch chain: buf block selected by l_ref at runtime;
    the incoming cotangent is g_run + the block's slice of the cat-layout
    cotangent (added in-kernel — no XLA slice/add per block)."""
    del l_ref
    gid = pl.program_id(0)
    s = g_ref.shape[2]
    g0 = g_ref.shape[1]
    gf = g_ref[0].astype(jnp.float32) + ct_ref[0].astype(jnp.float32)
    gc = gf.astype(buf_ref.dtype)
    buf = buf_ref[0, 0]

    @pl.when(gid == 0)
    def _():
        dwf_ref[...] = jnp.zeros_like(dwf_ref)
        dbf_ref[...] = jnp.zeros_like(dbf_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    dwf_ref[...] += jax.lax.dot_general(
        gc, buf, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbf_ref[...] += jnp.sum(gf, axis=1, keepdims=True)
    dbuf_ref[...] = jnp.dot(wft_ref[0], gc,
                            preferred_element_type=jnp.float32)

    pair_end = n_layers * (n_layers + 1) // 2
    for i in reversed(range(n_layers)):
        lo = g0 * (i + 1)
        h = buf[lo:lo + g0].astype(jnp.float32)
        dout = jnp.where(h > 0, dbuf_ref[lo:lo + g0], 0.0)
        db_ref[i] += jnp.sum(dout, axis=1, keepdims=True)
        doutb = dout.astype(buf.dtype)
        dout_ref[0, g0 * i:g0 * (i + 1)] = doutb
        _build_x3(doutb, g3_ref, s, w_img)
        pair_end -= i + 1
        for j in range(i + 1):
            p_idx = pair_end + j
            wt_j = wt_ref[0][p_idx * 3 * g0:(p_idx + 1) * 3 * g0]
            p = jnp.dot(wt_j, g3_ref[...],
                        preferred_element_type=jnp.float32)
            dbuf_ref[g0 * j:g0 * (j + 1)] += _dy_reduce(p, s, wk)
    dx_ref[0] = (dbuf_ref[0:g0] + gf).astype(dx_ref.dtype)


def rdb_bwd_chain_all(buf_all, l, g_run, ct_cat, wtcm, wft, w_img, k,
                      n_layers, interpret=None):
    """Backward chain of block ``l`` reading the (D, G, c_tot, S) buf
    stack and the (G, D*G0, S) cat-layout cotangent via scalar-prefetch
    index maps — one compiled kernel for all D blocks, zero XLA slices."""
    d, g, c_tot, s = buf_all.shape
    g0 = g_run.shape[1]
    lidx = jnp.asarray([l], jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, 1, c_tot, s),
                         lambda i, lr: (lr[0], i, 0, 0)),
            pl.BlockSpec((1, g0, s), lambda i, lr: (i, 0, 0)),
            pl.BlockSpec((1, g0, s), lambda i, lr: (i, lr[0], 0)),
            pl.BlockSpec((1,) + wtcm.shape[1:],
                         lambda i, lr: (lr[0], 0, 0)),
            pl.BlockSpec((1,) + wft.shape[1:],
                         lambda i, lr: (lr[0], 0, 0))],
        out_specs=(
            pl.BlockSpec((1, g0, s), lambda i, lr: (i, 0, 0)),
            pl.BlockSpec((1, n_layers * g0, s), lambda i, lr: (i, 0, 0)),
            pl.BlockSpec((g0, c_tot), lambda i, lr: (0, 0)),
            pl.BlockSpec((g0, 1), lambda i, lr: (0, 0)),
            pl.BlockSpec((n_layers, g0, 1), lambda i, lr: (0, 0, 0))),
        scratch_shapes=[pltpu.VMEM((c_tot, s), jnp.float32),
                        pltpu.VMEM((3 * g0, s), buf_all.dtype)])
    return pl.pallas_call(
        partial(_rdb_bwd_chain_kernel_sp, w_img=w_img, wk=w_img * k,
                n_layers=n_layers),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        out_shape=(jax.ShapeDtypeStruct((g, g0, s), buf_all.dtype),
                   jax.ShapeDtypeStruct((g, n_layers * g0, s),
                                        buf_all.dtype),
                   jax.ShapeDtypeStruct((g0, c_tot), jnp.float32),
                   jax.ShapeDtypeStruct((g0, 1), jnp.float32),
                   jax.ShapeDtypeStruct((n_layers, g0, 1), jnp.float32)),
        interpret=_interpret(interpret),
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * g0 * g0 * s * g
            * (n_layers * (n_layers + 1) // 2 + n_layers),
            bytes_accessed=3 * c_tot * s * g * 2, transcendentals=0),
    )(lidx, buf_all, g_run, ct_cat, wtcm, wft)


def _rdb_bwd_dw_kernel_sp(l_ref, buf_ref, dout_ref, dwt_ref, x3_ref,
                          *, w_img, wk, pairs):
    del l_ref
    gid = pl.program_id(0)
    s = buf_ref.shape[3]
    g0 = dwt_ref.shape[2]

    @pl.when(gid == 0)
    def _():
        dwt_ref[...] = jnp.zeros_like(dwt_ref)

    by_i: dict = {}
    for idx, (i, j) in enumerate(pairs):
        by_i.setdefault(i, []).append((idx, j))
    for i, items in by_i.items():
        doutf = dout_ref[0, g0 * i:g0 * (i + 1)].astype(jnp.float32)
        grs = [_gs_roll(doutf.astype(buf_ref.dtype), dy, s, wk)
               for dy in range(3)]
        for idx, j in items:
            _build_x3(buf_ref[0, 0, g0 * j:g0 * (j + 1)], x3_ref, s, w_img)
            x3 = x3_ref[...]
            for dy in range(3):
                dwt_ref[idx, dy] += jax.lax.dot_general(
                    grs[dy], x3, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)


def rdb_bwd_dw_all(buf_all, l, dout, pairs, w_img, k, g0, interpret=None):
    """dW pair-chunk accumulation for block ``l`` off the buf stack
    (scalar-prefetch block select, see rdb_bwd_chain_all)."""
    d, g, c_tot, s = buf_all.shape
    n_layers = dout.shape[1] // g0
    lidx = jnp.asarray([l], jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, 1, c_tot, s),
                         lambda i, lr: (lr[0], i, 0, 0)),
            pl.BlockSpec((1, n_layers * g0, s), lambda i, lr: (i, 0, 0))],
        out_specs=pl.BlockSpec((len(pairs), 3, g0, 3 * g0),
                               lambda i, lr: (0, 0, 0, 0)),
        scratch_shapes=[pltpu.VMEM((3 * g0, s), buf_all.dtype)])
    return pl.pallas_call(
        partial(_rdb_bwd_dw_kernel_sp, w_img=w_img, wk=w_img * k,
                pairs=tuple(pairs)),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        out_shape=jax.ShapeDtypeStruct((len(pairs), 3, g0, 3 * g0),
                                       jnp.float32),
        interpret=_interpret(interpret),
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * g0 * g0 * s * g * len(pairs),
            bytes_accessed=(c_tot + n_layers * g0) * s * g * 2,
            transcendentals=0),
    )(lidx, buf_all, dout)


@partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def rdn_trunk_cat_cs(x_cs, ws, bs, wfs, bfs, w_img, k):
    """Grid-over-blocks RDN trunk: same stored params as rdn_trunk_cs2,
    but ONE forward kernel for all D blocks and the result delivered
    directly in the GFF concat layout (G, D*G0, S)."""
    out, _ = _rdn3_fwd(x_cs, ws, bs, wfs, bfs, w_img, k)
    return out


def _rdn3_fwd(x_cs, ws, bs, wfs, bfs, w_img, k):
    dt = x_cs.dtype
    wsd = [w.astype(dt) for w in ws]
    wcm = w_rdn_chunk_major(wsd)
    b = jnp.stack([b_.astype(jnp.float32) for b_ in bs], axis=1)[..., None]
    cat, buf_all = rdn_all_fwd(x_cs, wcm, b, wfs.astype(dt),
                               bfs.astype(jnp.float32)[..., None],
                               w_img, k)
    return cat, (buf_all, wsd, wfs.astype(dt))


def _rdn3_vjp_fwd(x_cs, ws, bs, wfs, bfs, w_img, k):
    return _rdn3_fwd(x_cs, ws, bs, wfs, bfs, w_img, k)


def _rdn3_vjp_bwd(w_img, k, res, ct_cat):
    buf_all, wsd, wfd = res
    dt = buf_all.dtype
    d = buf_all.shape[0]
    n_layers = len(wsd)
    g0 = wfd.shape[1]
    wtcm = w_rdn_chunks_T(wsd)
    wft = jnp.transpose(wfd, (0, 2, 1))
    pairs = [(i, j) for i in range(n_layers) for j in range(i + 1)]
    halves = [pairs[o:o + _DW_PAIRS_PER_CALL]
              for o in range(0, len(pairs), _DW_PAIRS_PER_CALL)]
    ctd = ct_cat.astype(dt)

    dwts = [None] * d
    dwf = [None] * d
    dbf = [None] * d
    db = [None] * d
    g = jnp.zeros_like(buf_all[0, :, :g0])
    for l in reversed(range(d)):
        g, dout, dwf[l], dbf_l, db_l = rdb_bwd_chain_all(
            buf_all, l, g, ctd, wtcm, wft, w_img, k, n_layers)
        dbf[l] = dbf_l[:, 0]
        db[l] = db_l[..., 0]
        dwts[l] = jnp.concatenate(
            [rdb_bwd_dw_all(buf_all, l, dout, h, w_img, k, g0)
             for h in halves], axis=0)

    dws_layers = [_dw_pairs_to_layers(dwts[l], n_layers, g0)
                  for l in range(d)]
    dws = tuple(jnp.stack([dws_layers[l][i] for l in range(d)])
                for i in range(n_layers))
    dbs = tuple(jnp.stack([db[l][i] for l in range(d)])
                for i in range(n_layers))
    return (g, dws, dbs, jnp.stack(dwf), jnp.stack(dbf))


rdn_trunk_cat_cs.defvjp(_rdn3_vjp_fwd, _rdn3_vjp_bwd)


# forward-path selector for the one-process A/B (tools/ab_rdn_grid.py):
# 'grid' = rdn_trunk_cat_cs (one fwd kernel, scalar-prefetch bwd);
# 'calls' = rdn_trunk_cs2 (per-block calls, round-3 path).
# Measured DEAD EVEN on step time (22.30 vs 22.36 ms, one-process A/B,
# PERF.md round 5) — the XLA slices the grid path eliminates were fully
# overlapped — but the single-kernel forward compiles ~6x faster
# (36 s vs 214 s cold) and drops the output concat, so 'grid' ships.
_RDN_FWD = 'grid'


# ---------------------------------------------------------------------------
# RCAN residual group in CS layout (RCABs + close conv + group skip)
# ---------------------------------------------------------------------------
#
# RCAB = conv-relu-conv (fused Pallas pair, skip=False) followed by a
# channel-attention gate. The gate runs in XLA but DIRECTLY ON THE CS
# LAYOUT (per-image lane-segment means + a (C -> C/r -> C) MLP), so the
# trunk never leaves the transposed layout. The whole group is one custom
# VJP: weights stay stacked (each Pallas call DMAs its slice), and the
# gate's backward is hand-derived below. Reference: models/rcan.py:10-77.





def _seg_masks(s, w, k, s_valid=None):
    """Per-image lane masks; s_valid excludes the dead-lane pad tail
    (cs_plan_pad) — pad lanes would otherwise be attributed to real
    images by the ``lane % (w*k)`` arithmetic and poison the CA pools."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1)
    img = (lane % (w * k)) // w
    if s_valid is not None and s_valid < s:
        return [(img == j) & (lane < s_valid) for j in range(k)]
    return [img == j for j in range(k)]


def _pool_cols(v, masks, n_pix):
    """Per-image lane-segment means of v (C, S) -> (C, k) f32."""
    cols = [jnp.sum(jnp.where(m, v, 0.0), axis=1, keepdims=True)
            for m in masks]
    return jnp.concatenate(cols, axis=1) / n_pix


def _gate_cs(q, masks, s):
    """(C, k) per-image vectors -> (C, S) via segment masks."""
    acc = jnp.zeros((q.shape[0], s), jnp.float32)
    for j, m in enumerate(masks):
        acc = jnp.where(m, q[:, j:j + 1], acc)
    return acc


def _ca_forward(r2f, wdt, wut, bd, bu, masks, n_pix):
    """In-kernel channel attention: returns (p, z, q) — all f32."""
    p = _pool_cols(r2f, masks, n_pix)                    # (C, k)
    z = jnp.maximum(jnp.dot(wdt, p,
                            preferred_element_type=jnp.float32) + bd, 0.0)
    q = jax.nn.sigmoid(jnp.dot(wut, z,
                               preferred_element_type=jnp.float32) + bu)
    return p, z, q


def _rcab_fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                     wdt_ref, bd_ref, wut_ref, bu_ref,
                     out_ref, h1_ref, r2_ref, x3_ref, *, w_img, wk, k,
                     s_valid=None):
    x = x_ref[0]
    c, s = x.shape
    _build_x3(x, x3_ref, s, w_img)
    p_ = jnp.dot(w1_ref[0], x3_ref[...], preferred_element_type=jnp.float32)
    # re-zero the pad tail (bias/relu leave relu(b1) there otherwise —
    # the next conv's boundary reads and the bwd rolls need zeros)
    h1 = _zpad(jnp.maximum(_dy_reduce(p_, s, wk) + b1_ref[0], 0.0),
               s_valid).astype(x.dtype)
    h1_ref[0] = h1
    _build_x3(h1, x3_ref, s, w_img)
    p_ = jnp.dot(w2_ref[0], x3_ref[...], preferred_element_type=jnp.float32)
    r2f = _zpad(_dy_reduce(p_, s, wk) + b2_ref[0], s_valid)
    r2_ref[0] = r2f.astype(x.dtype)

    masks = _seg_masks(s, w_img, k, s_valid)
    _, _, q = _ca_forward(r2f, wdt_ref[0], wut_ref[0], bd_ref[0],
                          bu_ref[0], masks, (s_valid or s) // k)
    out_ref[0] = (x.astype(jnp.float32)
                  + r2f * _gate_cs(q, masks, s)).astype(out_ref.dtype)


def _rcab_bwd_kernel(x_ref, h1_ref, r2_ref, g_ref, w1t_ref, w2t_ref,
                     wd_ref, wdt_ref, wu_ref, wut_ref, bd_ref, bu_ref,
                     dx_ref, dw1t_ref, db1_ref, dw2t_ref, db2_ref,
                     dwd_ref, dbd_ref, dwu_ref, dbu_ref,
                     s3_ref, *, w_img, wk, k, s_valid=None):
    gid = pl.program_id(0)
    x = x_ref[0]
    h1 = h1_ref[0]
    g = g_ref[0]
    c, s = x.shape
    r2f = r2_ref[0].astype(jnp.float32)
    gf = g.astype(jnp.float32)
    masks = _seg_masks(s, w_img, k, s_valid)
    n_pix = (s_valid or s) // k

    @pl.when(gid == 0)
    def _():
        for ref in (dw1t_ref, db1_ref, dw2t_ref, db2_ref,
                    dwd_ref, dbd_ref, dwu_ref, dbu_ref):
            ref[...] = jnp.zeros_like(ref)

    # recompute the gate pieces from the saved r2 (tiny MLP)
    p, z, q = _ca_forward(r2f, wdt_ref[0], wut_ref[0], bd_ref[0],
                          bu_ref[0], masks, n_pix)
    # out = x + r2 * gate(q):  dr2 = g*q_b + broadcast(dp)/n_pix
    dq = _pool_cols(gf * r2f, masks, 1.0)                 # seg SUM (C, k)
    dzq = dq * q * (1.0 - q)
    dwu_ref[...] += jax.lax.dot_general(
        z, dzq, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)               # (Cr, C)
    dbu_ref[...] += jnp.sum(dzq, axis=1, keepdims=True)
    dz = jnp.dot(wu_ref[0], dzq,
                 preferred_element_type=jnp.float32) * (z > 0)
    dwd_ref[...] += jax.lax.dot_general(
        p, dz, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)               # (C, Cr)
    dbd_ref[...] += jnp.sum(dz, axis=1, keepdims=True)
    dp = jnp.dot(wd_ref[0], dz, preferred_element_type=jnp.float32)
    dr2 = (gf * _gate_cs(q, masks, s)
           + _gate_cs(dp / n_pix, masks, s)).astype(x.dtype)

    # conv-pair backward (skip-free), dh1 through the saved relu mask
    _build_x3(dr2, s3_ref, s, w_img)
    p_ = jnp.dot(w2t_ref[0], s3_ref[...], preferred_element_type=jnp.float32)
    dh1 = jnp.where(h1.astype(jnp.float32) > 0,
                    _dy_reduce(p_, s, wk), 0.0).astype(x.dtype)
    _build_x3(dh1, s3_ref, s, w_img)
    p_ = jnp.dot(w1t_ref[0], s3_ref[...], preferred_element_type=jnp.float32)
    dx_ref[0] = _zpad(_dy_reduce(p_, s, wk) + gf,
                      s_valid).astype(dx_ref.dtype)

    _build_x3(h1, s3_ref, s, w_img)
    h3 = s3_ref[...]
    dr2f = dr2.astype(jnp.float32)
    for dy in range(3):
        gr = _gs_roll(dr2f.astype(x.dtype), dy, s, wk)
        dw2t_ref[dy] += jax.lax.dot_general(
            gr, h3, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    db2_ref[...] += jnp.sum(dr2f, axis=1, keepdims=True)

    _build_x3(x, s3_ref, s, w_img)
    x3 = s3_ref[...]
    dh1f = dh1.astype(jnp.float32)
    for dy in range(3):
        dr_ = _gs_roll(dh1f.astype(x.dtype), dy, s, wk)
        dw1t_ref[dy] += jax.lax.dot_general(
            dr_, x3, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    db1_ref[...] += jnp.sum(dh1f, axis=1, keepdims=True)


def _rcab_fwd_call(x_cs, w1s, b1s, w2s, b2s, wdts, bds, wuts, bus,
                   w_img, k, interpret=None, s_valid=None):
    # weights are (1, ...) XLA-level slices -> one Mosaic kernel serves
    # every RCAB in every group (see rdb_fused_fwd on kernel dedupe)
    g, c, s = x_cs.shape
    cr = wdts.shape[1]
    blk, _ = _specs(g, c, s)
    return pl.pallas_call(
        partial(_rcab_fwd_kernel, w_img=w_img, wk=w_img * k, k=k,
                s_valid=s_valid),
        grid=(g,),
        in_specs=[blk, _stk(0, (3 * c, 3 * c)), _stk(0, (c, 1)),
                  _stk(0, (3 * c, 3 * c)), _stk(0, (c, 1)),
                  _stk(0, (cr, c)), _stk(0, (cr, 1)),
                  _stk(0, (c, cr)), _stk(0, (c, 1))],
        out_specs=(blk, blk, blk),
        out_shape=(jax.ShapeDtypeStruct(x_cs.shape, x_cs.dtype),) * 3,
        scratch_shapes=[pltpu.VMEM((3 * c, s), x_cs.dtype)],
        interpret=_interpret(interpret),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * 9 * c * c * s * g,
            bytes_accessed=4 * c * s * g * 2, transcendentals=s * g),
    )(x_cs, w1s, b1s, w2s, b2s, wdts, bds, wuts, bus)


def _rcab_bwd_call(x_cs, h1_cs, r2_cs, g_cs, w1ts, w2ts,
                   wds, wdts, wus, wuts, bds, bus, w_img, k,
                   interpret=None, s_valid=None):
    g, c, s = x_cs.shape
    cr = wdts.shape[1]
    blk, _ = _specs(g, c, s)
    acc = lambda *shp: pl.BlockSpec(shp, lambda i: (0,) * len(shp),
                                    memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_rcab_bwd_kernel, w_img=w_img, wk=w_img * k, k=k,
                s_valid=s_valid),
        grid=(g,),
        in_specs=[blk, blk, blk, blk,
                  _stk(0, (3 * c, 3 * c)), _stk(0, (3 * c, 3 * c)),
                  _stk(0, (c, cr)), _stk(0, (cr, c)),
                  _stk(0, (cr, c)), _stk(0, (c, cr)),
                  _stk(0, (cr, 1)), _stk(0, (c, 1))],
        out_specs=(blk, acc(3, c, 3 * c), acc(c, 1), acc(3, c, 3 * c),
                   acc(c, 1), acc(c, cr), acc(cr, 1), acc(cr, c),
                   acc(c, 1)),
        out_shape=(jax.ShapeDtypeStruct(x_cs.shape, x_cs.dtype),
                   jax.ShapeDtypeStruct((3, c, 3 * c), jnp.float32),
                   jax.ShapeDtypeStruct((c, 1), jnp.float32),
                   jax.ShapeDtypeStruct((3, c, 3 * c), jnp.float32),
                   jax.ShapeDtypeStruct((c, 1), jnp.float32),
                   jax.ShapeDtypeStruct((c, cr), jnp.float32),
                   jax.ShapeDtypeStruct((cr, 1), jnp.float32),
                   jax.ShapeDtypeStruct((cr, c), jnp.float32),
                   jax.ShapeDtypeStruct((c, 1), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((3 * c, s), x_cs.dtype)],
        interpret=_interpret(interpret),
        cost_estimate=pl.CostEstimate(
            flops=2 * 4 * 9 * c * c * s * g,
            bytes_accessed=6 * c * s * g * 2, transcendentals=s * g),
    )(x_cs, h1_cs, r2_cs, g_cs, w1ts, w2ts, wds, wdts, wus, wuts, bds, bus)


@partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13, 14))
def resgroup_ca_cs(x_cs, w1, b1, w2, b2, wd, bd, wu, bu, wc, bc,
                   h_img, w_img, k, s_valid=None):
    """RCAN residual group, CS layout. w1/w2 (L,3C,3C) CS-arranged;
    b1/b2 (L,C); CA mlp wd (L,C,C/r), bd (L,C/r), wu (L,C/r,C), bu (L,C);
    close conv wc (3C,3C) CS-arranged, bc (C,).

    s_valid (cs_plan_pad dead-lane packing): the CA segment pools mask
    the pad tail out of every per-image mean (and use the REAL pixel
    count), and every kernel write re-zeroes the tail."""
    out, *_ = _rg_fwd(x_cs, w1, b1, w2, b2, wd, bd, wu, bu, wc, bc,
                      h_img, w_img, k, s_valid)
    return out


def _rg_fwd(x_cs, w1, b1, w2, b2, wd, bd, wu, bu, wc, bc, h_img, w_img, k,
            s_valid=None):
    dt = x_cs.dtype
    w1s, w2s = w1.astype(dt), w2.astype(dt)
    b1s = b1.astype(jnp.float32)[..., None]
    b2s = b2.astype(jnp.float32)[..., None]
    wdts = jnp.transpose(wd, (0, 2, 1))      # (L, Cr, C)
    wuts = jnp.transpose(wu, (0, 2, 1))      # (L, C, Cr)
    bds = bd[..., None]
    bus = bu[..., None]
    xs, h1s, r2s = [], [], []
    x = x_cs
    for l in range(w1.shape[0]):
        xs.append(x)
        sl = slice(l, l + 1)
        x, h1, r2 = _rcab_fwd_call(x, w1s[sl], b1s[sl], w2s[sl],
                                   b2s[sl], wdts[sl], bds[sl],
                                   wuts[sl], bus[sl], w_img, k,
                                   s_valid=s_valid)
        h1s.append(h1); r2s.append(r2)
    x_close = x
    r = conv3x3_cs_fwd(x_close, wc.astype(dt),
                       bc.astype(jnp.float32)[:, None], w_img, k,
                       s_valid=s_valid)
    out = r + x_cs
    return out, xs, h1s, r2s, x_close, w1s, w2s, wdts, wuts, bds, bus


def _rg_vjp_fwd(x_cs, w1, b1, w2, b2, wd, bd, wu, bu, wc, bc,
                h_img, w_img, k, s_valid):
    out, xs, h1s, r2s, x_close, w1s, w2s, wdts, wuts, bds, bus = _rg_fwd(
        x_cs, w1, b1, w2, b2, wd, bd, wu, bu, wc, bc, h_img, w_img, k,
        s_valid)
    return out, (tuple(xs), tuple(h1s), tuple(r2s), x_close, w1s, w2s,
                 wd, wu, wdts, wuts, bds, bus, wc)


def _rg_vjp_bwd(h_img, w_img, k, s_valid, res, g_out):
    (xs, h1s, r2s, x_close, w1s, w2s, wd, wu, wdts, wuts, bds, bus,
     wc) = res
    l_blocks = len(xs)
    c = w1s.shape[1] // 3
    dt = xs[0].dtype

    # close conv: out = conv(x_close) + x_cs
    wct = w_cs_T_from_cs(wc[None].astype(dt), c, c)[0]
    g, dwc, dbc = conv3x3_cs_bwd(x_close, g_out, wct, w_img, k,
                                 s_valid=s_valid)
    dx_skip = g_out  # group skip to x_cs

    w1ts = w_cs_T_from_cs(w1s, c, c)
    w2ts = w_cs_T_from_cs(w2s, c, c)
    outs = {n: [None] * l_blocks
            for n in ('w1', 'b1', 'w2', 'b2', 'wd', 'bd', 'wu', 'bu')}
    for l in reversed(range(l_blocks)):
        sl = slice(l, l + 1)
        (g, dw1t, db1t, dw2t, db2t, dwd, dbd, dwu, dbu) = _rcab_bwd_call(
            xs[l], h1s[l], r2s[l], g, w1ts[sl], w2ts[sl], wd[sl],
            wdts[sl], wu[sl], wuts[sl], bds[sl], bus[sl], w_img, k,
            s_valid=s_valid)
        outs['w1'][l] = dw1t.reshape(3 * c, 3 * c)
        outs['b1'][l] = db1t[:, 0]
        outs['w2'][l] = dw2t.reshape(3 * c, 3 * c)
        outs['b2'][l] = db2t[:, 0]
        outs['wd'][l] = dwd
        outs['bd'][l] = dbd[:, 0]
        outs['wu'][l] = dwu
        outs['bu'][l] = dbu[:, 0]

    dx = (g.astype(jnp.float32)
          + dx_skip.astype(jnp.float32)).astype(dt)
    st = {n: jnp.stack(v) for n, v in outs.items()}
    return (dx, st['w1'], st['b1'], st['w2'], st['b2'], st['wd'],
            st['bd'], st['wu'], st['bu'],
            dwc.reshape(3 * c, 3 * c), dbc[:, 0])


resgroup_ca_cs.defvjp(_rg_vjp_fwd, _rg_vjp_bwd)


def ca_gate_reference(r, wd, bd, wu, bu):
    """NHWC channel attention (reference models/rcan.py:10-31 math)."""
    p = jnp.mean(r.astype(jnp.float32), axis=(1, 2))
    z = jnp.maximum(p @ wd + bd, 0.0)
    q = jax.nn.sigmoid(z @ wu + bu)
    return r * q[:, None, None, :].astype(r.dtype)


# ---------------------------------------------------------------------------
# NHWC reference (numerics check + fallback)
# ---------------------------------------------------------------------------


def conv3x3_reference(x, w, b):
    dn = ('NHWC', 'HWIO', 'NHWC')
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w.astype(jnp.float32), (1, 1), 'SAME',
        dimension_numbers=dn) + b.astype(jnp.float32)
    return out.astype(x.dtype)
