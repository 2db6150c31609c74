"""Phase-space (space-to-depth) convolutions for the Ghiasi transformer.

The reference generator (ghiasi.py:106-136) spends most of its TPU time in
full-resolution layers whose convs have tiny channel counts (3->32 9x9,
64->32 3x3 after nearest-up2, 32->3 9x9): measured on v5e at batch 48/224^2
they run at 2-5% MXU and are dominated by relayouts (reflect pads, upsample
broadcasts) over ~150 MB full-res slabs.

These are exact algebraic rewrites that move every conv to half resolution
with 4x the channels (space_to_depth phases), where the MXU is fed properly
and no full-resolution intermediate is ever materialized:

  * stride-2 3x3 conv + reflect-pad-1      == 2x2 conv on s2d(x) phases
  * nearest-up2 + reflect-pad-1 + 3x3 conv == 2x2 conv producing 4 output
    phases (subpixel / transposed-conv identity), 2.25x fewer FLOPs
  * stride-1 9x9 conv + reflect-pad-4      == 5x5 conv on s2d phases with
    phase-structured kernels, for both input and output phases

Reflect padding is performed IN PHASE SPACE: a reflect-pad of the full-res
image maps to per-phase edge/reflect/symmetric pads of the s2d blocks (the
parity of the mirrored index decides which phase supplies the pad row), so
the full-res pad pass disappears entirely.

Channel packing convention: s2d block (py, px) of channel c lives at channel
(py*2 + px)*C + c — identical on the input side (s2d) and output side (d2s),
so consecutive phase layers chain with zero relayout (the d2s of one layer
cancels the s2d of the next).

All functions are pure jnp (differentiable, jit/vmap-safe); equivalence with
the plain reflect_pad+conv+upsample path is covered by
tests/test_phase_conv.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def space_to_depth2(x):
    """(B, H, W, C) -> (B, H/2, W/2, 4C), channel order (py*2+px)*C + c."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (b, h2, w2, py, px, c)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space2(x):
    """Inverse of space_to_depth2: (B, h, w, 4C) -> (B, 2h, 2w, C)."""
    b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h, w, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (b, h, py, w, px, c)
    return x.reshape(b, 2 * h, 2 * w, c)


def _conv(x, w):
    """VALID NHWC conv in the input dtype (the TPU MXU accumulates in f32
    internally; keeping bf16 outputs halves the HBM write traffic)."""
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


# ---------------------------------------------------------------------------
# stride-2 3x3 conv (Ghiasi layer1/layer2): reflect-pad-1 + VALID 3x3 s2
# ---------------------------------------------------------------------------

def phase_weights_s2(w):
    """(3,3,C,O) -> (2,2,4C,O) for the 2x2 conv over s2d phases.

    Kernel slot (kh, py) covers original tap dy = 2*kh + py (dy=3 is zero).
    """
    k, _, c, o = w.shape
    assert k == 3
    wp = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))  # (4,4,C,O), zero tail
    wp = wp.reshape(2, 2, 2, 2, c, o)  # (kh, py, kw, px, C, O)
    wp = wp.transpose(0, 2, 1, 3, 4, 5)  # (kh, kw, py, px, C, O)
    return wp.reshape(2, 2, 4 * c, o)


def phase_pad_s2(x4):
    """s2d-domain equivalent of reflect-pad-1 before a stride-2 3x3 conv.

    Only the top/left pads are ever read by the VALID 2x2 conv; block
    (py, px) of the padded tensor at (m, n) holds x(2m+py-1, 2n+px-1), which
    is an edge-padded shift of block (1-py, 1-px)-ish of x4 — concretely the
    reflect x(-1) = x(1) lands on an "edge" pad of the odd-phase block.
    Output: (B, h+1, w+1, 4C).
    """
    b, h, w, c4 = x4.shape
    c = c4 // 4
    P = [x4[..., i * c:(i + 1) * c] for i in range(4)]  # (py*2+px)

    def pad(block, top, left):
        # top/left shift with edge fill; unused bottom/right rows are filled
        # with edge values (their kernel taps are zero).
        cfg = ((0, 0), (1, 0) if top else (0, 1), (1, 0) if left else (0, 1),
               (0, 0))
        return jnp.pad(block, cfg, mode="edge")

    out = [
        pad(P[3], True, True),    # (py=0, px=0) <- x(2m-1, 2n-1) = P11
        pad(P[2], True, False),   # (py=0, px=1) <- x(2m-1, 2n)   = P10
        pad(P[1], False, True),   # (py=1, px=0) <- x(2m,   2n-1) = P01
        pad(P[0], False, False),  # (py=1, px=1) <- x(2m,   2n)   = P00
    ]
    return jnp.concatenate(out, axis=-1)


def conv3x3_s2_phase(x4, w, b=None):
    """Reflect-pad-1 + 3x3 stride-2 conv, computed on the s2d phase tensor.

    x4: (B, h, w, 4C) = space_to_depth2 of the (B, 2h, 2w, C) input.
    Returns (B, h, w, O) — the layer's natural output resolution.
    """
    y = _conv(phase_pad_s2(x4), phase_weights_s2(w))
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def phase_weights_s2_aligned(w):
    """(3,3,C,O) -> (2,2,4C,O) for the single-edge-pad form: kernel slot
    (kh, py) covers original tap dy = 2*kh + py - 1 (dy=-1 is zero — that
    phase never contributes through the top pad row, which is what makes the
    plain whole-tensor edge pad equivalent to the reflect boundary)."""
    k, _, c, o = w.shape
    assert k == 3
    wp = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))  # (4,4,C,O), zero head
    wp = wp.reshape(2, 2, 2, 2, c, o)  # (kh, py, kw, px, C, O)
    wp = wp.transpose(0, 2, 1, 3, 4, 5)  # (kh, kw, py, px, C, O)
    return wp.reshape(2, 2, 4 * c, o)


def conv3x3_s2_phase_aligned(x4, w, b=None):
    """conv3x3_s2_phase with ONE whole-tensor edge pad instead of the
    4-block shifted concat (phase_pad_s2): output position m reads x4 block
    rows {m-1, m}, so a top/left edge pad aligns every phase to the same
    window and the reflect boundary x(-1)=x(1) lands on the pad row's odd
    phase (the even phase's pad value is dead — its tap is zero)."""
    xp = jnp.pad(x4, ((0, 0), (1, 0), (1, 0), (0, 0)), mode="edge")
    y = _conv(xp, phase_weights_s2_aligned(w))
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


# ---------------------------------------------------------------------------
# nearest-up2 + reflect-pad-1 + 3x3 conv (Ghiasi layer8/layer9)
# ---------------------------------------------------------------------------

# A shifted-window lowering (2x2 phase kernels + 4-way output stack,
# ``upconv3x3_phase``) was the round-2 alternative here; it measured 2.25x
# fewer MACs but lost badly to the aligned subpixel form below (18.25 vs
# 12.87 ms full forward — the gather/relayout dwarfs the MAC saving;
# BASELINE.md "Round-3 Ghiasi endgame") and was pruned.

# Aligned subpixel form: all 4 output phases share the SAME 3x3 input window
# (per-phase zero-masked taps), so the conv emits the packed (B, h, w, 4O)
# phase tensor directly — no shifted-window stack, full 4O-lane output.
# M3[p, ktap, dy]: tap ktap of the aligned kernel covers original weight dy
# for output phase p (out row 2i+p reads up rows {2i+p-1, 2i+p, 2i+p+1} =
# x rows {i-1, i, i} for p=0 and {i, i, i+1} for p=1; edge-pad covers the
# reflect-on-upsampled boundary, see _M_UP).
_M3_UP = jnp.asarray([
    [[1.0, 0.0, 0.0], [0.0, 1.0, 1.0], [0.0, 0.0, 0.0]],  # p=0
    [[0.0, 0.0, 0.0], [1.0, 1.0, 0.0], [0.0, 0.0, 1.0]],  # p=1
])


def phase_weights_up_aligned(w):
    """(3,3,C,O) -> (3,3,C,4O) aligned-window subpixel kernels, packed output
    channel order (p*2+q)*O + o (matches space_to_depth2)."""
    k, _, c, o = w.shape
    assert k == 3
    # (p, kh, dy) x (q, kw, dx) x (dy, dx, C, O) -> (kh, kw, C, p, q, O)
    t = jnp.einsum("akd,ble,deco->klcabo", _M3_UP, _M3_UP, w)
    return t.reshape(3, 3, c, 4 * o)


def upconv3x3_phase_packed(x, w, b=None):
    """nearest-up2 + reflect-pad-1 + VALID 3x3 conv, emitting the packed
    phase tensor (B, h, w, 4O) = space_to_depth2 of the (B, 2h, 2w, O)
    full-resolution output — one conv, full-lane output, no shifted-window
    stack."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    y = _conv(xp, phase_weights_up_aligned(w))
    if b is not None:
        y = y + jnp.tile(b.astype(y.dtype), 4)
    return y


def phase_instance_norm_packed(z, gamma=None, beta=None, eps: float = 1e-5,
                               phases: int = 4):
    """Instance norm over packed phase channels (B, h, w, phases*C):
    statistics pool over (H, W) and the phases — exactly the full-resolution
    per-channel statistics — but every full-size elementwise op stays on the
    packed 4-D layout (no 5-D relayout); only the (B, phases*C) moment
    vectors are reshaped to combine phases. ``phases=16`` serves the
    double-packed conv9x9_phase_dp output."""
    b, h, w, cp = z.shape
    c = cp // phases
    zf = z.astype(jnp.float32)
    m1 = jnp.mean(zf, axis=(1, 2))                      # (B, phases*C)
    m2 = jnp.mean(jnp.square(zf), axis=(1, 2))          # (B, phases*C)
    mean = jnp.mean(m1.reshape(b, phases, c), axis=1)   # (B, C)
    # E[x^2]-E[x]^2 can go slightly negative in f32 for near-constant
    # channels with large mean (catastrophic cancellation) — clamp like
    # flax's _compute_stats does, or rsqrt returns NaN.
    var = jnp.maximum(
        jnp.mean(m2.reshape(b, phases, c), axis=1) - jnp.square(mean), 0.0)
    scale = jax.lax.rsqrt(var + eps)                    # (B, C)
    shift = -mean * scale
    if gamma is not None:
        scale = scale * gamma.astype(jnp.float32)
        shift = shift * gamma.astype(jnp.float32)
    if beta is not None:
        shift = shift + beta.astype(jnp.float32)
    scale4 = jnp.tile(scale, (1, phases))[:, None, None, :]
    shift4 = jnp.tile(shift, (1, phases))[:, None, None, :]
    return (zf * scale4 + shift4).astype(z.dtype)


# ---------------------------------------------------------------------------
# stride-1 9x9 conv (Ghiasi layer0/layer10): reflect-pad-4 + VALID 9x9
# ---------------------------------------------------------------------------

def phase_weights_9x9(w):
    """(9,9,C,O) -> (5,5,4C,4O): 5x5 conv over input phases producing the 4
    output phases. Slot (kh, py) for output phase p covers tap
    dy = 2*kh + py - p (out of [0,8] -> zero)."""
    k, _, c, o = w.shape
    assert k == 9

    def rows(p):
        # pad so index 2*kh+py hits w[2*kh+py-p]
        return jnp.pad(w, ((p, 1 - p), (0, 0), (0, 0), (0, 0)))  # (10,9,C,O)

    # (p, dyp, kw', C, O) with dyp = 2*kh+py
    wr = jnp.stack([rows(0), rows(1)])  # (2, 10, 9, C, O)
    wr = wr.reshape(2, 5, 2, 9, c, o)   # (p, kh, py, dx, C, O)

    def cols(q):
        return jnp.pad(wr, ((0, 0), (0, 0), (0, 0), (q, 1 - q), (0, 0),
                            (0, 0)))

    wc = jnp.stack([cols(0), cols(1)])       # (q, p, kh, py, 10, C, O)
    wc = wc.reshape(2, 2, 5, 2, 5, 2, c, o)  # (q, p, kh, py, kw, px, C, O)
    # -> (kh, kw, py, px, C, p, q, O)
    wc = wc.transpose(2, 4, 3, 5, 6, 1, 0, 7)
    return wc.reshape(5, 5, 4 * c, 4 * o)


def _row_pad_strips_9x9(x4):
    """The two 2-row pad strips (top, bottom) of the s2d-domain
    reflect-pad-4: a full-res reflect-pad-4 keeps row parity (offset 4 is
    even), so each phase pads from its OWN rows — but the mirror x(-a) flips
    which row supplies the pad: even phases reflect around row 0 (rows
    [2,1], numpy 'reflect'), odd phases around the half-sample (rows [1,0],
    'symmetric'), and the two swap roles at the bottom edge. Selected with a
    static channel-parity mask over the full 4C dim (no lane concat)."""
    b, h, w, c4 = x4.shape
    c = c4 // 4
    is_py1 = ((jnp.arange(c4) // c) // 2 == 1).reshape(1, 1, 1, c4)
    top = jnp.where(is_py1, x4[:, 1::-1], x4[:, 2:0:-1])
    bot = jnp.where(is_py1, x4[:, h - 3:h - 1][:, ::-1],
                    x4[:, h - 2:h][:, ::-1])
    return top, bot


def _col_pad_strips_9x9(t):
    """Column analog of _row_pad_strips_9x9: (left, right) 2-col strips."""
    b, h, w, c4 = t.shape
    c = c4 // 4
    is_px1 = ((jnp.arange(c4) // c) % 2 == 1).reshape(1, 1, 1, c4)
    left = jnp.where(is_px1, t[:, :, 1::-1], t[:, :, 2:0:-1])
    right = jnp.where(is_px1, t[:, :, w - 3:w - 1][:, :, ::-1],
                      t[:, :, w - 2:w][:, :, ::-1])
    return left, right


def phase_pad_9x9(x4):
    """s2d-domain reflect-pad-4: (B, h, w, 4C) -> (B, h+4, w+4, 4C).

    Assembled as row/col STRIP concats over the full 4C channel dim with a
    static channel-parity select choosing each strip's source rows — no
    channel(lane)-dim concatenation, which forces an expensive relayout on
    TPU (the original 4-block form cost ~2 ms extra inside the Ghiasi l10
    stage at 112^2x128).
    """
    top, bot = _row_pad_strips_9x9(x4)
    t = jnp.concatenate([top, x4, bot], axis=1)
    left, right = _col_pad_strips_9x9(t)
    return jnp.concatenate([left, t, right], axis=2)


def conv9x9_phase(x4, w, b=None):
    """Reflect-pad-4 + 9x9 stride-1 conv in phase space.

    x4: (B, h, w, 4C) s2d input. Returns (B, h, w, 4O) phase output
    (depth_to_space2 gives the (B, 2h, 2w, O) image).
    """
    y = _conv(phase_pad_9x9(x4), phase_weights_9x9(w))
    if b is not None:
        y = y + jnp.tile(b.astype(y.dtype), 4)  # bias repeats per phase
    return y


def phase_weights_9x9_dp(w):
    """(9,9,C,O) -> (6,6,4C,16O) stride-2 kernel emitting the DOUBLE-packed
    (s2d of the phase) output: K2[qr+tr, qc+tc, :, (qr*2+qc)*4O + p] =
    W1[tr, tc, :, p], where W1 is the 5x5 phase kernel. Each outer phase q
    uses 25 of the 36 taps (the rest are zero): 36/25 extra MXU work buys
    4x the output lanes (N = 16O instead of 4O)."""
    w1 = phase_weights_9x9(w)  # (5, 5, 4C, 4O)
    c4, o4 = w1.shape[2], w1.shape[3]
    k2 = jnp.zeros((6, 6, c4, 4 * o4), w1.dtype)
    for qr in range(2):
        for qc in range(2):
            q = qr * 2 + qc
            k2 = k2.at[qr:qr + 5, qc:qc + 5, :,
                       q * o4:(q + 1) * o4].add(w1)
    return k2


def conv9x9_phase_dp(x4, w, b=None):
    """Reflect-pad-4 + 9x9 conv emitting the double-packed output.

    x4: (B, h, w, 4C) s2d input. Returns (B, h/2, w/2, 16O) — the s2d of
    conv9x9_phase's output (two depth_to_space2 calls give the full-res
    image). For the Ghiasi output layer (O=3) this lifts the conv's N from
    12 to 48 lanes (2.8x less MXU padding waste) and runs the IN/FiLM/
    sigmoid tail at 48/128 instead of 12/128 lane occupancy."""
    y = jax.lax.conv_general_dilated(
        phase_pad_9x9(x4), phase_weights_9x9_dp(w).astype(x4.dtype),
        window_strides=(2, 2), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if b is not None:
        y = y + jnp.tile(b.astype(y.dtype), 16)
    return y


# Two further l10/l0 lowerings were built and A/B-measured in round 3 and
# PRUNED as losers (record: BASELINE.md "Round-3 Ghiasi endgame"):
#   conv9x9_phase_border — interior+strip pad decomposition (12.94 vs 12.87
#   ms: the full-slab pad copies were already cheap);
#   conv9x9_phase_qp — double-packed input AND output for l0 (14.48 ms: the
#   1.44x MAC overhead loses; l0's K=12 lane waste is covered by BW overlap).


def phase_instance_norm(z, gamma=None, beta=None, eps: float = 1e-5,
                        phase_axis=None):
    """Instance norm whose statistics pool over (H, W) AND the 4 phases —
    exactly the full-resolution per-channel statistics.

    z: (B, h, w, 4, C) (phase_axis=3, explicit phase dim) or
       (B, h, w, 4C) (phase blocks packed in channels, e.g. conv9x9_phase).
    gamma/beta: optional (B, C) FiLM parameters.
    """
    packed = phase_axis is None
    if packed:
        b, h, w, c4 = z.shape
        z = z.reshape(b, h, w, 4, c4 // 4)
    orig = z.dtype
    zf = z.astype(jnp.float32)
    mean = jnp.mean(zf, axis=(1, 2, 3), keepdims=True)
    var = jnp.mean(jnp.square(zf - mean), axis=(1, 2, 3), keepdims=True)
    y = (zf - mean) * jax.lax.rsqrt(var + eps)
    if gamma is not None:
        y = y * gamma[:, None, None, None, :].astype(jnp.float32)
    if beta is not None:
        y = y + beta[:, None, None, None, :].astype(jnp.float32)
    y = y.astype(orig)
    if packed:
        return y.reshape(b, h, w, c4)
    return y
