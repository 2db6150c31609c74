"""Fused MobileNetV2 inverted-residual hot path (expand 1x1 -> train-BN ->
relu6 -> 3x3 depthwise) as one Pallas TPU kernel with a custom VJP.

Why: the KRN bare train step spends ~7.3 of 12.2 ms in the backward of the
two high-resolution MNv2 stages (BASELINE.md round-2 bisection). The cost is
HBM traffic on the expanded activations — block2's expand output is
(48, 112, 112, 96) = 116 MB bf16, touched ~8-10x across the unfused
fwd+bwd (conv outputs, BN normalize, relu6 masks, and all their gradients
each materialize in HBM; XLA cannot fuse across conv HLOs). This op keeps
every expanded tensor in VMEM: the forward reads x and writes the depthwise
output; the backward reads (x, dy) and writes dx, recomputing the expanded
activations on-chip (the extra FLOPs are ~2 GFLOP against a ~45 TFLOP/s MXU
— three orders of magnitude below the traffic it removes).

Matches reference park2019.py:107-136 (torchvision MobileNetV2 features
semantics); only the schedule changes (see models/mobilenetv2.py routing).

Structure
---------
`fused_expand_dw(x, w_e, gamma, beta, w_dw, mu, var, stride=...)` computes

    z  = x @ w_e                      # 1x1 expand conv
    zh = (z - mu) * rsqrt(var+eps) * gamma + beta
    a  = relu6(zh)
    y  = depthwise_conv3x3(a, w_dw, stride, torch pad 1)

with `mu`, `var` taken as INPUTS. In train mode the caller computes them
analytically in XLA via `expand_stats` (sum(z) = colsum(x) @ w_e and
E[z^2] = diag(w_e^T (X^T X) w_e) / N — one (Cin x Cin) Gram matrix, reading
x once); in eval mode they are the running stats. Because mu/var are inputs,
the BN backward's global batch reductions live in JAX's autodiff of
`expand_stats`, and this op's custom VJP needs only per-channel LOCAL
accumulators:

    dbeta  = S1 = sum(g)               g = dL/d zh
    dgamma = S2' * rs                  S2' = sum(g * (z - mu))
    dmu    = -gamma * rs * S1
    dvar   = -gamma/2 * rs^3 * S2'
    dx     = (g * gamma * rs) @ w_e^T      (one pass, no global barrier)

Stride 2 is lowered by space-to-depth phase decomposition OUTSIDE the kernel
(cheap XLA relayouts): the four x phases enter as separate inputs and every
in-kernel slice is unit-stride (Mosaic has no strided loads). Kernels
row-tile internally (static unroll) to bound the VMEM slabs.

Multi-chip note: like ops/pallas_resblock.py, this runs inside the jit'd DP
train step; on a >1-chip mesh route through shard_map or disable (the
single-chip TPU bench and CPU tests are the exercised paths).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-5
_TILE_BYTES = 2_621_440  # target f32 slab size per row tile (~2.5 MB)
# The backward kernels hold ~6 slabs live (zh, a, dy, da, g, dz); keep each
# small enough that Mosaic's conservative stack allocation stays under the
# 16 MB scoped-VMEM limit (measured: untiled block2 bwd OOM'd at 17.1 MB).
_TILE_BYTES_BWD = 1_048_576


# ---------------------------------------------------------------------------
# Analytic train-mode BN statistics of the (never materialized) expand output
# ---------------------------------------------------------------------------

def expand_stats(x, w_e):
    """Batch statistics of z = x @ w_e without materializing z.

    x: (B, H, W, Cin); w_e: (Cin, Ce) f32. Returns (mu, var) f32 of shape
    (Ce,), the per-channel mean/variance over (B, H, W) — exactly what
    flax's train-mode BatchNorm computes (biased variance, clamped >= 0).
    Differentiable: the BN-backward batch reductions flow through here.

    The Gram matrix X^T X is (Cin x Cin) with Cin = 16/24 — a naive
    dot_general uses ~2% of the MXU (16x16 of a 128x128 tile). Folding f =
    128 // Cin rows into the lane dim makes it a full-width matmul whose f
    diagonal (Cin x Cin) blocks sum to the Gram: f^2 x the FLOPs but ~f^3
    better utilization, and one full-bandwidth read of x either way.
    """
    b, h, w, cin = x.shape
    n = b * h * w
    xf = x.reshape(n, cin)
    colsum = jnp.sum(xf.astype(jnp.float32), axis=0)

    f = max(1, 128 // cin)
    while n % f != 0:  # n = B*H*W is highly composite; this rarely bites
        f -= 1
    xw = xf.reshape(n // f, f * cin)
    gram_wide = jax.lax.dot_general(xw, xw, (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
    gram = jnp.sum(gram_wide.reshape(f, cin, f, cin)[
        jnp.arange(f), :, jnp.arange(f)], axis=0)

    we = w_e.astype(jnp.float32)
    mu = (colsum @ we) / n
    ex2 = jnp.sum(we * (gram @ we), axis=0) / n
    var = jnp.maximum(ex2 - mu * mu, 0.0)
    return mu, var


# ---------------------------------------------------------------------------
# Phase packing helpers (stride-2 path): all XLA, outside the kernel
# ---------------------------------------------------------------------------

def _split_phases(x):
    """(B, H, W, C) -> four (B, H/2, W/2, C) arrays [(0,0), (0,1), (1,0), (1,1)]."""
    return (x[:, 0::2, 0::2], x[:, 0::2, 1::2],
            x[:, 1::2, 0::2], x[:, 1::2, 1::2])


def _merge_phases(p00, p01, p10, p11):
    """Inverse of _split_phases."""
    b, h, w, c = p00.shape
    row0 = jnp.stack([p00, p01], axis=3).reshape(b, h, 2 * w, c)
    row1 = jnp.stack([p10, p11], axis=3).reshape(b, h, 2 * w, c)
    return jnp.stack([row0, row1], axis=2).reshape(b, 2 * h, 2 * w, c)


def _pick_nh(h_out: int, w: int, ce: int, target: int = _TILE_BYTES) -> int:
    """Row tiles so one f32 (rows, W, Ce) slab stays under ``target``
    (lane-padded Ce, since Mosaic pads the minor dim to 128)."""
    ce_pad = -(-ce // 128) * 128
    for nh in (1, 2, 4, 7, 8, 14):
        if h_out % nh == 0 and (h_out // nh + 2) * w * ce_pad * 4 <= target:
            return nh
    return h_out  # degenerate fallback: row-by-row


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def _expand(xs, we, scale, shift):
    """z-hat tile: (R, W, Cin) x (Cin, Ce) -> normalized (R, W, Ce) f32."""
    r, w, cin = xs.shape
    z = jnp.dot(xs.reshape(r * w, cin), we,
                preferred_element_type=jnp.float32)
    return (z.reshape(r, w, -1) * scale + shift)


def _relu6(zh):
    return jnp.clip(zh, 0.0, 6.0)


def _row_tiles(h: int, nh: int):
    """Static tile plan: (r0, rows_before_pad_lo, pad_lo, pad_hi) per tile
    covering input rows [r0-1, r0+ht+1) with zero rows at the image edges."""
    ht = h // nh
    plan = []
    for t in range(nh):
        r0 = t * ht
        lo = max(r0 - 1, 0)
        hi = min(r0 + ht + 1, h)
        plan.append((r0, ht, lo, hi, 1 if r0 == 0 else 0,
                     1 if r0 + ht == h else 0))
    return plan


def _fwd_kernel_s1(x_ref, we_ref, wdw_ref, sc_ref, sh_ref, y_ref, *, nh):
    """Stride-1. x (1,H,W,Cin) -> y (1,H,W,Ce), row-tiled (static unroll)."""
    x = x_ref[0]
    we = we_ref[...]
    wdw = wdw_ref[...].astype(jnp.float32)
    scale = sc_ref[0]
    shift = sh_ref[0]
    h, w, _ = x.shape
    for (r0, ht, lo, hi, plo, phi) in _row_tiles(h, nh):
        a = _relu6(_expand(x[lo:hi], we, scale, shift))
        ap = jnp.pad(a, ((plo, phi), (1, 1), (0, 0)))  # (ht+2, W+2, Ce)
        acc = None
        for ki in range(3):
            for kj in range(3):
                term = ap[ki:ki + ht, kj:kj + w] * wdw[ki, kj]
                acc = term if acc is None else acc + term
        y_ref[0, r0:r0 + ht] = acc.astype(y_ref.dtype)


def _fwd_kernel_s2(x00_ref, x01_ref, x10_ref, x11_ref,
                   we_ref, wdw_ref, sc_ref, sh_ref, y_ref, *, nh):
    """Stride-2 via phases: xpq (1,Ho,Wo,Cin) -> y (1,Ho,Wo,Ce).

    Full-res a row 2i+ki-1 for output row i: ki=1 -> phase 0 row i;
    ki=0 -> phase 1 row i-1; ki=2 -> phase 1 row i (same for columns).
    In a phase slab padded by 1 leading row, those are offsets 1, 0, 1.
    """
    we = we_ref[...]
    wdw = wdw_ref[...].astype(jnp.float32)
    scale = sc_ref[0]
    shift = sh_ref[0]
    ho, wo, _ = x00_ref[0].shape
    tap = {0: (1, 0), 1: (0, 1), 2: (1, 1)}  # k -> (phase, padded offset)

    for (r0, ht, lo, hi, plo, phi) in _row_tiles(ho, nh):
        apad = []
        for ref in (x00_ref, x01_ref, x10_ref, x11_ref):
            a = _relu6(_expand(ref[0, lo:hi], we, scale, shift))
            apad.append(jnp.pad(a, ((plo, phi), (1, 1), (0, 0))))
        acc = None
        for ki in range(3):
            pr, orr = tap[ki]
            for kj in range(3):
                pc, oc = tap[kj]
                a = apad[2 * pr + pc]
                term = a[orr:orr + ht, oc:oc + wo] * wdw[ki, kj]
                acc = term if acc is None else acc + term
        y_ref[0, r0:r0 + ht] = acc.astype(y_ref.dtype)


def _zero_accums(first, refs):
    @pl.when(first)
    def _():
        for r in refs:
            r[...] = jnp.zeros_like(r)


def _bwd_kernel_s1(x_ref, dy_ref, we_ref, wdw_ref, sc_ref, sh_ref,
                   mu_ref, gr_ref,
                   dx_ref, dwe_ref, dwdw_ref, s1_ref, s2_ref, *, nh):
    """Stride-1 backward. Recomputes z/a per row tile in VMEM; accumulates
    weight grads and the per-channel BN sums across the sequential batch
    grid (and row tiles) directly in the constant-index output buffers."""
    first = pl.program_id(0) == 0
    _zero_accums(first, (dwe_ref, dwdw_ref, s1_ref, s2_ref))

    x = x_ref[0]
    we = we_ref[...]
    wdw = wdw_ref[...].astype(jnp.float32)
    scale = sc_ref[0]
    shift = sh_ref[0]
    beta = sh_ref[0] + mu_ref[0] * gr_ref[0]
    gr = gr_ref[0]
    h, w, cin = x.shape
    ce = dy_ref.shape[-1]

    for (r0, ht, lo, hi, plo, phi) in _row_tiles(h, nh):
        zh = _expand(x[lo:hi], we, scale, shift)
        ap = jnp.pad(_relu6(zh), ((plo, phi), (1, 1), (0, 0)))
        dy_t = dy_ref[0, r0:r0 + ht].astype(jnp.float32)
        dyp = jnp.pad(dy_ref[0, lo:hi].astype(jnp.float32),
                      ((plo, phi), (1, 1), (0, 0)))

        # da = input-grad of the depthwise conv (flipped taps);
        # dWdw[ki,kj] += sum dy * a[shifted].
        da = None
        for ki in range(3):
            for kj in range(3):
                term = dyp[2 - ki:2 - ki + ht, 2 - kj:2 - kj + w] * wdw[ki, kj]
                da = term if da is None else da + term
                dwdw_ref[ki, kj] += jnp.sum(
                    dy_t * ap[ki:ki + ht, kj:kj + w], axis=(0, 1))

        # drop the edge halo rows of zh to align with the tile
        zh_t = zh[r0 - lo:r0 - lo + ht]
        mask = jnp.logical_and(zh_t > 0.0, zh_t < 6.0).astype(jnp.float32)
        g = da * mask
        s1_ref[0] += jnp.sum(g, axis=(0, 1))
        # zh = (z - mu)*gr + beta  =>  z - mu = (zh - beta) / gr
        s2_ref[0] += jnp.sum(g * (zh_t - beta) / gr, axis=(0, 1))

        dz = (g * gr).reshape(ht * w, ce)
        dx = jax.lax.dot_general(dz, we, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dx_ref[0, r0:r0 + ht] = dx.reshape(ht, w, cin).astype(dx_ref.dtype)
        dwe_ref[...] += jax.lax.dot_general(
            x[r0:r0 + ht].reshape(ht * w, cin), dz, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


def _bwd_kernel_s2(x00_ref, x01_ref, x10_ref, x11_ref, dy_ref,
                   we_ref, wdw_ref, sc_ref, sh_ref, mu_ref, gr_ref,
                   dx00_ref, dx01_ref, dx10_ref, dx11_ref,
                   dwe_ref, dwdw_ref, s1_ref, s2_ref, *, nh):
    """Stride-2 backward in phase space, one input phase and one row tile at
    a time (bounds peak VMEM). For phase (pr, pc): da_phase = sum over the
    taps (ki, kj) whose parity selects it of dy shifted by the inverse
    offset; a-phase row i is read by tap ki at dy row i + offset."""
    first = pl.program_id(0) == 0
    _zero_accums(first, (dwe_ref, dwdw_ref, s1_ref, s2_ref))

    we = we_ref[...]
    wdw = wdw_ref[...].astype(jnp.float32)
    scale = sc_ref[0]
    shift = sh_ref[0]
    gr = gr_ref[0]
    beta = shift + mu_ref[0] * gr
    ho, wo, ce = dy_ref.shape[1:]

    # phase p is read by: p=0 -> tap k=1 at dy row m (offset 0);
    #                     p=1 -> tap k=0 at dy row m+1, tap k=2 at dy row m.
    taps = {0: ((1, 0),), 1: ((0, 1), (2, 0))}

    x_refs = (x00_ref, x01_ref, x10_ref, x11_ref)
    dx_refs = (dx00_ref, dx01_ref, dx10_ref, dx11_ref)
    for pr in range(2):
        for pc in range(2):
            xp = x_refs[2 * pr + pc][0]
            cin = xp.shape[-1]
            for (r0, ht, lo, hi, plo, phi) in _row_tiles(ho, nh):
                zh = _expand(xp[lo:hi], we, scale, shift)
                apd = jnp.pad(_relu6(zh), ((plo, phi), (1, 1), (0, 0)))
                dy_t = dy_ref[0, r0:r0 + ht].astype(jnp.float32)
                dyp = jnp.pad(dy_ref[0, lo:hi].astype(jnp.float32),
                              ((plo, phi), (1, 1), (0, 0)))

                da = None
                for (ki, oi) in taps[pr]:
                    for (kj, oj) in taps[pc]:
                        term = (dyp[1 + oi:1 + oi + ht, 1 + oj:1 + oj + wo]
                                * wdw[ki, kj])
                        da = term if da is None else da + term
                        # dWdw[ki,kj] += sum_m dy[m] * a_phase[m - offset]
                        dwdw_ref[ki, kj] += jnp.sum(
                            dy_t * apd[1 - oi:1 - oi + ht, 1 - oj:1 - oj + wo],
                            axis=(0, 1))

                zh_t = zh[r0 - lo:r0 - lo + ht]
                mask = jnp.logical_and(zh_t > 0.0,
                                       zh_t < 6.0).astype(jnp.float32)
                g = da * mask
                s1_ref[0] += jnp.sum(g, axis=(0, 1))
                s2_ref[0] += jnp.sum(g * (zh_t - beta) / gr, axis=(0, 1))

                dz = (g * gr).reshape(ht * wo, ce)
                dx = jax.lax.dot_general(dz, we, (((1,), (1,)), ((), ())),
                                         preferred_element_type=jnp.float32)
                dx_refs[2 * pr + pc][0, r0:r0 + ht] = dx.reshape(
                    ht, wo, cin).astype(dx_refs[0].dtype)
                dwe_ref[...] += jax.lax.dot_general(
                    xp[r0:r0 + ht].reshape(ht * wo, cin), dz,
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------

def _specs(shape):
    """Per-batch block: (1, *shape) indexed by the batch grid axis."""
    return pl.BlockSpec((1,) + shape, lambda b: (b,) + (0,) * len(shape),
                        memory_space=pltpu.VMEM)


def _shared(shape):
    """Whole-array block shared across the batch grid (weights, scales,
    and the cross-grid accumulator outputs — the constant index map keeps
    one live buffer across the sequential grid)."""
    return pl.BlockSpec(shape, lambda b: (0,) * len(shape),
                        memory_space=pltpu.VMEM)


def _prep(w_e, gamma, beta, w_dw, mu, var, dtype):
    rs = jax.lax.rsqrt(var.astype(jnp.float32) + EPS)
    gr = gamma.astype(jnp.float32) * rs
    scale = gr
    shift = beta.astype(jnp.float32) - mu.astype(jnp.float32) * gr
    we = w_e.astype(dtype)
    return we, scale[None], shift[None], gr[None]


def _fwd(x, w_e, gamma, beta, w_dw, mu, var, stride, interpret):
    b, h, w, cin = x.shape
    ce = w_e.shape[-1]
    we, scale, shift, _ = _prep(w_e, gamma, beta, w_dw, mu, var, x.dtype)
    wdw = w_dw.astype(jnp.float32)
    if stride == 1:
        return pl.pallas_call(
            functools.partial(_fwd_kernel_s1, nh=_pick_nh(h, w, ce)),
            out_shape=jax.ShapeDtypeStruct((b, h, w, ce), x.dtype),
            grid=(b,),
            in_specs=[_specs((h, w, cin)), _shared((cin, ce)),
                      _shared((3, 3, ce)), _shared((1, ce)), _shared((1, ce))],
            out_specs=_specs((h, w, ce)),
            interpret=interpret,
        )(x, we, wdw, scale, shift)
    ho, wo = h // 2, w // 2
    phases = _split_phases(x)
    return pl.pallas_call(
        functools.partial(_fwd_kernel_s2, nh=_pick_nh(ho, wo, 4 * ce)),
        out_shape=jax.ShapeDtypeStruct((b, ho, wo, ce), x.dtype),
        grid=(b,),
        in_specs=[_specs((ho, wo, cin))] * 4 + [
            _shared((cin, ce)), _shared((3, 3, ce)),
            _shared((1, ce)), _shared((1, ce))],
        out_specs=_specs((ho, wo, ce)),
        interpret=interpret,
    )(*phases, we, wdw, scale, shift)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def fused_expand_dw(stride, interpret, x, w_e, gamma, beta, w_dw, mu, var):
    """y = dwconv3x3_{stride}(relu6(BN[mu,var,gamma,beta](x @ w_e)), w_dw).

    x: (B, H, W, Cin) (H, W even for stride 2); w_e: (Cin, Ce) f32;
    gamma/beta/mu/var: (Ce,) f32; w_dw: (3, 3, Ce) f32. Torch padding 1.
    Returns (B, H/stride, W/stride, Ce) in x.dtype.
    """
    return _fwd(x, w_e, gamma, beta, w_dw, mu, var, stride, interpret)


def _fused_fwd(stride, interpret, x, w_e, gamma, beta, w_dw, mu, var):
    y = _fwd(x, w_e, gamma, beta, w_dw, mu, var, stride, interpret)
    return y, (x, w_e, gamma, beta, w_dw, mu, var)


def _fused_bwd(stride, interpret, res, dy):
    x, w_e, gamma, beta, w_dw, mu, var = res
    b, h, w, cin = x.shape
    ce = w_e.shape[-1]
    we, scale, shift, gr = _prep(w_e, gamma, beta, w_dw, mu, var, x.dtype)
    wdw = w_dw.astype(jnp.float32)
    mu_ = mu.astype(jnp.float32)[None]
    f32 = jnp.float32
    small = [jax.ShapeDtypeStruct((cin, ce), f32),
             jax.ShapeDtypeStruct((3, 3, ce), f32),
             jax.ShapeDtypeStruct((1, ce), f32),
             jax.ShapeDtypeStruct((1, ce), f32)]
    small_specs = [_shared((cin, ce)), _shared((3, 3, ce)),
                   _shared((1, ce)), _shared((1, ce))]

    if stride == 1:
        dx, dwe, dwdw, s1, s2p = pl.pallas_call(
            functools.partial(_bwd_kernel_s1,
                              nh=_pick_nh(h, w, ce, _TILE_BYTES_BWD)),
            out_shape=[jax.ShapeDtypeStruct((b, h, w, cin), x.dtype)] + small,
            grid=(b,),
            in_specs=[_specs((h, w, cin)), _specs((h, w, ce)),
                      _shared((cin, ce)), _shared((3, 3, ce)),
                      _shared((1, ce)), _shared((1, ce)),
                      _shared((1, ce)), _shared((1, ce))],
            out_specs=[_specs((h, w, cin))] + small_specs,
            interpret=interpret,
        )(x, dy, we, wdw, scale, shift, mu_, gr)
    else:
        ho, wo = h // 2, w // 2
        phases = _split_phases(x)
        outs = pl.pallas_call(
            functools.partial(_bwd_kernel_s2,
                              nh=_pick_nh(ho, wo, ce, _TILE_BYTES_BWD)),
            out_shape=[jax.ShapeDtypeStruct((b, ho, wo, cin), x.dtype)] * 4
            + small,
            grid=(b,),
            in_specs=[_specs((ho, wo, cin))] * 4 + [
                _specs((ho, wo, ce)),
                _shared((cin, ce)), _shared((3, 3, ce)),
                _shared((1, ce)), _shared((1, ce)),
                _shared((1, ce)), _shared((1, ce))],
            out_specs=[_specs((ho, wo, cin))] * 4 + small_specs,
            interpret=interpret,
        )(*phases, dy, we, wdw, scale, shift, mu_, gr)
        dx = _merge_phases(*outs[:4])
        dwe, dwdw, s1, s2p = outs[4:]

    s1 = s1[0]
    s2p = s2p[0]
    rs = jax.lax.rsqrt(var.astype(f32) + EPS)
    g32 = gamma.astype(f32)
    dgamma = s2p * rs
    dbeta = s1
    dmu = -g32 * rs * s1
    dvar = -0.5 * g32 * rs ** 3 * s2p
    return (dx, dwe.astype(w_e.dtype), dgamma.astype(gamma.dtype),
            dbeta.astype(beta.dtype), dwdw.astype(w_dw.dtype),
            dmu.astype(mu.dtype), dvar.astype(var.dtype))


fused_expand_dw.defvjp(_fused_fwd, _fused_bwd)


def fused_expand_dw_call(x, w_e, gamma, beta, w_dw, mu, var, *,
                         stride: int, interpret: bool = False):
    """Keyword-friendly wrapper (static stride/interpret first for the VJP)."""
    return fused_expand_dw(stride, interpret, x, w_e, gamma, beta, w_dw,
                           mu, var)
