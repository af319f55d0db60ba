"""Phase-composite (space-to-depth) stem convolutions.

TPU lane-padding makes the narrow stem layers (4..32 channels at 1024px)
HBM-bound: activations are stored padded to 128 lanes, inflating traffic up
to 32x. Measured on v5e: the 2-layer stem is ~45% of QUAN-YOLO11n's forward
time at 1024px.

Fix (math-identical, checkpoint-compatible — only the *weights* are
rearranged at apply time):

  * layer 0: a k=3,s=2,p=1 conv evaluated at the 4 stride-2 phases at once —
    one k=5,s=4 conv whose outputs are the space-to-depth packing of the
    original outputs: [H/2, W/2, C] -> [H/4, W/4, 4C] with phase-major
    channel order (a, b, c).
  * layer 1: a k=3,s=2,p=1 conv consuming that packed layout — a k=2,s=1
    conv with left/top padding producing the ORIGINAL layer-1 output.

Derivation: with Y[u,v] = sum_{d in [0,3)^2} W[d] X[2u+d-1, 2v+d-1],
  pack Z[i,j,(a,b)] = Y[2i+a, 2j+b]:
  - Z[i,j,(a,b)] = sum_d W[d] X[4i+2a+d-1, ...] -> tap p = 2a+d in [0,5)
    => W5[p,q,(a,b,co)] = W3[p-2a, q-2b] when 0 <= p-2a <= 2, else 0;
    conv(k=5, s=4, pad=1).
  - layer 1 on Z: out[i,j] = sum_d W[d] Y[2i+d-1, 2j+d-1]; Y row 2i+d-1 =
    Z row (i-1+pa) phase a with d-1 = 2pa+a-2 valid for
    (pa,a) in {(0,1),(1,0),(1,1)} => W2[pa,qb,(a,b,ci),co] nonzero there;
    conv(k=2, s=1, pad=(1,0) top-left).

Both expansions verified against the composed reference path in
tests/test_stem.py.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def space_to_depth(x: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """[..., H, W, C] -> [..., H/r, W/r, r*r*C] phase-major (a, b, c)."""
    *lead, H, W, C = x.shape
    x = x.reshape(*lead, H // r, r, W // r, r, C)
    x = jnp.moveaxis(x, -4, -3)  # [..., H/r, W/r, a, b, C]
    return x.reshape(*lead, H // r, W // r, r * r * C)


def expand_w_l0(w3: jnp.ndarray) -> jnp.ndarray:
    """[kh=3, kw=3, cin, cout] -> [5, 5, cin, 4*cout] phase-major (a,b,co)."""
    kh, kw, cin, cout = w3.shape
    assert kh == kw == 3
    w5 = jnp.zeros((5, 5, cin, 2, 2, cout), w3.dtype)
    for a in range(2):
        for b in range(2):
            w5 = w5.at[2 * a : 2 * a + 3, 2 * b : 2 * b + 3, :, a, b, :].set(w3)
    return w5.reshape(5, 5, cin, 4 * cout)


def expand_w_l1(w3: jnp.ndarray) -> jnp.ndarray:
    """[3, 3, cin, cout] -> [2, 2, 4*cin, cout] consuming phase-major input."""
    kh, kw, cin, cout = w3.shape
    assert kh == kw == 3
    w2 = jnp.zeros((2, 2, 2, 2, cin, cout), w3.dtype)  # [pa, qb, a, b, ci, co]
    for pa in range(2):
        for a in range(2):
            d = 2 * pa + a - 2  # row offset in the original kernel, -1..1 valid
            if not -1 <= d <= 1:
                continue
            for qb in range(2):
                for b in range(2):
                    e = 2 * qb + b - 2
                    if not -1 <= e <= 1:
                        continue
                    w2 = w2.at[pa, qb, a, b, :, :].set(w3[d + 1, e + 1])
    return w2.reshape(2, 2, 4 * cin, cout)


def expand_w_l0_s2d4(w3: jnp.ndarray) -> jnp.ndarray:
    """Layer-0 conv consuming an r=4 space-to-depth-packed input and emitting
    the r=2 packed output: [3, 3, cin, cout] -> [2, 2, 16*cin, 4*cout].

    Input channels are (a4, b4, ci) phase-major on the 1024-grid packed to
    the 256-grid; output channels (a2, b2, co) on the 512-grid packed to the
    256-grid. Derivation: output row u = 2i + a2 (512-grid) taps input row
    4i + 2*a2 + d - 1 = 4*(i + pm - 1) + a4 with d = a4 - 2*a2 + 4*pm - 3,
    valid when 0 <= d <= 2 — a k=2, s=1 conv with top-left padding 1.
    """
    kh, kw, cin, cout = w3.shape
    assert kh == kw == 3
    w = jnp.zeros((2, 2, 4, 4, cin, 2, 2, cout), w3.dtype)  # [pm,qn,a4,b4,ci,a2,b2,co]
    for pm in range(2):
        for a2 in range(2):
            for a4 in range(4):
                d = a4 - 2 * a2 + 4 * pm - 3
                if not 0 <= d <= 2:
                    continue
                for qn in range(2):
                    for b2 in range(2):
                        for b4 in range(4):
                            e = b4 - 2 * b2 + 4 * qn - 3
                            if not 0 <= e <= 2:
                                continue
                            w = w.at[pm, qn, a4, b4, :, a2, b2, :].set(w3[d, e])
    return w.reshape(2, 2, 16 * cin, 4 * cout)


def _packed_taps_1d(k: int, s: int, p: int, ri: int, ro: int):
    """Tap map for a 1-D conv on a fine grid with packed input/output.

    Original conv: output fine row ``u = ro*j + a_out`` taps input fine row
    ``x = s*u + d - p``.  With the input packed by ``ri`` (``x = ri*i + a_in``)
    and the output packed by ``ro``, each original tap ``(a_out, d)`` maps to
    exactly one packed tap ``i = S*j + m`` with ``S = s*ro/ri`` and
    ``m = (s*a_out + d - p - a_in) / ri`` (``a_in`` fixed by the remainder).

    Returns ``(taps, m_min, K, S)`` where taps = [(m, a_in, a_out, d)] and the
    packed conv has kernel size ``K`` with left padding ``-m_min``.
    """
    assert (s * ro) % ri == 0, f"incompatible packing: s={s} ro={ro} ri={ri}"
    S = (s * ro) // ri
    taps = []
    for a_out in range(ro):
        for d in range(k):
            v = s * a_out + d - p
            a_in = v % ri
            taps.append(((v - a_in) // ri, a_in, a_out, d))
    m_min = min(t[0] for t in taps)
    K = max(t[0] for t in taps) - m_min + 1
    return taps, m_min, K, S


def expand_w_packed(w: jnp.ndarray, s: int, p: int, ri: int, ro: int):
    """Generic packed-conv kernel expansion (channel-major ``(c, a, b)`` order).

    ``w``: one component's HWIO kernel ``[kh, kw, ci, co]`` for a conv with
    stride ``s`` / symmetric padding ``p`` on the fine grid.  Returns
    ``(kernel [KH, KW, ci*ri*ri, co*ro*ro], pad_left, S)`` — the equivalent
    conv on the packed grids, where packed channel index = c*(r*r) + a*r + b.
    The unpacked stem cases (ops/stem.py expand_w_l0/l1/l0_s2d4) are the
    (ri, ro) = (1, 2), (2, 1), (4, 2) instances of this rule.
    """
    kh, kw, ci, co = w.shape
    th, mh_min, KH, S = _packed_taps_1d(kh, s, p, ri, ro)
    tw, mw_min, KW, _ = _packed_taps_1d(kw, s, p, ri, ro)
    wk = jnp.zeros((KH, KW, ci, ri, ri, co, ro, ro), w.dtype)
    for m, a4, a2, d in th:
        for n, b4, b2, e in tw:
            wk = wk.at[m - mh_min, n - mw_min, :, a4, b4, :, a2, b2].set(w[d, e])
    # channel-major (c, a, b): [KH, KW, ci, a4, b4, co, a2, b2] -> flat
    return wk.reshape(KH, KW, ci * ri * ri, co * ro * ro), -mh_min, S


def depth_to_space_cmajor(z: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """Inverse of the channel-major packing: ``[B, Hc, Wc, 4, C*r*r]``
    (packed channel index = c*(r*r) + a*r + b, expand_w_packed convention)
    -> ``[B, Hc*r, Wc*r, 4, C]``. Used where a packed-region layer's output
    must also be consumed unpacked (the saved neck taps under deep
    packing level 2)."""
    B, Hc, Wc, Q, Cr = z.shape
    C = Cr // (r * r)
    z = z.reshape(B, Hc, Wc, Q, C, r, r)       # [..., q, c, a, b]
    z = z.transpose(0, 1, 5, 2, 6, 3, 4)       # [B, Hc, a, Wc, b, q, c]
    return z.reshape(B, Hc * r, Wc * r, Q, C)


def depth_to_space_phasemajor(z: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """Inverse of the phase-major packing (expand_w_l0 convention, packed
    channel index = a*r*C + b*C + c): ``[B, Hc, Wc, 4, C*r*r]`` ->
    ``[B, Hc*r, Wc*r, 4, C]``."""
    B, Hc, Wc, Q, Cr = z.shape
    C = Cr // (r * r)
    z = z.reshape(B, Hc, Wc, Q, r, r, C)       # [..., q, a, b, c]
    z = z.transpose(0, 1, 4, 2, 5, 3, 6)       # [B, Hc, a, Wc, b, q, c]
    return z.reshape(B, Hc * r, Wc * r, Q, C)


def s2d4_rgb_mapped(x_rgb: jnp.ndarray, mapping_type: str) -> jnp.ndarray:
    """RGB [B, H, W, 3] -> quaternion-mapped, r=4 packed [B, H/4, W/4, 4, 16].

    Per-pixel mapping commutes with spatial packing; packed per-component
    channels are phase-major (a4, b4) matching `expand_w_l0_s2d4`.
    """
    from quan_ultralytics_tpu.ops.mappings import rgb_to_quaternion

    B, H, W, _ = x_rgb.shape
    # map first, then ONE transpose: the earlier reshape-transpose-map-
    # moveaxis order materialized two full-image copies (~6 ms/iter at b96)
    q = rgb_to_quaternion(x_rgb, mapping_type)[..., 0]  # [B, H, W, 4(quat)]
    q = q.reshape(B, H // 4, 4, W // 4, 4, 4)  # [B, Hc, a4, Wc, b4, quat]
    q = q.transpose(0, 1, 3, 5, 2, 4)          # [B, Hc, Wc, quat, a4, b4]
    return q.reshape(B, H // 4, W // 4, 4, 16)
