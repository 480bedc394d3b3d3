"""Measure the monotone convex-hull-trick (CHT) stack depth for the EDT
envelope passes on the bench scene.

Motivation (round-3 EDT redesign): the envelope pass
    out[i] = min_j f[j] + (i-j)^2
has the Legendre form  out[i] = i^2 - max_j (2 i j - g[j]),  g[j] = f[j] + j^2
— a max over LINES y = (2j) x - g[j] whose slopes arrive in increasing order
while queries also move right: the textbook monotone CHT. A Pallas kernel can
hold the hull in K *registers* per line (no per-lane gathers — the blocker
that killed Felzenszwalb/PBA per NOTES §10) IF the "active" hull (lines that
can still win at or after the current query point) stays small. This script
measures that K on the real 512^3 bench scene for all four envelope passes
(filled/free fields x y/z passes).

Outputs per pass: histogram of per-line max active-hull size, global max, and
per-(8x128)-line-block max distribution (the kernel's fallback granularity).
"""
from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")
from bench import make_scene  # noqa: E402

INF = np.int64(1 << 29)


def line_d2_axis0(mask: np.ndarray) -> np.ndarray:
    """Squared distance along axis 0 to nearest True (INF if none)."""
    n = mask.shape[0]
    iota = np.arange(n, dtype=np.int64)[:, None, None]
    NEG = np.int64(-(1 << 30))
    last = np.maximum.accumulate(np.where(mask, iota, NEG), axis=0)
    fwd = iota - last
    nxt = -np.maximum.accumulate(np.where(mask, -iota, NEG)[::-1], axis=0)[::-1]
    bwd = nxt - iota
    d = np.minimum(fwd, bwd)
    return np.where(d > n, INF, d * d)


def envelope_exact_2d(slice_mask: np.ndarray) -> np.ndarray:
    """Exact 2D squared EDT of one z-slice via scipy (for pass-3 input)."""
    from scipy import ndimage

    if not slice_mask.any():
        return np.full(slice_mask.shape, INF, np.int64)
    d = ndimage.distance_transform_edt(~slice_mask)
    return np.rint(d * d).astype(np.int64)


def cht_stats_chunked(f_lines: np.ndarray, chunk: int = 32768):
    """cht_stats over line chunks (bounds peak memory at 512^3)."""
    outs, mxs = [], []
    for i in range(0, f_lines.shape[0], chunk):
        o, m = cht_stats(f_lines[i : i + chunk])
        outs.append(o)
        mxs.append(m)
    return np.concatenate(outs), np.concatenate(mxs)


def cht_stats(f_lines: np.ndarray, maxK: int | None = None):
    """Lockstep monotone-CHT forward scan over lines f_lines [B, n].

    Returns (out_left [B, n] left-envelope, per-line max active hull size).
    Active = stack minus the bottom lines already passed by the query point
    (the K a register kernel must hold). Storage is NOT recycled (passed
    bottom lines keep their slots), so maxK defaults to n.
    """
    B, n = f_lines.shape
    if maxK is None:
        maxK = n + 1
    g = f_lines + (np.arange(n, dtype=np.int64) ** 2)[None, :]
    m_st = np.zeros((B, maxK), np.int64)  # slopes 2j
    b_st = np.zeros((B, maxK), np.int64)  # intercepts -g[j]
    q = np.zeros(B, np.int64)  # stack size
    lo = np.zeros(B, np.int64)  # bottom pointer (passed lines)
    max_active = np.zeros(B, np.int64)
    rows = np.arange(B)
    out = np.full((B, n), INF, np.int64)

    for u in range(n):
        fu = f_lines[:, u]
        valid = fu < INF
        mc = np.int64(2 * u)
        bc = -(g[:, u])

        # pop dominated tops: top T with below S is dominated by C iff
        # x*(C,S) <= x*(T,S):  (bc-bS)(mT-mS) <= (bT-bS)(mc-mS)
        while True:
            can = valid & (q - lo >= 2)
            if not can.any():
                break
            qt = np.maximum(q - 1, 0)
            qs = np.maximum(q - 2, 0)
            mT = m_st[rows, qt]
            bT = b_st[rows, qt]
            mS = m_st[rows, qs]
            bS = b_st[rows, qs]
            bad = can & ((bc - bS) * (mT - mS) >= (bT - bS) * (mc - mS))
            if not bad.any():
                break
            q = np.where(bad, q - 1, q)
        # single-line stack: C dominates it iff C >= it at current x
        one = valid & (q - lo == 1)
        if one.any():
            qt = np.maximum(q - 1, 0)
            mT = m_st[rows, qt]
            bT = b_st[rows, qt]
            drop = one & (mc * u + bc >= mT * u + bT)
            q = np.where(drop, q - 1, q)
            lo = np.minimum(lo, q)

        # push C
        if (valid & (q >= maxK)).any():
            raise RuntimeError("maxK overflow in measurement")
        m_st[rows, np.minimum(q, maxK - 1)] = np.where(
            valid, mc, m_st[rows, np.minimum(q, maxK - 1)]
        )
        b_st[rows, np.minimum(q, maxK - 1)] = np.where(
            valid, bc, b_st[rows, np.minimum(q, maxK - 1)]
        )
        q = np.where(valid, q + 1, q)

        # advance bottom pointer: drop passed lines (query x = u moves right)
        while True:
            can = q - lo >= 2
            if not can.any():
                break
            l0 = np.minimum(lo, maxK - 1)
            l1 = np.minimum(lo + 1, maxK - 1)
            adv = can & (
                m_st[rows, l1] * u + b_st[rows, l1]
                >= m_st[rows, l0] * u + b_st[rows, l0]
            )
            if not adv.any():
                break
            lo = np.where(adv, lo + 1, lo)

        active = q - lo
        max_active = np.maximum(max_active, active)
        has = q - lo >= 1
        l0 = np.minimum(lo, maxK - 1)
        val = m_st[rows, l0] * u + b_st[rows, l0]
        out[:, u] = np.where(has, u * u - val, INF)

    return out, max_active


def pass_stats(name: str, f3d: np.ndarray, axis: int, block=(8, 128)):
    """f3d [nx, ny, nz]; envelope along `axis`; lines = the other two axes."""
    f = np.moveaxis(f3d, axis, -1)
    sh = f.shape
    lines = f.reshape(-1, sh[-1])
    _, mx = cht_stats_chunked(lines)
    mx2 = mx.reshape(sh[0], sh[1])
    # per-block max at the kernel's fallback granularity
    b0, b1 = block
    p0 = (sh[0] + b0 - 1) // b0 * b0
    p1 = (sh[1] + b1 - 1) // b1 * b1
    mp = np.zeros((p0, p1), np.int64)
    mp[: sh[0], : sh[1]] = mx2
    blk = mp.reshape(p0 // b0, b0, p1 // b1, b1).max(axis=(1, 3)).ravel()
    hist = np.bincount(mx, minlength=17)
    print(f"[{name}] lines={lines.shape[0]} n={sh[-1]}")
    print(f"  per-line max-active: max={mx.max()} mean={mx.mean():.2f} "
          f"p99={np.percentile(mx, 99):.0f} p99.9={np.percentile(mx, 99.9):.0f}")
    print(f"  hist[0..16+]: {hist[:16].tolist()} +{int((mx >= 16).sum())}")
    for K in (4, 6, 8, 12, 16):
        frac_lines = float((mx > K).mean())
        frac_blocks = float((blk > K).mean())
        print(f"  K={K:2d}: overflow lines {frac_lines:.4%}  "
              f"blocks({b0}x{b1}) {frac_blocks:.4%}")
    return mx


def main(n: int = 512):
    mask = make_scene(n)
    for field, seeds in (("filled", mask), ("free", ~mask)):
        f1 = line_d2_axis0(seeds)
        pass_stats(f"{field}/pass-y", f1, axis=1)
        # pass-3 input: exact 2D EDT per z-slice (x,y plane)
        f2 = np.empty_like(f1)
        for z in range(n):
            f2[:, :, z] = envelope_exact_2d(seeds[:, :, z])
        pass_stats(f"{field}/pass-z", f2, axis=2)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 512)
